"""Pallas streaming top-2 matcher vs the jnp reference (interpret mode on
the CPU backend; the same kernel compiles natively on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from spherical_bundle_adjuster_tpu.ops import pallas_match


def test_top2_matches_jnp_reference(rng):
    k1, k2, d = 96, 256, 64
    d1 = jnp.asarray(rng.normal(size=(k1, d)), jnp.float32)
    d2 = jnp.asarray(rng.normal(size=(k2, d)), jnp.float32)
    valid2 = jnp.asarray(rng.random(k2) > 0.2)

    dist_p, idx_p = pallas_match.top2_distances(
        d1, d2, valid2, block_m=32, block_n=64, interpret=True
    )

    # jnp reference
    dist2 = jnp.sum((d1[:, None, :] - d2[None, :, :]) ** 2, axis=-1)
    dist2 = jnp.where(valid2[None, :], dist2, jnp.inf)
    neg, idx = jax.lax.top_k(-dist2, 2)
    ref_d = jnp.sqrt(-neg)
    np.testing.assert_allclose(np.asarray(dist_p), np.asarray(ref_d), atol=2e-3)
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx))


def test_top2_all_invalid(rng):
    d1 = jnp.asarray(rng.normal(size=(32, 64)), jnp.float32)
    d2 = jnp.asarray(rng.normal(size=(64, 64)), jnp.float32)
    valid2 = jnp.zeros(64, bool)
    dist_p, idx_p = pallas_match.top2_distances(
        d1, d2, valid2, block_m=32, block_n=64, interpret=True
    )
    assert np.isinf(np.asarray(dist_p)).all()
