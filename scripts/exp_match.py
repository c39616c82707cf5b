"""Experiment: match stage cost at bench scale (2048x2048 banks, B=4).
Pallas streaming top-2 vs dense MXU matmul + top_k, plus packing and
band_pixel_to_erp. Scan-amortized. Run ALONE. Temporary."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

REPS = 16
B = 4
K = 2048
D = 64


def _sum_tree(t):
    return sum(jnp.sum(x).astype(jnp.float32) for x in jax.tree.leaves(t))


def make_timer():
    @jax.jit
    def tiny(x):
        return x + 1.0

    jax.block_until_ready(tiny(jnp.float32(0.0)))

    def med(f, *args, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    rtt = med(tiny, jnp.float32(1.0))
    print(f"(rtt ~{rtt*1e3:.1f} ms)", flush=True)

    def stage(label, body):
        @jax.jit
        def run(_x):
            def sbody(c, i):
                return c + _sum_tree(body(i)), None

            c, _ = jax.lax.scan(sbody, jnp.float32(0.0), jnp.arange(REPS))
            return c

        jax.block_until_ready(run(0))
        t = med(run, 0)
        print(f"{label}: {(t - rtt) / REPS * 1e3:.2f} ms", flush=True)

    return stage


def main():
    from spherical_bundle_adjuster_tpu.ops import match, pallas_match, warp
    from spherical_bundle_adjuster_tpu.utils.config import MatchConfig

    rng = np.random.default_rng(0)
    d1 = rng.normal(size=(B, K, D)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    d2 = rng.normal(size=(B, K, D)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    d1 = jnp.asarray(d1)
    d2 = jnp.asarray(d2)
    v1 = jnp.ones((B, K), bool)
    v2 = jnp.ones((B, K), bool)
    xy = jnp.asarray(rng.uniform(0, 1000, (B, K, 2)).astype(np.float32))

    stage = make_timer()
    v = jax.vmap
    cfg = MatchConfig(max_matches=512, ratio_thresh=0.5)

    def pert(x, i):
        return x + 0.0 * i.astype(jnp.float32)

    stage(
        "pallas top2 (B)",
        lambda i: v(lambda a, b, m: pallas_match.top2_distances(a, b, m))(
            pert(d1, i), d2, v2
        ),
    )

    def dense_top2(a, b, m):
        cross = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
        dist2 = jnp.maximum(2.0 - 2.0 * cross, 0.0)
        dist2 = jnp.where(m[None, :], dist2, jnp.inf)
        neg, idx = jax.lax.top_k(-dist2, 2)
        return jnp.sqrt(-neg), idx

    stage("dense matmul+top_k2 (B)", lambda i: v(dense_top2)(pert(d1, i), d2, v2))

    def dense_min2(a, b, m):
        # top-2 via two masked min+argmin passes (cheaper than top_k sort)
        cross = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
        dist2 = jnp.maximum(2.0 - 2.0 * cross, 0.0)
        dist2 = jnp.where(m[None, :], dist2, jnp.inf)
        i1 = jnp.argmin(dist2, axis=-1)
        b1 = jnp.take_along_axis(dist2, i1[:, None], axis=-1)[:, 0]
        d2_ = dist2.at[jnp.arange(dist2.shape[0]), i1].set(jnp.inf)
        b2 = jnp.min(d2_, axis=-1)
        return jnp.sqrt(jnp.stack([b1, b2], -1)), i1

    stage("dense matmul+2xmin (B)", lambda i: v(dense_min2)(pert(d1, i), d2, v2))

    stage(
        "full match_descriptors (B)",
        lambda i: v(lambda a, b: match.match_descriptors(a, v1[0], b, v2[0], cfg=cfg))(
            pert(d1, i), d2
        ),
    )

    # packing alone: argsort over K
    good = jnp.asarray(rng.uniform(0, 1, (B, K)) < 0.1)
    best = jnp.asarray(rng.uniform(0, 1, (B, K)).astype(np.float32))

    def pack(g, bst):
        score = jnp.where(g, bst, jnp.inf)
        order = jnp.argsort(score)
        return order[: cfg.max_matches]

    stage("pack argsort (B)", lambda i: v(pack)(good, pert(best, i)))

    pitches = jnp.deg2rad(jnp.asarray([45.0, 0.0, -45.0, -90.0]))
    xy_b = xy.reshape(B, 4, K // 4, 2)
    stage(
        "band_pixel_to_erp (Bx4)",
        lambda i: v(
            lambda x: jax.vmap(lambda a, p: warp.band_pixel_to_erp(a, p, 1024, 512))(
                x, pitches
            )
        )(pert(xy_b, i)),
    )


if __name__ == "__main__":
    main()
