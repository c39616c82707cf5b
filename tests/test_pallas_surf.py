"""Pallas dense-map kernels vs the XLA shifted-slice paths (VERDICT r4
#1). On CPU the kernels run in interpret mode — slow, so the fixture is
tiny; the assertions are numerical parity, the perf claim is measured on
TPU (BENCH_SWEEP_r05 stages)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spherical_bundle_adjuster_tpu.ops import integral, surf
from spherical_bundle_adjuster_tpu.utils.config import SurfConfig

CFG_XLA = SurfConfig(max_keypoints=64, n_octaves=2, det_mode="xla")
CFG_PAL = dataclasses.replace(CFG_XLA, det_mode="pallas")


@pytest.fixture(scope="module")
def gray():
    rng = np.random.default_rng(3)
    # smooth structure + noise so there are real blobs to detect
    y, x = np.mgrid[0:64, 0:128]
    img = (
        120
        + 80 * np.sin(x / 7.0) * np.cos(y / 5.0)
        + rng.uniform(0, 40, (64, 128))
    )
    return jnp.asarray(np.clip(img, 0, 255), jnp.float32)


def test_det_pyramid_matches_xla(gray):
    """Same det-of-Hessian maps (f32 reassociation noise only)."""
    det_x = surf._det_maps_per_octave(gray, CFG_XLA)
    det_p = surf._det_maps_per_octave(gray, CFG_PAL)
    assert len(det_x) == len(det_p)
    for a, b in zip(det_x, det_p):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape
        fin = np.isfinite(a)
        assert (fin == np.isfinite(b)).all()
        # det magnitudes at threshold scale are O(100); integral-image
        # cancellation noise is O(ii_max * eps) ~ O(0.5) on this fixture
        np.testing.assert_allclose(a[fin], b[fin], atol=2.0, rtol=1e-4)


def test_haar_trace_maps_match_xla(gray):
    ii = integral.integral_image(gray)
    out = surf._haar_trace_maps_pallas(ii, CFG_PAL)
    assert out is not None
    haar_p, trace_p = out
    haar_x = surf._dense_haar_maps(ii, CFG_XLA)
    trace_x = surf._dense_trace_sign_maps(ii, CFG_XLA)
    hx_p, hy_p = surf._unpack_haar(np.asarray(haar_p))
    hx_x, hy_x = surf._unpack_haar(np.asarray(haar_x))
    # bf16-packed responses: a half-ulp disagreement flips the stored
    # bf16 value; allow small relative differences
    np.testing.assert_allclose(np.asarray(hx_p), np.asarray(hx_x), atol=4.0, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(hy_p), np.asarray(hy_x), atol=4.0, rtol=2e-2)
    # trace signs: identical except where the trace is within
    # cancellation noise of zero
    tp, tx = np.asarray(trace_p), np.asarray(trace_x)
    assert (tp != tx).mean() < 0.01


def test_detect_and_describe_parity(gray):
    """End-to-end detect+describe with the Pallas maps must yield the
    same keypoint set (within subpixel noise) and matching descriptors."""
    kp_x, d_x = surf.detect_and_describe(gray, CFG_XLA)
    kp_p, d_p = surf.detect_and_describe(gray, CFG_PAL)
    vx, vp = np.asarray(kp_x.valid), np.asarray(kp_p.valid)
    assert vx.sum() > 4  # fixture must actually detect something
    assert abs(int(vx.sum()) - int(vp.sum())) <= 1
    n = min(int(vx.sum()), int(vp.sum()))
    # top-k order is response-sorted; compare the common prefix
    xy_x, xy_p = np.asarray(kp_x.xy)[:n], np.asarray(kp_p.xy)[:n]
    np.testing.assert_allclose(xy_x, xy_p, atol=0.25)
    np.testing.assert_allclose(
        np.asarray(d_x)[:n], np.asarray(d_p)[:n], atol=5e-2
    )
