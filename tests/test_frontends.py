"""Front-end strategy tests on synthetic GT-rotation ERP pairs."""

import numpy as np
import jax
import pytest

from spherical_bundle_adjuster_tpu.models import evaluation
from spherical_bundle_adjuster_tpu.models.frontend import FRONTENDS
from spherical_bundle_adjuster_tpu.utils import synthetic
from spherical_bundle_adjuster_tpu.utils.config import (
    FrontendConfig,
    MatchConfig,
    PipelineConfig,
    SurfConfig,
)

H, W = 96, 192
CFG = PipelineConfig(
    surf=SurfConfig(max_keypoints=128, n_octaves=2),
    match=MatchConfig(max_matches=256, ratio_thresh=0.6),
    frontend=FrontendConfig(cube_size=48),
)


@pytest.fixture(scope="module")
def pair():
    euler = np.deg2rad([2.0, -3.0, 5.0])
    left, right, R_gt = synthetic.rotation_pair(jax.random.PRNGKey(7), euler, H, W)
    return left, right, R_gt


# Regression bounds derived from measured round-2 values at THIS fixture
# (96x192, seed 7, euler (2,-3,5) deg): erp 38 matches / 26.3% / 1.47 deg,
# band 19 / 42.1% / 1.75 deg, cubemap 21 / 28.6% / 1.51 deg. Outlier% at a
# 2 deg threshold is inherently high at this tiny resolution (the match
# noise floor is ~1.5 deg); the 512x1024 envelope lives in QUALITY.md and
# bench.py's asserted gates.
BOUNDS = {  # name: (min_matches, max_outlier_pct, max_trim_err_deg)
    "erp": (25, 35.0, 2.5),
    "band": (12, 50.0, 2.5),
    "cubemap": (13, 40.0, 2.5),
}


@pytest.mark.parametrize("name", ["erp", "band", "cubemap"])
def test_frontend_quality(pair, name):
    left, right, R_gt = pair
    fr = FRONTENDS[name](left, right, CFG)
    m = evaluation.evaluate_matches(fr, R_gt, W, H, CFG)
    n = int(m.num_matches)
    min_m, max_out, max_err = BOUNDS[name]
    assert n >= min_m, f"{name}: only {n} matches"
    assert float(m.outlier_pct) < max_out, f"{name}: {float(m.outlier_pct)}% outliers"
    assert float(m.trimmed_mean_err_rad) < np.deg2rad(max_err)
    # matched coords lie inside the ERP image
    lxy = np.asarray(fr.left_xy)[np.asarray(fr.match_valid)]
    assert (lxy[:, 0] >= 0).all() and (lxy[:, 0] <= W).all()
    assert (lxy[:, 1] >= 0).all() and (lxy[:, 1] <= H).all()


def test_band_beats_naive_at_high_pitch(pair):
    """The band front-end's purpose: keypoints away from the equator are
    distortion-reduced. At minimum it must produce valid matches covering
    more vertical extent or comparable quality (smoke-level check)."""
    left, right, R_gt = pair
    fr = FRONTENDS["band"](left, right, CFG)
    assert int(fr.match_count) >= 5


def test_quality_preset(pair):
    """PipelineConfig.quality() = dense 22.5-deg ladder + inlier_count
    RANSAC scoring (the documented mode selection for the QUALITY.md
    pitch cliff). Wiring + behavior smoke: the dense ladder must produce
    at least as many valid band matches as the parity ladder on a
    rotated pair. Note the dense ladder is a superset of band COVERAGE,
    not of the match set — its extra bands also add distractor
    descriptors to the one-way ratio test, which can reject a few
    previously-passing matches — so the bound is 80% of the parity
    count, not a strict inequality (ADVICE r3)."""
    from spherical_bundle_adjuster_tpu.utils.config import DENSE_BAND_PITCHES

    q = CFG.quality()
    assert q.frontend.band_ladder == "dense"
    assert q.ransac.scoring == "inlier_count"
    left, right, _ = pair
    fr_p = FRONTENDS["band"](left, right, CFG.parity())
    fr_q = FRONTENDS["band"](left, right, q)
    assert int(fr_q.match_count) >= max(5, int(0.8 * int(fr_p.match_count)))


def test_auto_ladder_falls_back_on_pitch_cliff():
    """band_ladder='auto' (the default) must fall back to the dense
    ladder when the parity ladder starves (QUALITY.md pitch cliff: GT
    pitch ~30 deg lands between the reference's 45-deg band centers) and
    must return the parity result bit-for-bit when matches are plentiful."""
    import dataclasses

    cliff = np.deg2rad([0.0, 30.0, 3.0])
    left, right, R_gt = synthetic.rotation_pair(jax.random.PRNGKey(5), cliff, H, W)
    auto_cfg = CFG  # default band_ladder="auto"
    assert auto_cfg.frontend.band_ladder == "auto"
    fr_parity = FRONTENDS["band"](left, right, CFG.parity())
    fr_auto = FRONTENDS["band"](left, right, auto_cfg)
    fr_dense = FRONTENDS["band"](left, right, CFG.quality())
    if int(fr_parity.match_count) < auto_cfg.frontend.auto_min_matches:
        # the cliff: auto must equal the dense result
        assert int(fr_auto.match_count) == int(fr_dense.match_count)
        assert int(fr_auto.match_count) > int(fr_parity.match_count)
    # easy equatorial pair: auto == parity exactly
    easy = np.deg2rad([1.0, -2.0, 3.0])
    left2, right2, _ = synthetic.rotation_pair(jax.random.PRNGKey(6), easy, H, W)
    fr_p2 = FRONTENDS["band"](left2, right2, CFG.parity())
    if int(fr_p2.match_count) >= auto_cfg.frontend.auto_min_matches:
        fr_a2 = FRONTENDS["band"](left2, right2, auto_cfg)
        np.testing.assert_allclose(
            np.asarray(fr_a2.left_xy), np.asarray(fr_p2.left_xy)
        )
        assert int(fr_a2.match_count) == int(fr_p2.match_count)


def test_identity_pair_zero_error():
    left, right, R_gt = synthetic.rotation_pair(
        jax.random.PRNGKey(3), np.zeros(3), H, W
    )
    fr = FRONTENDS["erp"](left, left, CFG)
    m = evaluation.evaluate_matches(fr, R_gt, W, H, CFG)
    assert int(m.num_matches) >= 10
    assert float(m.trimmed_mean_err_rad) < 1e-3
    assert int(m.num_outliers) == 0
