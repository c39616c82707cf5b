"""Sequence pipeline test: rotation-only synthetic sequence."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spherical_bundle_adjuster_tpu.core import rotation
from spherical_bundle_adjuster_tpu.models import sequence
from spherical_bundle_adjuster_tpu.utils import synthetic
from spherical_bundle_adjuster_tpu.utils.config import (
    BaConfig,
    MatchConfig,
    PipelineConfig,
    SurfConfig,
)

H, W = 96, 192


def render_sequence(eulers, key):
    """Frames viewing the same procedural scene through cumulative
    rotations; frame k's camera rotation R_k maps bearings b_0 -> b_k =
    R_k b_0 (reference eval convention, see synthetic.rotation_pair)."""
    frames = []
    for e in eulers:
        R = rotation.euler_to_matrix(jnp.asarray(e, jnp.float32))
        frames.append(synthetic.render_erp(key, R.T, H, W))
    return jnp.stack(frames)


def test_sequence_recovers_rotations():
    cfg = PipelineConfig(
        surf=SurfConfig(max_keypoints=128, n_octaves=2),
        match=MatchConfig(max_matches=256, ratio_thresh=0.6),
        ba=BaConfig(reference_compat=False),
    )
    key = jax.random.PRNGKey(11)
    eulers = np.deg2rad(
        [[0, 0, 0], [1.5, -2.0, 3.0], [3.0, -3.5, 6.0], [4.0, -5.0, 9.0]]
    )
    frames = render_sequence(eulers, key)

    out = sequence.run_sequence(
        frames, key, cfg, frontend="band", global_ba=False
    )
    # pairwise odometry rotations should match the incremental GT rotation
    for k in range(3):
        R_prev = np.asarray(rotation.euler_to_matrix(jnp.asarray(eulers[k], jnp.float32)))
        R_next = np.asarray(rotation.euler_to_matrix(jnp.asarray(eulers[k + 1], jnp.float32)))
        R_rel_gt = R_next @ R_prev.T
        R_est = np.asarray(rotation.angle_axis_to_matrix(out.pairwise_rot[k]))
        cos = (np.trace(R_est.T @ R_rel_gt) - 1) / 2
        geo = np.degrees(np.arccos(np.clip(cos, -1, 1)))
        assert geo < 2.0, f"pair {k}: rel rotation off by {geo:.2f} deg"

    # chained pose-graph rotation of the last frame ~ GT cumulative
    R_last_est = np.asarray(rotation.angle_axis_to_matrix(out.poses[-1, :3]))
    R_last_gt = np.asarray(rotation.euler_to_matrix(jnp.asarray(eulers[-1], jnp.float32)))
    cos = (np.trace(R_last_est.T @ R_last_gt) - 1) / 2
    geo = np.degrees(np.arccos(np.clip(cos, -1, 1)))
    assert geo < 4.0, f"final pose rotation drift {geo:.2f} deg"
    assert float(out.pg_costs[-1]) <= float(out.pg_costs[0]) + 1e-6


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("SBA_SLOW", "0") != "1",
    reason="100-keyframe sequence takes minutes on CPU; set SBA_SLOW=1",
)
def test_sequence_100_keyframes_ate_bound():
    """100-keyframe orbit through the full sequence path on the virtual
    8-device mesh (VERDICT r3 next #8); the committed artifact
    SEQUENCE_100_r04.json records the same run via
    scripts/run_sequence_100.py. Rotation ATE (gauge-aligned at frame 0)
    must stay below 2 degrees median over the whole trajectory."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "run_sequence_100",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "run_sequence_100.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from jax.sharding import Mesh
    from spherical_bundle_adjuster_tpu.models import sequence as seq

    n = 100
    cfg = PipelineConfig(
        surf=SurfConfig(max_keypoints=64, n_octaves=2),
        match=MatchConfig(max_matches=128, ratio_thresh=0.5),
    )
    eulers = mod.orbit_eulers(n)
    Rs = jax.vmap(rotation.euler_to_matrix)(jnp.asarray(eulers))
    frames = jax.vmap(
        lambda R: synthetic.render_erp(jax.random.PRNGKey(11), R.T, 128, 256)
    )(Rs)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(-1), ("landmarks",))
    res = seq.run_sequence(
        frames, jax.random.PRNGKey(3), cfg, global_ba=True, ba_iters=10,
        mesh=mesh,
    )
    R_est = np.asarray(jax.vmap(rotation.angle_axis_to_matrix)(res.poses[:, :3]))
    R_gt = np.asarray(Rs)
    align = R_gt[0] @ R_est[0].T
    errs = []
    for i in range(n):
        Re = align @ R_est[i]
        cosv = (np.trace(R_gt[i].T @ Re) - 1) / 2
        errs.append(np.degrees(np.arccos(np.clip(cosv, -1, 1))))
    errs = np.asarray(errs)
    assert float(np.median(errs)) < 2.0, errs
