"""Sequence pipeline test: rotation-only synthetic sequence."""

import numpy as np
import jax
import jax.numpy as jnp

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
