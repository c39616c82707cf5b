"""Pose-graph optimization tests: drift correction via loop closure."""

import numpy as np
import jax.numpy as jnp

from spherical_bundle_adjuster_tpu.core import rotation
from spherical_bundle_adjuster_tpu.solver import pose_graph as pg


def make_loop(n=6, drift=0.03, seed=0):
    """Ground truth: cameras around a loop; odometry edges with drift noise
    plus one exact loop-closure edge from last back to first."""
    rng = np.random.default_rng(seed)
    # GT poses: successive small rotations/translations
    gt = [np.zeros(6)]
    for k in range(n - 1):
        aa = rng.uniform(-0.1, 0.1, 3)
        t = rng.uniform(-0.3, 0.3, 3)
        R = np.asarray(rotation.angle_axis_to_matrix(jnp.asarray(aa)))
        R_prev = np.asarray(rotation.angle_axis_to_matrix(jnp.asarray(gt[-1][:3])))
        R_new = R @ R_prev
        t_new = t + R @ gt[-1][3:]
        gt.append(
            np.concatenate(
                [np.asarray(rotation.matrix_to_angle_axis(jnp.asarray(R_new))), t_new]
            )
        )
    gt = np.stack(gt)

    # exact relative edges + noise on odometry
    def rel(i, j):
        Ri = np.asarray(rotation.angle_axis_to_matrix(jnp.asarray(gt[i][:3])))
        Rj = np.asarray(rotation.angle_axis_to_matrix(jnp.asarray(gt[j][:3])))
        R_rel = Rj @ Ri.T
        t_rel = gt[j][3:] - R_rel @ gt[i][3:]
        return (
            np.asarray(rotation.matrix_to_angle_axis(jnp.asarray(R_rel))),
            t_rel,
        )

    odo_r, odo_t = [], []
    for k in range(n - 1):
        raa, t = rel(k, k + 1)
        odo_r.append(raa + rng.normal(scale=drift, size=3))
        odo_t.append(t + rng.normal(scale=drift, size=3))
    closure = rel(0, n - 1)  # exact loop closure from 0 to last
    return (
        jnp.asarray(np.stack(odo_r), jnp.float32),
        jnp.asarray(np.stack(odo_t), jnp.float32),
        closure,
        gt,
    )


class TestPoseGraph:
    def test_zero_residual_at_consistent_graph(self):
        odo_r, odo_t, closure, gt = make_loop(drift=0.0)
        g = pg.chain_with_loop_closures(odo_r, odo_t)
        assert float(pg.total_cost(g)) < 1e-8

    def test_loop_closure_reduces_drift(self):
        odo_r, odo_t, closure, gt = make_loop(n=6, drift=0.03)
        c_raa, c_t = closure
        g = pg.chain_with_loop_closures(
            odo_r,
            odo_t,
            closures=[(0, 5, jnp.asarray(c_raa, jnp.float32), jnp.asarray(c_t, jnp.float32))],
            closure_weight=10.0,
        )
        err_before = np.linalg.norm(np.asarray(g.poses)[-1][3:] - gt[-1][3:])
        opt, costs = pg.optimize_pose_graph(g, num_iters=25)
        err_after = np.linalg.norm(np.asarray(opt.poses)[-1][3:] - gt[-1][3:])
        assert float(costs[-1]) < float(costs[0])
        assert err_after < err_before, (err_before, err_after)
        # end pose should be pulled close to GT by the strong exact closure
        assert err_after < 0.6 * err_before

    def test_first_pose_fixed(self):
        odo_r, odo_t, closure, gt = make_loop(n=5, drift=0.05)
        g = pg.chain_with_loop_closures(odo_r, odo_t)
        opt, _ = pg.optimize_pose_graph(g, num_iters=10)
        np.testing.assert_allclose(np.asarray(opt.poses)[0], 0.0, atol=1e-7)
