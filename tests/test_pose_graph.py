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


class TestScaledPoseGraph:
    """VERDICT r1 #4: per-edge blocks + segment-sum assembly must carry a
    512-node chain with 32 loop closures in ONE jit on the CPU backend."""

    def _make_graph(self, n, n_closures, rng, init_noise=(0.05, 0.2)):
        gt = np.concatenate(
            [rng.uniform(-0.5, 0.5, (n, 3)), rng.uniform(-2.0, 2.0, (n, 3))],
            axis=-1,
        ).astype(np.float32)
        gt[0] = 0.0
        ei = np.arange(n - 1)
        ej = np.arange(1, n)
        if n_closures:
            ci = rng.integers(0, n - 10, n_closures)
            cj = ci + rng.integers(5, 10, n_closures)
            ei = np.concatenate([ei, ci])
            ej = np.concatenate([ej, cj])
        gtj = jnp.asarray(gt)
        R_rel, t_rel = pg.relative_pose(gtj[ei], gtj[ej])
        rot_aa = rotation.matrix_to_angle_axis(R_rel)
        init = gt + np.concatenate(
            [
                rng.normal(scale=init_noise[0], size=(n, 3)),
                rng.normal(scale=init_noise[1], size=(n, 3)),
            ],
            axis=-1,
        ).astype(np.float32)
        init[0] = gt[0]
        g = pg.PoseGraph(
            poses=jnp.asarray(init),
            edge_i=jnp.asarray(ei, jnp.int32),
            edge_j=jnp.asarray(ej, jnp.int32),
            edge_rot=rot_aa,
            edge_tran=t_rel,
            edge_weight=jnp.ones(len(ei), jnp.float32),
        )
        return g, gt

    def test_512_chain_32_closures_pcg(self):
        rng = np.random.default_rng(3)
        g, gt = self._make_graph(512, 32, rng)
        opt, costs = pg.optimize_pose_graph(
            g, num_iters=15, linear_solver="pcg", cg_iters=120
        )
        assert float(costs[-1]) < 1e-4 * float(costs[0]), (
            float(costs[0]),
            float(costs[-1]),
        )
        # exact measurements + gauge fix => solution is the GT
        t_err = np.linalg.norm(np.asarray(opt.poses)[:, 3:] - gt[:, 3:], axis=-1)
        assert np.median(t_err) < 0.02, f"median t err {np.median(t_err)}"

    def test_dense_and_pcg_agree(self):
        rng = np.random.default_rng(4)
        g, gt = self._make_graph(24, 4, rng)
        opt_d, costs_d = pg.optimize_pose_graph(
            g, num_iters=12, linear_solver="dense"
        )
        opt_p, costs_p = pg.optimize_pose_graph(
            g, num_iters=12, linear_solver="pcg", cg_iters=200, cg_tol=1e-7
        )
        assert float(costs_d[-1]) < 1e-4 * float(costs_d[0])
        assert float(costs_p[-1]) < 1e-4 * float(costs_p[0])
        np.testing.assert_allclose(
            np.asarray(opt_d.poses), np.asarray(opt_p.poses), atol=5e-3
        )
