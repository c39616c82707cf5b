"""Pose-graph optimization over relative-pose constraints (loop closure).

The layer above per-pair BA for long 360 sequences (BASELINE.json config
#4): nodes are keyframe poses (angle-axis r, translation t; camera maps a
world point X to R(r) X - t, matching the BA convention), edges are
measured relative poses from two-view BA plus loop-closure detections.

Edge residual for (i, j) with measurement (R_ij, t_ij):
    rotation:    log(R_ij^T (R_j R_i^T))              (3)
    translation: (t_j_pred - t_ij_world) residual expressed via the pose
                 composition p_j = R_ij p_i - t_ij; using the camera
                 convention, the predicted relative pose of edge (i, j) is
                 R_rel = R_j R_i^T,  t_rel = t_j - R_rel t_i,
    res = [ log(R_ij^T R_rel), t_rel - t_ij ] in R^6, optionally scaled by
    per-edge weights (information).

Solved by damped Gauss-Newton with `jax.jacfwd` over the stacked pose
vector — dense (6N)^2 normal equations (fine for hundreds of keyframes;
the multi-host story shards edges and psums H, g like dist_ba).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import rotation, smallmat
from ..core.precision import einsum as hp_einsum


class PoseGraph(NamedTuple):
    poses: jax.Array      # (N, 6) [angle-axis | translation]
    edge_i: jax.Array     # (E,) int32 source node
    edge_j: jax.Array     # (E,) int32 target node
    edge_rot: jax.Array   # (E, 3) measured relative rotation (angle-axis)
    edge_tran: jax.Array  # (E, 3) measured relative translation
    edge_weight: jax.Array  # (E,) confidence (0 disables an edge slot)


def relative_pose(pose_i, pose_j):
    """Predicted relative pose of edge (i, j): R_rel = R_j R_i^T,
    t_rel = t_j - R_rel t_i (camera convention p = R X - t)."""
    Ri = rotation.angle_axis_to_matrix(pose_i[..., :3])
    Rj = rotation.angle_axis_to_matrix(pose_j[..., :3])
    R_rel = Rj @ jnp.swapaxes(Ri, -1, -2)
    t_rel = pose_j[..., 3:] - hp_einsum("...ij,...j->...i", R_rel, pose_i[..., 3:])
    return R_rel, t_rel


def edge_residual(pose_i, pose_j, meas_rot_aa, meas_tran):
    """6-residual per edge: SO(3) log of rotation error + translation gap."""
    R_rel, t_rel = relative_pose(pose_i, pose_j)
    R_meas = rotation.angle_axis_to_matrix(meas_rot_aa)
    R_err = jnp.swapaxes(R_meas, -1, -2) @ R_rel
    r_err = rotation.matrix_to_angle_axis(R_err)
    return jnp.concatenate([r_err, t_rel - meas_tran], axis=-1)


def graph_residuals(poses_flat, g: PoseGraph):
    poses = poses_flat.reshape(-1, 6)
    pi = poses[g.edge_i]
    pj = poses[g.edge_j]
    res = edge_residual(pi, pj, g.edge_rot, g.edge_tran)  # (E, 6)
    return res * g.edge_weight[:, None]


def total_cost(g: PoseGraph):
    res = graph_residuals(g.poses.reshape(-1), g)
    return 0.5 * jnp.sum(res * res)


@partial(jax.jit, static_argnames=("num_iters", "fix_first_pose"))
def optimize_pose_graph(
    g: PoseGraph,
    num_iters: int = 25,
    lam0: float = 1e-3,
    fix_first_pose: bool = True,
):
    """Damped GN over all poses; returns (optimized graph, cost trace)."""
    n = g.poses.shape[0]

    def step(carry, _):
        poses_flat, lam = carry
        gg = g._replace(poses=poses_flat.reshape(-1, 6))
        res = graph_residuals(poses_flat, gg)
        cost0 = 0.5 * jnp.sum(res * res)
        J = jax.jacfwd(lambda p: graph_residuals(p, gg))(poses_flat)  # (E,6,6N)
        Jf = J.reshape(-1, poses_flat.shape[0])
        rf = res.reshape(-1)
        H = hp_einsum("ri,rj->ij", Jf, Jf)
        grad = hp_einsum("ri,r->i", Jf, rf)
        H = H + lam * jnp.diag(jnp.maximum(jnp.diagonal(H), 1e-8))
        if fix_first_pose:
            mask = jnp.concatenate([jnp.zeros(6), jnp.ones(poses_flat.shape[0] - 6)])
            H = H * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
            grad = grad * mask
        H = H + 1e-9 * jnp.eye(poses_flat.shape[0])
        dp = -smallmat.solve_psd(H, grad)
        new_flat = poses_flat + dp
        res1 = graph_residuals(new_flat, gg)
        cost1 = 0.5 * jnp.sum(res1 * res1)
        accept = cost1 < cost0
        poses_flat = jnp.where(accept, new_flat, poses_flat)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-10, 1e8)
        return (poses_flat, lam), jnp.minimum(cost0, cost1)

    (poses_flat, _), costs = jax.lax.scan(
        step,
        (g.poses.reshape(-1), jnp.asarray(lam0, g.poses.dtype)),
        None,
        length=num_iters,
    )
    return g._replace(poses=poses_flat.reshape(-1, 6)), costs


def chain_with_loop_closures(
    odometry_rot, odometry_tran, closures=(), closure_weight=1.0
):
    """Build a PoseGraph from sequential odometry edges (i -> i+1) plus
    (i, j, rot_aa, tran) loop-closure tuples; initializes poses by chaining
    odometry. Convenience for sequence pipelines and tests."""
    n = odometry_rot.shape[0] + 1
    poses = [jnp.zeros(6)]
    for k in range(n - 1):
        Rk = rotation.angle_axis_to_matrix(odometry_rot[k])
        R_prev = rotation.angle_axis_to_matrix(poses[-1][:3])
        R_new = Rk @ R_prev
        t_new = odometry_tran[k] + hp_einsum("ij,j->i", Rk, poses[-1][3:])
        # p_{k+1} = R_k p_k - t_k => R_{k+1} = R_k R_k_prev ... chain in
        # the same camera convention as relative_pose().
        poses.append(
            jnp.concatenate([rotation.matrix_to_angle_axis(R_new), t_new])
        )
    poses = jnp.stack(poses)

    ei = list(range(n - 1))
    ej = list(range(1, n))
    er = [odometry_rot[k] for k in range(n - 1)]
    et = [odometry_tran[k] for k in range(n - 1)]
    ew = [1.0] * (n - 1)
    for (i, j, raa, t) in closures:
        ei.append(i)
        ej.append(j)
        er.append(jnp.asarray(raa))
        et.append(jnp.asarray(t))
        ew.append(closure_weight)
    return PoseGraph(
        poses=poses,
        edge_i=jnp.asarray(ei, jnp.int32),
        edge_j=jnp.asarray(ej, jnp.int32),
        edge_rot=jnp.stack(er),
        edge_tran=jnp.stack(et),
        edge_weight=jnp.asarray(ew, jnp.float32),
    )
