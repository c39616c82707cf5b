"""Sequence pipeline: multi-keyframe spherical SfM over an ordered list of
ERP frames — the capstone composition the reference stops short of
(it is two-view only; BASELINE.json configs #3-#5).

Stages:
  1. pairwise odometry — two-view BA between consecutive frames (vmapped
     over the whole sequence at once: frames[:-1] vs frames[1:]);
  2. optional loop closures — two-view BA between given (i, j) pairs;
  3. pose graph — chain odometry + closures, damped GN (solver.pose_graph);
  4. global refinement — triangulate matched pairs into landmarks and run
     the multi-keyframe Schur BA (models.multiview), optionally sharded
     over a device mesh (parallel.dist_ba).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rotation, sphere
from ..solver import pose_graph as pg
from ..utils.config import PipelineConfig
from . import multiview as mv
from . import twoview


class SequenceResult(NamedTuple):
    poses: jax.Array          # (N, 6) world->camera [angle-axis | t]
    pairwise_rot: jax.Array   # (N-1, 3) odometry rotations (angle-axis)
    pairwise_tran: jax.Array  # (N-1, 3)
    pg_costs: jax.Array       # pose-graph cost trace
    ba_costs: jax.Array       # global BA cost trace (empty if skipped)


def pairwise_odometry(frames, key, cfg: PipelineConfig, frontend: str = "band"):
    """Two-view BA on every consecutive pair, one vmapped batch.

    frames: (N, H, W, C). Returns (rot_aa (N-1, 3), tran (N-1, 3),
    ok (N-1,), results)."""
    keys = jax.random.split(key, frames.shape[0] - 1)
    fn = jax.vmap(partial(twoview.run_two_view, cfg=cfg, frontend=frontend))
    res = fn(frames[:-1], frames[1:], keys)
    return res.rotation_aa, res.translation, res.ok, res


def _triangulate_pair(b1, b2, r_aa, t, valid):
    """Midpoint triangulation of matched bearings for landmark init.

    Rays: camera i at origin along b1; camera j at center c = R^T t with
    direction R^T b2 (from p_j = R p_i - t). Returns (X (M, 3), ok (M,)).
    """
    R = rotation.angle_axis_to_matrix(r_aa)
    d2 = b2 @ R  # R^T b2, batched
    c2 = R.T @ t
    # closest points on the two rays: solve 2x2 for (s, u)
    b1d2 = jnp.sum(b1 * d2, axis=-1)
    rhs1 = jnp.sum(b1 * c2[None, :], axis=-1)
    rhs2 = jnp.sum(d2 * c2[None, :], axis=-1)
    det = 1.0 - b1d2 * b1d2
    s = (rhs1 - b1d2 * rhs2) / jnp.maximum(det, 1e-9)
    u = (b1d2 * rhs1 - rhs2) / jnp.maximum(det, 1e-9)
    p1 = b1 * s[:, None]
    p2 = c2[None, :] + d2 * u[:, None]
    X = 0.5 * (p1 + p2)
    ok = valid & (det > 1e-6) & (s > 0.1) & jnp.all(jnp.isfinite(X), axis=-1)
    return jnp.where(ok[:, None], X, 0.0), ok


def build_multiview_problem(
    poses, pair_results, width, height, max_landmarks_per_pair=64
):
    """Landmark-major (L, P=2) observation table from pairwise matches.

    Each consecutive-pair match becomes one landmark observed by its two
    cameras, triangulated in the world frame via the chained poses. (A
    cross-pair track merger is a natural extension; two-view landmarks
    already couple all cameras through shared poses.)
    """
    n_pairs = pair_results.rotation_aa.shape[0]
    Ls, cams, bears, vals = [], [], [], []
    for i in range(n_pairs):
        b1 = sphere.pixel_to_bearing(pair_results.left_xy[i], width, height)
        b2 = sphere.pixel_to_bearing(pair_results.right_xy[i], width, height)
        valid = pair_results.match_valid[i]
        X_local, ok = _triangulate_pair(
            b1, b2, pair_results.rotation_aa[i], pair_results.translation[i], valid
        )
        # world frame: X_w = R_i^T (X_ci + t_i)  (p_i = R_i X_w - t_i)
        Ri = rotation.angle_axis_to_matrix(poses[i, :3])
        Xw = (X_local + poses[i, 3:][None, :]) @ Ri  # = R_i^T (X + t)
        # keep the strongest max_landmarks_per_pair (by validity)
        score = jnp.where(ok, -pair_results.match_distance[i], -jnp.inf)
        _, keep = jax.lax.top_k(score, max_landmarks_per_pair)
        Ls.append(Xw[keep])
        cams.append(
            jnp.stack(
                [jnp.full((max_landmarks_per_pair,), i, jnp.int32),
                 jnp.full((max_landmarks_per_pair,), i + 1, jnp.int32)],
                axis=-1,
            )
        )
        bears.append(jnp.stack([b1[keep], b2[keep]], axis=-2))
        vals.append(jnp.stack([ok[keep], ok[keep]], axis=-1))
    landmarks = jnp.concatenate(Ls)
    obs_cam = jnp.concatenate(cams)
    obs_bearing = jnp.concatenate(bears)
    obs_valid = jnp.concatenate(vals)
    return mv.MultiViewProblem(
        poses=poses,
        landmarks=landmarks,
        obs_cam=obs_cam,
        obs_bearing=obs_bearing,
        obs_valid=obs_valid,
        lm_valid=jnp.any(obs_valid, axis=-1),
    )


def run_sequence(
    frames,
    key,
    cfg: PipelineConfig = PipelineConfig(),
    frontend: str = "band",
    closures: Sequence[tuple] = (),
    global_ba: bool = True,
    ba_iters: int = 15,
    mesh=None,
) -> SequenceResult:
    """Full sequence SfM. frames: (N, H, W, C) stacked ERP frames.

    closures: optional (i, j) index pairs to add as loop-closure edges
    (each solved with an extra two-view BA)."""
    h, w = frames.shape[1], frames.shape[2]
    rot_aa, tran, ok, pair_res = pairwise_odometry(frames, key, cfg, frontend)

    closure_edges = []
    for (i, j) in closures:
        res = twoview.run_two_view(frames[i], frames[j], key, cfg, frontend)
        closure_edges.append((i, j, res.rotation_aa, res.translation))

    g = pg.chain_with_loop_closures(rot_aa, tran, closure_edges, closure_weight=2.0)
    g_opt, pg_costs = pg.optimize_pose_graph(g, num_iters=20)

    ba_costs = jnp.zeros((0,))
    poses = g_opt.poses
    if global_ba:
        prob = build_multiview_problem(poses, pair_res, w, h)
        if mesh is not None:
            from ..parallel import dist_ba

            prob, ba_costs = dist_ba.solve_multiview_sharded(
                prob, mesh, num_iters=ba_iters
            )
        else:
            prob, ba_costs = mv.solve_multiview(prob, num_iters=ba_iters)
        poses = prob.poses

    return SequenceResult(
        poses=poses,
        pairwise_rot=rot_aa,
        pairwise_tran=tran,
        pg_costs=pg_costs,
        ba_costs=ba_costs,
    )
