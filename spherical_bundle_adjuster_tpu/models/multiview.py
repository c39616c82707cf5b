"""Multi-keyframe spherical bundle adjustment with explicit Schur
complement — the scaling generalization of the reference's two-view solve
(BASELINE.json north star; the reference itself is two-view only, so this
is the framework's beyond-reference capability, built on the same residual
convention).

Problem layout (static shapes, chosen for TPU sharding):
  * poses: (C, 6) — angle-axis r and translation t per keyframe camera;
    camera i maps a world point X to p_i = R(r_i) @ X - t_i  (the
    two-view residual X2 = R X1 - t with camera 0 = world, reference
    spherical_bundle_adjuster.cpp:844-868, generalized).
  * landmarks: (L, 3) world points.
  * observations in landmark-major layout (L, P): each landmark has up to
    P observing cameras: obs_cam (L, P) int32, obs_bearing (L, P, 3),
    obs_valid (L, P) bool. This layout makes landmark marginalization a
    dense per-landmark computation (vmappable, shardable along L).

Residual per observation: chordal bearing error
    res = b_obs - (R X - t) / ||R X - t||        (3-dim)

Gauss-Newton + Schur: per-landmark 3x3 blocks are marginalized in one
vmapped pass; the reduced camera system S (C*6, C*6) is assembled with
segment-sums over camera pairs and solved densely (MXU Cholesky). Under
`parallel.dist_ba`, L is sharded over the mesh and S/g are `psum`-reduced
over ICI — the distributed Schur-complement BA.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import rotation, smallmat
from ..core.precision import einsum as hp_einsum


class MultiViewProblem(NamedTuple):
    poses: jax.Array        # (C, 6) [angle-axis | translation]
    landmarks: jax.Array    # (L, 3)
    obs_cam: jax.Array      # (L, P) int32
    obs_bearing: jax.Array  # (L, P, 3) unit bearings in camera frame
    obs_valid: jax.Array    # (L, P) bool
    lm_valid: jax.Array     # (L,) bool


def transform_point(pose, X):
    """p = R(aa) @ X - t for pose = [aa | t]."""
    return rotation.rotate_angle_axis(pose[..., :3], X) - pose[..., 3:]


def obs_residual(pose, X, b_obs):
    """Chordal bearing residual for one observation; safe for |p| ~ 0."""
    p = transform_point(pose, X)
    n = jnp.linalg.norm(p, axis=-1, keepdims=True)
    pred = p / jnp.maximum(n, 1e-9)
    return b_obs - pred


def total_cost(prob: MultiViewProblem):
    poses = prob.poses[prob.obs_cam]             # (L, P, 6)
    X = prob.landmarks[:, None, :]               # (L, 1, 3)
    res = obs_residual(poses, jnp.broadcast_to(X, prob.obs_bearing.shape), prob.obs_bearing)
    w = (prob.obs_valid & prob.lm_valid[:, None]).astype(res.dtype)
    return 0.5 * jnp.sum(w[..., None] * res * res)


def _per_landmark_system(prob: MultiViewProblem):
    """Per-landmark Jacobian blocks for all observations.

    Returns res (L,P,3), Jc (L,P,3,6), Jl (L,P,3,3), w (L,P)."""

    def one_obs(pose, X, b):
        def r_of(pose_and_X):
            p, xx = pose_and_X
            return obs_residual(p, xx, b)

        res = obs_residual(pose, X, b)
        Jp, Jx = jax.jacfwd(lambda p, xx: obs_residual(p, xx, b), argnums=(0, 1))(
            pose, X
        )
        return res, Jp, Jx

    def one_lm(cams, X, bs):
        poses = prob.poses[cams]  # (P, 6)
        return jax.vmap(one_obs, in_axes=(0, None, 0))(poses, X, bs)

    res, Jc, Jl = jax.vmap(one_lm)(prob.obs_cam, prob.landmarks, prob.obs_bearing)
    w = (prob.obs_valid & prob.lm_valid[:, None]).astype(res.dtype)
    return res, Jc, Jl, w


def gauss_newton_step(prob: MultiViewProblem, lam, fix_first_pose=True):
    """One damped GN step with Schur elimination of landmarks.

    Returns (new_poses, new_landmarks, predicted_cost_decrease_terms).
    All heavy math is batched over (L, P) — the sharding axis is L.
    """
    C = prob.poses.shape[0]
    L, P = prob.obs_cam.shape
    res, Jc, Jl, w = _per_landmark_system(prob)

    ww = w[..., None, None]
    # per-landmark 3x3 and per-obs cam blocks
    Hll = hp_einsum("lpri,lprj->lij", Jl * ww[..., 0][..., None], Jl)      # (L,3,3)
    gl = hp_einsum("lpri,lpr->li", Jl * ww[..., 0][..., None], res)        # (L,3)
    Wc = hp_einsum("lpri,lprj->lpij", Jc * ww, Jl)                          # (L,P,6,3)
    Hcc_diag = hp_einsum("lpri,lprj->lpij", Jc * ww, Jc)                    # (L,P,6,6)
    gc_obs = hp_einsum("lpri,lpr->lpi", Jc * ww, res)                       # (L,P,6)

    # damp and invert landmark blocks
    dEye = jnp.eye(3, dtype=Hll.dtype)
    Hll_d = Hll + lam * dEye[None] * jnp.maximum(
        jnp.diagonal(Hll, axis1=-2, axis2=-1).max(-1)[:, None, None], 1e-8
    )
    Hll_inv = smallmat.inv3(Hll_d + 1e-9 * dEye[None])
    Hll_inv = jnp.where(prob.lm_valid[:, None, None], Hll_inv, 0.0)

    # ---- reduced camera system ----
    # diagonal/self terms: scatter per-obs Hcc into (C,6,6)
    cam_flat = prob.obs_cam.reshape(-1)
    S_diag = jax.ops.segment_sum(
        Hcc_diag.reshape(-1, 6, 6), cam_flat, num_segments=C
    )  # (C,6,6)
    g_cam = jax.ops.segment_sum(gc_obs.reshape(-1, 6), cam_flat, num_segments=C)

    # coupling terms: for each landmark, all (p, q) pairs of observations
    WHinv = hp_einsum("lpij,ljk->lpik", Wc, Hll_inv)  # (L,P,6,3)
    pair = hp_einsum("lpik,lqjk->lpqij", WHinv, Wc)   # (L,P,P,6,6)
    cam_p = jnp.broadcast_to(prob.obs_cam[:, :, None], (L, P, P))
    cam_q = jnp.broadcast_to(prob.obs_cam[:, None, :], (L, P, P))
    pair_idx = (cam_p * C + cam_q).reshape(-1)
    S_pairs = jax.ops.segment_sum(
        pair.reshape(-1, 6, 6), pair_idx, num_segments=C * C
    ).reshape(C, C, 6, 6)
    g_pairs = jax.ops.segment_sum(
        hp_einsum("lpik,lk->lpi", WHinv, gl).reshape(-1, 6),
        cam_flat,
        num_segments=C,
    )

    # assemble dense S: (C*6, C*6)
    S = -S_pairs
    S = S.at[jnp.arange(C), jnp.arange(C)].add(S_diag)
    S = S.transpose(0, 2, 1, 3).reshape(C * 6, C * 6)
    g = (g_cam - g_pairs).reshape(C * 6)

    # damping + gauge fixing (freeze camera 0)
    S = S + lam * jnp.diag(jnp.maximum(jnp.diagonal(S), 1e-8))
    if fix_first_pose:
        mask = jnp.concatenate([jnp.zeros(6), jnp.ones(C * 6 - 6)])
        S = S * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
        g = g * mask
    S = S + 1e-9 * jnp.eye(C * 6)

    dc = -smallmat.solve_psd(S, g)                        # (C*6,)
    dc_blocks = dc.reshape(C, 6)

    # back-substitute landmarks:
    # dl_j = -Hll_inv (gl + sum_p Wc_p^T dc_{cam_p})
    dc_per_obs = dc_blocks[prob.obs_cam]                  # (L,P,6)
    rhs = gl + hp_einsum("lpij,lpi->lj", Wc, dc_per_obs)
    dl = -hp_einsum("lij,lj->li", Hll_inv, rhs)

    new_poses = prob.poses + dc_blocks
    new_landmarks = jnp.where(
        prob.lm_valid[:, None], prob.landmarks + dl, prob.landmarks
    )
    return new_poses, new_landmarks


@partial(jax.jit, static_argnames=("num_iters", "fix_first_pose"))
def solve_multiview(
    prob: MultiViewProblem,
    num_iters: int = 20,
    lam0: float = 1e-3,
    fix_first_pose: bool = True,
):
    """LM loop (accept/reject) over Schur GN steps. Returns
    (solved problem, per-iteration cost trace)."""

    def step(carry, _):
        poses, landmarks, lam = carry
        p = prob._replace(poses=poses, landmarks=landmarks)
        cost0 = total_cost(p)
        new_poses, new_landmarks = gauss_newton_step(p, lam, fix_first_pose)
        cost1 = total_cost(
            prob._replace(poses=new_poses, landmarks=new_landmarks)
        )
        accept = cost1 < cost0
        poses = jnp.where(accept, new_poses, poses)
        landmarks = jnp.where(accept, new_landmarks, landmarks)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-10, 1e8)
        return (poses, landmarks, lam), jnp.minimum(cost0, cost1)

    (poses, landmarks, _), costs = jax.lax.scan(
        step,
        (prob.poses, prob.landmarks, jnp.asarray(lam0, prob.poses.dtype)),
        None,
        length=num_iters,
    )
    return prob._replace(poses=poses, landmarks=landmarks), costs
