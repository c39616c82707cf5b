"""Distributed multi-keyframe Schur-complement BA and batched two-view BA
over a device mesh.

Sharding strategy (SURVEY.md §2 TPU-native mapping, scaling-book recipe):
  * landmarks (the L axis of the (L, P) observation table) are SHARDED
    across the mesh — landmark marginalization is embarrassingly parallel;
  * poses are REPLICATED — the reduced camera system S (C*6, C*6) and
    gradient g are partial-summed per shard and `psum`-reduced over ICI;
    every device then solves the identical dense system (cheap, MXU) and
    back-substitutes its local landmark shard. No parameter server, no
    gather of landmark state, one collective per GN iteration.

Batched independent pairs (two-view) shard the batch axis — pure data
parallelism, zero collectives.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import smallmat
from ..core.precision import einsum as hp_einsum
from ..models import multiview as mv


def _schur_step_sharded(prob: mv.MultiViewProblem, lam, axis_name: str):
    """One damped GN/Schur step where the L axis is sharded; identical math
    to models.multiview.gauss_newton_step with psum insertion points."""
    C = prob.poses.shape[0]
    L, Pp = prob.obs_cam.shape
    res, Jc, Jl, w = mv._per_landmark_system(prob)

    ww = w[..., None, None]
    Hll = hp_einsum("lpri,lprj->lij", Jl * ww[..., 0][..., None], Jl)
    gl = hp_einsum("lpri,lpr->li", Jl * ww[..., 0][..., None], res)
    Wc = hp_einsum("lpri,lprj->lpij", Jc * ww, Jl)
    Hcc_diag = hp_einsum("lpri,lprj->lpij", Jc * ww, Jc)
    gc_obs = hp_einsum("lpri,lpr->lpi", Jc * ww, res)

    dEye = jnp.eye(3, dtype=Hll.dtype)
    Hll_d = Hll + lam * dEye[None] * jnp.maximum(
        jnp.diagonal(Hll, axis1=-2, axis2=-1).max(-1)[:, None, None], 1e-8
    )
    Hll_inv = smallmat.inv3(Hll_d + 1e-9 * dEye[None])
    Hll_inv = jnp.where(prob.lm_valid[:, None, None], Hll_inv, 0.0)

    cam_flat = prob.obs_cam.reshape(-1)
    S_diag = jax.ops.segment_sum(Hcc_diag.reshape(-1, 6, 6), cam_flat, num_segments=C)
    g_cam = jax.ops.segment_sum(gc_obs.reshape(-1, 6), cam_flat, num_segments=C)

    WHinv = hp_einsum("lpij,ljk->lpik", Wc, Hll_inv)
    pair = hp_einsum("lpik,lqjk->lpqij", WHinv, Wc)
    cam_p = jnp.broadcast_to(prob.obs_cam[:, :, None], (L, Pp, Pp))
    cam_q = jnp.broadcast_to(prob.obs_cam[:, None, :], (L, Pp, Pp))
    pair_idx = (cam_p * C + cam_q).reshape(-1)
    S_pairs = jax.ops.segment_sum(
        pair.reshape(-1, 6, 6), pair_idx, num_segments=C * C
    ).reshape(C, C, 6, 6)
    g_pairs = jax.ops.segment_sum(
        hp_einsum("lpik,lk->lpi", WHinv, gl).reshape(-1, 6), cam_flat, num_segments=C
    )

    S = -S_pairs
    S = S.at[jnp.arange(C), jnp.arange(C)].add(S_diag)
    S = S.transpose(0, 2, 1, 3).reshape(C * 6, C * 6)
    g = (g_cam - g_pairs).reshape(C * 6)

    # ---- the one collective: reduce the camera system over the mesh ----
    S = jax.lax.psum(S, axis_name)
    g = jax.lax.psum(g, axis_name)

    S = S + lam * jnp.diag(jnp.maximum(jnp.diagonal(S), 1e-8))
    mask = jnp.concatenate([jnp.zeros(6), jnp.ones(C * 6 - 6)])
    S = S * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
    g = g * mask
    S = S + 1e-9 * jnp.eye(C * 6)

    dc = -smallmat.solve_psd(S, g)
    dc_blocks = dc.reshape(C, 6)

    dc_per_obs = dc_blocks[prob.obs_cam]
    rhs = gl + hp_einsum("lpij,lpi->lj", Wc, dc_per_obs)
    dl = -hp_einsum("lij,lj->li", Hll_inv, rhs)

    new_poses = prob.poses + dc_blocks
    new_landmarks = jnp.where(prob.lm_valid[:, None], prob.landmarks + dl, prob.landmarks)
    return new_poses, new_landmarks


def _cost_sharded(prob: mv.MultiViewProblem, axis_name: str):
    return jax.lax.psum(mv.total_cost(prob), axis_name)


def solve_multiview_sharded(
    prob: mv.MultiViewProblem,
    mesh: Mesh,
    num_iters: int = 20,
    lam0: float = 1e-3,
    axis_name: str = "data",
):
    """Distributed LM/Schur solve: landmarks sharded over `mesh`, poses
    replicated, reduced camera system psum-reduced per iteration.

    The (L, P) observation table must have L divisible by the mesh size
    (pad with lm_valid=False rows).
    """
    lm_spec = P(axis_name)
    rep = P()

    in_specs = mv.MultiViewProblem(
        poses=rep,
        landmarks=lm_spec,
        obs_cam=lm_spec,
        obs_bearing=lm_spec,
        obs_valid=lm_spec,
        lm_valid=lm_spec,
    )
    out_specs = (in_specs, rep)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(in_specs,),
        out_specs=out_specs,
    )
    def run(p: mv.MultiViewProblem):
        def step(carry, _):
            poses, landmarks, lam = carry
            cur = p._replace(poses=poses, landmarks=landmarks)
            cost0 = _cost_sharded(cur, axis_name)
            np_, nl = _schur_step_sharded(cur, lam, axis_name)
            cost1 = _cost_sharded(p._replace(poses=np_, landmarks=nl), axis_name)
            accept = cost1 < cost0
            poses = jnp.where(accept, np_, poses)
            landmarks = jnp.where(accept, nl, landmarks)
            lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-10, 1e8)
            return (poses, landmarks, lam), jnp.minimum(cost0, cost1)

        (poses, landmarks, _), costs = jax.lax.scan(
            step,
            (p.poses, p.landmarks, jnp.asarray(lam0, p.poses.dtype)),
            None,
            length=num_iters,
        )
        return p._replace(poses=poses, landmarks=landmarks), costs

    return jax.jit(run)(prob)


def batched_two_view_sharded(im_left, im_right, keys, mesh: Mesh, cfg, frontend="band"):
    """Data-parallel batched two-view BA: batch axis sharded over the mesh
    (BASELINE.md config #2 scaled out). Zero collectives."""
    from ..models import twoview

    shard = NamedSharding(mesh, P("data"))
    im_left = jax.device_put(im_left, shard)
    im_right = jax.device_put(im_right, shard)
    keys = jax.device_put(keys, shard)
    fn = jax.jit(
        jax.vmap(partial(twoview.run_two_view, cfg=cfg, frontend=frontend))
    )
    return fn(im_left, im_right, keys)
