"""Levenberg-Marquardt / Gauss-Newton engine for the spherical BA stages.

Replaces Ceres (reference spherical_bundle_adjuster.cpp:183-217, functors
:843-1063) with fully-jitted, static-shape solvers:

  * residual (all stages): with X1 = d1*b1, X2 = d2*b2,
      res = X2 - (AngleAxis(r) @ X1 - t)    (3-vector per match)
  * d-stage: per-match independent 2-param problems with 2 extra barrier
    residuals lambda*exp(-c*d_i) and bound d >= 0 -> one vmapped 2x2 LM
    over all matches (the TPU answer to Ceres' N tiny residual blocks).
  * rot/tran stages: 3 global params; J^T J is 3x3 -> LM with Huber IRLS.
  * joint mode: (r, t, all d) Gauss-Newton with explicit Schur complement
    (per-match 2x2 blocks marginalized, 6x6 reduced camera system) — the
    reference's dead joint functor (C11) done right, and the seed of the
    distributed multi-keyframe solver.

The LM loop is a `lax.while_loop` with accept/reject damping; `max_iters`
matches the reference's 50-iteration budget per stage (:336).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import rotation, smallmat
from ..core.precision import einsum as hp_einsum, matmul as hp_matmul
from ..utils.config import BaConfig


def reprojection_residual(b1, b2, d1, d2, r, t):
    """(..., 3) residual X2 - (R(r) @ (d1*b1) - t); r is angle-axis.

    Mirrors ba_spherical_costfunctor::operator() (:844-868).
    """
    x1 = b1 * d1[..., None]
    x2 = b2 * d2[..., None]
    x1r = rotation.rotate_angle_axis(jnp.broadcast_to(r, x1.shape), x1)
    return x2 - (x1r - t)


def huber_weight(res_block, delta):
    """IRLS weight per residual block: rho'(s) with s = |res|^2,
    rho = Huber(delta) (Ceres HuberLoss(1.0), :887,:943,:1000)."""
    s = jnp.sum(res_block * res_block, axis=-1)
    return jnp.where(s <= delta * delta, 1.0, delta / jnp.sqrt(jnp.maximum(s, 1e-32)))


def huber_cost(res_block, delta, w_valid):
    s = jnp.sum(res_block * res_block, axis=-1)
    rho = jnp.where(
        s <= delta * delta, s, 2.0 * delta * jnp.sqrt(jnp.maximum(s, 1e-32)) - delta * delta
    )
    return 0.5 * jnp.sum(rho * w_valid)


class LMState(NamedTuple):
    x: jax.Array
    lam: jax.Array
    cost: jax.Array
    it: jax.Array
    done: jax.Array


class StageReport(NamedTuple):
    """Per-stage convergence telemetry — the TPU equivalent of the Ceres
    BriefReport the reference prints after each BCD stage
    (spherical_bundle_adjuster.cpp:198-211): iterations run, initial cost,
    final cost."""

    iterations: jax.Array    # scalar int32
    initial_cost: jax.Array  # scalar f32
    final_cost: jax.Array    # scalar f32


def lm_fixed(cost_and_system, x0, cfg: BaConfig, max_iters=None, lower_bound=None):
    """Generic damped LM on a small parameter vector.

    cost_and_system(x) -> (cost, H, g): H = J^T W J, g = J^T W r of the
    robustified problem at x. Runs accept/reject steps up to `max_iters`
    (the reference's 50-iteration budget, :336), terminating early on
    Ceres' function_tolerance criterion |cost - cost_new| <= ftol * cost
    (Ceres Solver::Options default 1e-6 — the reference leaves it unset) or
    when the damping saturates (step rejected at lambda cap).
    """
    n = x0.shape[-1]
    iters = cfg.max_iterations if max_iters is None else max_iters
    ftol = cfg.function_tolerance

    def clip(x):
        if lower_bound is None:
            return x
        return jnp.maximum(x, lower_bound)

    if n == 2:
        small_solve = smallmat.solve2
    elif n == 3:
        small_solve = smallmat.solve3
    else:
        small_solve = lambda A, b: jnp.linalg.solve(A, b[..., None])[..., 0]

    def body(state: LMState):
        cost, H, g = cost_and_system(state.x)
        damped = H + state.lam * jnp.diag(jnp.diagonal(H)) + 1e-12 * jnp.eye(n)
        delta = -small_solve(damped, g)
        x_new = clip(state.x + delta)
        new_cost, _, _ = cost_and_system(x_new)
        accept = new_cost < cost
        x = jnp.where(accept, x_new, state.x)
        lam = jnp.where(
            accept, state.lam / cfg.lm_lambda_down, state.lam * cfg.lm_lambda_up
        )
        lam = jnp.clip(lam, 1e-12, 1e10)
        converged = accept & (cost - new_cost <= ftol * jnp.maximum(cost, 1e-30))
        # Damping saturation: from lm_lambda_init=1e-4 with up=4, lam >= 1e6
        # means ~12 consecutive rejections — the step direction is hopeless,
        # stop burning the iteration budget.
        stuck = (~accept) & (state.lam >= 1e6)
        return LMState(
            x, lam, jnp.minimum(new_cost, cost), state.it + 1, converged | stuck
        )

    def cond(state: LMState):
        return (state.it < iters) & ~state.done

    init_cost, _, _ = cost_and_system(x0)
    out = jax.lax.while_loop(
        cond,
        body,
        LMState(
            x0,
            jnp.asarray(cfg.lm_lambda_init),
            init_cost,
            jnp.asarray(0),
            jnp.asarray(False),
        ),
    )
    return out.x, StageReport(out.it, init_cost, out.cost)


# ---------------------------------------------------------------------------
# Stage: depths (d-only), vmapped per match


def solve_depths(b1, b2, d_init, r, t, match_valid, cfg: BaConfig):
    """Optimize per-match (d1, d2) with fixed (r, t).

    Residual is 5-dim: 3 reprojection + 2 barrier terms lambda*exp(-c*d_i)
    (functor :1005-1032), no robust loss, bounds d >= 0 (:1059-1061).
    d_init: (M, 2) -> returns ((M, 2), StageReport) — the report aggregates
    the vmapped per-match problems as one Ceres-style stage summary:
    iterations = max over valid matches, costs = sums over valid matches.
    """
    lam_b = cfg.barrier_lambda
    c_b = cfg.barrier_c

    def residual(d, bb1, bb2):
        rep = reprojection_residual(bb1, bb2, d[0], d[1], r, t)
        bar = lam_b * jnp.exp(-c_b * d)
        return jnp.concatenate([rep, bar])

    def one(d0, bb1, bb2, mv):
        def sys(d):
            res = residual(d, bb1, bb2)
            J = jax.jacfwd(residual)(d, bb1, bb2)  # (5, 2)
            H = hp_matmul(J.T, J)
            g = hp_matmul(J.T, res[:, None])[:, 0]
            return 0.5 * jnp.sum(res * res), H, g

        d_opt, rep = lm_fixed(
            sys, d0, cfg, lower_bound=cfg.d_lower_bound
        )
        return jnp.where(mv, d_opt, d0), rep

    d_out, reps = jax.vmap(one)(d_init, b1, b2, match_valid)
    w = match_valid.astype(jnp.float32)
    report = StageReport(
        iterations=jnp.max(jnp.where(match_valid, reps.iterations, 0)),
        initial_cost=jnp.sum(reps.initial_cost * w),
        final_cost=jnp.sum(reps.final_cost * w),
    )
    return d_out, report


# ---------------------------------------------------------------------------
# Stages: rotation-only / translation-only (3 global params, Huber IRLS)


def _global_stage(param0, residual_of, match_valid, cfg: BaConfig):
    """LM over a 3-vector with per-match Huber-weighted 3-residual blocks.

    residual_of(p) -> (M, 3) residual blocks.
    """
    w_valid = match_valid.astype(jnp.float32)

    def sys(p):
        res = residual_of(p)  # (M, 3)
        w_rob = huber_weight(res, cfg.huber_delta) * w_valid
        J = jax.jacfwd(residual_of)(p)  # (M, 3, 3)
        Jw = J * w_rob[:, None, None]
        H = hp_einsum("mri,mrj->ij", Jw, J)
        g = hp_einsum("mri,mr->i", Jw, res)
        cost = huber_cost(res, cfg.huber_delta, w_valid)
        return cost, H, g

    return lm_fixed(sys, param0, cfg)


def solve_rotation(b1, b2, d_pair, r0, t, match_valid, cfg: BaConfig):
    """Rotation-only stage. d_pair: the (d1, d2) used for EVERY residual.

    In reference-compat mode the caller passes the first two matches' left
    depths (the load-bearing quirk at :941-942); otherwise per-match depths
    are used (d_pair shaped (M, 2))."""
    if d_pair.ndim == 1:
        d1 = jnp.broadcast_to(d_pair[0], b1.shape[:-1])
        d2 = jnp.broadcast_to(d_pair[1], b1.shape[:-1])
    else:
        d1, d2 = d_pair[:, 0], d_pair[:, 1]

    def residual_of(r):
        return reprojection_residual(b1, b2, d1, d2, r, t)

    return _global_stage(r0, residual_of, match_valid, cfg)


def solve_translation(b1, b2, d_pair, r, t0, match_valid, cfg: BaConfig):
    """Translation-only stage (quirk semantics identical to solve_rotation,
    reference :978-1002)."""
    if d_pair.ndim == 1:
        d1 = jnp.broadcast_to(d_pair[0], b1.shape[:-1])
        d2 = jnp.broadcast_to(d_pair[1], b1.shape[:-1])
    else:
        d1, d2 = d_pair[:, 0], d_pair[:, 1]

    def residual_of(t):
        return reprojection_residual(b1, b2, d1, d2, r, t)

    return _global_stage(t0, residual_of, match_valid, cfg)


# ---------------------------------------------------------------------------
# Joint Schur-complement Gauss-Newton (corrected formulation)


def solve_joint_schur(b1, b2, d0, r0, t0, match_valid, cfg: BaConfig, num_iters=20):
    """Joint (r, t, d) refinement via Schur elimination.

    Per iteration: build per-match Jacobians, marginalize each 2x2 depth
    block, psum-able 6x6 reduced camera system, back-substitute depths.
    All match-indexed work is one vmapped/elementwise pass — this is the
    two-view specialization of the distributed multi-keyframe solver in
    parallel/.
    """
    w_valid = match_valid.astype(jnp.float32)
    # Depth barrier in the joint solve (round-5 fix): the reprojection
    # cost |d2 b2 - (R d1 b1 - t)|^2 has a PER-MATCH scale gauge on
    # low-parallax matches — (d1, d2) -> (s d1, s d2) scales that match's
    # residual by s — so plain LM free-falls depths match by match
    # (measured up to 57/80 at the 0-bound on pure-rotation pairs,
    # corrupting predicted directions and poisoning the multi-start
    # residual vote). The reference's d-stage carries exactly this
    # regularizer (lambda * exp(-c * d_i), no robust loss,
    # spherical_bundle_adjuster.cpp:1028-1058); the joint solve inherits
    # it so depths stay anchored at the same scale the BCD d-stage
    # produces. Barrier rows enter the depth blocks only (J wrt (r, t)
    # is 0), so the Schur camera system feels them only through the
    # marginalization, as in the reference.
    lam_b = cfg.barrier_lambda
    c_b = cfg.barrier_c

    def residual_all(r, t, d):
        return reprojection_residual(b1, b2, d[:, 0], d[:, 1], r, t)

    def barrier_res(d):
        return lam_b * jnp.exp(-c_b * d)  # (M, 2)

    def total_cost(r, t, d):
        rep = huber_cost(residual_all(r, t, d), cfg.huber_delta, w_valid)
        bar = 0.5 * jnp.sum(jnp.sum(barrier_res(d) ** 2, -1) * w_valid)
        return rep + bar

    def step(carry, _):
        r, t, d, lam = carry
        res = residual_all(r, t, d)  # (M, 3)
        w_rob = huber_weight(res, cfg.huber_delta) * w_valid

        # Jacobians per match: wrt cam = (r, t) (3+3) and wrt d (2)
        def res_one(cam, dm, bb1, bb2):
            return reprojection_residual(bb1, bb2, dm[0], dm[1], cam[:3], cam[3:])

        cam = jnp.concatenate([r, t])
        Jc = jax.vmap(
            lambda dm, bb1, bb2: jax.jacfwd(res_one, argnums=0)(cam, dm, bb1, bb2)
        )(d, b1, b2)  # (M, 3, 6)
        Jd = jax.vmap(
            lambda dm, bb1, bb2: jax.jacfwd(res_one, argnums=1)(cam, dm, bb1, bb2)
        )(d, b1, b2)  # (M, 3, 2)

        w = w_rob[:, None, None]
        Hcc = hp_einsum("mri,mrj->ij", Jc * w, Jc)  # (6, 6)
        Hcd = hp_einsum("mri,mrj->mij", Jc * w, Jd)  # (M, 6, 2)
        Hdd = hp_einsum("mri,mrj->mij", Jd * w, Jd)  # (M, 2, 2)
        gc = hp_einsum("mri,mr->i", Jc * w, res)
        gd = hp_einsum("mri,mr->mi", Jd * w, res)

        # barrier rows: res_b = lam * exp(-c d_i), d res_b / d d_i =
        # -c * res_b (diagonal in the 2x2 depth block; no camera coupling)
        rb = barrier_res(d) * w_valid[:, None]          # (M, 2) masked
        jb = -c_b * rb                                   # (M, 2) diagonal
        Hdd = Hdd + jnp.stack(
            [jnp.stack([jb[:, 0] ** 2, jnp.zeros_like(jb[:, 0])], -1),
             jnp.stack([jnp.zeros_like(jb[:, 0]), jb[:, 1] ** 2], -1)], -2
        )
        gd = gd + jb * rb

        # damp and invert the 2x2 depth blocks
        Hdd = Hdd + lam * jnp.eye(2)[None] * jnp.maximum(
            jnp.diagonal(Hdd, axis1=-2, axis2=-1)[..., None], 1e-8
        ) * jnp.eye(2)[None]
        Hdd_inv = smallmat.inv2(Hdd + 1e-9 * jnp.eye(2)[None])
        # Schur: S = Hcc - sum_m Hcd Hdd^-1 Hdc ; rhs = gc - sum Hcd Hdd^-1 gd
        HcdHinv = hp_einsum("mij,mjk->mik", Hcd, Hdd_inv)
        S = Hcc - hp_einsum("mik,mjk->ij", HcdHinv, Hcd)
        rhs = gc - hp_einsum("mik,mk->i", HcdHinv, gd)
        S = S + lam * jnp.diag(jnp.diagonal(S)) + 1e-9 * jnp.eye(6)
        dc = -smallmat.solve_psd(S, rhs)
        dd = -hp_einsum("mij,mj->mi", Hdd_inv, gd + hp_einsum("mij,j->mi", Hcd.transpose(0, 2, 1), dc))

        r_new = r + dc[:3]
        t_new = t + dc[3:]
        d_new = jnp.maximum(d + dd, cfg.d_lower_bound)

        cost_old = total_cost(r, t, d)
        cost_new = total_cost(r_new, t_new, d_new)
        accept = cost_new < cost_old
        r = jnp.where(accept, r_new, r)
        t = jnp.where(accept, t_new, t)
        d = jnp.where(accept, d_new, d)
        lam = jnp.clip(
            jnp.where(accept, lam / cfg.lm_lambda_down, lam * cfg.lm_lambda_up),
            1e-10,
            1e8,
        )
        # record the ACCEPTED cost: a rejected proposal can carry NaN from
        # an ill-conditioned Schur solve at tiny damping (the params are
        # already protected by accept=False; the trace must be too)
        return (r, t, d, lam), jnp.where(accept, cost_new, cost_old)

    (r, t, d, _), costs = jax.lax.scan(
        step, (r0, t0, d0, jnp.asarray(cfg.lm_lambda_init)), None, length=num_iters
    )
    return r, t, d, costs
