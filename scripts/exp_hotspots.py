"""Micro-profile: initial_guess internals, BA stages, orientation/topk
split — at bench batch scale. Scan-amortized; run ALONE. Temporary."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

REPS = 16
B = 4  # pairs
M = 512  # match capacity
T = 80  # ransac trials


def _sum_tree(t):
    return sum(jnp.sum(x).astype(jnp.float32) for x in jax.tree.leaves(t))


def make_timer():
    @jax.jit
    def tiny(x):
        return x + 1.0

    jax.block_until_ready(tiny(jnp.float32(0.0)))

    def med(f, *args, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    rtt = med(tiny, jnp.float32(1.0))
    print(f"(rtt ~{rtt*1e3:.1f} ms)", flush=True)

    def stage(label, body):
        @jax.jit
        def run(_x):
            def sbody(c, i):
                return c + _sum_tree(body(i)), None

            c, _ = jax.lax.scan(sbody, jnp.float32(0.0), jnp.arange(REPS))
            return c

        jax.block_until_ready(run(0))
        t = med(run, 0)
        print(f"{label}: {(t - rtt) / REPS * 1e3:.2f} ms", flush=True)

    return stage


def main():
    from spherical_bundle_adjuster_tpu.ops import integral, surf
    from spherical_bundle_adjuster_tpu.solver import epipolar, lm
    from spherical_bundle_adjuster_tpu.utils.config import (
        BaConfig,
        RansacConfig,
        SurfConfig,
    )

    rng = np.random.default_rng(0)
    v = jax.vmap
    stage = make_timer()

    # ---- bearing banks for solver stages (batch B) ----
    bl = rng.normal(size=(B, M, 3)).astype(np.float32)
    bl /= np.linalg.norm(bl, axis=-1, keepdims=True)
    aa = np.deg2rad([3.0, -2.0, 4.0]).astype(np.float32)

    def rotm(a):
        th = np.linalg.norm(a)
        k = a / th
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K

    R = rotm(aa)
    t_gt = np.array([0.1, -0.05, 0.02], np.float32)
    d_gt = rng.uniform(2.0, 6.0, (B, M, 1)).astype(np.float32)
    x1 = bl * d_gt
    x2 = (x1 @ R.T) - t_gt
    br = (x2 / np.linalg.norm(x2, axis=-1, keepdims=True)).astype(np.float32)
    bl_j = jnp.asarray(bl)
    br_j = jnp.asarray(br)
    mv = jnp.ones((B, M), bool)
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    rcfg = RansacConfig()
    bacfg = BaConfig()

    stage(
        "initial_guess full (B)",
        lambda i: v(lambda a, b, m_, k: epipolar.initial_guess(a, b, m_, k, rcfg))(
            bl_j, br_j, mv, jax.vmap(jax.random.fold_in)(keys, jnp.full(B, 0) + i)
        ),
    )

    # subsample weights only
    def weights_only(a, b, m_, k):
        ks = jax.random.split(k, T)

        def one(kk):
            g = jax.random.gumbel(kk, (M,))
            g = jnp.where(m_, g, -jnp.inf)
            _, idx = jax.lax.top_k(g, M // 4)
            return jnp.zeros((M,)).at[idx].set(1.0)

        return v(one)(ks)

    stage(
        "  gumbel+topk weights (B*80)",
        lambda i: v(weights_only)(
            bl_j, br_j, mv, jax.vmap(jax.random.fold_in)(keys, jnp.full(B, 0) + i)
        ),
    )

    w = v(weights_only)(bl_j, br_j, mv, keys)  # (B, T, M)

    def ata_only(a, b, ww):
        def one(wt):
            m9 = (a[:, :, None] * b[:, None, :]).reshape(-1, 9)
            aw = m9 * wt[:, None]
            return jnp.dot(
                aw.T, m9, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        return v(one)(ww)

    stage(
        "  ata build (B*80)",
        lambda i: v(ata_only)(bl_j, br_j, w + 0 * i.astype(jnp.float32)),
    )
    ata = v(ata_only)(bl_j, br_j, w)  # (B, T, 9, 9)

    stage(
        "  eigh 9x9 (B*80)",
        lambda i: jnp.linalg.eigh(ata + 1e-9 * i.astype(jnp.float32))[1],
    )
    evecs = jnp.linalg.eigh(ata)[1][..., 0]  # (B, T, 9)
    e33 = evecs.reshape(B, T, 3, 3)
    stage(
        "  svd 3x3 rank2+decompose (B*80)",
        lambda i: jnp.linalg.svd(e33 + 1e-9 * i.astype(jnp.float32), full_matrices=True),
    )

    # ---- BA stages ----
    d0 = jnp.full((B, M, 2), 1.0)
    r0 = jnp.tile(jnp.asarray(-aa)[None], (B, 1))
    t0 = jnp.tile(jnp.asarray(t_gt)[None], (B, 1))

    stage(
        "solve_depths (B)",
        lambda i: v(lambda a, b, d, r, t, m_: lm.solve_depths(a, b, d, r, t, m_, bacfg)[0])(
            bl_j, br_j, d0 + 1e-6 * i.astype(jnp.float32), r0, t0, mv
        ),
    )
    stage(
        "solve_rotation (B)",
        lambda i: v(
            lambda a, b, d, r, t, m_: lm.solve_rotation(a, b, d, r, t, m_, bacfg)[0]
        )(bl_j, br_j, d0 + 1e-6 * i.astype(jnp.float32), r0, t0, mv),
    )
    stage(
        "solve_translation (B)",
        lambda i: v(
            lambda a, b, d, r, t, m_: lm.solve_translation(a, b, d, r, t, m_, bacfg)[0]
        )(bl_j, br_j, d0 + 1e-6 * i.astype(jnp.float32), r0, t0, mv),
    )

    # ---- orientation / topk split at batch scale (B*8 bands) ----
    grays = jnp.asarray(
        rng.integers(0, 255, (B * 8, 128, 1024), dtype=np.uint8)
    ).astype(jnp.float32)
    scfg = SurfConfig(max_keypoints=256, n_octaves=3)
    det = v(lambda g: tuple(surf._det_maps_per_octave(g, scfg)))(grays)
    cand = v(lambda *d_: tuple(surf._nms_candidates(list(d_), scfg)))(*det)
    stage(
        "refine+topk (B*8)",
        lambda i: v(
            lambda d_, c: surf._refine_and_pack((128, 1024), list(d_), list(c), scfg)
        )(jax.tree.map(lambda x: x + 0 * i.astype(jnp.float32), det), cand),
    )
    kp = v(lambda d_, c: surf._refine_and_pack((128, 1024), list(d_), list(c), scfg))(
        det, cand
    )
    ii = v(integral.integral_image)(grays)
    stage(
        "orientation (B*8)",
        lambda i: v(lambda a, b: surf._assign_orientation(a, b, scfg))(
            ii + 0 * i.astype(jnp.float32), kp
        ),
    )


if __name__ == "__main__":
    main()
