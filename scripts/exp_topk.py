"""Experiment: top_k variants over realistic NMS candidate maps (TPU).
Scan-amortized. Run ALONE. Temporary exploration script."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

REPS = 16
K = 256
B = 8


def _sum_tree(t):
    return sum(jnp.sum(x).astype(jnp.float32) for x in jax.tree.leaves(t))


def main():
    from spherical_bundle_adjuster_tpu.ops import integral, surf
    from spherical_bundle_adjuster_tpu.utils.config import SurfConfig

    rng = np.random.default_rng(0)
    grays = jnp.asarray(rng.integers(0, 255, (B, 128, 1024), dtype=np.uint8)).astype(
        jnp.float32
    )

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

    v = jax.vmap
    cfg = SurfConfig(max_keypoints=K, n_octaves=3)
    det = v(lambda g: tuple(surf._det_maps_per_octave(g, cfg)))(grays)
    cand = v(lambda *d: tuple(surf._nms_candidates(list(d), cfg)))(*det)
    flat = jnp.concatenate([c.reshape(B, -1) for c in cand], axis=1)
    print(f"flat candidates per band: {flat.shape[1]}", flush=True)
    fin = np.isfinite(np.asarray(flat)).sum(1)
    print("finite candidates per band:", fin, flush=True)

    def perturb(i):
        return flat + 1e-6 * i.astype(jnp.float32)

    stage("T1 lax.top_k 256", lambda i: v(lambda f: jax.lax.top_k(f, K))(perturb(i)))

    def reduced(c):
        outs = []
        for g in c:
            n_mid, oh, ow = g.shape
            ph, pw = (oh + 1) // 2 * 2, (ow + 1) // 2 * 2
            gp = jnp.pad(
                g, ((0, 0), (0, ph - oh), (0, pw - ow)), constant_values=-jnp.inf
            )
            blk = gp.reshape(n_mid, ph // 2, 2, pw // 2, 2).transpose(0, 1, 3, 2, 4)
            blk = blk.reshape(n_mid, ph // 2, pw // 2, 4)
            outs.append(jnp.max(blk, -1).reshape(-1))
        return jnp.concatenate(outs)

    red = v(lambda *c: reduced(list(c)))(*cand)
    print(f"reduced candidates per band: {red.shape[1]}", flush=True)
    stage(
        "T3 2x2reduce+top_k (reduce incl.)",
        lambda i: v(lambda *c: jax.lax.top_k(reduced([cc + 1e-6 * i for cc in c]), K))(
            *cand
        ),
    )

    try:
        stage(
            "T2 approx_max_k 256",
            lambda i: v(lambda f: jax.lax.approx_max_k(f, K))(perturb(i)),
        )
    except Exception as e:
        print("approx_max_k failed:", e, flush=True)

    # sanity: reduced top-k keeps the same candidate scores
    ex = np.sort(np.asarray(v(lambda f: jax.lax.top_k(f, K)[0])(flat)), axis=1)
    rd = np.sort(np.asarray(v(lambda f: jax.lax.top_k(f, K)[0])(red)), axis=1)
    ex = np.where(np.isfinite(ex), ex, 0)
    rd = np.where(np.isfinite(rd), rd, 0)
    print("max|T3-T1| scores:", float(np.max(np.abs(ex - rd))), flush=True)


if __name__ == "__main__":
    main()
