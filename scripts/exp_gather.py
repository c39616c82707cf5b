"""Experiments: gather strategies for SURF describe + top_k variants (TPU).

Scan-amortized timing (CLAUDE.md: never trust per-call timings through the
RPC tunnel). Run ALONE. Temporary exploration script.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

REPS = 32
K = 256
N_SAMP = 441  # 21x21 descriptor grid
H, W = 128, 1024
B = 8


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
    print(f"(rtt ~{rtt*1e3:.1f} ms)")

    def stage(label, body):
        # body(i) MUST consume i so XLA cannot hoist it out of the scan.
        @jax.jit
        def run(_x):
            def sbody(c, i):
                return c + _sum_tree(body(i)), None

            c, _ = jax.lax.scan(sbody, jnp.float32(0.0), jnp.arange(REPS))
            return c

        jax.block_until_ready(run(0))
        t = med(run, 0)
        print(f"{label}: {(t - rtt) / REPS * 1e3:.2f} ms")

    return stage


def main():
    rng = np.random.default_rng(0)
    grays = jnp.asarray(rng.integers(0, 255, (B, H, W), dtype=np.uint8)).astype(
        jnp.float32
    )
    # plausible sample coords: keypoint centers + jitter
    yi = jnp.asarray(rng.integers(0, H, (B, K, N_SAMP)), jnp.int32)
    xi = jnp.asarray(rng.integers(0, W, (B, K, N_SAMP)), jnp.int32)

    stage = make_timer()
    v = jax.vmap

    # ---- gather strategies ----
    def g_plain(g, y, x):
        return g[y, x]

    stage("A gather (K,441) fancy-index x8", lambda i: v(g_plain)(grays, (yi + i) % H, (xi + i) % W))

    def g_flat(g, y, x):
        return jnp.take(g.reshape(-1), y * W + x)

    stage("B gather flat 1D x8", lambda i: v(g_flat)(grays, (yi + i) % H, (xi + i) % W))

    # C: one-hot matmul, contract y first (small axis), bf16 exact-select
    def g_onehot(g, y, x):
        yf = y.reshape(-1)
        xf = x.reshape(-1)
        oh_y = (yf[:, None] == jnp.arange(H)[None, :]).astype(jnp.bfloat16)
        c = jax.lax.dot(
            oh_y, g.astype(jnp.bfloat16), preferred_element_type=jnp.float32
        )  # (KN, W)
        oh_x = (xf[:, None] == jnp.arange(W)[None, :]).astype(jnp.float32)
        out = jnp.sum(c * oh_x, axis=-1)
        return out.reshape(y.shape)

    stage("C one-hot matmul (y) + mask-reduce x8", lambda i: v(g_onehot)(grays, (yi + i) % H, (xi + i) % W))

    # D: one-hot both sides as two matmuls (contract x first -> (KN,H) small out)
    def g_onehot2(g, y, x):
        yf = y.reshape(-1)
        xf = x.reshape(-1)
        oh_x = (xf[:, None] == jnp.arange(W)[None, :]).astype(jnp.bfloat16)
        c = jax.lax.dot(
            oh_x, g.astype(jnp.bfloat16).T, preferred_element_type=jnp.float32
        )  # (KN, H)
        oh_y = (yf[:, None] == jnp.arange(H)[None, :]).astype(jnp.float32)
        out = jnp.sum(c * oh_y, axis=-1)
        return out.reshape(y.shape)

    stage("D one-hot matmul (x) + mask-reduce x8", lambda i: v(g_onehot2)(grays, (yi + i) % H, (xi + i) % W))

    # E: local patch extraction (dynamic_slice per kp) + local gather
    ky = jnp.asarray(rng.integers(16, H - 16, (B, K)), jnp.int32)
    kx = jnp.asarray(rng.integers(16, W - 16, (B, K)), jnp.int32)
    ly = jnp.asarray(rng.integers(0, 32, (B, K, N_SAMP)), jnp.int32)
    lx = jnp.asarray(rng.integers(0, 32, (B, K, N_SAMP)), jnp.int32)

    def g_local(g, cy, cx, dy, dx):
        def per_kp(yy, xx, sy, sx):
            patch = jax.lax.dynamic_slice(g, (yy - 16, xx - 16), (32, 32))
            return patch[sy, sx]

        return v(per_kp)(cy, cx, dy, dx)

    stage(
        "E dyn-slice 32x32 + local gather x8",
        lambda i: v(g_local)(grays, jnp.clip(ky + i % 3, 16, H - 17), kx, ly, lx),
    )

    # correctness check for C/D vs A
    a = np.asarray(v(g_plain)(grays, yi, xi))
    c_ = np.asarray(v(g_onehot)(grays, yi, xi))
    d_ = np.asarray(v(g_onehot2)(grays, yi, xi))
    print(
        "max|C-A|:",
        float(np.max(np.abs(c_ - a))),
        " max|D-A|:",
        float(np.max(np.abs(d_ - a))),
    )

    # ---- top_k variants over realistic candidate maps ----
    from spherical_bundle_adjuster_tpu.ops import surf
    from spherical_bundle_adjuster_tpu.utils.config import SurfConfig

    cfg = SurfConfig(max_keypoints=256, n_octaves=3)
    det = v(lambda g: tuple(surf._det_maps_per_octave(g, cfg)))(grays)
    cand = v(lambda *d: tuple(surf._nms_candidates(list(d), cfg)))(*det)
    flat = jnp.concatenate([c.reshape(B, -1) for c in cand], axis=1)
    n_flat = flat.shape[1]
    print(f"flat candidates per band: {n_flat}")

    stage("T1 lax.top_k 256 x8", lambda i: v(lambda f: jax.lax.top_k(f, K))(flat + i.astype(jnp.float32)))
    stage(
        "T2 approx_max_k 256 x8",
        lambda i: v(lambda f: jax.lax.approx_max_k(f, K))(flat + i.astype(jnp.float32)),
    )

    def reduced(c):  # exact 2x2 block argmax per layer grid
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
    print(f"reduced candidates per band: {red.shape[1]}")
    stage(
        "T3 2x2-reduce+top_k x8",
        lambda i: v(lambda f: jax.lax.top_k(f, K))(red + i.astype(jnp.float32)),
    )
    stage(
        "T3b reduce itself x8",
        lambda i: v(lambda *c: reduced([cc + i.astype(jnp.float32) for cc in c]))(*cand),
    )

    # recall of approx vs exact on this data
    ex = np.asarray(v(lambda f: jax.lax.top_k(f, K)[0])(flat))
    ap = np.asarray(v(lambda f: jax.lax.approx_max_k(f, K)[0])(flat))
    exv = ex[np.isfinite(ex)]
    apv = ap[np.isfinite(ap)]
    print("exact finite:", exv.size, "approx finite:", apv.size)


if __name__ == "__main__":
    main()
