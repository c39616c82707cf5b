"""Strategy experiment: fastest way to read 13 rows x 13 cols of per-scale
Haar maps for K keypoints per band (the orientation stage's whole cost —
ORIENT_PROFILE_r03.json: vmapped dynamic_slice = 208 ms/batch(4), element-
serialized at ~7.6 ns/element).

Candidates (B=32 bands, K=256 kp, Q=9 maps of (128, 1024)):
  a_dynslice_flat : current — vmap(dynamic_slice) on flat (Q*H*W), span 256
  b_take_rows2d   : jnp.take of full (W,) rows from (Q*H, W), axis 0
  c_take_elems    : jnp.take of 169 individual linear elements per kp
  d_onehot_mxu    : bf16 one-hot row matmul (K*13, Q*H) @ (Q*H, W) per band
  e_onehot_patch  : one-hot rows THEN batched one-hot col matmul -> 13x13

Each returns the (K, 13, 13) hx/hy patches (or rows for a/b/d) — timings
comparable because the later select is ~1 ms (measured). Synthetic data;
correctness cross-checked c vs a on one band.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

B, K, Q, H, W = 32, 256, 9, 128, 1024
SPAN = 256
REPS = 16


def med(f, *args, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    rng = np.random.default_rng(0)
    hx = jnp.asarray(rng.standard_normal((B, Q, H, W)), jnp.bfloat16)
    hy = jnp.asarray(rng.standard_normal((B, Q, H, W)), jnp.bfloat16)
    hx16 = jax.lax.bitcast_convert_type(hx, jnp.uint16)
    hy16 = jax.lax.bitcast_convert_type(hy, jnp.uint16)
    packed = (hx16.astype(jnp.uint32) << 16) | hy16.astype(jnp.uint32)

    q = jnp.asarray(rng.integers(0, Q, (B, K)), jnp.int32)
    cy = jnp.asarray(rng.integers(0, H, (B, K, 13)), jnp.int32)
    cx = jnp.asarray(rng.integers(0, W, (B, K, 13)), jnp.int32)
    xstart = jnp.clip(cx.min(axis=-1), 0, W - SPAN)
    jax.block_until_ready((packed, hx, hy))

    @jax.jit
    def tiny(x):
        return x + 1.0

    jax.block_until_ready(tiny(jnp.float32(0.0)))
    rtt = med(tiny, jnp.float32(1.0))
    print(f"(rtt ~{rtt*1e3:.1f} ms)", file=sys.stderr)
    out = {}

    def stage(label, body):
        @jax.jit
        def run(_x):
            def sbody(c, i):
                leaves = jax.tree.leaves(body(i))
                return c + sum(jnp.sum(x.astype(jnp.float32)) for x in leaves), None

            c, _ = jax.lax.scan(sbody, jnp.float32(0.0), jnp.arange(REPS))
            return c

        jax.block_until_ready(run(0))
        t = max((med(run, 0) - rtt) / REPS, 1e-9)
        out[label] = t * 1e3
        print(f"{label}: {t*1e3:.2f} ms", file=sys.stderr, flush=True)

    v = jax.vmap

    # a) current: vmapped dynamic_slice on flat, span window
    def a_one(p1, q1, cy1, xs1):
        starts = (q1[:, None] * H + cy1) * W + xs1[:, None]
        flat = p1.reshape(-1)
        return v(lambda st: jax.lax.dynamic_slice(flat, (st,), (SPAN,)))(
            starts.reshape(-1)
        ).reshape(K, 13, SPAN)

    stage("a_dynslice_flat", lambda i: v(a_one)(packed, q, cy, xstart))

    # b) row take from 2D (Q*H, W)
    def b_one(p1, q1, cy1):
        rows_idx = (q1[:, None] * H + cy1).reshape(-1)
        return jnp.take(p1.reshape(Q * H, W), rows_idx, axis=0).reshape(K, 13, W)

    stage("b_take_rows2d", lambda i: v(b_one)(packed, q, cy))

    # c) element take: 169 linear indices per keypoint
    def c_one(p1, q1, cy1, cx1):
        lin = ((q1[:, None, None] * H + cy1[:, :, None]) * W + cx1[:, None, :])
        return jnp.take(p1.reshape(-1), lin.reshape(-1)).reshape(K, 13, 13)

    stage("c_take_elems", lambda i: v(c_one)(packed, q, cy, cx))

    # d) one-hot row matmul on bf16 maps (hx and hy separately)
    def d_one(hx1, hy1, q1, cy1):
        rows_idx = (q1[:, None] * H + cy1).reshape(-1)  # (K*13,)
        oh = (rows_idx[:, None] == jnp.arange(Q * H)[None, :]).astype(jnp.bfloat16)
        rx = jax.lax.dot(oh, hx1.reshape(Q * H, W), preferred_element_type=jnp.float32)
        ry = jax.lax.dot(oh, hy1.reshape(Q * H, W), preferred_element_type=jnp.float32)
        return rx.reshape(K, 13, W), ry.reshape(K, 13, W)

    stage("d_onehot_mxu_rows", lambda i: v(d_one)(hx, hy, q, cy))

    # e) one-hot rows then batched one-hot col matmul -> (K, 13, 13)
    def e_one(hx1, hy1, q1, cy1, cx1):
        rx, ry = d_one(hx1, hy1, q1, cy1)
        ohc = (cx1[:, :, None] == jnp.arange(W)[None, None, :]).astype(jnp.bfloat16)
        # (K, 13, W) @ (K, W, 13) batched
        px = jnp.einsum(
            "krw,kjw->krj", rx.astype(jnp.bfloat16), ohc,
            preferred_element_type=jnp.float32,
        )
        py = jnp.einsum(
            "krw,kjw->krj", ry.astype(jnp.bfloat16), ohc,
            preferred_element_type=jnp.float32,
        )
        return px, py

    stage("e_onehot_patch", lambda i: v(e_one)(hx, hy, q, cy, cx))

    # correctness: c vs direct numpy on band 0
    pk0 = np.asarray(packed[0]).reshape(-1)
    lin0 = (
        (np.asarray(q[0])[:, None, None] * H + np.asarray(cy[0])[:, :, None]) * W
        + np.asarray(cx[0])[:, None, :]
    )
    ref = pk0[lin0.reshape(-1)].reshape(K, 13, 13)
    got = np.asarray(jax.jit(c_one)(packed[0], q[0], cy[0], cx[0]))
    assert (ref == got).all(), "c_take_elems mismatch"
    print("correctness ok", file=sys.stderr)

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "EXP_ORIENT_GATHER.json")
    with open(path, "w") as f:
        json.dump({"shapes": {"B": B, "K": K, "Q": Q, "H": H, "W": W, "span": SPAN},
                   "ms_per_batch4equiv": out}, f, indent=1)
    print(json.dumps({k: round(v_, 2) for k, v_ in out.items()}, indent=1))


if __name__ == "__main__":
    main()
