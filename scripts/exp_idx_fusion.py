"""Test: does computing gather start-indices INSIDE the jit (from float
keypoint coords) de-optimize the vmapped dynamic_slice row read?

EXP_ORIENT_GATHER: precomputed int indices -> 1.75 ms.
EXP_ORIENT_REAL:   identical gather with indices computed from kp floats
                   inside the jit -> 198.5 ms (113x).

Variants:
  x1_int_inputs   : indices as inputs (control, expect ~1.75 ms)
  x2_float_inline : indices from float xy inline (expect ~200 ms)
  x3_barrier      : x2 + lax.optimization_barrier on the indices
  x4_take_rows    : x2 indices + row take from (Q*H, W) 2D instead of
                    flat dynamic_slice
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


def main():
    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.integers(0, 2**32, (B, Q, H, W), dtype=np.uint32))
    xy = jnp.asarray(
        np.stack([rng.uniform(0, W - 1, (B, K)), rng.uniform(0, H - 1, (B, K))], -1),
        jnp.float32,
    )
    s = jnp.asarray(rng.uniform(2.0, 14.4, (B, K)), jnp.float32)
    q = jnp.asarray(rng.integers(0, Q, (B, K)), jnp.int32)
    grid = jnp.arange(-6, 7, dtype=jnp.float32)

    def idx_of(xy1, s1):
        cy = jnp.clip(
            jnp.round(xy1[:, 1:2] + grid[None, :] * s1[:, None]).astype(jnp.int32),
            0, H - 1,
        )
        xstart = jnp.clip(
            jnp.round(xy1[:, 0] - 6.0 * s1).astype(jnp.int32), 0, W - SPAN
        )
        return cy, xstart

    cy_in, xs_in = jax.jit(jax.vmap(idx_of))(xy, s)
    jax.block_until_ready((packed, cy_in, xs_in))

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
        return ts, float(np.median(ts))

    _, rtt = med(tiny, jnp.float32(1.0))
    print(f"(rtt ~{rtt*1e3:.2f} ms)", file=sys.stderr)
    out = {"rtt_ms": rtt * 1e3}

    def stage(label, body):
        @jax.jit
        def run(_x):
            def sbody(c, i):
                leaves = jax.tree.leaves(body(i))
                return c + sum(jnp.sum(x.astype(jnp.float32)) for x in leaves), None

            c, _ = jax.lax.scan(sbody, jnp.float32(0.0), jnp.arange(REPS))
            return c

        jax.block_until_ready(run(0))
        ts, m = med(run, 0)
        t = max((m - rtt) / REPS, 1e-9)
        out[label] = round(t * 1e3, 3)
        print(f"{label}: {t*1e3:.2f} ms  raw={['%.3f' % x for x in ts]}",
              file=sys.stderr, flush=True)

    v = jax.vmap

    def slice_rows(p1, cy1, xs1, q1):
        starts = (q1[:, None] * H + cy1) * W + xs1[:, None]
        flat = p1.reshape(-1)
        return v(lambda st: jax.lax.dynamic_slice(flat, (st,), (SPAN,)))(
            starts.reshape(-1)
        ).reshape(K, 13, SPAN)

    stage("x1_int_inputs", lambda i: v(slice_rows)(packed, cy_in, xs_in, q))

    def fused(p1, xy1, s1, q1):
        cy1, xs1 = idx_of(xy1, s1)
        return slice_rows(p1, cy1, xs1, q1)

    stage("x2_float_inline", lambda i: v(fused)(packed, xy, s, q))

    def barrier(p1, xy1, s1, q1):
        cy1, xs1 = idx_of(xy1, s1)
        cy1, xs1 = jax.lax.optimization_barrier((cy1, xs1))
        return slice_rows(p1, cy1, xs1, q1)

    stage("x3_barrier", lambda i: v(barrier)(packed, xy, s, q))

    def take2d(p1, xy1, s1, q1):
        cy1, _ = idx_of(xy1, s1)
        rows_idx = (q1[:, None] * H + cy1).reshape(-1)
        return jnp.take(p1.reshape(Q * H, W), rows_idx, axis=0).reshape(K, 13, W)

    stage("x4_take_rows2d_inline", lambda i: v(take2d)(packed, xy, s, q))

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "EXP_IDX_FUSION.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
