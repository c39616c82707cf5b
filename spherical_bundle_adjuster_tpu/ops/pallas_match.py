"""Pallas TPU kernel: streaming brute-force top-2 nearest descriptors.

The jnp matcher (ops/match.py) materializes the full (K1, K2) distance
matrix in HBM before top_k — fine at K ~ 1k, but 8K-ERP scale banks
(K ~ 16k, 1 GB of distances) need a streaming kernel: tile over train
blocks, keep the per-query running top-2 in VMEM scratch, write once at
the end. The distance block is one MXU matmul per tile; the top-2 merge
is a handful of VPU ops.

Grid: (num_train_blocks,) — sequential on TPU, so the scratch accumulators
persist across iterations. Queries are kept whole in VMEM (K1 x 64 f32 =
4 MB at K1=16k; block the query axis too beyond that).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _match_kernel(
    q_ref,       # (BM, D) one query block, VMEM
    t_ref,       # (BN, D) one train block, VMEM
    tvalid_ref,  # (1, BN) train-validity block (f32 0/1), VMEM
    dist_out,    # (BM, 2) output distances
    idx_out,     # (BM, 2) output indices (int32)
    best_d,      # scratch (BM, 2) f32
    best_i,      # scratch (BM, 2) i32
):
    j = pl.program_id(1)  # train block index (innermost grid dim)
    bn = t_ref.shape[0]

    @pl.when(j == 0)
    def _():
        best_d[:] = jnp.full_like(best_d, jnp.inf)
        best_i[:] = jnp.zeros_like(best_i)

    q = q_ref[:]
    t = t_ref[:]
    # squared distances: |q|^2 + |t|^2 - 2 q.t
    qq = jnp.sum(q * q, axis=-1, keepdims=True)            # (K1, 1)
    tt = jnp.sum(t * t, axis=-1)[None, :]                  # (1, BN)
    cross = jax.lax.dot_general(
        q, t,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # (K1, BN)
    d2 = jnp.maximum(qq + tt - 2.0 * cross, 0.0)
    d2 = jnp.where(tvalid_ref[0][None, :] > 0.5, d2, jnp.inf)

    # block top-2 per query row
    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1) + j * bn
    m1 = jnp.min(d2, axis=-1, keepdims=True)               # (K1, 1)
    am1 = jnp.argmin(d2, axis=-1)                          # (K1,)
    i1 = am1.astype(jnp.int32) + j * bn
    masked = jnp.where(col == i1[:, None], jnp.inf, d2)
    m2 = jnp.min(masked, axis=-1, keepdims=True)
    i2 = jnp.argmin(masked, axis=-1).astype(jnp.int32) + j * bn

    # merge {running top2} with {block top2}: select 2 smallest of 4.
    # take_along_axis lowers to an unsupported gather shape in Mosaic;
    # exactly-one-hot masked sums select the winning column instead.
    cd = jnp.concatenate([best_d[:], m1, m2], axis=-1)     # (K1, 4)
    ci = jnp.concatenate([best_i[:], i1[:, None], i2[:, None]], axis=-1)
    a1 = jnp.argmin(cd, axis=-1)
    r = jax.lax.broadcasted_iota(jnp.int32, cd.shape, 1)
    d1st = jnp.min(cd, axis=-1)
    one1 = (r == a1[:, None]).astype(jnp.int32)
    i1st = jnp.sum(ci * one1, axis=-1)
    cd2 = jnp.where(r == a1[:, None], jnp.inf, cd)
    d2nd = jnp.min(cd2, axis=-1)
    a2 = jnp.argmin(cd2, axis=-1)
    one2 = (r == a2[:, None]).astype(jnp.int32)
    i2nd = jnp.sum(ci * one2, axis=-1)
    best_d[:] = jnp.stack([d1st, d2nd], axis=-1)
    best_i[:] = jnp.stack([i1st, i2nd], axis=-1)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        dist_out[:] = best_d[:]
        idx_out[:] = best_i[:]


@partial(jax.jit, static_argnames=("block_m", "block_n", "interpret"))
def top2_distances(
    desc1,
    desc2,
    valid2,
    block_m: int = 1024,
    block_n: int = 512,
    interpret: bool = False,
):
    """Streaming top-2: (dist (K1, 2) L2 distances, idx (K1, 2) int32) of
    each query's two nearest valid train descriptors.

    Semantics match the jnp matcher's top-2 stage (ops/match.py): invalid
    train slots are +inf. K1 % block_m == 0 and K2 % block_n == 0 (pad
    with valid=False slots). VMEM per step ~ 2 * block_m * block_n * 4B.
    """
    k1, d = desc1.shape
    k2 = desc2.shape[0]
    block_m = min(block_m, k1)
    block_n = min(block_n, k2)
    assert k1 % block_m == 0, (k1, block_m)
    assert k2 % block_n == 0, (k2, block_n)
    grid = (k1 // block_m, k2 // block_n)
    tv = valid2.astype(jnp.float32).reshape(1, k2)

    dist2, idx = pl.pallas_call(
        _match_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_m, 2), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 2), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k1, 2), jnp.float32),
            jax.ShapeDtypeStruct((k1, 2), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_m, 2), jnp.float32),
            pltpu.VMEM((block_m, 2), jnp.int32),
        ],
        interpret=interpret,
    )(desc1.astype(jnp.float32), desc2.astype(jnp.float32), tv)
    return jnp.sqrt(dist2), idx
