"""Pallas TPU kernels for the SURF dense-map stages (VERDICT r4 #1).

The XLA formulation of the det-of-Hessian pyramid reads ~40 shifted
slices of the integral image per octave layer (12 Dxx + 12 Dyy + 16 Dxy
box corners; ops/surf._det_maps_per_octave) and the dense Haar/trace maps
another ~300 (8 per scale x 9 scales + 24 x 9). Each shifted slice is an
independent HBM read of the (padded) integral image, so the fused XLA
kernels stream the same ~2 MB array hundreds of times per band:
FRONTEND_PROFILE_r04 measured the det pyramid at 12.0 ms and lap+orient
at 11.3 ms per 4-pair batch while achieving ~7% of HBM bandwidth — the
stage is bound on redundant HBM traffic, not compute.

These kernels load the integral image into VMEM ONCE per band and
evaluate every shifted read from VMEM (a vector-lane shift, no HBM
contact), writing only the dense result maps back:

  * det_octave_dense   — all (n_octave_layers + 2) det-of-Hessian layer
                         maps of one octave, evaluated dense over the
                         octave's shifted window (subsampling to the
                         stride grid stays in XLA, unchanged)
  * haar_trace_maps    — the packed-bf16 Haar response maps AND the int8
                         trace-sign maps for every middle-layer scale in
                         one pass (ops/surf._dense_haar_maps /
                         _dense_trace_sign_maps equivalents)

Both grid over the layer/scale axis with the integral image mapped as a
CONSTANT block (index_map ignores the grid index), so Pallas keeps it
resident in VMEM across programs and only the per-layer output block is
double-buffered — whole-stack VMEM stays ~(ii + 2 output layers), well
under the 16 MB core budget even at the 2K workload's band shapes. (The
round-5 first cut used gridless whole-array blocks; Pallas double-buffers
blocks, and the batched Haar+trace output pair overflowed VMEM by ~1 MB.)

Both compute term-for-term the same expressions as the XLA paths (same
integral image, same offsets, same add order), so results agree to f32
reassociation noise; parity is locked by tests/test_pallas_surf.py
(interpret mode on CPU).

HBM traffic per band drops from ~hundreds of full-array reads to: one
integral-image read per kernel + the dense outputs — a >20x cut on the
frontend's dominant stage.

Replaces the hot path of the reference's cv::xfeatures2d::SURF
(feature_matcher.cpp:26-40, spherical_surf.cpp:156-178).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# VMEM stack budget for (resident integral image + double-buffered
# per-layer output blocks); headroom under the 16 MB/core VMEM. 9 MB is
# deliberately conservative: the 2K-workload band shapes (785x2577 ii,
# 12 scales) sat near the edge and crashed the remote TPU compile helper
# (HTTP 500) in the r5 full-bench run — those shapes now take the proven
# XLA shifted-slice path, the headline 512 shapes stay on Pallas.
VMEM_BUDGET_BYTES = 9 * 1024 * 1024


def _interpret():
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# det-of-Hessian pyramid (one octave per call, grid over layers)


def _dense_sums_ref(ii_ref, boxes, pad, half, dh, dw):
    """Weighted shifted-slice box sums read from a VMEM ref — the literal
    Pallas transcription of surf._det_maps_per_octave's dense_sums (same
    offsets, same accumulation order)."""
    acc = None
    for (y0, x0, y1, x1, wt) in boxes:
        oy0 = y0 + pad - half
        ox0 = x0 + pad - half
        oy1 = y1 + pad - half
        ox1 = x1 + pad - half

        def sl(dy, dx):
            return ii_ref[0, dy : dy + dh, dx : dx + dw]

        s = sl(oy1, ox1) - sl(oy0, ox1) - sl(oy1, ox0) + sl(oy0, ox0)
        term = wt * s
        acc = term if acc is None else acc + term
    return acc


def det_octave_dense(ii_pad, octave: int, n_layers: int, pad: int, dh: int,
                     dw: int, patterns):
    """Dense det-of-Hessian maps for one octave: (n_layers, dh, dw) f32.

    ii_pad: (Hp, Wp) edge-padded integral image (pad = max filter size,
    as surf._det_maps_per_octave builds it). patterns: tuple per layer of
    (size, dxx_boxes, dyy_boxes, dxy_boxes) with boxes as static
    (y0, x0, y1, x1, weight) tuples. Grid over layers; ii is a constant
    block resident in VMEM across the grid.
    """
    hp, wp = ii_pad.shape

    def kernel(ii_ref, out_ref):
        l = pl.program_id(0)
        for li, (size, bxx, byy, bxy) in enumerate(patterns):

            @pl.when(l == li)
            def _():
                half = size // 2
                dxx = _dense_sums_ref(ii_ref, bxx, pad, half, dh, dw)
                dyy = _dense_sums_ref(ii_ref, byy, pad, half, dh, dw)
                dxy = _dense_sums_ref(ii_ref, bxy, pad, half, dh, dw)
                out_ref[0] = dxx * dyy - 0.81 * dxy * dxy

    return pl.pallas_call(
        kernel,
        grid=(n_layers,),
        out_shape=jax.ShapeDtypeStruct((n_layers, dh, dw), jnp.float32),
        in_specs=[
            pl.BlockSpec(
                (1, hp, wp), lambda l: (0, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (1, dh, dw), lambda l: (l, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(ii_pad[None])


def det_pyramid_fits_vmem(hp: int, wp: int, n_layers: int, dh: int, dw: int):
    # resident ii + ~2 double-buffered single-layer output blocks
    need = 4 * (hp * wp + 2 * dh * dw)
    return need <= VMEM_BUDGET_BYTES


# ---------------------------------------------------------------------------
# Haar (packed bf16) + trace-sign maps (grid over scales)


def haar_trace_maps(ii_pad, pad: int, h: int, w: int, sizes):
    """(haar_u32 (Q, h, w), trace_i8 (Q, h, w)) for middle-layer `sizes`.

    Haar packing matches surf._dense_haar_maps: per pixel
    (hx as bf16) << 16 | (hy as bf16); radius r = round(2 * 1.2 * size/9).
    Trace matches surf._dense_trace_sign_maps: sign of the thirds-geometry
    Dxx + Dyy. Boxes are expressed relative to this kernel's single `pad`
    (the values are identical to the per-stage pads the XLA paths use —
    same edge-padded integral image, bigger margin). Grid over scales.
    """
    q = len(sizes)
    hp, wp = ii_pad.shape

    def kernel(ii_ref, haar_ref, trace_ref):
        qi = pl.program_id(0)

        def box(y0, x0, y1, x1):
            return (
                ii_ref[0, y1 : y1 + h, x1 : x1 + w]
                - ii_ref[0, y0 : y0 + h, x1 : x1 + w]
                - ii_ref[0, y1 : y1 + h, x0 : x0 + w]
                + ii_ref[0, y0 : y0 + h, x0 : x0 + w]
            )

        for si, size in enumerate(sizes):

            @pl.when(qi == si)
            def _():
                r = max(int(round(2 * 1.2 * size / 9.0)), 1)
                # hx = right-half minus left-half; hy = bottom minus top
                hx = box(pad - r, pad, pad + r, pad + r) - box(
                    pad - r, pad - r, pad + r, pad
                )
                hy = box(pad, pad - r, pad + r, pad + r) - box(
                    pad - r, pad - r, pad, pad + r
                )
                hx16 = jax.lax.bitcast_convert_type(
                    hx.astype(jnp.bfloat16), jnp.uint16
                )
                hy16 = jax.lax.bitcast_convert_type(
                    hy.astype(jnp.bfloat16), jnp.uint16
                )
                haar_ref[0] = (hx16.astype(jnp.uint32) << 16) | hy16.astype(
                    jnp.uint32
                )

                # thirds-geometry trace (surf._dense_trace_sign_maps)
                half = size // 2
                t = int(size / 3.0)
                b = int(2.0 * size / 9.0)
                base = pad - half
                tr = None
                boxes = [
                    (base + i * t, base + b, base + (i + 1) * t,
                     base + size - b, wt)
                    for i, wt in ((0, 1.0), (1, -2.0), (2, 1.0))
                ] + [
                    (base + b, base + i * t, base + size - b,
                     base + (i + 1) * t, wt)
                    for i, wt in ((0, 1.0), (1, -2.0), (2, 1.0))
                ]
                for (y0, x0, y1, x1, wt) in boxes:
                    term = wt * box(y0, x0, y1, x1)
                    tr = term if tr is None else tr + term
                trace_ref[0] = jnp.sign(tr).astype(jnp.int8)

    return pl.pallas_call(
        kernel,
        grid=(q,),
        out_shape=(
            jax.ShapeDtypeStruct((q, h, w), jnp.uint32),
            jax.ShapeDtypeStruct((q, h, w), jnp.int8),
        ),
        in_specs=[
            pl.BlockSpec(
                (1, hp, wp), lambda qi: (0, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=(
            pl.BlockSpec(
                (1, h, w), lambda qi: (qi, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, h, w), lambda qi: (qi, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        interpret=_interpret(),
    )(ii_pad[None])


def haar_trace_fits_vmem(hp: int, wp: int, q: int, h: int, w: int):
    # resident ii + ~2 double-buffered single-scale (u32 + i8) blocks
    need = 4 * hp * wp + 2 * h * w * (4 + 1)
    return need <= VMEM_BUDGET_BYTES
