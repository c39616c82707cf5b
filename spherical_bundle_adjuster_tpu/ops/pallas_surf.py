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

Both compute term-for-term the same expressions as the XLA paths (same
integral image, same offsets, same add order), so results agree to f32
reassociation noise; parity is locked by
tests/test_pallas_surf.py (interpret mode on CPU).

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


# VMEM budget guard: whole-band kernels need ii + outputs resident; fall
# back to the XLA path when the estimate exceeds this (e.g. 2K bands with
# 4 octaves). 12 MB leaves headroom in the ~16 MB VMEM.
VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _interpret():
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# det-of-Hessian pyramid (one octave per call)


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
            return ii_ref[dy : dy + dh, dx : dx + dw]

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
    (y0, x0, y1, x1, weight) tuples.
    """

    def kernel(ii_ref, out_ref):
        for l, (size, bxx, byy, bxy) in enumerate(patterns):
            half = size // 2
            dxx = _dense_sums_ref(ii_ref, bxx, pad, half, dh, dw)
            dyy = _dense_sums_ref(ii_ref, byy, pad, half, dh, dw)
            dxy = _dense_sums_ref(ii_ref, bxy, pad, half, dh, dw)
            out_ref[l] = dxx * dyy - 0.81 * dxy * dxy

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_layers, dh, dw), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(ii_pad)


def det_pyramid_fits_vmem(hp: int, wp: int, n_layers: int, dh: int, dw: int):
    need = 4 * (hp * wp + n_layers * dh * dw)
    return need <= VMEM_BUDGET_BYTES


# ---------------------------------------------------------------------------
# Haar (packed bf16) + trace-sign maps, all middle-layer scales in one pass


def haar_trace_maps(ii_pad, pad: int, h: int, w: int, sizes):
    """(haar_u32 (Q, h, w), trace_i8 (Q, h, w)) for middle-layer `sizes`.

    Haar packing matches surf._dense_haar_maps: per pixel
    (hx as bf16) << 16 | (hy as bf16); radius r = round(2 * 1.2 * size/9).
    Trace matches surf._dense_trace_sign_maps: sign of the thirds-geometry
    Dxx + Dyy. Boxes are expressed relative to this kernel's single `pad`
    (the values are identical to the per-stage pads the XLA paths use —
    same edge-padded integral image, bigger margin).
    """
    q = len(sizes)

    def kernel(ii_ref, haar_ref, trace_ref):
        def box(y0, x0, y1, x1):
            return (
                ii_ref[y1 : y1 + h, x1 : x1 + w]
                - ii_ref[y0 : y0 + h, x1 : x1 + w]
                - ii_ref[y1 : y1 + h, x0 : x0 + w]
                + ii_ref[y0 : y0 + h, x0 : x0 + w]
            )

        for qi, size in enumerate(sizes):
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
            haar_ref[qi] = (hx16.astype(jnp.uint32) << 16) | hy16.astype(
                jnp.uint32
            )

            # thirds-geometry trace (surf._dense_trace_sign_maps)
            half = size // 2
            t = int(size / 3.0)
            b = int(2.0 * size / 9.0)
            base = pad - half
            tr = None
            boxes = [
                (base + i * t, base + b, base + (i + 1) * t, base + size - b, wt)
                for i, wt in ((0, 1.0), (1, -2.0), (2, 1.0))
            ] + [
                (base + b, base + i * t, base + size - b, base + (i + 1) * t, wt)
                for i, wt in ((0, 1.0), (1, -2.0), (2, 1.0))
            ]
            for (y0, x0, y1, x1, wt) in boxes:
                term = wt * box(y0, x0, y1, x1)
                tr = term if tr is None else tr + term
            trace_ref[qi] = jnp.sign(tr).astype(jnp.int8)

    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((q, h, w), jnp.uint32),
            jax.ShapeDtypeStruct((q, h, w), jnp.int8),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=_interpret(),
    )(ii_pad)


def haar_trace_fits_vmem(hp: int, wp: int, q: int, h: int, w: int):
    need = 4 * hp * wp + q * h * w * (4 + 1)
    return need <= VMEM_BUDGET_BYTES
