"""SURF feature detection and description, TPU-native.

Replaces OpenCV xfeatures2d::SURF (reference feature_matcher.cpp:6-40) with
a static-shape JAX implementation:

  * integral image  — two parallel prefix sums (ops.integral)
  * box-filter Hessian pyramid — dense det-of-Hessian maps for every
    octave/layer as shifted-slice arithmetic on the integral image (no
    gathers; XLA fuses each filter into one elementwise pass)
  * non-max suppression — `lax.reduce_window` max over (scale, y, x)
  * keypoint selection — one global `top_k` over all octaves with a fixed
    capacity and validity mask (static shapes for jit/vmap)
  * subpixel/scale refinement — batched 3x3 quadratic fit
  * orientation — Haar responses on a radius-6s disc, sliding pi/3 window
  * descriptor — 64-d (4x4 subregions x (sum dx, sum|dx|, sum dy, sum|dy|))
    from a rotated 21x21 patch sampled at spacing s, Gaussian-weighted,
    L2-normalized

Filter geometry follows the OpenCV convention the reference depends on:
filter sizes (9 + 6*layer) << octave, area-normalized box weights,
det = Dxx*Dyy - (0.9*Dxy)^2, hessianThreshold default 100
(feature_matcher.cpp:13: SURF::create() defaults).

SURF implementations never bit-match each other; parity is validated by
match-quality metrics (outlier% @ 2 deg, SURVEY.md §4), not identical
keypoints.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import smallmat
from ..utils.config import SurfConfig
from . import integral, pallas_surf


def _use_mxu_gather(cfg: SurfConfig) -> bool:
    if cfg.gather_mode == "auto":
        return jax.default_backend() != "cpu"
    return cfg.gather_mode == "mxu"


def _use_pallas_maps(cfg: SurfConfig) -> bool:
    """Pallas dense-map kernels (det pyramid, Haar/trace maps): "auto"
    enables them off-CPU; "pallas" forces them (interpret mode on CPU —
    slow, for parity tests); "xla" keeps the shifted-slice XLA paths."""
    if cfg.det_mode == "auto":
        return jax.default_backend() != "cpu"
    return cfg.det_mode == "pallas"


def _use_approx_topk(cfg: SurfConfig) -> bool:
    if cfg.topk_mode == "auto":
        return jax.default_backend() != "cpu"
    return cfg.topk_mode == "approx"


def _gather2d_mxu(img, yi, xi, chunk: int = 0):
    """img[yi, xi] as two MXU contractions (exact one-hot select).

    TPU lowers random gathers to a serialized ~14 ns/element pipeline; a
    one-hot matmul rides the MXU instead (~6x faster at 100k+ samples from
    a band-sized image, measured). Contract the wide axis W with an int8
    one-hot, then mask-reduce over H. `img` is rounded to the integer grid
    first — EXACTLY the 8U grayscale quantization OpenCV's SURF operates on
    (band-crop grays are non-integer floats) — then shifted by -128 so
    [0, 255] fits int8; the MXU int8 contraction accumulates in int32
    (exact), and the shift is restored afterward (each one-hot row has
    exactly one nonzero). int8 operands halve the one-hot's HBM footprint
    vs bf16 and double MXU throughput.

    `chunk` > 0 splits the sample axis into chunks of that size via
    lax.map (sequential under vmap batching): the one-hot operand is
    (chunk, W) instead of (N, W), bounding peak memory for large batched
    pipelines (unchunked, batch 64 x 8 bands fused a 29.6 GB operand).
    """
    h, w = img.shape
    shp = yi.shape
    yf = yi.reshape(-1)
    xf = xi.reshape(-1)
    imq = (jnp.round(img) - 128.0).astype(jnp.int8)

    def sample(pair):
        xc, yc = pair
        oh_x = (xc[:, None] == jnp.arange(w)[None, :]).astype(jnp.int8)
        c = jax.lax.dot(oh_x, imq.T, preferred_element_type=jnp.int32)  # (n, H)
        sel = yc[:, None] == jnp.arange(h)[None, :]
        v = jnp.sum(jnp.where(sel, c, 0), axis=-1) + 128
        return v.astype(jnp.float32)

    n = yf.shape[0]
    if chunk and n > chunk and n % chunk == 0:
        out = jax.lax.map(
            sample, (xf.reshape(-1, chunk), yf.reshape(-1, chunk))
        )
        return out.reshape(shp)
    return sample((xf, yf)).reshape(shp)

# Base (size-9) box patterns, (y0, x0, y1, x1, weight), relative to the
# filter's top-left corner. Same geometry OpenCV scales from.
_DXX9 = [(2, 0, 7, 3, 1.0), (2, 3, 7, 6, -2.0), (2, 6, 7, 9, 1.0)]
_DYY9 = [(0, 2, 3, 7, 1.0), (3, 2, 6, 7, -2.0), (6, 2, 9, 7, 1.0)]
_DXY9 = [
    (1, 1, 4, 4, 1.0),
    (1, 5, 4, 8, -1.0),
    (5, 1, 8, 4, -1.0),
    (5, 5, 8, 8, 1.0),
]


def _round_half_even(v: float) -> int:
    return int(round(v))


def _scaled_pattern(base, size: int):
    """Scale a size-9 base pattern to `size`, area-normalizing weights."""
    ratio = size / 9.0
    out = []
    for (y0, x0, y1, x1, w) in base:
        sy0 = _round_half_even(ratio * y0)
        sx0 = _round_half_even(ratio * x0)
        sy1 = _round_half_even(ratio * y1)
        sx1 = _round_half_even(ratio * x1)
        area = max((sy1 - sy0) * (sx1 - sx0), 1)
        out.append((sy0, sx0, sy1, sx1, w / area))
    return out


def _filter_sizes(cfg: SurfConfig):
    """[(octave, layer, size)] for all octave layers (incl. NMS border
    layers 0 and n_octave_layers+1)."""
    sizes = []
    for o in range(cfg.n_octaves):
        for l in range(cfg.n_octave_layers + 2):
            sizes.append((o, l, (9 + 6 * l) << o))
    return sizes


class Keypoints(NamedTuple):
    """Fixed-capacity keypoint set (K = cfg.max_keypoints).

    xy: (K, 2) float32 ERP/image pixel coords (x, y); size: (K,) filter
    size in pixels (OpenCV convention); response: (K,) det-of-Hessian;
    orientation: (K,) radians; laplacian: (K,) sign of trace; valid: (K,)
    bool mask — invalid slots carry zeros.
    """

    xy: jax.Array
    size: jax.Array
    response: jax.Array
    orientation: jax.Array
    laplacian: jax.Array
    valid: jax.Array

    @property
    def scale(self):
        """SURF scale s = size * 1.2 / 9 (OpenCV convention)."""
        return self.size * (1.2 / 9.0)


def _det_maps_per_octave(gray, cfg: SurfConfig):
    """Det-of-Hessian maps per octave, evaluated on the octave's stride
    grid (sampleStep = 1 << octave, OpenCV's scheme).

    TPU note: an earlier version strided every box-corner slice directly
    (lax.slice with stride (step, step)) — ~40 lane-strided slices per
    layer, which XLA lowered as standalone relayout copies; the det
    pyramid alone cost 74 ms of a 107 ms 4-pair frontend
    (FRONTEND_PROFILE_r04.json). Now every corner read is a CONTIGUOUS
    shifted slice; the det map is computed dense over the shifted window
    and subsampled ONCE per layer with a single strided slice. All the
    shifted-slice reads and the elementwise det fuse into one kernel per
    layer, and the sampled values are bit-identical to the strided
    formulation (same ii_pad elements).

    Returns a list of (n_layers+2, H>>o, W>>o) arrays (with -inf margins).
    """
    h, w = gray.shape
    ii = integral.integral_image(gray)
    sizes = _filter_sizes(cfg)
    max_size = max(s for (_, _, s) in sizes)
    pad = max_size  # generous so all shifted slices stay in range
    ii_pad = jnp.pad(ii, ((pad, pad), (pad, pad)), mode="edge")

    n_l = cfg.n_octave_layers + 2
    use_pallas = _use_pallas_maps(cfg)
    out = []
    for o in range(cfg.n_octaves):
        step = 1 << o
        oh = (h + step - 1) // step
        ow = (w + step - 1) // step
        # dense window covering all strided sample points
        dh = (oh - 1) * step + 1
        dw = (ow - 1) * step + 1

        # Pallas path (VERDICT r4 #1): all the octave's shifted-slice
        # reads come from a VMEM-resident integral image instead of ~40
        # HBM streams per layer (ops/pallas_surf). Same expressions, same
        # offsets; dense -> strided subsample below is shared.
        dense_pallas = None
        if use_pallas and pallas_surf.det_pyramid_fits_vmem(
            ii_pad.shape[0], ii_pad.shape[1], n_l, dh, dw
        ):
            patterns = tuple(
                (
                    (9 + 6 * l) << o,
                    tuple(_scaled_pattern(_DXX9, (9 + 6 * l) << o)),
                    tuple(_scaled_pattern(_DYY9, (9 + 6 * l) << o)),
                    tuple(_scaled_pattern(_DXY9, (9 + 6 * l) << o)),
                )
                for l in range(n_l)
            )
            dense_pallas = pallas_surf.det_octave_dense(
                ii_pad, o, n_l, pad, dh, dw, patterns
            )

        layer_maps = []
        for l in range(n_l):
            size = (9 + 6 * l) << o
            half = size // 2

            def dense_sums(boxes):
                acc = None
                for (y0, x0, y1, x1, wt) in boxes:
                    oy0 = y0 + pad - half
                    ox0 = x0 + pad - half
                    oy1 = y1 + pad - half
                    ox1 = x1 + pad - half

                    def sl(dy, dx):
                        return jax.lax.slice(
                            ii_pad, (dy, dx), (dy + dh, dx + dw)
                        )

                    s = sl(oy1, ox1) - sl(oy0, ox1) - sl(oy1, ox0) + sl(oy0, ox0)
                    term = wt * s
                    acc = term if acc is None else acc + term
                return acc

            if dense_pallas is not None:
                det = dense_pallas[l]
            else:
                dxx = dense_sums(_scaled_pattern(_DXX9, size))
                dyy = dense_sums(_scaled_pattern(_DYY9, size))
                dxy = dense_sums(_scaled_pattern(_DXY9, size))
                det = dxx * dyy - 0.81 * dxy * dxy
            if step > 1:
                det = det[::step, ::step]  # one strided subsample per layer
            ys = jnp.arange(oh)[:, None] * step
            xs = jnp.arange(ow)[None, :] * step
            inside = (
                (ys >= half)
                & (ys <= h - (size - half))
                & (xs >= half)
                & (xs <= w - (size - half))
            )
            layer_maps.append(jnp.where(inside, det, -jnp.inf))
        out.append(jnp.stack(layer_maps))
    return out


def _nms_candidates(det_list, cfg: SurfConfig):
    """Scores for middle layers that are 3x3x3 local maxima above the
    Hessian threshold on each octave's stride grid; -inf elsewhere.
    Returns a list of (n_mid, H>>o, W>>o)."""
    out = []
    for stack in det_list:
        n_l = stack.shape[0]
        neg_inf = jnp.array(-jnp.inf, stack.dtype)
        m = jax.lax.reduce_window(
            stack,
            neg_inf,
            jax.lax.max,
            window_dimensions=(3, 3, 3),
            window_strides=(1, 1, 1),
            padding=[(1, 1), (1, 1), (1, 1)],
        )
        mid = stack[1 : n_l - 1]
        is_max = (mid >= m[1 : n_l - 1]) & (mid > cfg.hessian_threshold)
        out.append(jnp.where(is_max, mid, -jnp.inf))
    return out


def _refine_and_pack(gray_shape, det_list, cand_list, cfg: SurfConfig):
    """Global top-K + subpixel/scale refinement -> Keypoints fields
    (without orientation/laplacian). Works on per-octave stride grids."""
    k = cfg.max_keypoints
    # Exact candidate-count reduction before top_k: NMS enforces a 3x3
    # spatial exclusion per layer, so any 2x2 block of one layer's grid
    # holds at most one maximum (two at L_inf distance 1 would each have to
    # exceed the other) — a 2x2 block-argmax loses nothing (ties aside) and
    # shrinks the top_k input 4x (top_k over ~500k scores is the detect
    # stage's hottest op on TPU: 5.3 ms -> 2.5 ms measured, bit-identical
    # scores).
    red_list = []  # (n_mid, rh, rw) block maxima
    sub_list = []  # argmax-in-block in [0, 4): sub = 2*dy + dx
    for c in cand_list:
        n_mid, oh, ow = c.shape
        ph, pw = (oh + 1) // 2 * 2, (ow + 1) // 2 * 2
        gp = jnp.pad(
            c, ((0, 0), (0, ph - oh), (0, pw - ow)), constant_values=-jnp.inf
        )
        blk = gp.reshape(n_mid, ph // 2, 2, pw // 2, 2).transpose(0, 1, 3, 2, 4)
        blk = blk.reshape(n_mid, ph // 2, pw // 2, 4)
        red_list.append(jnp.max(blk, axis=-1))
        sub_list.append(jnp.argmax(blk, axis=-1).astype(jnp.int32))

    flats = [c.reshape(-1) for c in red_list]
    sizes = [f.shape[0] for f in flats]
    offsets = [0]
    for sz in sizes:
        offsets.append(offsets[-1] + sz)
    flat = jnp.concatenate(flats)
    if _use_approx_topk(cfg):
        # TPU PartialReduce top-k: single-pass, ~2x faster than the exact
        # sort-based lax.top_k on 100k+ scores. Only the weakest-response
        # keypoints near the capacity cut can differ from exact.
        scores, idx = jax.lax.approx_max_k(
            flat, k, recall_target=cfg.topk_recall
        )
    else:
        scores, idx = jax.lax.top_k(flat, k)
    valid = jnp.isfinite(scores)

    # decode reduced flat index -> (octave, layer, gy, gx) with static
    # per-octave shapes (python loop over octaves, masked select)
    oct_i = jnp.zeros_like(idx)
    layer = jnp.zeros_like(idx)
    y = jnp.zeros_like(idx)
    x = jnp.zeros_like(idx)
    step_arr = jnp.zeros_like(idx)
    for o, (red, sub, c) in enumerate(zip(red_list, sub_list, cand_list)):
        n_mid, rh, rw = red.shape
        oh, ow = c.shape[1], c.shape[2]
        in_oct = (idx >= offsets[o]) & (idx < offsets[o + 1])
        local = jnp.clip(idx - offsets[o], 0, sizes[o] - 1)
        l_o = local // (rh * rw)
        rem = local % (rh * rw)
        by = rem // rw
        bx = rem % rw
        s_o = sub.reshape(-1)[local]
        y_o = jnp.minimum(by * 2 + s_o // 2, oh - 1)
        x_o = jnp.minimum(bx * 2 + s_o % 2, ow - 1)
        oct_i = jnp.where(in_oct, o, oct_i)
        layer = jnp.where(in_oct, l_o + 1, layer)
        y = jnp.where(in_oct, y_o, y)
        x = jnp.where(in_oct, x_o, x)
        step_arr = jnp.where(in_oct, 1 << o, step_arr)

    # 3x3x3 neighborhood on the octave's grid: TPU gathers cost ~14 ns per
    # gathered ELEMENT (batching into fewer gather ops does not help), so
    # the flat index is computed with the keypoint's own octave shape
    # (masked arithmetic — cheap VPU work) and all 27 taps come from ONE
    # take of the concatenated det buffer: K*27 elements total instead of
    # 3x that from per-octave takes.
    offs = [(dl, dy, dx) for dl in (-1, 0, 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    dls = jnp.asarray([o_[0] for o_ in offs], jnp.int32)[None, :]
    dys = jnp.asarray([o_[1] for o_ in offs], jnp.int32)[None, :]
    dxs = jnp.asarray([o_[2] for o_ in offs], jnp.int32)[None, :]
    det_flat = jnp.concatenate([s_.reshape(-1) for s_ in det_list])
    doff = [0]
    for s_ in det_list:
        doff.append(doff[-1] + s_.size)
    lin27 = jnp.zeros((idx.shape[0], 27), jnp.int32)
    for o, stack in enumerate(det_list):
        n_l, oh, ow = stack.shape
        ll = jnp.clip(layer[:, None] + dls, 0, n_l - 1)
        yy = jnp.clip(y[:, None] + dys, 0, oh - 1)
        xx = jnp.clip(x[:, None] + dxs, 0, ow - 1)
        lin = doff[o] + (ll * oh + yy) * ow + xx
        lin27 = jnp.where((oct_i == o)[:, None], lin, lin27)
    v27 = jnp.take(det_flat, lin27)
    n27 = jnp.where(jnp.isfinite(v27), v27, 0.0)

    def nb(dl, dy, dx):
        return n27[:, (dl + 1) * 9 + (dy + 1) * 3 + (dx + 1)]

    d000 = nb(0, 0, 0)
    # gradient
    gs = 0.5 * (nb(1, 0, 0) - nb(-1, 0, 0))
    gy = 0.5 * (nb(0, 1, 0) - nb(0, -1, 0))
    gx = 0.5 * (nb(0, 0, 1) - nb(0, 0, -1))
    # Hessian of the response surface
    hss = nb(1, 0, 0) + nb(-1, 0, 0) - 2 * d000
    hyy = nb(0, 1, 0) + nb(0, -1, 0) - 2 * d000
    hxx = nb(0, 0, 1) + nb(0, 0, -1) - 2 * d000
    hsy = 0.25 * (nb(1, 1, 0) - nb(1, -1, 0) - nb(-1, 1, 0) + nb(-1, -1, 0))
    hsx = 0.25 * (nb(1, 0, 1) - nb(1, 0, -1) - nb(-1, 0, 1) + nb(-1, 0, -1))
    hyx = 0.25 * (nb(0, 1, 1) - nb(0, 1, -1) - nb(0, -1, 1) + nb(0, -1, -1))

    H3 = jnp.stack(
        [
            jnp.stack([hss, hsy, hsx], -1),
            jnp.stack([hsy, hyy, hyx], -1),
            jnp.stack([hsx, hyx, hxx], -1),
        ],
        -2,
    )  # (K, 3, 3)
    g3 = jnp.stack([gs, gy, gx], -1)
    # damped closed-form solve (tiny batched jnp.linalg.solve lowers to a
    # slow generic LU on TPU — core/smallmat); clamp offsets to +-1 sample
    eye = jnp.eye(3, dtype=H3.dtype) * 1e-6
    delta = -smallmat.solve3(H3 + eye, g3)
    delta = jnp.nan_to_num(jnp.clip(delta, -1.0, 1.0))

    stepf = step_arr.astype(jnp.float32)
    base_size = (9.0 + 6.0 * (layer.astype(jnp.float32))) * stepf
    size_step = 6.0 * stepf
    size = base_size + delta[:, 0] * size_step
    # grid coords -> image pixels: offsets scale by the octave stride
    xy = jnp.stack(
        [
            (x.astype(jnp.float32) + delta[:, 2]) * stepf,
            (y.astype(jnp.float32) + delta[:, 1]) * stepf,
        ],
        -1,
    )
    if cfg.subpixel_refine is False:
        size = base_size
        xy = jnp.stack(
            [x.astype(jnp.float32) * stepf, y.astype(jnp.float32) * stepf], -1
        )
    zero = jnp.zeros_like(size)
    xy = jnp.where(valid[:, None], xy, 0.0)
    return Keypoints(
        xy=xy,
        size=jnp.where(valid, size, 1.0),
        response=jnp.where(valid, scores, 0.0),
        orientation=zero,
        laplacian=zero,
        valid=valid,
    )


def _dense_trace_sign_maps(ii, cfg: SurfConfig):
    """Dense sign(Dxx + Dyy) maps for every middle-layer scale.

    Shape (Q, H, W) int8. Each layer's trace is 6 thirds-geometry boxes =
    24 shifted slices of the edge-padded integral image — fully fused by
    XLA, no gathers (same trick as _dense_haar_maps). Keypoints then read
    their sign with ONE gathered element instead of the previous 24
    corner reads per keypoint: the laplacian stage was pure gather
    latency (~14 ns/element serialized; 16.8 ms per 4-pair batch,
    EXP_ORIENT_REAL.json). The scale is quantized to the keypoint's
    detection layer — what OpenCV itself does (the trace is recorded at
    detection, before subpixel size refinement), so this is parity-
    faithful, not an approximation.
    """
    h = ii.shape[0] - 1
    w = ii.shape[1] - 1
    sizes = _mid_layer_sizes(cfg)
    pad = max(sizes) // 2 + 2
    ii_pad = jnp.pad(ii, ((pad, pad), (pad, pad)), mode="edge")
    maps = []
    for s in sizes:
        half = s // 2
        t = int(s / 3.0)
        b = int(2.0 * s / 9.0)
        base = pad - half
        boxes = [
            # Dyy: three row bands x center column band
            (base + i * t, base + b, base + (i + 1) * t, base + s - b, wt)
            for i, wt in ((0, 1.0), (1, -2.0), (2, 1.0))
        ] + [
            # Dxx: center row band x three column bands
            (base + b, base + i * t, base + s - b, base + (i + 1) * t, wt)
            for i, wt in ((0, 1.0), (1, -2.0), (2, 1.0))
        ]
        tr = integral.shifted_box_sums(ii_pad, boxes, h, w)
        maps.append(jnp.sign(tr).astype(jnp.int8))
    return jnp.stack(maps)  # (Q, H, W) int8


def _haar_trace_maps_pallas(ii, cfg: SurfConfig):
    """Both dense-map families (packed Haar u32, trace-sign i8) from ONE
    Pallas kernel with the integral image resident in VMEM — replaces the
    ~(72 + 216) shifted HBM streams of _dense_haar_maps +
    _dense_trace_sign_maps (ops/pallas_surf.haar_trace_maps). Returns
    (haar (Q, H, W) u32, trace (Q, H, W) i8) or None when the shapes
    exceed the VMEM budget."""
    h = ii.shape[0] - 1
    w = ii.shape[1] - 1
    sizes = _mid_layer_sizes(cfg)
    rmax = max(int(round(2 * 1.2 * s / 9.0)) for s in sizes) + 1
    tpad = max(sizes) // 2 + 2
    pad = max(rmax, tpad)
    if not pallas_surf.haar_trace_fits_vmem(
        h + 1 + 2 * pad, w + 1 + 2 * pad, len(sizes), h, w
    ):
        return None
    ii_pad = jnp.pad(ii, ((pad, pad), (pad, pad)), mode="edge")
    return pallas_surf.haar_trace_maps(ii_pad, pad, h, w, tuple(sizes))


def _lap_from_trace_maps(maps, kp: Keypoints, cfg: SurfConfig):
    """Laplacian sign: one gather per keypoint from dense trace maps."""
    q, h, w = maps.shape
    li = _layer_index(kp.size, cfg)
    x = jnp.clip(jnp.round(kp.xy[:, 0]).astype(jnp.int32), 0, w - 1)
    y = jnp.clip(jnp.round(kp.xy[:, 1]).astype(jnp.int32), 0, h - 1)
    lin = li * (h * w) + y * w + x
    return jnp.take(maps.reshape(-1), lin).astype(jnp.float32)


def _laplacian_sign_dense(ii, kp: Keypoints, cfg: SurfConfig):
    """Laplacian sign via one gather per keypoint from the dense maps."""
    return _lap_from_trace_maps(_dense_trace_sign_maps(ii, cfg), kp, cfg)


def _laplacian_sign(ii, kp: Keypoints, cfg: SurfConfig):
    """Sign of Dxx + Dyy at each keypoint (OpenCV stores this for
    match-time bucketing; we keep it for API parity).

    Coarse trace with thirds geometry (sign only, exact scaling unneeded).
    Gather strategy ("gather" mode, the A/B reference for
    _laplacian_sign_dense): 24 integral-image corners per keypoint, read
    as ONE flat `jnp.take` of K*24 elements (~14 ns/element serialized).
    Wide-row reads + in-register selection are slower here: with only 24
    samples the (K, 24, W) masked reduction costs more than the serial
    gather, and the previous vmapped `lax.dynamic_slice` row reads
    lowered to a serial per-slice loop (EXP_IDX_FUSION.json). Integral
    values need full f32, so no int8 one-hot matmul either."""
    h = ii.shape[0] - 1
    w = ii.shape[1] - 1
    size = jnp.round(kp.size).astype(jnp.int32)
    half = size // 2
    x = jnp.round(kp.xy[:, 0]).astype(jnp.int32) - half
    y = jnp.round(kp.xy[:, 1]).astype(jnp.int32) - half
    third = (size.astype(jnp.float32) / 3.0).astype(jnp.int32)
    b = (2.0 * size.astype(jnp.float32) / 9.0).astype(jnp.int32)
    zero = jnp.zeros_like(size)

    # slot offsets shared by rows and cols: {0, t, 2t, 3t, b, size-b}
    slots = jnp.stack([zero, third, 2 * third, 3 * third, b, size - b], -1)  # (K, 6)
    # (row slot, col slot, coefficient) for all 24 corners:
    # dyy boxes span row slots (0,1),(1,2),(2,3) x col slots (4,5) with
    # weights (1,-2,1); dxx boxes span row slots (4,5) x cols (0,1),(1,2),
    # (2,3). Corner signs: (y1,x1,+),(y0,x1,-),(y1,x0,-),(y0,x0,+).
    corner_r, corner_c, coef = [], [], []
    boxes = [(i, i + 1, 4, 5, wt) for i, wt in ((0, 1.0), (1, -2.0), (2, 1.0))]
    boxes += [(4, 5, i, i + 1, wt) for i, wt in ((0, 1.0), (1, -2.0), (2, 1.0))]
    for (r0, r1, c0, c1, wt) in boxes:
        for (rr, cc, sgn) in ((r1, c1, 1.0), (r0, c1, -1.0), (r1, c0, -1.0), (r0, c0, 1.0)):
            corner_r.append(rr)
            corner_c.append(cc)
            coef.append(wt * sgn)
    coefs = jnp.asarray(coef, jnp.float32)[None, :]

    rows_i = jnp.clip(y[:, None] + slots, 0, h)  # (K, 6)
    cols_i = jnp.clip(x[:, None] + slots, 0, w)  # (K, 6)
    lin = rows_i[:, jnp.asarray(corner_r)] * (w + 1) + cols_i[:, jnp.asarray(corner_c)]
    v = jnp.take(ii.reshape(-1), lin)  # (K, 24)
    return jnp.sign(jnp.sum(v * coefs, axis=-1))


# ---------------------------------------------------------------------------
# Orientation


def _orientation_samples():
    """Static (N, 2) integer offsets within the radius-6 disc + Gaussian
    weights (sigma 2.5), matching the classic SURF orientation grid."""
    pts = []
    wts = []
    for i in range(-6, 7):
        for j in range(-6, 7):
            if i * i + j * j <= 36:
                pts.append((j, i))  # (dx, dy)
                wts.append(math.exp(-(i * i + j * j) / (2.0 * 2.5**2)))
    return (
        jnp.asarray(pts, jnp.float32),
        jnp.asarray(wts, jnp.float32),
    )


def _haar_xy(ii, cx, cy, r):
    """Haar wavelet responses of full size 2r x 2r centered at (cx, cy).

    hx = right-half minus left-half box sum, hy = bottom minus top. Both
    share the 3x3 corner grid {y0,cy,y1} x {x0,cx,x1} of the integral
    image, so the pair costs 8 unique gathers instead of 16 naive
    box-corner reads — gathers are the orientation stage's entire cost.
    """
    h = ii.shape[0] - 1
    w = ii.shape[1] - 1
    xs = (jnp.clip(cx - r, 0, w), jnp.clip(cx, 0, w), jnp.clip(cx + r, 0, w))
    ys = (jnp.clip(cy - r, 0, h), jnp.clip(cy, 0, h), jnp.clip(cy + r, 0, h))

    def g(yi, xi):
        return ii[ys[yi], xs[xi]]

    v00, v01, v02 = g(0, 0), g(0, 1), g(0, 2)
    v10, v12 = g(1, 0), g(1, 2)
    v20, v21, v22 = g(2, 0), g(2, 1), g(2, 2)
    right = v22 - v21 - v02 + v01
    left = v21 - v20 - v01 + v00
    bottom = v22 - v20 - v12 + v10
    top = v12 - v10 - v02 + v00
    return right - left, bottom - top


def _mid_layer_sizes(cfg: SurfConfig):
    """Filter sizes of the NMS-eligible middle layers, all octaves."""
    return [
        (9 + 6 * l) << o
        for o in range(cfg.n_octaves)
        for l in range(1, cfg.n_octave_layers + 1)
    ]


def _dense_haar_maps(ii, cfg: SurfConfig):
    """Dense Haar-x / Haar-y response maps for every middle-layer scale.

    Shape (Q, H, W) uint32, Q = n_octaves * n_octave_layers; each pixel
    packs (hx as bf16) << 16 | (hy as bf16). Each map is four shifted
    slices of the padded integral image — fully fused, no gathers.
    Keypoints then sample with ONE gathered element per sample instead of
    8 corner reads (or a (2,) row): the orientation stage is
    gather-latency-bound (~14 ns/element on TPU) and this is an ~8x cut.
    The wavelet radius is quantized to the keypoint's detection layer
    (round(2 * 1.2 * size / 9)), matching OpenCV's integer rounding to
    within half a layer.
    """
    h = ii.shape[0] - 1
    w = ii.shape[1] - 1
    sizes = _mid_layer_sizes(cfg)
    rmax = max(int(round(2 * 1.2 * s / 9.0)) for s in sizes) + 1
    ii_pad = jnp.pad(ii, ((rmax, rmax), (rmax, rmax)), mode="edge")
    maps = []
    for size in sizes:
        r = max(int(round(2 * 1.2 * size / 9.0)), 1)
        # boxes relative to the sample center (y0, x0, y1, x1, weight)
        hx = integral.shifted_box_sums(
            ii_pad,
            [
                (rmax - r, rmax, rmax + r, rmax + r, 1.0),
                (rmax - r, rmax - r, rmax + r, rmax, -1.0),
            ],
            h,
            w,
        )
        hy = integral.shifted_box_sums(
            ii_pad,
            [
                (rmax, rmax - r, rmax + r, rmax + r, 1.0),
                (rmax - r, rmax - r, rmax, rmax + r, -1.0),
            ],
            h,
            w,
        )
        # (hx, hy) PACKED as two bf16s in one uint32 per pixel: TPU gathers
        # cost ~14 ns per gathered element regardless of batching, so one
        # u32 element per sample is 2x cheaper than a (2,) f32 row. bf16
        # rounding (<=0.4% relative on each response) is negligible for the
        # orientation histogram, whose own quantization is 5-degree bins.
        hx16 = jax.lax.bitcast_convert_type(hx.astype(jnp.bfloat16), jnp.uint16)
        hy16 = jax.lax.bitcast_convert_type(hy.astype(jnp.bfloat16), jnp.uint16)
        packed = (hx16.astype(jnp.uint32) << 16) | hy16.astype(jnp.uint32)
        maps.append(packed)
    return jnp.stack(maps)  # (Q, H, W) uint32 [hx_bf16 | hy_bf16]


def _unpack_haar(packed_u32):
    """uint32 [hx_bf16 << 16 | hy_bf16] -> (hx, hy) float32."""
    hx = jax.lax.bitcast_convert_type(
        (packed_u32 >> 16).astype(jnp.uint16), jnp.bfloat16
    ).astype(jnp.float32)
    hy = jax.lax.bitcast_convert_type(
        (packed_u32 & jnp.uint32(0xFFFF)).astype(jnp.uint16), jnp.bfloat16
    ).astype(jnp.float32)
    return hx, hy


def _layer_index(kp_size, cfg: SurfConfig):
    """Nearest middle-layer index for each keypoint's (continuous) size."""
    sizes = jnp.asarray(_mid_layer_sizes(cfg), jnp.float32)
    return jnp.argmin(jnp.abs(kp_size[:, None] - sizes[None, :]), axis=-1)


def _assign_orientation(ii, kp: Keypoints, cfg: SurfConfig, haar=None):
    """Dominant orientation per keypoint (classic SURF sliding window).

    Gather strategy: the disc samples form a 13x13 grid of rows cy x cols
    cx per keypoint. The 13 whole map rows are read with `jnp.take(rows2d,
    idx, axis=0)` — the one gather form XLA:TPU lowers to a batched row
    gather even with indices computed in the same program (the previous
    vmapped `lax.dynamic_slice` lowered to a serial per-slice loop at
    ~200 ms/4-pair batch; EXP_IDX_FUSION.json: 207.8 ms -> 2.9 ms) — and
    the 13 columns are then selected in-register with one exact masked
    reduction on the PACKED u32 rows (single nonzero per reduction row,
    so integer sum == select; half the traffic of two f32 selects).
    Sample pixel coordinates (round + clip) are identical to the
    per-sample formulation.
    """
    if cfg.upright:
        return jnp.zeros_like(kp.size)
    s = kp.scale  # (K,)
    if haar is None:
        haar = _dense_haar_maps(ii, cfg)  # (Q, H, W) packed uint32
    h, w = haar.shape[1], haar.shape[2]
    q = _layer_index(kp.size, cfg)  # (K,)
    k = kp.xy.shape[0]

    grid = jnp.arange(-6, 7, dtype=jnp.float32)  # (13,)
    gx, gy = jnp.meshgrid(grid, grid, indexing="xy")  # (13, 13): dx, dy
    disc = gx * gx + gy * gy <= 36.0
    wts = jnp.where(disc, jnp.exp(-(gx * gx + gy * gy) / (2.0 * 2.5**2)), 0.0)

    cy = jnp.clip(
        jnp.round(kp.xy[:, 1:2] + grid[None, :] * s[:, None]).astype(jnp.int32), 0, h - 1
    )  # (K, 13) row per row-offset
    cx = jnp.clip(
        jnp.round(kp.xy[:, 0:1] + grid[None, :] * s[:, None]).astype(jnp.int32), 0, w - 1
    )  # (K, 13) col per col-offset
    rows_idx = (q[:, None] * h + cy).reshape(-1)  # (K*13,)
    rows = jnp.take(haar.reshape(-1, w), rows_idx, axis=0).reshape(k, 13, w)
    if jax.default_backend() == "cpu":
        # one-hot column selection on packed u32, fused mask+reduce
        # (exact: one nonzero per (k, r, j) reduction row)
        sel = cx[:, None, :, None] == jnp.arange(w)[None, None, None, :]
        packed = jnp.sum(
            jnp.where(sel, rows[:, :, None, :], jnp.uint32(0)), axis=-1
        )  # (K, 13, 13) u32
        hx, hy = _unpack_haar(packed)  # (K, 13, 13) f32, bf16-valued
    else:
        # MXU column selection: the predicated u32 reduction costs
        # O(K * 13 * 13 * W) VPU ops (~1.4G per 4-pair batch — the
        # orientation stage's dominant term after the row take); as two
        # bf16 one-hot matmuls the same select rides the MXU. Exact:
        # the map values are bf16 by construction (packed storage), the
        # one-hot rows are exact {0,1}, and each output element has
        # exactly one nonzero product, so f32 accumulation reproduces
        # the selected bf16 value bit-for-bit.
        hx_rows, hy_rows = _unpack_haar(rows)  # (K, 13, W) f32 bf16-valued
        onehot = (cx[:, :, None] == jnp.arange(w)[None, None, :]).astype(
            jnp.bfloat16
        )  # (K, 13j, W)
        hx = jax.lax.dot_general(
            hx_rows.astype(jnp.bfloat16), onehot,
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (K, 13r, 13j)
        hy = jax.lax.dot_general(
            hy_rows.astype(jnp.bfloat16), onehot,
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    # (r, j) -> dy = grid[r], dx = grid[j]; flatten to the sample axis
    hx = (hx * wts[None]).reshape(k, -1)  # weights zero outside the disc
    hy = (hy * wts[None]).reshape(k, -1)
    ang = jnp.arctan2(hy, hx)  # (K, N)

    # Sliding pi/3 window every 5 degrees. Window centers sit on 5-degree
    # bin boundaries, so binning responses into a 72-bin circular histogram
    # and summing 12 adjacent bins per center is EXACT (membership
    # |wrap(ang - c_j)| < pi/6 is constant across each 5-degree bin, up to
    # the measure-zero bin edge) — replaces the (K, 72, N) mask reduction.
    nbins = 72
    b = jnp.clip(
        jnp.floor((ang + jnp.pi) / (2 * jnp.pi) * nbins).astype(jnp.int32), 0, nbins - 1
    )  # (K, N)
    onehot_b = (b[..., None] == jnp.arange(nbins)[None, None, :]).astype(jnp.float32)
    hist_x = jnp.einsum("knb,kn->kb", onehot_b, hx)
    hist_y = jnp.einsum("knb,kn->kb", onehot_b, hy)
    # window j covers bins b with (b - j) mod 72 in {-6, ..., 5}
    sx = sum(jnp.roll(hist_x, -d, axis=-1) for d in range(-6, 6))
    sy = sum(jnp.roll(hist_y, -d, axis=-1) for d in range(-6, 6))
    mag = sx * sx + sy * sy
    best = jnp.argmax(mag, axis=-1)
    bx = jnp.take_along_axis(sx, best[:, None], axis=-1)[:, 0]
    by = jnp.take_along_axis(sy, best[:, None], axis=-1)[:, 0]
    return jnp.arctan2(by, bx)


# ---------------------------------------------------------------------------
# Descriptor


def _descriptor_grid():
    """21x21 sample offsets centered on the keypoint (units of s)."""
    r = jnp.arange(21, dtype=jnp.float32) - 10.0
    gx, gy = jnp.meshgrid(r, r, indexing="xy")
    return gx, gy  # each (21, 21)


def _gauss20():
    """Gaussian weights (sigma 3.3) over the 20x20 derivative grid."""
    r = jnp.arange(20, dtype=jnp.float32) - 9.5
    gx, gy = jnp.meshgrid(r, r, indexing="xy")
    return jnp.exp(-(gx * gx + gy * gy) / (2.0 * 3.3**2))


def describe(gray, kp: Keypoints, cfg: SurfConfig):
    """64-d SURF descriptors for all K keypoints. (K, 64) float32,
    L2-normalized; zero rows for invalid slots."""
    h, w = gray.shape
    gxs, gys = _descriptor_grid()  # (21, 21)
    s = kp.scale
    co = jnp.cos(kp.orientation)
    si = jnp.sin(kp.orientation)
    # rotated sampling positions, (K, 21, 21)
    px = kp.xy[:, 0, None, None] + s[:, None, None] * (
        co[:, None, None] * gxs[None] - si[:, None, None] * gys[None]
    )
    py = kp.xy[:, 1, None, None] + s[:, None, None] * (
        si[:, None, None] * gxs[None] + co[:, None, None] * gys[None]
    )
    if cfg.descriptor_interp == "bilinear":
        x0 = jnp.floor(px)
        y0 = jnp.floor(py)
        fx = px - x0
        fy = py - y0
        x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
        x1i = jnp.clip(x0i + 1, 0, w - 1)
        y1i = jnp.clip(y0i + 1, 0, h - 1)
        patch = (
            gray[y0i, x0i] * (1 - fx) * (1 - fy)
            + gray[y0i, x1i] * fx * (1 - fy)
            + gray[y1i, x0i] * (1 - fx) * fy
            + gray[y1i, x1i] * fx * fy
        )  # (K, 21, 21)
    else:
        # nearest (OpenCV rounds sample coords; 4x fewer gathers)
        xi = jnp.clip(jnp.round(px).astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(jnp.round(py).astype(jnp.int32), 0, h - 1)
        if _use_mxu_gather(cfg):
            chunk = cfg.mxu_gather_chunk * 21 * 21  # keypoints -> samples
            patch = _gather2d_mxu(gray, yi, xi, chunk=chunk)  # (K, 21, 21)
        else:
            patch = gray[yi, xi]  # (K, 21, 21)

    # 2-tap derivatives on the resampled patch (OpenCV's DX/DY scheme)
    dx = 0.5 * (
        patch[:, :-1, 1:] - patch[:, :-1, :-1] + patch[:, 1:, 1:] - patch[:, 1:, :-1]
    )  # (K, 20, 20)
    dy = 0.5 * (
        patch[:, 1:, :-1] - patch[:, :-1, :-1] + patch[:, 1:, 1:] - patch[:, :-1, 1:]
    )
    gw = _gauss20()[None]
    dx = dx * gw
    dy = dy * gw

    # 4x4 subregions of 5x5 samples -> (sum dx, sum|dx|, sum dy, sum|dy|)
    def pool(v):
        v = v.reshape(v.shape[0], 4, 5, 4, 5)
        return jnp.sum(v, axis=(2, 4))  # (K, 4, 4)

    feats = jnp.stack(
        [pool(dx), pool(jnp.abs(dx)), pool(dy), pool(jnp.abs(dy))], axis=-1
    )  # (K, 4, 4, 4)
    desc = feats.reshape(feats.shape[0], 64)
    norm = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(norm, 1e-12)
    return jnp.where(kp.valid[:, None], desc, 0.0)


@partial(jax.jit, static_argnames=("cfg",))
def detect(gray, cfg: SurfConfig = SurfConfig()):
    """Detect up to cfg.max_keypoints SURF keypoints in a grayscale image.

    Returns a Keypoints with orientation and laplacian sign filled in.
    """
    gray = gray.astype(jnp.float32)
    det_list = _det_maps_per_octave(gray, cfg)
    cand_list = _nms_candidates(det_list, cfg)
    kp = _refine_and_pack(gray.shape, det_list, cand_list, cfg)
    ii = integral.integral_image(gray)
    maps = (
        _haar_trace_maps_pallas(ii, cfg)
        if (_use_pallas_maps(cfg) and cfg.laplacian_mode == "dense")
        else None
    )
    if maps is not None:
        haar_maps, trace_maps = maps
        lap = _lap_from_trace_maps(trace_maps, kp, cfg)
        ori = _assign_orientation(ii, kp, cfg, haar=haar_maps)
    else:
        lap_fn = (
            _laplacian_sign_dense
            if cfg.laplacian_mode == "dense"
            else _laplacian_sign
        )
        lap = lap_fn(ii, kp, cfg)
        ori = _assign_orientation(ii, kp, cfg)
    return kp._replace(
        orientation=jnp.where(kp.valid, ori, 0.0),
        laplacian=jnp.where(kp.valid, lap, 0.0),
    )


@partial(jax.jit, static_argnames=("cfg",))
def detect_and_describe(image, cfg: SurfConfig = SurfConfig()):
    """RGB or gray image -> (Keypoints, descriptors (K, 64))."""
    gray = integral.rgb_to_gray(image)
    kp = detect(gray, cfg)
    desc = describe(gray, kp, cfg)
    return kp, desc
