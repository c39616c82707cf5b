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
from . import integral


def _use_mxu_gather(cfg: SurfConfig) -> bool:
    if cfg.gather_mode == "auto":
        return jax.default_backend() != "cpu"
    return cfg.gather_mode == "mxu"


def _gather2d_mxu(img, yi, xi):
    """img[yi, xi] as two MXU contractions (exact one-hot select).

    TPU lowers random gathers to a serialized ~14 ns/element pipeline; a
    one-hot matmul rides the MXU instead (~6x faster at 100k+ samples from
    a band-sized image, measured). Contract the wide axis W with a bf16
    one-hot (bit-exact: one nonzero per row selects a bf16 pixel under f32
    accumulation), then mask-reduce over H. `img` is rounded to the integer
    grid before the bf16 cast: integers in [0, 256] are exactly
    representable in bf16 (8 significant bits), so the quantization is
    EXACTLY the 8U grayscale quantization OpenCV's SURF operates on —
    band-crop grays are non-integer floats, so without the rounding the
    bf16 cast would differ from 8U by up to 1/2 ulp (~0.4% measured).
    """
    h, w = img.shape
    shp = yi.shape
    yf = yi.reshape(-1)
    xf = xi.reshape(-1)
    oh_x = (xf[:, None] == jnp.arange(w)[None, :]).astype(jnp.bfloat16)
    c = jax.lax.dot(
        oh_x, jnp.round(img).astype(jnp.bfloat16).T,
        preferred_element_type=jnp.float32,
    )  # (N, H)
    oh_y = (yf[:, None] == jnp.arange(h)[None, :]).astype(jnp.float32)
    return jnp.sum(c * oh_y, axis=-1).reshape(shp)

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
    grid (sampleStep = 1 << octave, OpenCV's scheme): box sums are
    computed by strided slicing of the padded integral image, so octave o
    costs 4^-o of full resolution and the NMS window is always 3x3x3.

    Returns a list of (n_layers+2, H>>o, W>>o) arrays (with -inf margins).
    """
    h, w = gray.shape
    ii = integral.integral_image(gray)
    sizes = _filter_sizes(cfg)
    max_size = max(s for (_, _, s) in sizes)
    pad = max_size  # generous so all shifted slices stay in range
    ii_pad = jnp.pad(ii, ((pad, pad), (pad, pad)), mode="edge")

    n_l = cfg.n_octave_layers + 2
    out = []
    for o in range(cfg.n_octaves):
        step = 1 << o
        oh = (h + step - 1) // step
        ow = (w + step - 1) // step
        layer_maps = []
        for l in range(n_l):
            size = (9 + 6 * l) << o
            half = size // 2

            def strided_sums(boxes):
                acc = None
                for (y0, x0, y1, x1, wt) in boxes:
                    oy0 = y0 + pad - half
                    ox0 = x0 + pad - half
                    oy1 = y1 + pad - half
                    ox1 = x1 + pad - half

                    def sl(dy, dx):
                        return jax.lax.slice(
                            ii_pad,
                            (dy, dx),
                            (dy + (oh - 1) * step + 1, dx + (ow - 1) * step + 1),
                            (step, step),
                        )

                    s = sl(oy1, ox1) - sl(oy0, ox1) - sl(oy1, ox0) + sl(oy0, ox0)
                    term = wt * s
                    acc = term if acc is None else acc + term
                return acc

            dxx = strided_sums(_scaled_pattern(_DXX9, size))
            dyy = strided_sums(_scaled_pattern(_DYY9, size))
            dxy = strided_sums(_scaled_pattern(_DXY9, size))
            det = dxx * dyy - 0.81 * dxy * dxy
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

    # 3x3x3 neighborhood gather on the octave's grid (per-octave gather,
    # masked-summed across octaves since grids have different shapes)
    def nb(dl, dy, dx):
        acc = jnp.zeros(idx.shape, jnp.float32)
        for o, stack in enumerate(det_list):
            n_l, oh, ow = stack.shape
            yy = jnp.clip(y + dy, 0, oh - 1)
            xx = jnp.clip(x + dx, 0, ow - 1)
            ll = jnp.clip(layer + dl, 0, n_l - 1)
            v = stack[ll, yy, xx]
            v = jnp.where(jnp.isfinite(v), v, 0.0)
            acc = jnp.where(oct_i == o, v, acc)
        return acc

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


def _laplacian_sign(ii, kp: Keypoints):
    """Sign of Dxx + Dyy at each keypoint (OpenCV stores this for
    match-time bucketing; we keep it for API parity)."""
    size = jnp.round(kp.size).astype(jnp.int32)
    half = size // 2
    x = jnp.round(kp.xy[:, 0]).astype(jnp.int32) - half
    y = jnp.round(kp.xy[:, 1]).astype(jnp.int32) - half
    third = (size.astype(jnp.float32) / 3.0).astype(jnp.int32)
    b = (2.0 * size.astype(jnp.float32) / 9.0).astype(jnp.int32)

    def boxsum(y0, x0, y1, x1):
        return integral.box_sum_at(ii, y + y0, x + x0, y + y1, x + x1)

    # coarse trace with thirds geometry (sign only, exact scaling unneeded)
    dyy = (
        boxsum(0 * third, b, 1 * third, size - b)
        - 2.0 * boxsum(1 * third, b, 2 * third, size - b)
        + boxsum(2 * third, b, 3 * third, size - b)
    )
    dxx = (
        boxsum(b, 0 * third, size - b, 1 * third)
        - 2.0 * boxsum(b, 1 * third, size - b, 2 * third)
        + boxsum(b, 2 * third, size - b, 3 * third)
    )
    return jnp.sign(dxx + dyy)


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

    Shape (Q, 2, H, W), Q = n_octaves * n_octave_layers. Each map is four
    shifted slices of the padded integral image — fully fused, no gathers.
    Keypoints then sample with ONE gather per (sample, direction) instead
    of 8 corner reads: the orientation stage is gather-latency-bound and
    this is a ~4x traffic cut. The wavelet radius is quantized to the
    keypoint's detection layer (round(2 * 1.2 * size / 9)), matching
    OpenCV's integer rounding to within half a layer.
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
        # (hx, hy) interleaved on the MINOR axis so one keypoint sample is
        # one gather of a contiguous pair instead of two strided gathers.
        maps.append(jnp.stack([hx, hy], axis=-1))
    return jnp.stack(maps)  # (Q, H, W, 2)


def _layer_index(kp_size, cfg: SurfConfig):
    """Nearest middle-layer index for each keypoint's (continuous) size."""
    sizes = jnp.asarray(_mid_layer_sizes(cfg), jnp.float32)
    return jnp.argmin(jnp.abs(kp_size[:, None] - sizes[None, :]), axis=-1)


def _assign_orientation(ii, kp: Keypoints, cfg: SurfConfig):
    if cfg.upright:
        return jnp.zeros_like(kp.size)
    pts, wts = _orientation_samples()  # (N, 2), (N,)
    s = kp.scale  # (K,)
    haar = _dense_haar_maps(ii, cfg)  # (Q, H, W, 2)
    h, w = haar.shape[1], haar.shape[2]
    q = _layer_index(kp.size, cfg)  # (K,)
    cx = jnp.clip(
        jnp.round(kp.xy[:, 0:1] + pts[None, :, 0] * s[:, None]).astype(jnp.int32), 0, w - 1
    )
    cy = jnp.clip(
        jnp.round(kp.xy[:, 1:2] + pts[None, :, 1] * s[:, None]).astype(jnp.int32), 0, h - 1
    )
    # one paired gather per sample through a flat linear index (1D row
    # gathers lower ~1.5x faster than multi-axis fancy indexing on TPU)
    lin = (q[:, None] * h + cy) * w + cx
    hxy = jnp.take(haar.reshape(-1, 2), lin, axis=0)  # (K, N, 2)
    hx = hxy[..., 0] * wts[None, :]
    hy = hxy[..., 1] * wts[None, :]
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
            patch = _gather2d_mxu(gray, yi, xi)  # (K, 21, 21)
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
    lap = _laplacian_sign(ii, kp)
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
