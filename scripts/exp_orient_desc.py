"""A/B experiment for two frontend substage rewrites flagged by
ROOFLINE_r05.json (VERDICT r4 #1 follow-through):

  A. Orientation column-select: the per-keypoint 13x13 one-hot matmuls
     pad 13 -> 128 on both MXU dims (97x pad waste; the roofline floor
     charges 2.79 ms of the substage's 8.4 ms to this). Regroup G=4
     keypoints into one block matmul (M = 4*26 rows incl. hx|hy merge,
     N = 4*13 cols), then slice the diagonal blocks. EXACT: every output
     element still has exactly one nonzero product.

  B. Descriptor sampling: the one-hot gather reads K*441 samples against
     the FULL band (n*H*W MXU work, 191x the compulsory floor). Separable
     rewrite: extract a 31x31 axis-aligned patch per keypoint with two
     thin one-hot matmuls (contract W once for all keypoints, then a
     per-keypoint H-row mask-reduce), and resolve the rotated 21x21 grid
     by nearest lookup INSIDE the patch. Changes rounding (patch grid is
     quantized per-axis before rotation), so this is flag-gated; at
     s=1, theta=0 it is exactly the direct path.

Run ALONE on the TPU: python scripts/exp_orient_desc.py
Writes EXP_ORIENT_DESC.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from spherical_bundle_adjuster_tpu.ops import integral, surf
from spherical_bundle_adjuster_tpu.utils.config import SurfConfig

REPS = 8
NB = 32          # bands in flight at the headline batch (4 pairs x 8)
H, W = 128, 1024


def synth_bands(key):
    """Smooth random bands with structure at several scales."""
    k1, k2 = jax.random.split(key)
    base = jax.random.uniform(k1, (NB, H // 8, W // 8))
    up = jax.image.resize(base, (NB, H, W), "linear")
    fine = jax.random.uniform(k2, (NB, H, W)) * 0.15
    return (up + fine) * 255.0


def synth_kp(key, cfg):
    k = cfg.max_keypoints
    ks = jax.random.split(key, 4)
    xy = jnp.stack(
        [
            jax.random.uniform(ks[0], (k,), minval=20.0, maxval=W - 20.0),
            jax.random.uniform(ks[1], (k,), minval=12.0, maxval=H - 12.0),
        ],
        -1,
    )
    sizes = jnp.asarray(surf._mid_layer_sizes(cfg), jnp.float32)
    size = sizes[jax.random.randint(ks[2], (k,), 0, len(sizes))]
    # bias toward small scales like real detections
    size = jnp.where(jax.random.uniform(ks[3], (k,)) < 0.7, sizes[0], size)
    return surf.Keypoints(
        xy=xy,
        size=size,
        response=jnp.ones((k,)),
        orientation=jax.random.uniform(ks[3], (k,), minval=-3.1, maxval=3.1),
        laplacian=jnp.ones((k,)),
        valid=jnp.ones((k,), bool),
    )


# ---------------------------------------------------------------- A: orient
def orient_grouped(ii, kp, cfg, haar=None, group=4):
    s = kp.scale
    if haar is None:
        haar = surf._dense_haar_maps(ii, cfg)
    h, w = haar.shape[1], haar.shape[2]
    q = surf._layer_index(kp.size, cfg)
    k = kp.xy.shape[0]

    grid = jnp.arange(-6, 7, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(grid, grid, indexing="xy")
    disc = gx * gx + gy * gy <= 36.0
    wts = jnp.where(disc, jnp.exp(-(gx * gx + gy * gy) / (2.0 * 2.5**2)), 0.0)

    cy = jnp.clip(
        jnp.round(kp.xy[:, 1:2] + grid[None, :] * s[:, None]).astype(jnp.int32), 0, h - 1
    )
    cx = jnp.clip(
        jnp.round(kp.xy[:, 0:1] + grid[None, :] * s[:, None]).astype(jnp.int32), 0, w - 1
    )
    rows_idx = (q[:, None] * h + cy).reshape(-1)
    rows = jnp.take(haar.reshape(-1, w), rows_idx, axis=0).reshape(k, 13, w)
    hx_rows, hy_rows = surf._unpack_haar(rows)

    g = group
    hb = jnp.concatenate([hx_rows, hy_rows], 1)  # (K, 26, W)
    hbg = hb.astype(jnp.bfloat16).reshape(k // g, g * 26, w)
    oh = (cx[:, :, None] == jnp.arange(w)[None, None, :]).astype(jnp.bfloat16)
    ohg = oh.reshape(k // g, g * 13, w)
    out = jax.lax.dot_general(
        hbg, ohg, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (K/g, g*26, g*13)
    out = out.reshape(k // g, g, 26, g, 13)
    diag = jnp.stack([out[:, i, :, i, :] for i in range(g)], 1).reshape(k, 26, 13)
    hx, hy = diag[:, :13, :], diag[:, 13:, :]

    hx = (hx * wts[None]).reshape(k, -1)
    hy = (hy * wts[None]).reshape(k, -1)
    ang = jnp.arctan2(hy, hx)
    nbins = 72
    b = jnp.clip(
        jnp.floor((ang + jnp.pi) / (2 * jnp.pi) * nbins).astype(jnp.int32), 0, nbins - 1
    )
    onehot_b = (b[..., None] == jnp.arange(nbins)[None, None, :]).astype(jnp.float32)
    hist_x = jnp.einsum("knb,kn->kb", onehot_b, hx)
    hist_y = jnp.einsum("knb,kn->kb", onehot_b, hy)
    sx = sum(jnp.roll(hist_x, -d, axis=-1) for d in range(-6, 6))
    sy = sum(jnp.roll(hist_y, -d, axis=-1) for d in range(-6, 6))
    mag = sx * sx + sy * sy
    best = jnp.argmax(mag, axis=-1)
    bx = jnp.take_along_axis(sx, best[:, None], axis=-1)[:, 0]
    by = jnp.take_along_axis(sy, best[:, None], axis=-1)[:, 0]
    return jnp.arctan2(by, bx)


# -------------------------------------------------------------- B: describe
def describe_patch_samples(gray, kp, take_mode):
    """(K, 21, 21) rotated nearest samples via separable patch extract."""
    h, w = gray.shape
    k = kp.xy.shape[0]
    s = kp.scale
    co = jnp.cos(kp.orientation)
    si = jnp.sin(kp.orientation)
    g31 = jnp.arange(31, dtype=jnp.float32) - 15.0
    ys = jnp.clip(
        jnp.round(kp.xy[:, 1:2] + s[:, None] * g31).astype(jnp.int32), 0, h - 1
    )  # (K, 31)
    xs = jnp.clip(
        jnp.round(kp.xy[:, 0:1] + s[:, None] * g31).astype(jnp.int32), 0, w - 1
    )
    imq = (jnp.round(gray) - 128.0).astype(jnp.int8)

    ohx = (xs.reshape(-1)[:, None] == jnp.arange(w)[None, :]).astype(jnp.int8)
    colv = jax.lax.dot_general(
        imq, ohx, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )  # (H, K*31)
    colv = colv.reshape(h, k, 31).transpose(1, 0, 2)  # (K, H, 31)
    sely = ys[:, :, None] == jnp.arange(h)[None, None, :]  # (K, 31, H)
    patch = jnp.sum(
        jnp.where(sely[:, :, :, None], colv[:, None, :, :], 0), axis=2
    )  # (K, 31, 31) int32 rows=i (y), cols=j (x)

    gxs, gys = surf._descriptor_grid()  # (21, 21)
    u = co[:, None, None] * gxs[None] - si[:, None, None] * gys[None]
    v = si[:, None, None] * gxs[None] + co[:, None, None] * gys[None]
    qu = jnp.clip(jnp.round(u).astype(jnp.int32) + 15, 0, 30)
    qv = jnp.clip(jnp.round(v).astype(jnp.int32) + 15, 0, 30)
    idx = (qv * 31 + qu).reshape(k, 441)
    pf = patch.reshape(k, 961)
    if take_mode == "take":
        samp = jnp.take_along_axis(pf, idx, axis=1)
    else:
        sel = idx[:, :, None] == jnp.arange(961)[None, None, :]
        samp = jnp.sum(jnp.where(sel, pf[:, None, :], 0), axis=-1)
    return samp.reshape(k, 21, 21).astype(jnp.float32) + 128.0


def describe_direct_samples(gray, kp, cfg):
    """The current TPU path's samples (round + full-band MXU gather)."""
    h, w = gray.shape
    gxs, gys = surf._descriptor_grid()
    s = kp.scale
    co = jnp.cos(kp.orientation)
    si = jnp.sin(kp.orientation)
    px = kp.xy[:, 0, None, None] + s[:, None, None] * (
        co[:, None, None] * gxs[None] - si[:, None, None] * gys[None]
    )
    py = kp.xy[:, 1, None, None] + s[:, None, None] * (
        si[:, None, None] * gxs[None] + co[:, None, None] * gys[None]
    )
    xi = jnp.clip(jnp.round(px).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(py).astype(jnp.int32), 0, h - 1)
    chunk = cfg.mxu_gather_chunk * 21 * 21
    return surf._gather2d_mxu(gray, yi, xi, chunk=chunk)


def main():
    backend = jax.default_backend()
    cfg = SurfConfig()
    key = jax.random.PRNGKey(0)
    bands = jax.device_put(np.asarray(synth_bands(key)))
    kps = jax.vmap(lambda k: synth_kp(k, cfg))(jax.random.split(key, NB))
    kps = jax.tree.map(jax.device_put, kps)
    jax.block_until_ready((bands, kps))

    @jax.jit
    def tiny(x):
        return x + 1.0

    jax.block_until_ready(tiny(jnp.float32(0.0)))

    def med(f, *a, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*a))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    rtt = med(tiny, jnp.float32(1.0))
    print(f"(rtt ~{rtt*1e3:.1f} ms)", file=sys.stderr)

    def timed(make_body, label):
        @jax.jit
        def run(x):
            def sbody(c, i):
                eps = x * (i.astype(jnp.float32) + 1.0)
                return c + make_body(eps), None

            c, _ = jax.lax.scan(sbody, jnp.float32(0.0), jnp.arange(REPS))
            return c

        jax.block_until_ready(run(jnp.float32(0.0)))
        t = max((med(run, jnp.float32(0.0)) - rtt) / REPS, 1e-9)
        print(f"{label}: {t*1e3:.2f} ms/{NB}-band batch", file=sys.stderr, flush=True)
        return t * 1e3

    out = {"backend": backend, "nb": NB, "h": H, "w": W, "reps": REPS}

    # ---- A: orientation --------------------------------------------------
    def orient_cur(eps):
        def f(g, kp):
            ii = integral.integral_image(g)
            haar = (
                surf._haar_trace_maps_pallas(ii, cfg)[0]
                if surf._use_pallas_maps(cfg)
                else None
            )
            return surf._assign_orientation(ii, kp, cfg, haar=haar)

        o = jax.vmap(f)(bands + eps, kps)
        return jnp.sum(o)

    def orient_new(eps):
        def f(g, kp):
            ii = integral.integral_image(g)
            haar = (
                surf._haar_trace_maps_pallas(ii, cfg)[0]
                if surf._use_pallas_maps(cfg)
                else None
            )
            return orient_grouped(ii, kp, cfg, haar=haar)

        o = jax.vmap(f)(bands + eps, kps)
        return jnp.sum(o)

    out["orient_current_ms"] = timed(orient_cur, "orient current")
    out["orient_grouped_ms"] = timed(orient_new, "orient grouped")

    # exactness
    def oc(g, kp):
        ii = integral.integral_image(g)
        haar = (
            surf._haar_trace_maps_pallas(ii, cfg)[0]
            if surf._use_pallas_maps(cfg)
            else None
        )
        return surf._assign_orientation(ii, kp, cfg, haar=haar)

    def on(g, kp):
        ii = integral.integral_image(g)
        haar = (
            surf._haar_trace_maps_pallas(ii, cfg)[0]
            if surf._use_pallas_maps(cfg)
            else None
        )
        return orient_grouped(ii, kp, cfg, haar=haar)

    a = jax.jit(jax.vmap(oc))(bands, kps)
    b = jax.jit(jax.vmap(on))(bands, kps)
    out["orient_max_abs_diff"] = float(jnp.max(jnp.abs(a - b)))

    # ---- B: describe -----------------------------------------------------
    def desc_cur(eps):
        s = jax.vmap(lambda g, kp: describe_direct_samples(g, kp, cfg))(
            bands + eps, kps
        )
        return jnp.sum(s)

    out["desc_direct_ms"] = timed(desc_cur, "describe direct (mxu full-band)")
    for mode in ("take", "masksum"):
        def desc_new(eps, m=mode):
            s = jax.vmap(lambda g, kp: describe_patch_samples(g, kp, m))(
                bands + eps, kps
            )
            return jnp.sum(s)

        out[f"desc_patch_{mode}_ms"] = timed(desc_new, f"describe patch[{mode}]")

    # sample agreement (patch vs direct) on the synthetic bands
    sa = jax.jit(jax.vmap(lambda g, kp: describe_direct_samples(g, kp, cfg)))(
        bands, kps
    )
    sb = jax.jit(jax.vmap(lambda g, kp: describe_patch_samples(g, kp, "take")))(
        bands, kps
    )
    d = jnp.abs(sa - sb)
    rng = 255.0
    out["desc_sample_mean_abs_diff"] = float(jnp.mean(d))
    out["desc_sample_frac_gt_5pct"] = float(jnp.mean(d > 0.05 * rng))

    # exactness at s=1 (size 7.5), theta=0
    kp0 = kps._replace(
        size=jnp.full_like(kps.size, 9.0 / 1.2),
        orientation=jnp.zeros_like(kps.orientation),
    )
    sa0 = jax.jit(jax.vmap(lambda g, kp: describe_direct_samples(g, kp, cfg)))(
        bands, kp0
    )
    sb0 = jax.jit(jax.vmap(lambda g, kp: describe_patch_samples(g, kp, "take")))(
        bands, kp0
    )
    out["desc_s1_theta0_max_abs_diff"] = float(jnp.max(jnp.abs(sa0 - sb0)))

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "EXP_ORIENT_DESC.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
