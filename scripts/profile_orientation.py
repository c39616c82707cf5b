"""Micro-profile INSIDE surf._assign_orientation — locates the hot part
of the dominant frontend substage (h_orientation = 201.7 ms/batch(4) =
89% of the substage sum, FRONTEND_PROFILE_r03.json).

Parts timed on the bench band shapes ((B*8, H/4, W) = (32, 128, 1024)):
  1_dense_haar   — _dense_haar_maps (shifted slices, packing)
  2_row_slices   — K*13 vmapped dynamic_slice row reads of span
  3_unpack_select— bf16 unpack + in-window one-hot column select
  4_histogram    — binning + one-hot einsum + sliding window argmax
  5_full_orient  — _assign_orientation end to end

Run ALONE on the TPU. Writes ORIENT_PROFILE_r03.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

REPS = 16


def main():
    import bench
    from spherical_bundle_adjuster_tpu.ops import integral, surf

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cfg = bench.bench_config().surf
    h, w = bench.BENCH_H, bench.BENCH_W
    im_l, im_r = bench.make_batch(batch)

    from spherical_bundle_adjuster_tpu.models import frontend as fe
    from spherical_bundle_adjuster_tpu.ops import warp

    pcfg = bench.bench_config()
    nz = [p for p in pcfg.frontend.band_pitches_deg if p != 0.0]
    nz_rad = jnp.deg2rad(jnp.asarray(nz, jnp.float32))

    def crop_all(gray):
        def one(g):
            warped = jax.vmap(
                lambda p: warp.crop_rotated_band(g, p, pcfg.frontend.resample_mode)
            )(nz_rad)
            r0 = 3 * h // 8
            outs, wi = [], 0
            for p in pcfg.frontend.band_pitches_deg:
                if p == 0.0:
                    outs.append(g[r0 : r0 + h // 4])
                else:
                    outs.append(warped[wi]); wi += 1
            return jnp.stack(outs)
        return jax.vmap(one)(gray)

    gray_l = jax.jit(jax.vmap(integral.rgb_to_gray))(im_l)
    gray_r = jax.jit(jax.vmap(integral.rgb_to_gray))(im_r)
    bands = jax.jit(lambda a, b: jnp.concatenate([crop_all(a), crop_all(b)], 1))(
        gray_l, gray_r
    )
    bflat = bands.reshape(-1, h // 4, w)
    n_bands = bflat.shape[0]

    det = jax.jit(jax.vmap(lambda g: tuple(surf._det_maps_per_octave(g, cfg))))(bflat)
    cand = jax.jit(jax.vmap(lambda *d: tuple(surf._nms_candidates(list(d), cfg))))(*det)
    kp = jax.jit(
        jax.vmap(lambda d, c: surf._refine_and_pack((h // 4, w), list(d), list(c), cfg))
    )(det, cand)
    ii = jax.jit(jax.vmap(integral.integral_image))(bflat)
    jax.block_until_ready((kp, ii))
    print(f"bands={n_bands} K={cfg.max_keypoints}", file=sys.stderr)

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
    print(f"(rtt ~{rtt*1e3:.1f} ms)", file=sys.stderr)
    out = {}

    def stage(label, body):
        @jax.jit
        def run(_x):
            def sbody(c, i):
                leaves = jax.tree.leaves(body(i))
                return c + sum(jnp.sum(x).astype(jnp.float32) for x in leaves), None

            c, _ = jax.lax.scan(sbody, jnp.float32(0.0), jnp.arange(REPS))
            return c

        jax.block_until_ready(run(0))
        t = max((med(run, 0) - rtt) / REPS, 1e-9)
        out[label] = {"ms_per_batch": t * 1e3}
        print(f"{label}: {t*1e3:.2f} ms/batch", file=sys.stderr, flush=True)

    v = jax.vmap

    # 1. dense haar maps
    stage("1_dense_haar", lambda i: v(lambda a: surf._dense_haar_maps(a, cfg))(ii))

    haar = jax.jit(v(lambda a: surf._dense_haar_maps(a, cfg)))(ii)
    jax.block_until_ready(haar)
    hh, ww = haar.shape[2], haar.shape[3]
    grid = jnp.arange(-6, 7, dtype=jnp.float32)

    def slices_of(haar1, kp1):
        s = kp1.scale
        q = surf._layer_index(kp1.size, cfg)
        cy = jnp.clip(
            jnp.round(kp1.xy[:, 1:2] + grid[None, :] * s[:, None]).astype(jnp.int32),
            0, hh - 1,
        )
        k = kp1.xy.shape[0]
        rows_idx = (q[:, None] * hh + cy).reshape(-1)
        return jnp.take(haar1.reshape(-1, ww), rows_idx, axis=0).reshape(k, 13, ww)

    # 2. row takes alone
    stage("2_row_slices", lambda i: v(slices_of)(haar, kp))

    rows = jax.jit(v(slices_of))(haar, kp)
    jax.block_until_ready(rows)

    def select_of(rows1, kp1):
        s = kp1.scale
        cx = jnp.clip(
            jnp.round(kp1.xy[:, 0:1] + grid[None, :] * s[:, None]).astype(jnp.int32),
            0, ww - 1,
        )
        sel = cx[:, None, :, None] == jnp.arange(ww)[None, None, None, :]
        packed = jnp.sum(
            jnp.where(sel, rows1[:, :, None, :], jnp.uint32(0)), axis=-1
        )
        return surf._unpack_haar(packed)

    # 3. unpack + one-hot column select
    stage("3_unpack_select", lambda i: v(select_of)(rows, kp))

    hxy = jax.jit(v(select_of))(rows, kp)
    jax.block_until_ready(hxy)

    gx, gy = jnp.meshgrid(grid, grid, indexing="xy")
    disc = gx * gx + gy * gy <= 36.0
    wts = jnp.where(disc, jnp.exp(-(gx * gx + gy * gy) / (2.0 * 2.5**2)), 0.0)

    def hist_of(hx, hy):
        k = hx.shape[0]
        hxw = (hx * wts[None]).reshape(k, -1)
        hyw = (hy * wts[None]).reshape(k, -1)
        ang = jnp.arctan2(hyw, hxw)
        nbins = 72
        b = jnp.clip(
            jnp.floor((ang + jnp.pi) / (2 * jnp.pi) * nbins).astype(jnp.int32),
            0, nbins - 1,
        )
        onehot_b = (b[..., None] == jnp.arange(nbins)[None, None, :]).astype(jnp.float32)
        hist_x = jnp.einsum("knb,kn->kb", onehot_b, hxw)
        hist_y = jnp.einsum("knb,kn->kb", onehot_b, hyw)
        sx = sum(jnp.roll(hist_x, -d, axis=-1) for d in range(-6, 6))
        sy = sum(jnp.roll(hist_y, -d, axis=-1) for d in range(-6, 6))
        mag = sx * sx + sy * sy
        best = jnp.argmax(mag, axis=-1)
        bx = jnp.take_along_axis(sx, best[:, None], axis=-1)[:, 0]
        by = jnp.take_along_axis(sy, best[:, None], axis=-1)[:, 0]
        return jnp.arctan2(by, bx)

    stage("4_histogram", lambda i: v(hist_of)(*hxy))

    stage("5_full_orient", lambda i: v(lambda a, b: surf._assign_orientation(a, b, cfg))(ii, kp))

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ORIENT_PROFILE_r03.json",
    )
    with open(path, "w") as f:
        json.dump({"batch": batch, "bands": int(n_bands), "span": int(span),
                   "parts": out}, f, indent=1)
    print(json.dumps({l: round(s["ms_per_batch"], 2) for l, s in out.items()}, indent=1))


if __name__ == "__main__":
    main()
