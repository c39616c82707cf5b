"""Per-substage frontend profile (ISOLATED stages — superseded).

CAUTION: these stage bodies don't depend on the scan index, so XLA can
hoist a stage out of the timing loop entirely (several substages timed at
~0 ms in FRONTEND_PROFILE_r03 and the difference surfaced as a phantom
83 ms "fusion residual"). scripts/profile_composed.py is the authoritative
profile: it times composed prefixes of the real dataflow with
index-dependent inputs. This script is kept for isolated A/B of single
substages only.

Run ALONE on the TPU (no concurrent CPU jobs).

Substages mirror models/frontend.band_frontend's dataflow on the bench
config (batch x 2 images x 4 bands of (H/4, W)):

  gray -> crop bands -> integral -> det pyramid -> NMS -> refine+topk
  -> laplacian -> orientation -> describe -> keypoint remap -> match

Writes FRONTEND_PROFILE_r03.json {substage: {ms_per_batch, pct}} plus the
end-to-end frontend time and the residual (fusion overlap between
stand-alone substage timings and the fused whole).

Usage: python scripts/profile_frontend.py [batch] (default 4).
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

REPS = 16


def _sum_tree(t):
    return sum(jnp.sum(x).astype(jnp.float32) for x in jax.tree.leaves(t))


def main():
    import bench
    from spherical_bundle_adjuster_tpu.models import frontend as fe
    from spherical_bundle_adjuster_tpu.ops import integral, match, surf, warp

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cfg = bench.bench_config()
    h, w = bench.BENCH_H, bench.BENCH_W
    im_l, im_r = bench.make_batch(batch)
    jax.block_until_ready((im_l, im_r))

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
                return c + _sum_tree(body(i)), None

            c, _ = jax.lax.scan(sbody, jnp.float32(0.0), jnp.arange(REPS))
            return c

        jax.block_until_ready(run(0))
        t = max((med(run, 0) - rtt) / REPS, 1e-9)
        out[label] = {"ms_per_batch": t * 1e3, "ms_per_pair": t / batch * 1e3}
        print(f"{label}: {t*1e3:.2f} ms/batch", file=sys.stderr, flush=True)

    v = jax.vmap
    pitches = jnp.deg2rad(jnp.asarray(cfg.frontend.band_pitches_deg, jnp.float32))
    nz = jnp.asarray([p for p in cfg.frontend.band_pitches_deg if p != 0.0])
    nz_rad = jnp.deg2rad(nz.astype(jnp.float32))

    # ---- substage inputs (precomputed, excluded from each timing) ----
    gray_l = jax.jit(v(integral.rgb_to_gray))(im_l)
    gray_r = jax.jit(v(integral.rgb_to_gray))(im_r)

    def crop_all(gray):  # (B,H,W) -> (B,4,H/4,W)
        def one(g):
            warped = v(lambda p: warp.crop_rotated_band(g, p, cfg.frontend.resample_mode))(nz_rad)
            r0 = 3 * h // 8
            outs, wi = [], 0
            for p in cfg.frontend.band_pitches_deg:
                if p == 0.0:
                    outs.append(g[r0 : r0 + h // 4])
                else:
                    outs.append(warped[wi]); wi += 1
            return jnp.stack(outs)
        return v(one)(gray)

    bands = jax.jit(
        lambda a, b: jnp.concatenate([crop_all(a), crop_all(b)], axis=1)
    )(gray_l, gray_r)  # (B, 8, H/4, W)
    bflat = bands.reshape(-1, h // 4, w)  # (B*8, H/4, W)
    jax.block_until_ready(bflat)

    ii = jax.jit(v(integral.integral_image))(bflat)
    det = jax.jit(v(lambda g: tuple(surf._det_maps_per_octave(g, cfg.surf))))(bflat)
    cand = jax.jit(v(lambda *d: tuple(surf._nms_candidates(list(d), cfg.surf))))(*det)
    kp = jax.jit(
        v(lambda d, c: surf._refine_and_pack((h // 4, w), list(d), list(c), cfg.surf))
    )(det, cand)
    desc = jax.jit(v(lambda g, k: surf.describe(g, k, cfg.surf)))(bflat, kp)
    jax.block_until_ready((ii, det, cand, kp, desc))

    # ---- timings ----
    stage("a_rgb_to_gray", lambda i: (v(integral.rgb_to_gray)(im_l),
                                      v(integral.rgb_to_gray)(im_r)))
    stage("b_crop_bands", lambda i: (crop_all(gray_l), crop_all(gray_r)))
    stage("c_integral", lambda i: v(integral.integral_image)(bflat))
    stage("d_det_pyramid", lambda i: v(lambda g: tuple(surf._det_maps_per_octave(g, cfg.surf)))(bflat))
    stage("e_nms", lambda i: v(lambda *d: tuple(surf._nms_candidates(list(d), cfg.surf)))(*det))
    stage("f_refine_topk", lambda i: v(
        lambda d, c: surf._refine_and_pack((h // 4, w), list(d), list(c), cfg.surf)
    )(det, cand))
    # profile the laplacian path the config actually selects (dense is the
    # shipped default; _laplacian_sign is the gather A/B path)
    lap_fn = (
        surf._laplacian_sign_dense
        if cfg.surf.laplacian_mode == "dense"
        else surf._laplacian_sign
    )
    stage("g_laplacian", lambda i: v(lambda a, b: lap_fn(a, b, cfg.surf))(ii, kp))
    stage("h_orientation", lambda i: v(lambda a, b: surf._assign_orientation(a, b, cfg.surf))(ii, kp))
    stage("i_describe", lambda i: v(lambda g, k: surf.describe(g, k, cfg.surf))(bflat, kp))

    # keypoint remap + bank flatten + match (per pair)
    k = cfg.surf.max_keypoints
    nb = pitches.shape[0]
    p2 = jnp.tile(pitches, 2)

    def remap(kp_xy):  # (B*8, K, 2)
        kxy = kp_xy.reshape(batch, 2 * nb, k, 2)
        return v(lambda xy: v(lambda a, p: warp.band_pixel_to_erp(a, p, w, h))(xy, p2))(kxy)

    stage("j_kp_remap", lambda i: remap(kp.xy))

    desc_b = desc.reshape(batch, 2, nb * k, -1)
    val_b = kp.valid.reshape(batch, 2, nb * k)
    matcher = v(partial(match.match_descriptors, cfg=cfg.match))
    stage("k_match", lambda i: matcher(desc_b[:, 0], val_b[:, 0], desc_b[:, 1], val_b[:, 1]))

    # compositions: locate residual between sum-of-parts and the fused whole
    stage("y1_detect", lambda i: v(lambda g: surf.detect(g, cfg.surf))(bflat))
    stage("y2_detect_describe",
          lambda i: v(lambda g: surf.detect_and_describe(g, cfg.surf))(bflat))

    front = v(partial(fe.band_frontend, cfg=cfg))
    stage("z_full_band_frontend", lambda i: front(im_l, im_r))

    total = sum(
        s["ms_per_batch"]
        for lbl, s in out.items()
        if not lbl.startswith(("y", "z_"))
    )
    full = out["z_full_band_frontend"]["ms_per_batch"]
    for lbl, s in out.items():
        s["pct_of_full"] = round(100.0 * s["ms_per_batch"] / full, 2)
    summary = {
        "batch": batch,
        "height": h,
        "width": w,
        "device": jax.devices()[0].device_kind,
        "backend": jax.default_backend(),
        "substage_sum_ms": total,
        "full_ms": full,
        "fusion_residual_ms": full - total,
        "substages": out,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "FRONTEND_PROFILE_r03.json")
    with open(path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({l: round(s["ms_per_batch"], 2) for l, s in out.items()}, indent=1))
    print(f"substage sum {total:.2f} ms vs full {full:.2f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
