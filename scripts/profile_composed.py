"""Composed-prefix frontend profile — attributes the cost of the FUSED
band_frontend (VERDICT r3 weak #3: isolated substage timings summed to
24.5 ms while the composed frontend cost 107.4 ms and 77% was an
unexplained "fusion residual").

Method: time jitted PREFIXES of the real composed dataflow
(gray -> crop -> det pyramid -> nms -> refine -> lap+orient -> describe
-> match); the difference between consecutive prefixes is the marginal
cost of that stage AS COMPOSED (including any rematerialization XLA
schedules across fusion boundaries). Every scanned body depends on the
loop index through a runtime-zero perturbation of the input images, so
XLA cannot hoist the computation out of the timing loop — the round-3
isolated profile let it (several substages timed at ~0 ms), which is
where the phantom residual came from.

Run ALONE on the TPU. Usage: python scripts/profile_composed.py [batch]
(default 4). Writes FRONTEND_PROFILE_r04.json.
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

REPS = 12


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

    # ---- the composed dataflow, cut at `stop` ----
    pitch_list = cfg.frontend.band_pitches_deg
    nz_rad = jnp.deg2rad(
        jnp.asarray([p for p in pitch_list if p != 0.0], jnp.float32)
    )
    pitches = jnp.deg2rad(jnp.asarray(pitch_list, jnp.float32))
    k = cfg.surf.max_keypoints
    nb = len(pitch_list)

    def crop_all(g):
        warped = jax.vmap(
            lambda p: warp.crop_rotated_band(g, p, cfg.frontend.resample_mode)
        )(nz_rad)
        r0 = 3 * h // 8
        outs, wi = [], 0
        for p in pitch_list:
            if p == 0.0:
                outs.append(g[r0 : r0 + h // 4])
            else:
                outs.append(warped[wi])
                wi += 1
        return jnp.stack(outs)

    def prefix(iml, imr, stop):
        gray = jax.vmap(integral.rgb_to_gray)(jnp.concatenate([iml, imr]))
        if stop == "1_gray":
            return gray
        bands = jax.vmap(crop_all)(gray)  # (2B, nb, H/4, W)
        bflat = bands.reshape(-1, h // 4, w)
        if stop == "2_crop":
            return bflat

        def upto_det(g):
            return tuple(surf._det_maps_per_octave(g, cfg.surf))

        if stop == "3_det_pyramid":
            return jax.vmap(upto_det)(bflat)

        def upto_nms(g):
            det = surf._det_maps_per_octave(g, cfg.surf)
            return tuple(surf._nms_candidates(det, cfg.surf))

        if stop == "4_nms":
            return jax.vmap(upto_nms)(bflat)

        def upto_refine(g):
            det = surf._det_maps_per_octave(g, cfg.surf)
            cand = surf._nms_candidates(det, cfg.surf)
            return surf._refine_and_pack(g.shape, det, cand, cfg.surf)

        if stop == "5_refine_topk":
            return jax.vmap(upto_refine)(bflat)

        def upto_detect(g):
            return surf.detect(g, cfg.surf)

        if stop == "6_detect(lap+orient)":
            return jax.vmap(upto_detect)(bflat)

        def upto_desc(g):
            kp = surf.detect(g, cfg.surf)
            return kp, surf.describe(g, kp, cfg.surf)

        if stop == "7_describe":
            return jax.vmap(upto_desc)(bflat)
        raise ValueError(stop)

    out = {}

    def stage(label, body):
        @jax.jit
        def run(x):
            def sbody(c, i):
                # runtime-zero, index-dependent perturbation: defeats
                # loop-invariant code motion without changing the math
                eps = x * (i.astype(jnp.float32) + 1.0)
                return c + _sum_tree(body(im_l + eps, im_r + eps)), None

            c, _ = jax.lax.scan(sbody, jnp.float32(0.0), jnp.arange(REPS))
            return c

        jax.block_until_ready(run(jnp.float32(0.0)))
        t = max((med(run, jnp.float32(0.0)) - rtt) / REPS, 1e-9)
        out[label] = {"ms_per_batch": t * 1e3, "ms_per_pair": t / batch * 1e3}
        print(f"{label}: {t*1e3:.2f} ms/batch", file=sys.stderr, flush=True)

    for stop in (
        "1_gray",
        "2_crop",
        "3_det_pyramid",
        "4_nms",
        "5_refine_topk",
        "6_detect(lap+orient)",
        "7_describe",
    ):
        stage(stop, lambda a, b, s=stop: prefix(a, b, s))

    front = jax.vmap(partial(fe.band_frontend, cfg=cfg))
    stage("8_full_band_frontend", lambda a, b: front(a, b))

    # marginal (composed) costs
    labels = list(out.keys())
    marg = {}
    prev = 0.0
    for lbl in labels:
        cur = out[lbl]["ms_per_batch"]
        marg[lbl] = round(cur - prev, 3)
        prev = cur

    summary = {
        "batch": batch,
        "height": h,
        "width": w,
        "device": jax.devices()[0].device_kind,
        "backend": jax.default_backend(),
        "reps": REPS,
        "method": "composed cumulative prefixes, index-dependent inputs "
                  "(no loop-invariant hoisting)",
        "prefix_ms": {l: round(s["ms_per_batch"], 3) for l, s in out.items()},
        "marginal_ms": marg,
        "full_ms": out["8_full_band_frontend"]["ms_per_batch"],
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "FRONTEND_PROFILE_r04.json",
    )
    with open(path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary["marginal_ms"], indent=1))


if __name__ == "__main__":
    main()
