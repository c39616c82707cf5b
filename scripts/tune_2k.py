"""2K-workload characterization (BASELINE.md config #1, the reference's
actual workload: one 1024x2048 ERP pair — main.cpp:8-33).

Round 2 measured the 2K point with the 512-tuned SurfConfig and got
15 matches/pair (under-provisioned capacity at 4x the pixels, VERDICT
missing #3). This sweeps capacity/octave variants at 2K, measuring match
quality (outlier%@2deg, trimmed err) + corrected/compat rot err + TPU
throughput per variant, and writes TUNE_2K_r03.json so the chosen bench
config has committed provenance.

Run ALONE on the TPU: python scripts/tune_2k.py
"""

import dataclasses
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

H2K, W2K = 1024, 2048
N_PAIRS = 4


def main():
    import bench
    from spherical_bundle_adjuster_tpu.core import rotation
    from spherical_bundle_adjuster_tpu.models import evaluation, twoview
    from spherical_bundle_adjuster_tpu.utils.config import (
        MatchConfig, PipelineConfig, SurfConfig,
    )

    timer = bench.Timer()
    print(f"(rtt {timer.rtt*1e3:.0f} ms)", file=sys.stderr)

    im_l, im_r, eulers = bench.make_batch_gt(N_PAIRS, H2K, W2K, seed=43)
    jax.block_until_ready((im_l, im_r))
    Rs = jax.vmap(rotation.euler_to_matrix)(eulers)
    keys = jax.random.split(jax.random.PRNGKey(44), N_PAIRS)

    variants = {
        "r2_current(k256,o3,m512)": PipelineConfig(
            surf=SurfConfig(max_keypoints=256, n_octaves=3),
            match=MatchConfig(max_matches=512, ratio_thresh=0.5),
        ),
        "k512,o3,m1024": PipelineConfig(
            surf=SurfConfig(max_keypoints=512, n_octaves=3),
            match=MatchConfig(max_matches=1024, ratio_thresh=0.5),
        ),
        "k512,o4,m1024": PipelineConfig(
            surf=SurfConfig(max_keypoints=512, n_octaves=4),
            match=MatchConfig(max_matches=1024, ratio_thresh=0.5),
        ),
        "k1024,o4,m1024": PipelineConfig(
            surf=SurfConfig(max_keypoints=1024, n_octaves=4),
            match=MatchConfig(max_matches=1024, ratio_thresh=0.5),
        ),
    }

    out = {}
    for name, cfg in variants.items():
        row = {}
        try:
            for mode, ba in (
                ("compat", cfg.ba),
                ("corrected", dataclasses.replace(
                    cfg.ba, reference_compat=False, joint_refine=True,
                    outlier_reject=True)),
            ):
                c = dataclasses.replace(cfg, ba=ba)
                step = jax.jit(jax.vmap(
                    partial(twoview.run_two_view, cfg=c, frontend="band")))
                res = step(im_l, im_r, keys)
                ev = jax.vmap(partial(
                    evaluation.evaluate_matches, width=W2K, height=H2K, cfg=c
                ))(bench._as_frontend_result(res), Rs)
                R_rec = jax.vmap(rotation.angle_axis_to_matrix)(res.rotation_aa)
                tr = jnp.einsum("bij,bij->b", R_rec, Rs)
                rot = np.rad2deg(np.arccos(np.clip(
                    (np.asarray(tr) - 1) / 2, -1, 1)))
                row[mode] = {
                    "matches": float(np.mean(np.asarray(ev.num_matches))),
                    "outlier_pct": float(np.mean(np.asarray(ev.outlier_pct))),
                    "trim_err_deg": float(np.rad2deg(np.mean(np.asarray(
                        ev.trimmed_mean_err_rad)))),
                    "rot_err_deg_median": float(np.median(rot)),
                    "rot_err_deg_max": float(np.max(rot)),
                }
            # throughput: single 2K pair (x = anti-hoisting runtime zero)
            def body(i, x):
                eps = x * (i.astype(jnp.float32) + 1.0)
                o = jax.vmap(partial(
                    twoview.run_two_view, cfg=cfg, frontend="band"))(
                    im_l[:1] + eps, im_r[:1] + eps, keys[:1])
                return (o.rotation_aa, o.num_matches)
            per_iter, _ = timer.scan_time(body, reps=4, n=2)
            row["ms_per_pair"] = per_iter * 1e3
        except Exception as e:
            row["error"] = str(e).split("\n")[0][:300]
        out[name] = row
        print(f"[tune2k] {name}: {json.dumps(row)[:400]}", file=sys.stderr,
              flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "TUNE_2K_r03.json")
    with open(path, "w") as f:
        json.dump({"n_pairs": N_PAIRS, "variants": out}, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
