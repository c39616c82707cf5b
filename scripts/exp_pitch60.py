"""Pitch-60 corrected-tail experiment (QUALITY.md "known tail"):
matches are good (24.8/pair, 5.8% outliers) but the corrected pose stops
2.0-3.2 deg off on every pair — a large-rotation solver tail. A/B the
solver variants over 8 pitch-60 pairs to locate it:

  base        — production corrected mode (multi_start=4, trimmed_mode)
  inliers     — RANSAC scoring="inlier_count" (data-contact winner)
  ms8         — multi_start=8
  bcd3        — bcd_rounds=3
  trials240   — 240 RANSAC trials (3x candidate pool)
  gate_off    — outlier_reject=False (is the gate eating good matches?)

Writes EXP_PITCH60_r04.json. Run on TPU, alone.
"""

import dataclasses
import json
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    import bench
    from spherical_bundle_adjuster_tpu.core import rotation
    from spherical_bundle_adjuster_tpu.models import twoview
    from spherical_bundle_adjuster_tpu.utils import synthetic
    from spherical_bundle_adjuster_tpu.utils.config import FrontendConfig

    n = 8
    h, w = bench.BENCH_H, bench.BENCH_W
    base_cfg = dataclasses.replace(bench.bench_config(), frontend=FrontendConfig())
    corrected = dataclasses.replace(
        base_cfg,
        ba=dataclasses.replace(
            base_cfg.ba, reference_compat=False, joint_refine=True,
            outlier_reject=True, multi_start=4),
    )

    rng = np.random.default_rng(77)
    eulers = np.stack(
        [rng.uniform(-3, 3, n), 60.0 + rng.uniform(-1.5, 1.5, n),
         rng.uniform(-3, 3, n)], axis=1)
    eul = jnp.asarray(np.deg2rad(eulers), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(137), n)
    Rs = jax.vmap(rotation.euler_to_matrix)(eul)
    lefts = jax.vmap(lambda k: synthetic.render_erp(k, jnp.eye(3), h, w))(keys)
    rights = jax.vmap(lambda k, R: synthetic.render_erp(k, R.T, h, w))(keys, Rs)
    jax.block_until_ready((lefts, rights))

    def variant(name, cfg):
        step = jax.jit(jax.vmap(partial(twoview.run_two_view, cfg=cfg, frontend="band")))
        res = step(lefts, rights, jax.random.split(jax.random.PRNGKey(3), n))
        R_rec = jax.vmap(rotation.angle_axis_to_matrix)(res.rotation_aa)
        tr = jnp.einsum("bij,bij->b", R_rec, Rs)
        errs = np.rad2deg(np.arccos(np.clip((np.asarray(tr) - 1) / 2, -1, 1)))
        row = {
            "rot_err_deg": [round(float(e), 3) for e in errs],
            "median": float(np.median(errs)),
            "max": float(np.max(errs)),
            "mean_matches": float(np.mean(np.asarray(res.num_matches))),
        }
        print(f"[exp60] {name}: med {row['median']:.2f} max {row['max']:.2f} "
              f"matches {row['mean_matches']:.1f}", file=sys.stderr, flush=True)
        return row

    ba = corrected.ba
    out = {"n_pairs": n, "pitch_deg": 60.0, "variants": {}}
    out["variants"]["base"] = variant("base", corrected)
    out["variants"]["inliers"] = variant(
        "inliers",
        dataclasses.replace(
            corrected,
            ransac=dataclasses.replace(corrected.ransac, scoring="inlier_count")),
    )
    out["variants"]["ms8"] = variant(
        "ms8", dataclasses.replace(corrected, ba=dataclasses.replace(ba, multi_start=8)))
    out["variants"]["bcd3"] = variant(
        "bcd3", dataclasses.replace(corrected, ba=dataclasses.replace(ba, bcd_rounds=3)))
    out["variants"]["trials240"] = variant(
        "trials240",
        dataclasses.replace(
            corrected,
            ransac=dataclasses.replace(corrected.ransac, num_trials=240)),
    )
    out["variants"]["gate_off"] = variant(
        "gate_off",
        dataclasses.replace(corrected, ba=dataclasses.replace(ba, outlier_reject=False)),
    )

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "EXP_PITCH60_r04.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: (v["median"], v["max"]) for k, v in out["variants"].items()}))


if __name__ == "__main__":
    main()
