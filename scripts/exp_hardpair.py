"""Corrected-mode hard-pair experiment (VERDICT r2 weak #4 follow-up).

CALIBRATION_r03.json shows corrected-mode accuracy is deterministic with
exactly one hard pair (seed 43 / pair 7, 2.32 deg; every other pair
<= 0.49). This sweeps solver variants on the SAME 16 bench-accuracy pairs
to see which (if any) fixes the hard pair without hurting the rest:

  base          multi_start=4, scoring=trimmed_mode   (shipped)
  inlier        multi_start=4, scoring=inlier_count
  ms8           multi_start=8, scoring=trimmed_mode
  inlier_ms8    multi_start=8, scoring=inlier_count

Writes EXP_HARDPAIR_r03.json. Run ALONE on the TPU.
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

    cfg0 = bench.bench_config()
    base_ba = dataclasses.replace(
        cfg0.ba, reference_compat=False, joint_refine=True,
        outlier_reject=True, multi_start=4,
    )
    variants = {
        "base": (base_ba, "trimmed_mode"),
        "inlier": (base_ba, "inlier_count"),
        "ms8": (dataclasses.replace(base_ba, multi_start=8), "trimmed_mode"),
        "inlier_ms8": (dataclasses.replace(base_ba, multi_start=8),
                       "inlier_count"),
    }

    out = {}
    for name, (ba, scoring) in variants.items():
        cfg = dataclasses.replace(
            cfg0, ba=ba,
            ransac=dataclasses.replace(cfg0.ransac, scoring=scoring),
        )
        errs = []
        for seed in bench.ACC_SEEDS:
            im_l, im_r, eulers = bench.make_batch_gt(
                bench.ACC_PAIRS_PER_SEED, bench.BENCH_H, bench.BENCH_W,
                seed=seed,
            )
            jax.block_until_ready((im_l, im_r))
            Rs = jax.vmap(rotation.euler_to_matrix)(eulers)
            keys = jax.random.split(
                jax.random.PRNGKey(seed + 1), bench.ACC_PAIRS_PER_SEED
            )
            step = jax.jit(jax.vmap(
                partial(twoview.run_two_view, cfg=cfg, frontend="band")))
            res = step(im_l, im_r, keys)
            R_rec = jax.vmap(rotation.angle_axis_to_matrix)(res.rotation_aa)
            tr = jnp.einsum("bij,bij->b", R_rec, Rs)
            errs += list(np.rad2deg(np.arccos(np.clip(
                (np.asarray(tr) - 1) / 2, -1, 1))))
        errs = np.asarray(errs)
        out[name] = {
            "rot_err_deg": [round(float(x), 4) for x in errs],
            "median": float(np.median(errs)),
            "max": float(np.max(errs)),
            "hard_pair_idx7": round(float(errs[7]), 4),
        }
        print(f"[hardpair] {name}: med={out[name]['median']:.3f} "
              f"max={out[name]['max']:.3f} pair7={errs[7]:.3f}",
              file=sys.stderr, flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "EXP_HARDPAIR_r03.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
