"""Does the approx top-k capacity cut cost accuracy on TPU?

EXP_HARDPAIR_r03 showed the corrected-mode hard pair (seed 43 / pair 7,
2.32 deg) is invariant to every solver variant, while the identical pair
solves to 0.77 deg on CPU — where the only pipeline difference is
topk_mode auto resolving to exact (CPU) vs approx_max_k recall 0.95
(TPU). This measures the 16-pair corrected accuracy AND the headline
throughput with exact vs approx top-k on TPU, so the topk default is a
measured accuracy/speed tradeoff.

Writes EXP_TOPK_ACC_r03.json. Run ALONE on the TPU.
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

    timer = bench.Timer()
    cfg0 = bench.bench_config()
    out = {}
    for name in ("approx", "exact"):
        cfg = dataclasses.replace(
            cfg0,
            surf=dataclasses.replace(cfg0.surf, topk_mode=name if name != "approx" else "auto"),
            ba=dataclasses.replace(
                cfg0.ba, reference_compat=False, joint_refine=True,
                outlier_reject=True, multi_start=4,
            ),
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

        # headline-point throughput with this topk mode (batch 1)
        pt = bench.measure_point(timer, 1, bench.BENCH_H, bench.BENCH_W,
                                 reps=16, cfg=dataclasses.replace(
                                     cfg0, surf=cfg.surf), n=2)
        out[name] = {
            "rot_err_deg": [round(float(x), 4) for x in errs],
            "median": float(np.median(errs)),
            "p90": float(np.percentile(errs, 90)),
            "max": float(np.max(errs)),
            "pairs_per_s": pt["pairs_per_s"],
        }
        print(f"[topk_acc] {name}: med={out[name]['median']:.3f} "
              f"max={out[name]['max']:.3f} {pt['pairs_per_s']:.1f} pairs/s",
              file=sys.stderr, flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "EXP_TOPK_ACC_r03.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != "rot_err_deg"}
                      for k, v in out.items()}, indent=1))


if __name__ == "__main__":
    main()
