"""Front-end match-quality envelope vs rotation magnitude -> QUALITY.md.

VERDICT r1 #7: the SURF orientation dense-Haar radius quantization
(ops/surf.py) and coarse laplacian sign are documented approximations with
no recorded quality envelope. This sweeps GT yaw and pitch rotations over
{5, 15, 30, 60, 90} deg x 3 seeds at 512x1024 and records, per front-end
(erp / band / cubemap), the reference's own KPIs (test/feature_test.cpp:
102-121): match count, outlier% @ 2 deg, 10%-trimmed mean angular error.

Each (axis, angle) cell is vmapped over the 3 seeds — one compile per
front-end, reused across the whole grid. Runs on whatever backend is
default (TPU preferred; CPU works but slowly). Don't overlap with other
TPU/CPU jobs.

    python scripts/measure_quality.py [--size 512x1024] [--out QUALITY.md]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.makedirs(os.path.join(REPO, ".jax_cache"), exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))

import numpy as np

ANGLES = (5.0, 15.0, 30.0, 60.0, 90.0)
AXES = ("yaw", "pitch")
SEEDS = (11, 12, 13)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="512x1024")
    ap.add_argument("--out", default=os.path.join(REPO, "QUALITY.md"))
    ap.add_argument("--json", default=os.path.join(REPO, "QUALITY.json"))
    ap.add_argument("--frontends", default="erp,band,cubemap")
    args = ap.parse_args(argv)
    h, w = (int(x) for x in args.size.split("x"))

    import jax
    import jax.numpy as jnp
    from functools import partial

    from spherical_bundle_adjuster_tpu.core import rotation
    from spherical_bundle_adjuster_tpu.models import evaluation
    from spherical_bundle_adjuster_tpu.models.frontend import FRONTENDS
    from spherical_bundle_adjuster_tpu.utils import synthetic
    from spherical_bundle_adjuster_tpu.utils.config import (
        FrontendConfig,
        MatchConfig,
        PipelineConfig,
        SurfConfig,
    )

    from spherical_bundle_adjuster_tpu.utils.config import DENSE_BAND_PITCHES

    base_cfg = PipelineConfig(
        surf=SurfConfig(max_keypoints=256, n_octaves=3),
        match=MatchConfig(max_matches=512, ratio_thresh=0.5),
        frontend=FrontendConfig(cube_size=h // 2),
    )
    dense_cfg = PipelineConfig(
        surf=base_cfg.surf,
        match=base_cfg.match,
        frontend=FrontendConfig(cube_size=h // 2, band_pitches_deg=DENSE_BAND_PITCHES),
    )
    print(f"backend={jax.default_backend()} size={h}x{w}", flush=True)

    @partial(jax.jit, static_argnames=("fe_name", "cfg"))
    def cell(keys, euler, fe_name, cfg):
        """3-seed vmapped render + front-end + eval for one GT rotation."""
        R = rotation.euler_to_matrix(euler)

        def one(key):
            eye = jnp.eye(3, dtype=jnp.float32)
            left = synthetic.render_erp(key, eye, h, w)
            right = synthetic.render_erp(key, R.T, h, w)
            fr = FRONTENDS[fe_name](left, right, cfg)
            return evaluation.evaluate_matches(fr, R, w, h, cfg)

        return jax.vmap(one)(keys)

    keys = jnp.stack([jax.random.PRNGKey(s) for s in SEEDS])
    variants = [(n, n, base_cfg) for n in args.frontends.split(",")]
    variants.append(("band-dense", "band", dense_cfg))
    rows = []
    for label, fe_name, cfg in variants:
        for axis in AXES:
            for ang in ANGLES:
                euler_deg = {"yaw": [0.0, 0.0, ang], "pitch": [0.0, ang, 0.0]}[axis]
                ev = cell(keys, jnp.asarray(np.deg2rad(euler_deg), jnp.float32), fe_name, cfg)
                row = {
                    "frontend": label,
                    "axis": axis,
                    "angle_deg": ang,
                    "matches_mean": float(jnp.mean(ev.num_matches.astype(jnp.float32))),
                    "matches_min": int(jnp.min(ev.num_matches)),
                    "outlier_pct_mean": float(jnp.mean(ev.outlier_pct)),
                    "trim_err_deg_mean": float(jnp.rad2deg(jnp.mean(ev.trimmed_mean_err_rad))),
                    "total_keypoints_mean": float(
                        jnp.mean(ev.total_keypoints.astype(jnp.float32))
                    ),
                }
                rows.append(row)
                print(
                    f"{label:10s} {axis:5s} {ang:5.0f}deg: "
                    f"matches={row['matches_mean']:6.1f} (min {row['matches_min']:3d}) "
                    f"outlier%={row['outlier_pct_mean']:5.1f} "
                    f"trim_err={row['trim_err_deg_mean']:6.2f}deg",
                    flush=True,
                )

    with open(args.json, "w") as f:
        json.dump({"size": [h, w], "seeds": list(SEEDS), "cfg": "bench (kp=256, ratio=0.5)", "rows": rows}, f, indent=1)

    lines = [
        "# QUALITY — front-end match quality vs rotation magnitude",
        "",
        f"Synthetic pure-rotation ERP pairs at {h}x{w}, 3 seeds per cell, bench config",
        "(max_keypoints=256/band, n_octaves=3, ratio 0.5). KPIs per the reference's own",
        "eval (test/feature_test.cpp:102-121): matches, outlier% @ 2 deg, 10%-trimmed",
        "mean angular error. Produced by `scripts/measure_quality.py` (raw: QUALITY.json).",
        "",
        "## Findings",
        "",
        "* **Yaw** is handled well by every front-end at every angle (for the naive ERP",
        "  front-end yaw is a pure horizontal pixel shift, so it is the easy axis; 90°",
        "  cells are degenerate-easy for the same reason and inflate match counts).",
        "* **Intermediate pitch (15–60°) is the hard case**: with the reference's 45°",
        "  band ladder {45,0,−45,−90}, content at latitude ≈30° lies between band",
        "  centers, the two views see differently-distorted crops, and matches collapse",
        "  (26.7 → 4.0 between pitch 5° and 15°). Loosening the Lowe ratio recovers",
        "  count but not quality (ratio 0.7 @ pitch 30°: 28 matches, 40% outliers —",
        "  the descriptors are genuinely distant; see scripts/exp_pitch_cliff.py).",
        "* **Fix: the dense 22.5° ladder** (`config.DENSE_BAND_PITCHES`, 'band-dense'",
        "  rows below) keeps every latitude within 11.25° of a band center and removes",
        "  the cliff (pitch 30°: 23.7 matches, 10.6% outliers, 0.76° trimmed error at",
        "  the same ratio 0.5) for 2× front-end cost. The default stays the reference",
        "  ladder for parity + speed.",
        "* ERP and cubemap rows saturate their 256-keypoint capacity at this",
        "  resolution (the band front-end has 4–8 banks of 256); raise",
        "  `SurfConfig.max_keypoints` when using them standalone.",
        "",
        "| front-end | axis | angle | matches (mean/min) | outlier % | trimmed err (deg) |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['frontend']} | {r['axis']} | {r['angle_deg']:.0f}° "
            f"| {r['matches_mean']:.1f} / {r['matches_min']} "
            f"| {r['outlier_pct_mean']:.1f} | {r['trim_err_deg_mean']:.2f} |"
        )
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out} and {args.json}")


if __name__ == "__main__":
    main()
