"""Round-5 accuracy refresh + compat-tail adjudication (VERDICT r4 #3/#4).

Runs on the live backend (TPU under axon):
  1. bench.measure_accuracy (512x1024, 16 pairs, compat + corrected) with
     the r5 code (Kabsch rotation start in corrected multi-start).
  2. bench.measure_pitch_cells (the pitch {15, 30, 60} cells, corrected
     auto-ladder default) — the regime VERDICT r4 #3 targets.
  3. Adjudication (VERDICT r4 #4): the K worst compat pairs are fed to the
     f64 native oracle (csrc/sba_native.cpp) in two regimes:
       * same-init — oracle BCD seeded with the pipeline's own consensus
         init (negated-Euler quirk applied, d0 = 1): does the reference-
         convention solver land in the same basin / at the same error?
       * independent — oracle full-set 8-point + oracle BCD: the
         reference's own init convention minus its unseeded shuffle.
     If the oracle reproduces the multi-degree tail from the same init,
     the tail is reference-faithful (compat parity by construction) and
     the gate can be set to measured + headroom; if not, the pipeline
     diverges from the reference and needs fixing.

Writes ACC_r05.json (accuracy + cells) and ADJUDICATION_r05.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench  # noqa: E402  (sets the compilation cache dir)


def _aa_to_matrix(v):
    v = np.asarray(v, np.float64)
    th = np.linalg.norm(v)
    if th < 1e-12:
        return np.eye(3)
    k = v / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def _pixel_to_bearing(xy, w, h):
    """C8 lifting in f64 (spherical_bundle_adjuster.cpp:276-298)."""
    phi = 2.0 * np.pi * xy[:, 0] / w
    th = np.pi * xy[:, 1] / h
    return np.stack(
        [np.sin(th) * np.cos(phi), np.sin(th) * np.sin(phi), np.cos(th)], -1
    )


def geodesic_deg(R1, R2):
    return float(
        np.degrees(
            np.arccos(np.clip((np.trace(R1.T @ R2) - 1) / 2, -1, 1))
        )
    )


def main():
    import jax
    from functools import partial
    import jax.numpy as jnp
    from spherical_bundle_adjuster_tpu.core import rotation
    from spherical_bundle_adjuster_tpu.models import twoview
    from spherical_bundle_adjuster_tpu.utils import native

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    print(f"[adjudicate] backend={jax.default_backend()}", flush=True)

    out = {"backend": jax.default_backend()}

    # --- 1+2: the bench's own accuracy sections, with r5 code -----------
    acc = bench.measure_accuracy()
    out["accuracy"] = acc
    cells = bench.measure_pitch_cells()
    out["pitch_cells"] = cells
    with open(os.path.join(here, "ACC_r05.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("[adjudicate] wrote ACC_r05.json", flush=True)

    # --- 3: worst-compat-pair oracle adjudication -----------------------
    cfg = bench.bench_config()
    h, w = bench.BENCH_H, bench.BENCH_W
    step = jax.jit(
        jax.vmap(partial(twoview.run_two_view, cfg=cfg, frontend="band"))
    )
    pairs = []  # (err_deg, seed, idx, result-on-host, R_gt)
    for seed in bench.ACC_SEEDS:
        im_l, im_r, eulers = bench.make_batch_gt(
            bench.ACC_PAIRS_PER_SEED, h, w, seed=seed
        )
        keys = jax.random.split(
            jax.random.PRNGKey(seed + 1), bench.ACC_PAIRS_PER_SEED
        )
        res = step(im_l, im_r, keys)
        res = jax.tree.map(np.asarray, res)
        Rs = np.asarray(
            jax.vmap(rotation.euler_to_matrix)(jnp.asarray(eulers))
        )
        for i in range(bench.ACC_PAIRS_PER_SEED):
            R_rec = _aa_to_matrix(res.rotation_aa[i])
            err = geodesic_deg(R_rec, Rs[i])
            pairs.append((err, seed, i, jax.tree.map(lambda x: x[i], res), Rs[i]))
    pairs.sort(key=lambda p: -p[0])

    K = 4
    rows = []
    for err, seed, i, r, R_gt in pairs[:K]:
        mv = r.match_valid.astype(bool)
        xy_l = r.left_xy[mv]
        xy_r = r.right_xy[mv]
        b1 = _pixel_to_bearing(xy_l, w, h)
        b2 = _pixel_to_bearing(xy_r, w, h)
        n = b1.shape[0]
        row = {
            "seed": int(seed),
            "pair": int(i),
            "n_matches": int(n),
            "pipeline_err_deg": round(err, 3),
            "init_euler": [float(x) for x in r.initial_euler],
        }
        # same-init: the pipeline's consensus init through the oracle BCD
        rot0 = -np.asarray(r.initial_euler, np.float64)  # negated-Euler quirk
        t0 = np.asarray(r.initial_translation, np.float64)
        d0 = np.ones((n, 2))
        ro, to, _ = native.oracle_bcd(b1, b2, rot0, t0, d0, iters=50, compat=True)
        R_or = _aa_to_matrix(ro)
        row["oracle_same_init_err_deg"] = round(geodesic_deg(R_or, R_gt), 3)
        row["oracle_vs_pipeline_deg"] = round(
            geodesic_deg(R_or, _aa_to_matrix(r.rotation_aa)), 3
        )
        # independent: oracle full-set 8-point init + oracle BCD
        e1, e2, t_o, v1, v2 = native.oracle_eight_point(b1, b2)
        e_init = e1 if v1 else e2
        if v1 or v2:
            ro2, _, _ = native.oracle_bcd(
                b1, b2, -np.asarray(e_init, np.float64), t_o, np.ones((n, 2)),
                iters=50, compat=True,
            )
            row["oracle_indep_err_deg"] = round(
                geodesic_deg(_aa_to_matrix(ro2), R_gt), 3
            )
        else:
            row["oracle_indep_err_deg"] = None
        rows.append(row)
        print(f"[adjudicate] {row}", flush=True)

    adj = {
        "method": "worst compat pairs -> f64 oracle BCD, same-init + independent",
        "compat_median_err_deg": float(
            np.median([p[0] for p in pairs])
        ),
        "compat_max_err_deg": float(pairs[0][0]),
        "worst_pairs": rows,
    }
    with open(os.path.join(here, "ADJUDICATION_r05.json"), "w") as f:
        json.dump(adj, f, indent=1)
    print("[adjudicate] wrote ADJUDICATION_r05.json", flush=True)
    print(json.dumps({"ok": True, "compat_max": adj["compat_max_err_deg"]}))


if __name__ == "__main__":
    main()
