"""Weak-scaling measurement of the distributed multi-keyframe Schur BA on
a virtual device mesh -> SCALING_r02.json.

BASELINE.md's north-star target is >=0.8 scaling efficiency on the sharded
Schur solve. Real multi-chip hardware is not reachable from this
environment, so this measures the SAME program on N in {1,2,4,8} virtual
CPU devices (XLA_FLAGS=--xla_force_host_platform_device_count): identical
shardings, identical psum schedule, wall-clock indicative only (the host
has 2 physical cores, so >=2 virtual devices oversubscribe and wall time
reflects serialization, not the collective cost a TPU pod would see).
The analytically exact part — per-device collective payload per LM
iteration — is recorded alongside (O(C) for the matrix-free PCG path vs
O(C^2) dense; see parallel.dist_ba.collective_bytes_per_gn_iter).

Protocol per N: fixed per-device landmark shard L0 (weak scaling: total
L = N*L0), C cameras replicated, pcg linear solver with a fixed CG budget.
Ideal weak scaling keeps wall time constant; efficiency = t(1)/t(N).

Run ALONE (CPU-bound; don't overlap with pytest or TPU benches):
    python scripts/measure_scaling.py
"""

import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

# The axon TPU plugin re-asserts JAX_PLATFORMS during import; this config
# update is the only reliable CPU pin (CLAUDE.md).
jax.config.update("jax_platforms", "cpu")

L0 = 2048       # landmarks per device (weak-scaling constant)
C = 128         # cameras (replicated; psum payload is O(C))
P_OBS = 4       # observations per landmark
NUM_ITERS = 5   # LM iterations
CG_ITERS = 25   # fixed CG budget per GN step
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "SCALING_r02.json")


def build_problem(L, seed=0):
    import jax.numpy as jnp
    from spherical_bundle_adjuster_tpu.models import multiview as mv

    rng = np.random.default_rng(seed)
    aa = rng.uniform(-0.05, 0.05, (C, 3))
    t = rng.uniform(-0.3, 0.3, (C, 3))
    aa[0] = 0
    t[0] = 0
    poses = jnp.asarray(np.concatenate([aa, t], -1), jnp.float32)
    X = rng.normal(size=(L, 3)).astype(np.float32)
    X = X / np.linalg.norm(X, axis=-1, keepdims=True) * rng.uniform(3, 8, (L, 1))
    obs_cam = np.stack(
        [rng.choice(C, P_OBS, replace=False) for _ in range(L)]
    ).astype(np.int32)
    p = mv.transform_point(poses[obs_cam], jnp.asarray(X)[:, None, :])
    bear = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
    noisy = jnp.asarray(X + rng.normal(size=(L, 3)).astype(np.float32) * 0.05)
    return mv.MultiViewProblem(
        poses=poses,
        landmarks=noisy,
        obs_cam=jnp.asarray(obs_cam),
        obs_bearing=bear,
        obs_valid=jnp.ones((L, P_OBS), bool),
        lm_valid=jnp.ones((L,), bool),
    )


def time_solve(n_dev):
    import jax
    from spherical_bundle_adjuster_tpu.parallel import dist_ba, mesh as mesh_lib

    mesh = mesh_lib.make_mesh(n_dev)
    prob = build_problem(L0 * n_dev, seed=n_dev)

    def run():
        return dist_ba.solve_multiview_sharded(
            prob, mesh, num_iters=NUM_ITERS, linear_solver="pcg",
            cg_iters=CG_ITERS,
        )

    solved, costs = run()  # compile + warm
    jax.block_until_ready(costs)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _, costs = run()
        jax.block_until_ready(costs)
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts))
    return {
        "n_devices": n_dev,
        "landmarks_total": L0 * n_dev,
        "landmarks_per_device": L0,
        "cameras": C,
        "solve_wall_s": t,
        "landmarks_per_s_total": L0 * n_dev * NUM_ITERS / t,
        "cost_first": float(np.asarray(costs)[0]),
        "cost_last": float(np.asarray(costs)[-1]),
        "collective_bytes_per_lm_iter_per_device": dist_ba.collective_bytes_per_gn_iter(
            C, "pcg", CG_ITERS
        ),
        "collective_bytes_per_lm_iter_dense_equiv": dist_ba.collective_bytes_per_gn_iter(
            C, "dense"
        ),
    }


def main():
    import jax

    assert jax.device_count() >= 8, jax.devices()
    rows = []
    for n in (1, 2, 4, 8):
        r = time_solve(n)
        print(f"N={n}: {r['solve_wall_s']:.3f}s "
              f"({r['landmarks_per_s_total']:.0f} lm/s total), "
              f"psum {r['collective_bytes_per_lm_iter_per_device']/1e3:.1f} KB/iter/dev",
              flush=True)
        rows.append(r)

    t1 = rows[0]["solve_wall_s"]
    for r in rows:
        r["weak_scaling_efficiency_wallclock"] = t1 / r["solve_wall_s"]

    out = {
        "workload": (
            f"multi-keyframe Schur BA, weak scaling: L0={L0} landmarks/device, "
            f"C={C} cameras, P={P_OBS} obs/landmark, {NUM_ITERS} LM iters, "
            f"matrix-free PCG (cg_iters={CG_ITERS}), landmark axis sharded, "
            "camera aggregates psum-reduced"
        ),
        "caveat": (
            "virtual CPU devices on a 2-core host: wall-clock reflects core "
            "oversubscription, not interconnect cost — the collective-bytes "
            "column is the hardware-independent part. On a TPU pod the psum "
            "payload (O(C) per CG iteration, ~KBs) is negligible vs the "
            "O(L0*P) per-device marginalization work, which is what >=0.8 "
            "weak-scaling efficiency requires."
        ),
        "entries": rows,
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
