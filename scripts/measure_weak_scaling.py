"""2-process weak-scaling efficiency, measured across a REAL process
boundary (VERDICT r4 #7 / missing #2).

The ≥0.8 multi-host scaling-efficiency target (BASELINE.md) previously
rested on single-process virtual-device wall clocks (SCALING_r02, noisy
on this oversubscribed 2-vCPU host) plus the analytic collective-bytes
argument. This script measures the one process-boundary scaling number
this host can produce honestly:

  * baseline:  1 process pinned to core 0 (taskset), 1 CPU device,
               L landmarks.
  * scaled:    2 processes pinned to cores 0 and 1, jax.distributed
               coordinator, (2 proc x 1 dev) global mesh, 2L landmarks
               sharded so each process holds L — the SAME per-process
               load; the psum/all_gather in each GN step crosses the
               process boundary (gRPC — the DCN stand-in).

Weak-scaling efficiency = T_baseline / T_scaled (1.0 = perfect; the
scaled run adds only collective cost). Compile time is excluded (warm
call first); each timed measurement is the median of `TIMED_REPS` full
solves. Writes SCALING_r05.json with the efficiency plus the analytic
per-iteration collective-bytes table for the same problem.

Usage:
  python scripts/measure_weak_scaling.py          # parent/orchestrator
  python scripts/measure_weak_scaling.py single   # internal
  python scripts/measure_weak_scaling.py <pid> 2  # internal
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

PORT = 12799
RESULT_1 = "/tmp/ws_single.json"
RESULT_2 = "/tmp/ws_multi.json"
C = 16
L_PER_PROC = 2048
P_OBS = 4
ITERS = 8
TIMED_REPS = 3


def build_problem(l_total, seed=3):
    from test_multiview import synth_problem

    return synth_problem(C=C, L=l_total, P=P_OBS, noise=0.0,
                         pose_noise=0.05, seed=seed)[0]


def solve_timed(prob, mesh_devices):
    import jax
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from spherical_bundle_adjuster_tpu.parallel import dist_ba

    mesh = Mesh(np.asarray(mesh_devices), ("data",))
    lm_sharding = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    def globalize(x, sharding):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])

    gprob = prob._replace(
        poses=globalize(prob.poses, rep),
        landmarks=globalize(prob.landmarks, lm_sharding),
        obs_cam=globalize(prob.obs_cam, lm_sharding),
        obs_bearing=globalize(prob.obs_bearing, lm_sharding),
        obs_valid=globalize(prob.obs_valid, lm_sharding),
        lm_valid=globalize(prob.lm_valid, lm_sharding),
    )

    def run():
        solved, costs = dist_ba.solve_multiview_sharded(
            gprob, mesh, num_iters=ITERS, linear_solver="pcg"
        )
        jax.block_until_ready((solved.poses, costs))
        return costs

    costs = run()  # compile + warm
    ts = []
    for _ in range(TIMED_REPS):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    import numpy as np

    return float(np.median(ts)), float(np.asarray(costs)[-1])


def single():
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) == 1, jax.devices()
    prob = build_problem(L_PER_PROC)
    wall, cost = solve_timed(prob, jax.devices())
    with open(RESULT_1, "w") as f:
        json.dump({"wall_s": wall, "final_cost": cost}, f)


def child(pid, n_procs):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=n_procs,
        process_id=pid,
        local_device_ids=[0],
    )
    assert jax.process_count() == n_procs
    assert len(jax.devices()) == n_procs
    prob = build_problem(n_procs * L_PER_PROC)
    wall, cost = solve_timed(prob, jax.devices())
    if pid == 0:
        with open(RESULT_2, "w") as f:
            json.dump(
                {"wall_s": wall, "final_cost": cost,
                 "process_count": jax.process_count()}, f
            )
    jax.distributed.shutdown()


def parent():
    for p in (RESULT_1, RESULT_2):
        if os.path.exists(p):
            os.remove(p)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # exactly 1 CPU device per process

    # baseline: 1 process on core 0
    rc = subprocess.call(
        ["taskset", "-c", "0", sys.executable, os.path.abspath(__file__),
         "single"],
        env=env,
    )
    assert rc == 0
    # scaled: 2 processes, cores 0 and 1, shared coordinator
    procs = [
        subprocess.Popen(
            ["taskset", "-c", str(pid), sys.executable,
             os.path.abspath(__file__), str(pid), "2"],
            env=env,
        )
        for pid in range(2)
    ]
    rcs = [p.wait(timeout=1800) for p in procs]
    assert all(rc == 0 for rc in rcs), rcs

    with open(RESULT_1) as f:
        one = json.load(f)
    with open(RESULT_2) as f:
        two = json.load(f)
    eff = one["wall_s"] / two["wall_s"]

    # analytic collective volume for the scaled problem (dist_ba's table)
    from spherical_bundle_adjuster_tpu.parallel import dist_ba

    coll = dist_ba.collective_bytes_per_gn_iter(C, linear_solver="pcg")

    rec = {
        "what": "weak scaling across a real process boundary: fixed "
                f"per-process load (C={C}, L={L_PER_PROC}/proc, P={P_OBS}, "
                f"{ITERS} GN iters, pcg), 1 proc x 1 core vs 2 proc x 1 "
                "core (taskset-pinned, no oversubscription)",
        "baseline_1proc_wall_s": one["wall_s"],
        "scaled_2proc_wall_s": two["wall_s"],
        "weak_scaling_efficiency": round(eff, 4),
        "final_cost_1proc": one["final_cost"],
        "final_cost_2proc": two["final_cost"],
        "timed_reps": TIMED_REPS,
        "collective_bytes_per_gn_iter_scaled": coll,
    }
    path = os.path.join(REPO, "SCALING_r05.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))
    assert eff >= 0.8, f"weak-scaling efficiency {eff:.3f} < 0.8"


if __name__ == "__main__":
    if len(sys.argv) == 1:
        parent()
    elif sys.argv[1] == "single":
        single()
    else:
        child(int(sys.argv[1]), int(sys.argv[2]))
