"""One-time measurement of the host-CPU single-pair throughput for the
bench workload; frozen into BASELINE_FROZEN.json as the reference-class
CPU figure (the reference publishes no numbers, SURVEY.md §6 — this is
the same full pipeline executed on CPU, the reference's platform)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The session's axon plugin overrides JAX_PLATFORMS at import time;
# jax.config.update is the only reliable CPU pin (see tests/conftest.py).
import jax

jax.config.update("jax_platforms", "cpu")

import bench

assert jax.default_backend() == "cpu", jax.default_backend()
res = bench.run_bench(batch=1, reps=2)
out = {
    "cpu_pairs_per_s": res["pairs_per_s"],
    "workload": f"two-view BA {bench.BENCH_H}x{bench.BENCH_W} ERP, full pipeline",
    "host": "2-vCPU container (bench-time host)",
    "detail": res,
}
with open(bench.FROZEN, "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out))
