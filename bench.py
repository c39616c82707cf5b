"""Benchmark: end-to-end two-view spherical BA throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload (BASELINE.md config #2): a batch of independent synthetic ERP
pairs, full pipeline per pair (band front-end SURF detect/describe ->
descriptor matching -> 80-trial consensus 8-point -> 3-stage BCD bundle
adjustment), vmapped on the accelerator.

vs_baseline compares against the frozen single-pair CPU figure in
BASELINE_FROZEN.json (the reference is a CPU/OpenMP tool with no published
numbers — SURVEY.md §6; the frozen figure is this same workload measured
on the host CPU, our stand-in for the reference-class implementation).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# persistent compilation cache: repeat bench runs skip the (sometimes
# very slow) remote compile service
os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"), exist_ok=True)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

BENCH_H, BENCH_W = 512, 1024
BATCH = 4
FROZEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_FROZEN.json")


def bench_config():
    from spherical_bundle_adjuster_tpu.utils.config import (
        MatchConfig,
        PipelineConfig,
        SurfConfig,
    )

    return PipelineConfig(
        surf=SurfConfig(max_keypoints=256, n_octaves=3),
        match=MatchConfig(max_matches=512, ratio_thresh=0.5),
    )


def make_batch(batch):
    import jax
    from spherical_bundle_adjuster_tpu.utils import synthetic

    keys = jax.random.split(jax.random.PRNGKey(42), batch)
    eulers = np.deg2rad(
        np.stack(
            [
                np.random.default_rng(1).uniform(-5, 5, (batch, 3))[i]
                for i in range(batch)
            ]
        )
    )
    lefts, rights = [], []
    for i in range(batch):
        l, r, _ = synthetic.rotation_pair(
            keys[i], eulers[i], height=BENCH_H, width=BENCH_W
        )
        lefts.append(l)
        rights.append(r)
    import jax.numpy as jnp

    return jnp.stack(lefts), jnp.stack(rights)


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def run_bench(batch=BATCH, reps=24):
    """Measure device throughput with dispatch-latency calibration.

    The RPC dispatch latency of remote/tunneled TPU backends (tens to
    hundreds of ms, highly variable) dwarfs the per-batch device time, so
    a per-call timer measures the network, not the chip. The pipeline runs
    `reps` times inside ONE dispatch (lax.scan over fresh PRNG keys); the
    dispatch round trip is measured separately with a trivial program and
    subtracted. One heavy compile total (the compile service can be slow),
    backed by a persistent compilation cache under .jax_cache/.
    """
    import jax
    import jax.numpy as jnp
    from functools import partial

    from spherical_bundle_adjuster_tpu.models import twoview

    cfg = bench_config()
    _log(f"backend={jax.default_backend()} rendering batch={batch}")
    im_l, im_r = make_batch(batch)
    jax.block_until_ready((im_l, im_r))
    _log("rendered; compiling pipeline")

    step = jax.vmap(partial(twoview.run_two_view, cfg=cfg, frontend="band"))

    @jax.jit
    def run(keys):
        def body(carry, ks):
            out = step(im_l, im_r, ks)
            acc = (
                carry[0] + jnp.sum(out.rotation_aa) + jnp.sum(out.translation),
                carry[1] + jnp.sum(out.num_matches),
            )
            return acc, None

        acc, _ = jax.lax.scan(body, (jnp.float32(0.0), jnp.int32(0)), keys)
        return acc

    def keys_for(salt):
        return jax.random.split(jax.random.PRNGKey(salt), reps * batch).reshape(
            reps, batch, -1
        )

    jax.block_until_ready(run(keys_for(1)))
    _log("compiled; timing")

    @jax.jit
    def tiny(x):
        return x + 1.0

    jax.block_until_ready(tiny(jnp.float32(0.0)))

    def med(f, arg, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(f(arg))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    rtt = med(tiny, jnp.float32(1.0))
    ks = keys_for(2)
    jax.block_until_ready(ks)
    t_total = med(run, ks)
    _log(f"rtt={rtt:.3f}s t_scan({reps})={t_total:.3f}s")

    per_batch = max((t_total - rtt) / reps, 1e-9)
    pairs_per_s = batch / per_batch
    _, match_sum = run(ks)
    matches = int(match_sum) // reps
    return {
        "pairs_per_s": pairs_per_s,
        "seconds_per_batch": per_batch,
        "batch": batch,
        "dispatch_latency_s": rtt,
        "total_matches": matches,
        "backend": jax.default_backend(),
    }


def main():
    res = run_bench()
    baseline = None
    if os.path.exists(FROZEN):
        with open(FROZEN) as f:
            frozen = json.load(f)
        baseline = frozen.get("cpu_pairs_per_s")
    vs = res["pairs_per_s"] / baseline if baseline else 0.0
    print(
        json.dumps(
            {
                "metric": "two_view_ba_pairs_per_s",
                "value": round(res["pairs_per_s"], 4),
                "unit": "pairs/s (512x1024 ERP, full pipeline)",
                "vs_baseline": round(vs, 3),
                "detail": res,
            }
        )
    )


if __name__ == "__main__":
    main()
