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


def run_bench(batch=BATCH, iters=3):
    import jax
    import jax.numpy as jnp
    from functools import partial

    from spherical_bundle_adjuster_tpu.models import twoview

    cfg = bench_config()
    _log(f"backend={jax.default_backend()} rendering batch={batch}")
    im_l, im_r = make_batch(batch)
    jax.block_until_ready((im_l, im_r))
    _log("rendered; compiling pipeline")
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    fn = jax.jit(jax.vmap(partial(twoview.run_two_view, cfg=cfg, frontend="band")))

    out = fn(im_l, im_r, keys)  # compile
    jax.block_until_ready(out)
    _log("compiled; timing")

    # median-of-iters with fresh keys, keys prepared outside the timed
    # region (host-side key generation costs a dispatch round trip)
    key_sets = [jax.random.split(jax.random.PRNGKey(i + 1), batch) for i in range(iters)]
    jax.block_until_ready(key_sets)
    times = []
    for keys_i in key_sets:
        t0 = time.perf_counter()
        out = fn(im_l, im_r, keys_i)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    pairs_per_s = batch / dt
    matches = int(np.sum(np.asarray(out.num_matches)))
    return {
        "pairs_per_s": pairs_per_s,
        "seconds_per_batch": dt,
        "batch": batch,
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
