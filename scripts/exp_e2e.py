"""Experiment: end-to-end split at bench scale — frontend vs init vs BA.
Scan-amortized. Run ALONE. Temporary."""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

REPS = 8
BATCH = 4


def _sum_tree(t):
    return sum(jnp.sum(x).astype(jnp.float32) for x in jax.tree.leaves(t))


def make_timer():
    @jax.jit
    def tiny(x):
        return x + 1.0

    jax.block_until_ready(tiny(jnp.float32(0.0)))

    def med(f, *args, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    rtt = med(tiny, jnp.float32(1.0))
    print(f"(rtt ~{rtt*1e3:.1f} ms)", flush=True)

    def stage(label, body):
        @jax.jit
        def run(_x):
            def sbody(c, i):
                return c + _sum_tree(body(i)), None

            c, _ = jax.lax.scan(sbody, jnp.float32(0.0), jnp.arange(REPS))
            return c

        jax.block_until_ready(run(0))
        t = med(run, 0)
        print(f"{label}: {(t - rtt) / REPS * 1e3:.2f} ms", flush=True)

    return stage


def main():
    import bench
    from spherical_bundle_adjuster_tpu.models import frontend, twoview
    from spherical_bundle_adjuster_tpu.solver import epipolar

    cfg = bench.bench_config()
    im_l, im_r = bench.make_batch(BATCH)
    h, w = im_l.shape[1], im_l.shape[2]
    keys = jax.random.split(jax.random.PRNGKey(0), BATCH)
    v = jax.vmap
    stage = make_timer()

    def pert(x, i):
        return x + 0.0 * i.astype(x.dtype)

    stage(
        "frontend total (B)",
        lambda i: v(lambda a, b: frontend.band_frontend(a, b, cfg))(
            pert(im_l, i), im_r
        ),
    )
    fr = v(lambda a, b: frontend.band_frontend(a, b, cfg))(im_l, im_r)
    b_l, b_r = v(lambda f: twoview.lift_matches(f, w, h))(fr)
    stage(
        "initial_guess (B)",
        lambda i: v(lambda a, b, mv, k: epipolar.initial_guess(a, b, mv, k, cfg.ransac))(
            pert(b_l, i), b_r, fr.match_valid, keys
        ),
    )
    stage(
        "adjust_from_matches (B)",
        lambda i: v(lambda a, b, mv, k: twoview.adjust_from_matches(a, b, mv, k, cfg))(
            pert(b_l, i), b_r, fr.match_valid, keys
        ),
    )
    stage(
        "END-TO-END (B)",
        lambda i: v(partial(twoview.run_two_view, cfg=cfg, frontend="band"))(
            pert(im_l, i), im_r, keys
        ),
    )


if __name__ == "__main__":
    main()
