"""Re-measure the REAL surf._assign_orientation (and the full band
frontend) under a known-good tunnel phase, with synthetic keypoints so
there is no 20-minute detect-stage setup compile.

Context: FRONTEND_PROFILE_r03.json measured h_orientation at 201.7
ms/batch(4) with tunnel rtt ~27 ms; EXP_ORIENT_GATHER.json then measured
the identical gather pattern at 1.75 ms with rtt ~0.1 ms. This script
arbitrates: real function, synthetic inputs, report rtt alongside.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

REPS = 16


def main():
    import bench
    from spherical_bundle_adjuster_tpu.ops import integral, surf
    from spherical_bundle_adjuster_tpu.models import frontend as fe

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cfg = bench.bench_config()
    scfg = cfg.surf
    h, w = bench.BENCH_H, bench.BENCH_W
    bh = h // 4
    B = batch * 8  # bands
    K = scfg.max_keypoints

    rng = np.random.default_rng(1)
    bflat = jnp.asarray(rng.uniform(0, 255, (B, bh, w)), jnp.float32)
    ii = jax.jit(jax.vmap(integral.integral_image))(bflat)

    sizes = surf._mid_layer_sizes(scfg)
    kp = surf.Keypoints(
        xy=jnp.asarray(
            np.stack(
                [rng.uniform(0, w - 1, (B, K)), rng.uniform(0, bh - 1, (B, K))],
                axis=-1,
            ),
            jnp.float32,
        ),
        size=jnp.asarray(rng.choice(sizes, (B, K)), jnp.float32),
        response=jnp.ones((B, K), jnp.float32),
        orientation=jnp.zeros((B, K), jnp.float32),
        laplacian=jnp.zeros((B, K), jnp.float32),
        valid=jnp.ones((B, K), bool),
    )
    jax.block_until_ready((ii, kp))

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
        return ts, float(np.median(ts))

    _, rtt = med(tiny, jnp.float32(1.0))
    print(f"(rtt ~{rtt*1e3:.2f} ms)", file=sys.stderr)
    out = {"rtt_ms": rtt * 1e3, "batch": batch}

    def stage(label, body):
        @jax.jit
        def run(_x):
            def sbody(c, i):
                leaves = jax.tree.leaves(body(i))
                return c + sum(jnp.sum(x.astype(jnp.float32)) for x in leaves), None

            c, _ = jax.lax.scan(sbody, jnp.float32(0.0), jnp.arange(REPS))
            return c

        jax.block_until_ready(run(0))
        ts, m = med(run, 0)
        t = max((m - rtt) / REPS, 1e-9)
        out[label] = {"ms_per_batch": t * 1e3,
                      "raw_dispatch_s": [round(x, 4) for x in ts]}
        print(f"{label}: {t*1e3:.2f} ms/batch  raw={['%.3f' % x for x in ts]}",
              file=sys.stderr, flush=True)

    v = jax.vmap
    stage("real_assign_orientation",
          lambda i: v(lambda a, b: surf._assign_orientation(a, b, scfg))(ii, kp))
    stage("real_laplacian",
          lambda i: v(lambda a, b: surf._laplacian_sign(a, b, scfg))(ii, kp))
    stage("real_describe",
          lambda i: v(lambda g, k: surf.describe(g, k, scfg))(bflat, kp))

    # full band frontend on real rendered pairs (one compile, ~2-5 min)
    im_l, im_r = bench.make_batch(batch)
    jax.block_until_ready((im_l, im_r))
    from functools import partial

    front = v(partial(fe.band_frontend, cfg=cfg))
    stage("full_band_frontend", lambda i: front(im_l, im_r))

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "EXP_ORIENT_REAL.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: (round(s["ms_per_batch"], 2) if isinstance(s, dict) else s)
                      for k, s in out.items()}, indent=1))


if __name__ == "__main__":
    main()
