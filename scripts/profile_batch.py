"""Per-stage TPU timing of the two-view pipeline at bench batch size.

Scan-amortized (see profile_stages.py). Run ALONE. The bench workload is
batch=4 vmapped pairs; this profiles each stage vmapped over the batch to
find what dominates at batch scale (single-pair profiles under-weight
throughput-bound ops 4x).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

REPS = 16
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
    print(f"(rtt ~{rtt*1e3:.0f} ms)", flush=True)

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
    from spherical_bundle_adjuster_tpu.ops import integral, match, surf, warp
    from spherical_bundle_adjuster_tpu.solver import epipolar, lm

    cfg = bench.bench_config()
    im_l, im_r = bench.make_batch(BATCH)  # (B, H, W, 3)
    h, w = im_l.shape[1], im_l.shape[2]
    keys = jax.random.split(jax.random.PRNGKey(0), BATCH)

    print(f"batch {BATCH}, image {h}x{w}, reps={REPS}", flush=True)
    stage = make_timer()
    v = jax.vmap

    pitches = jnp.deg2rad(jnp.asarray(cfg.frontend.band_pitches_deg))

    def crop_gray(im):  # one image -> (4, H/4, W) gray bands
        g = integral.rgb_to_gray(im)
        return v(lambda p: warp.crop_rotated_band(g, p))(pitches)

    def bands_of(iml, imr):  # per pair -> (8, H/4, W)
        return jnp.concatenate([crop_gray(iml), crop_gray(imr)])

    stage(
        "gray+band_crop (Bx8)",
        lambda i: v(bands_of)(im_l, im_r),
    )
    bands = v(bands_of)(im_l, im_r)  # (B, 8, h/4, w)
    flat_bands = bands.reshape(BATCH * 8, h // 4, w)

    stage(
        "surf detect (Bx8)",
        lambda i: v(lambda g: surf.detect(g, cfg.surf))(flat_bands),
    )
    kp = v(lambda g: surf.detect(g, cfg.surf))(flat_bands)
    stage(
        "surf describe (Bx8)",
        lambda i: v(lambda g, k: surf.describe(g, k, cfg.surf))(flat_bands, kp),
    )

    fr = v(lambda a, b: frontend.band_frontend(a, b, cfg))(im_l, im_r)
    b_l, b_r = v(lambda f: twoview.lift_matches(f, w, h))(fr)
    stage(
        "frontend total (B)",
        lambda i: v(lambda a, b: frontend.band_frontend(a, b, cfg))(im_l, im_r),
    )
    stage(
        "initial_guess (B)",
        lambda i: v(lambda a, b, mv, k: epipolar.initial_guess(a, b, mv, k, cfg.ransac))(
            b_l, b_r, fr.match_valid, keys
        ),
    )
    stage(
        "adjust_from_matches (B)",
        lambda i: v(
            lambda a, b, mv, k: twoview.adjust_from_matches(a, b, mv, k, cfg)
        )(b_l, b_r, fr.match_valid, keys),
    )
    stage(
        "END-TO-END batch",
        lambda i: v(partial(twoview.run_two_view, cfg=cfg, frontend="band"))(
            im_l, im_r, keys
        ),
    )


if __name__ == "__main__":
    main()
