"""Per-stage TPU timing of the two-view pipeline, scan-amortized.

Per-call timing through the RPC tunnel measures network latency, not the
chip (CLAUDE.md). Each stage here runs `REPS` times inside one dispatch
via lax.scan (outputs folded into a scalar carry so nothing is DCE'd);
device time = (t_scan - rtt) / REPS. Run ALONE.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

REPS = 32


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
    print(f"(rtt ~{rtt*1e3:.0f} ms)")

    def stage(label, body):
        """body(i) -> any pytree; timed over REPS scan iterations."""

        @jax.jit
        def run(_x):
            def sbody(c, i):
                return c + _sum_tree(body(i)), None

            c, _ = jax.lax.scan(sbody, jnp.float32(0.0), jnp.arange(REPS))
            return c

        jax.block_until_ready(run(0))  # compile
        t = med(run, 0)
        print(f"{label}: {(t - rtt) / REPS * 1e3:.2f} ms")

    return stage


def main():
    import bench
    from spherical_bundle_adjuster_tpu.models import frontend, twoview
    from spherical_bundle_adjuster_tpu.ops import integral, match, surf, warp
    from spherical_bundle_adjuster_tpu.solver import epipolar, lm
    from spherical_bundle_adjuster_tpu.utils.config import BaConfig

    cfg = bench.bench_config()
    im_l, im_r = bench.make_batch(1)
    im_l, im_r = im_l[0], im_r[0]
    h, w = im_l.shape[0], im_l.shape[1]
    key = jax.random.PRNGKey(0)

    print(
        f"image {h}x{w}; surf K={cfg.surf.max_keypoints}, "
        f"octaves={cfg.surf.n_octaves}, matches M={cfg.match.max_matches}, reps={REPS}"
    )
    stage = make_timer()

    pitches = jnp.deg2rad(jnp.asarray(cfg.frontend.band_pitches_deg))

    def crop(im):
        return jax.vmap(lambda p: warp.crop_rotated_band(im, p))(pitches)

    stage("band_crop x8 (both images)", lambda i: (crop(im_l), crop(im_r)))

    bands = jnp.concatenate([crop(im_l), crop(im_r)])
    grays = jax.vmap(integral.rgb_to_gray)(bands)

    stage(
        "surf detect x8",
        lambda i: jax.vmap(lambda g: surf.detect(g, cfg.surf))(grays),
    )
    kp = jax.vmap(lambda g: surf.detect(g, cfg.surf))(grays)
    stage(
        "surf describe x8",
        lambda i: jax.vmap(lambda g, k: surf.describe(g, k, cfg.surf))(grays, kp),
    )
    desc = jax.vmap(lambda g, k: surf.describe(g, k, cfg.surf))(grays, kp)

    k = cfg.surf.max_keypoints
    d_l = desc[:4].reshape(4 * k, -1)
    d_r = desc[4:].reshape(4 * k, -1)
    v_l = kp.valid[:4].reshape(-1)
    v_r = kp.valid[4:].reshape(-1)
    stage(
        f"match {4*k}x{4*k}",
        lambda i: match.match_descriptors(d_l, v_l, d_r, v_r, cfg=cfg.match),
    )

    fr = frontend.band_frontend(im_l, im_r, cfg)
    b_l, b_r = twoview.lift_matches(fr, w, h)
    keys = jax.random.split(key, REPS)
    stage(
        "initial_guess (80 trials)",
        lambda i: epipolar.initial_guess(b_l, b_r, fr.match_valid, keys[0], cfg.ransac),
    )

    ba = cfg.ba
    d0 = jnp.full((b_l.shape[0], 2), 1.0)
    r0 = jnp.zeros(3)
    t0 = jnp.asarray([1.0, 0.0, 0.0])
    stage(
        "solve_depths",
        lambda i: lm.solve_depths(b_l, b_r, d0, r0, t0, fr.match_valid, ba)[0],
    )
    stage(
        "solve_rotation",
        lambda i: lm.solve_rotation(b_l, b_r, d0, r0, t0, fr.match_valid, ba)[0],
    )
    stage(
        "END-TO-END run_two_view",
        lambda i: twoview.run_two_view(im_l, im_r, keys[0], cfg, "band"),
    )


if __name__ == "__main__":
    main()
