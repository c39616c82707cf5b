"""Per-stage TPU timing of the two-view pipeline (device-side breakdown).

Times each stage as its own jitted function with host sync, median of N.
Run ALONE — concurrent CPU load starves the dispatch path and corrupts
timings on small hosts.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


def timeit(fn, *args, n=3, warm=1):
    for _ in range(warm):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import bench
    from spherical_bundle_adjuster_tpu.models import frontend, twoview
    from spherical_bundle_adjuster_tpu.ops import match, surf, warp
    from spherical_bundle_adjuster_tpu.solver import epipolar, lm
    from spherical_bundle_adjuster_tpu.utils.config import BaConfig

    cfg = bench.bench_config()
    im_l, im_r = bench.make_batch(1)
    im_l, im_r = im_l[0], im_r[0]
    h, w = im_l.shape[0], im_l.shape[1]
    key = jax.random.PRNGKey(0)

    print(f"image {h}x{w}; surf K={cfg.surf.max_keypoints}, "
          f"octaves={cfg.surf.n_octaves}, matches M={cfg.match.max_matches}")

    # stage 1: band crops (8 warps)
    pitches = jnp.deg2rad(jnp.asarray(cfg.frontend.band_pitches_deg))
    crop = jax.jit(lambda im: jax.vmap(lambda p: warp.crop_rotated_band(im, p))(pitches))
    t = timeit(crop, im_l)
    print(f"band_crop x4 (one image): {t*1e3:.1f} ms")
    bands = jnp.concatenate([crop(im_l), crop(im_r)])

    # stage 2: SURF detect+describe on 8 bands
    dd = jax.jit(jax.vmap(lambda b: surf.detect_and_describe(b, cfg.surf)))
    t = timeit(dd, bands)
    print(f"surf detect+describe x8 bands: {t*1e3:.1f} ms")
    kp, desc = dd(bands)

    # detect only
    from spherical_bundle_adjuster_tpu.ops import integral
    det_only = jax.jit(jax.vmap(lambda b: surf.detect(integral.rgb_to_gray(b), cfg.surf)))
    t = timeit(det_only, bands)
    print(f"  surf detect only: {t*1e3:.1f} ms")

    # stage 3: matching
    k = cfg.surf.max_keypoints
    d_l = desc[:4].reshape(4 * k, -1)
    d_r = desc[4:].reshape(4 * k, -1)
    v_l = kp.valid[:4].reshape(-1)
    v_r = kp.valid[4:].reshape(-1)
    mt = jax.jit(partial(match.match_descriptors, cfg=cfg.match))
    t = timeit(mt, d_l, v_l, d_r, v_r)
    print(f"match ({4*k}x{4*k}): {t*1e3:.1f} ms")

    # stage 4: full frontend
    fe = jax.jit(partial(frontend.band_frontend, cfg=cfg))
    t = timeit(fe, im_l, im_r)
    print(f"full band_frontend: {t*1e3:.1f} ms")
    fr = fe(im_l, im_r)

    # stage 5: initial guess (RANSAC)
    b_l, b_r = twoview.lift_matches(fr, w, h)
    ig = jax.jit(partial(epipolar.initial_guess, cfg=cfg.ransac))
    t = timeit(ig, b_l, b_r, fr.match_valid, key)
    print(f"initial_guess (80 trials): {t*1e3:.1f} ms")

    # stage 6: BCD solve
    ab = jax.jit(partial(twoview.adjust_from_matches, cfg=cfg))
    t = timeit(ab, b_l, b_r, fr.match_valid, key)
    print(f"adjust_from_matches (RANSAC+BCD): {t*1e3:.1f} ms")

    # individual BCD stages
    ba = cfg.ba
    d0 = jnp.full((b_l.shape[0], 2), 1.0)
    r0 = jnp.zeros(3)
    t0v = jnp.asarray([1.0, 0.0, 0.0])
    sd = jax.jit(partial(lm.solve_depths, cfg=ba))
    t = timeit(sd, b_l, b_r, d0, r0, t0v, fr.match_valid)
    print(f"  solve_depths (vmapped 2x2 LM x{b_l.shape[0]}): {t*1e3:.1f} ms")
    sr = jax.jit(lambda *a: lm.solve_rotation(*a, ba)[0])
    t = timeit(sr, b_l, b_r, d0, r0, t0v, fr.match_valid)
    print(f"  solve_rotation (3x3 LM): {t*1e3:.1f} ms")

    # end-to-end single pair
    e2e = jax.jit(partial(twoview.run_two_view, cfg=cfg, frontend="band"))
    t = timeit(e2e, im_l, im_r, key)
    print(f"END-TO-END single pair: {t*1e3:.1f} ms")


if __name__ == "__main__":
    main()
