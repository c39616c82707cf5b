"""Micro-profile of SURF detect stages on one band image (TPU).

Run ALONE (tunnel dispatch stalls under host CPU load).
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
    from spherical_bundle_adjuster_tpu.ops import integral, surf
    from spherical_bundle_adjuster_tpu.utils.config import SurfConfig

    cfg = SurfConfig(max_keypoints=256, n_octaves=3)
    rng = np.random.default_rng(0)
    bands = jnp.asarray(rng.integers(0, 255, (8, 128, 1024), dtype=np.uint8)).astype(
        jnp.float32
    )

    f_det_maps = jax.jit(jax.vmap(lambda g: tuple(surf._det_maps_per_octave(g, cfg))))
    t = timeit(f_det_maps, bands)
    print(f"det maps (8 bands): {t*1e3:.1f} ms")
    det_lists = f_det_maps(bands)

    f_nms = jax.jit(jax.vmap(lambda *d: tuple(surf._nms_candidates(list(d), cfg))))
    t = timeit(f_nms, *det_lists)
    print(f"nms: {t*1e3:.1f} ms")
    cands = f_nms(*det_lists)

    f_refine = jax.jit(
        jax.vmap(
            lambda d, c: surf._refine_and_pack((128, 1024), list(d), list(c), cfg),
            in_axes=(0, 0),
        )
    )
    t = timeit(f_refine, det_lists, cands)
    print(f"refine+pack (top_k): {t*1e3:.1f} ms")
    kp = f_refine(det_lists, cands)

    f_ii = jax.jit(jax.vmap(integral.integral_image))
    t = timeit(f_ii, bands)
    print(f"integral image: {t*1e3:.1f} ms")
    ii = f_ii(bands)

    f_ori = jax.jit(jax.vmap(lambda i, k: surf._assign_orientation(i, k, cfg)))
    t = timeit(f_ori, ii, kp)
    print(f"orientation: {t*1e3:.1f} ms")

    f_lap = jax.jit(jax.vmap(surf._laplacian_sign))
    t = timeit(f_lap, ii, kp)
    print(f"laplacian sign: {t*1e3:.1f} ms")

    f_full = jax.jit(jax.vmap(lambda g: surf.detect(g, cfg)))
    t = timeit(f_full, bands)
    print(f"full detect: {t*1e3:.1f} ms")

    f_desc = jax.jit(jax.vmap(lambda g, k: surf.describe(g, k, cfg)))
    t = timeit(f_desc, bands, kp)
    print(f"describe: {t*1e3:.1f} ms")


if __name__ == "__main__":
    main()
