"""Scan-amortized micro-profile of SURF internals (TPU). Run ALONE."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

REPS = 32


def _sum_tree(t):
    return sum(jnp.sum(x).astype(jnp.float32) for x in jax.tree.leaves(t))


def main():
    from spherical_bundle_adjuster_tpu.ops import integral, surf
    from spherical_bundle_adjuster_tpu.utils.config import SurfConfig

    cfg = SurfConfig(max_keypoints=256, n_octaves=3)
    rng = np.random.default_rng(0)
    grays = jnp.asarray(
        rng.integers(0, 255, (8, 128, 1024), dtype=np.uint8)
    ).astype(jnp.float32)

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
    print(f"(rtt ~{rtt*1e3:.1f} ms)")

    def stage(label, body):
        @jax.jit
        def run(_x):
            def sbody(c, i):
                return c + _sum_tree(body(i)), None

            c, _ = jax.lax.scan(sbody, jnp.float32(0.0), jnp.arange(REPS))
            return c

        jax.block_until_ready(run(0))
        t = med(run, 0)
        print(f"{label}: {(t - rtt) / REPS * 1e3:.2f} ms")

    v = jax.vmap

    stage("integral image x8", lambda i: v(integral.integral_image)(grays))
    ii = v(integral.integral_image)(grays)

    stage(
        "det maps x8",
        lambda i: v(lambda g: tuple(surf._det_maps_per_octave(g, cfg)))(grays),
    )
    det = v(lambda g: tuple(surf._det_maps_per_octave(g, cfg)))(grays)

    stage(
        "nms x8",
        lambda i: v(lambda *d: tuple(surf._nms_candidates(list(d), cfg)))(*det),
    )
    cand = v(lambda *d: tuple(surf._nms_candidates(list(d), cfg)))(*det)

    stage(
        "refine+topk x8",
        lambda i: v(
            lambda d, c: surf._refine_and_pack((128, 1024), list(d), list(c), cfg)
        )(det, cand),
    )
    kp = v(lambda d, c: surf._refine_and_pack((128, 1024), list(d), list(c), cfg))(
        det, cand
    )

    stage(
        "orientation x8",
        lambda i: v(lambda a, b: surf._assign_orientation(a, b, cfg))(ii, kp),
    )
    stage("laplacian x8", lambda i: v(lambda a, b: surf._laplacian_sign(a, b, cfg))(ii, kp))
    stage("describe x8", lambda i: v(lambda g, k: surf.describe(g, k, cfg))(grays, kp))
    stage("full detect x8", lambda i: v(lambda g: surf.detect(g, cfg))(grays))


if __name__ == "__main__":
    main()
