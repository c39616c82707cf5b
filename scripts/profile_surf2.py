"""Scan-amortized micro-profile of SURF describe-side stages (TPU). Run ALONE."""

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
    print(f"(rtt ~{rtt*1e3:.1f} ms)", flush=True)

    def stage(label, body):
        @jax.jit
        def run(_x):
            def sbody(c, i):
                return c + _sum_tree(body(i)), None

            c, _ = jax.lax.scan(sbody, jnp.float32(0.0), jnp.arange(REPS))
            return c

        t0 = time.perf_counter()
        jax.block_until_ready(run(0))
        print(f"  [{label} compiled in {time.perf_counter()-t0:.0f}s]", flush=True)
        t = med(run, 0)
        print(f"{label}: {(t - rtt) / REPS * 1e3:.2f} ms", flush=True)

    v = jax.vmap
    ii = jax.jit(v(integral.integral_image))(grays)
    kp = jax.jit(v(lambda g: surf.detect(g, cfg)), static_argnums=())(grays)
    jax.block_until_ready((ii, kp))

    which = os.environ.get("STAGES", "ori,lap,desc,haar").split(",")
    if "refine" in which:
        det = jax.jit(v(lambda g: tuple(surf._det_maps_per_octave(g, cfg))))(grays)
        cand = jax.jit(v(lambda *d: tuple(surf._nms_candidates(list(d), cfg))))(*det)
        jax.block_until_ready((det, cand))
        stage(
            "refine+topk x8",
            lambda i: v(
                lambda d, c: surf._refine_and_pack((128, 1024), list(d), list(c), cfg)
            )(det, cand),
        )
    if "crop" in which:
        from spherical_bundle_adjuster_tpu.ops import warp

        rng2 = np.random.default_rng(1)
        erp = jnp.asarray(
            rng2.integers(0, 255, (512, 1024), dtype=np.uint8)
        ).astype(jnp.float32)
        pitches = jnp.deg2rad(jnp.asarray([45.0, 0.0, -45.0, -90.0], jnp.float32))

        def crop8(i):
            a = v(lambda p: warp.crop_rotated_band(erp, p))(pitches)
            b = v(lambda p: warp.crop_rotated_band(erp + i, p))(pitches)
            return a, b

        stage("crop x8 (2 images x 4 bands)", crop8)
    if "ori_gather" in which:
        pts, wts = surf._orientation_samples()
        cfg_l = cfg

        def ori_gather(a, b):
            s = b.scale
            haar = surf._dense_haar_maps(a, cfg_l)
            h2, w2 = haar.shape[1], haar.shape[2]
            q = surf._layer_index(b.size, cfg_l)
            cx = jnp.clip(
                jnp.round(b.xy[:, 0:1] + pts[None, :, 0] * s[:, None]).astype(jnp.int32),
                0, w2 - 1,
            )
            cy = jnp.clip(
                jnp.round(b.xy[:, 1:2] + pts[None, :, 1] * s[:, None]).astype(jnp.int32),
                0, h2 - 1,
            )
            lin = (q[:, None] * h2 + cy) * w2 + cx
            return surf._unpack_haar(jnp.take(haar.reshape(-1), lin))

        stage("ori gather-only x8", lambda i: v(ori_gather)(ii, kp))
    if "haar" in which:
        stage(
            "dense_haar_maps x8",
            lambda i: v(lambda a: surf._dense_haar_maps(a, cfg))(ii),
        )
    if "ori" in which:
        stage(
            "orientation x8",
            lambda i: v(lambda a, b: surf._assign_orientation(a, b, cfg))(ii, kp),
        )
    if "lap" in which:
        stage("laplacian x8", lambda i: v(lambda a, b: surf._laplacian_sign(a, b, cfg))(ii, kp))
    if "desc" in which:
        stage(
            "describe x8", lambda i: v(lambda g, k: surf.describe(g, k, cfg))(grays, kp)
        )


if __name__ == "__main__":
    main()
