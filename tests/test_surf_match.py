"""SURF detector/descriptor + matcher tests on synthetic images."""

import numpy as np
import jax
import jax.numpy as jnp

from spherical_bundle_adjuster_tpu.ops import match, surf
from spherical_bundle_adjuster_tpu.utils.config import MatchConfig, SurfConfig

CFG = SurfConfig(max_keypoints=64, n_octaves=2)


def blob_image(h=96, w=128, centers=((30, 40), (60, 90), (50, 20)), r=5):
    img = np.full((h, w), 40.0, np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    for (cy, cx) in centers:
        mask = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
        img[mask] = 220.0
    return jnp.asarray(img)


class TestDetect:
    def test_finds_blobs(self):
        centers = ((30, 40), (60, 90), (50, 20))
        img = blob_image(centers=centers)
        kp = surf.detect(img, CFG)
        found = np.asarray(kp.xy)[np.asarray(kp.valid)]
        assert found.shape[0] >= len(centers)
        for (cy, cx) in centers:
            d = np.min(np.linalg.norm(found - np.array([cx, cy]), axis=-1))
            assert d < 3.0, f"blob at {(cx, cy)} not localized (nearest {d:.1f}px)"

    def test_empty_image_no_keypoints(self):
        img = jnp.full((96, 128), 128.0)
        kp = surf.detect(img, CFG)
        assert int(jnp.sum(kp.valid)) == 0

    def test_static_shapes(self):
        img = blob_image()
        kp = surf.detect(img, CFG)
        assert kp.xy.shape == (CFG.max_keypoints, 2)
        assert kp.valid.shape == (CFG.max_keypoints,)


class TestDescribeAndMatch:
    def test_self_match_identity(self):
        img = blob_image()
        kp, desc = surf.detect_and_describe(img, CFG)
        mt = match.match_descriptors(
            desc, kp.valid, desc, kp.valid, cfg=MatchConfig(max_matches=64, ratio_thresh=0.9)
        )
        # each valid keypoint's nearest neighbor in the identical bank is
        # itself (distance 0); ratio test may kill some (duplicate blobs)
        v = np.asarray(mt.valid)
        q = np.asarray(mt.query_idx)[v]
        t = np.asarray(mt.train_idx)[v]
        assert v.sum() >= 1
        np.testing.assert_array_equal(q, t)
        assert float(np.max(np.asarray(mt.distance)[v])) < 1e-3

    def test_descriptors_unit_norm(self):
        img = blob_image()
        kp, desc = surf.detect_and_describe(img, CFG)
        norms = np.linalg.norm(np.asarray(desc), axis=-1)
        valid = np.asarray(kp.valid)
        np.testing.assert_allclose(norms[valid], 1.0, atol=1e-4)
        np.testing.assert_allclose(norms[~valid], 0.0, atol=1e-6)

    def test_translated_blobs_match(self):
        # shift the whole pattern: descriptors must still match 1-1
        img1 = blob_image(centers=((30, 40), (60, 90), (50, 20)))
        img2 = blob_image(centers=((33, 44), (63, 94), (53, 24)))
        kp1, d1 = surf.detect_and_describe(img1, CFG)
        kp2, d2 = surf.detect_and_describe(img2, CFG)
        mt = match.match_descriptors(
            d1, kp1.valid, d2, kp2.valid, cfg=MatchConfig(max_matches=64, ratio_thresh=0.8)
        )
        v = np.asarray(mt.valid)
        assert v.sum() >= 2
        # matched pairs should be the corresponding shifted blobs (+4, +4);
        # identical-looking blobs can produce an occasional cross match at
        # this lenient ratio, so require a correct majority, not all
        xy1 = np.asarray(kp1.xy)[np.asarray(mt.query_idx)[v]]
        xy2 = np.asarray(kp2.xy)[np.asarray(mt.train_idx)[v]]
        shift = xy2 - xy1
        good = np.all(np.abs(shift - 4.0) < 2.0, axis=-1)
        assert good.sum() >= 2, f"shifts {shift}"
        assert good.mean() > 0.5, f"shifts {shift}"


class TestGatherModes:
    def test_mxu_gather_parity_on_cpu(self):
        """ADVICE r1: the MXU one-hot descriptor-sampling path must match
        the native-gather path. With gray rounded to the integer grid the
        bf16 one-hot select is exact for 8U-range values, so the only
        difference vs 'gather' is the (<= 0.5 gray level) rounding of
        non-integer band-crop floats; descriptors are normalized Haar sums,
        so they must agree closely and produce identical match sets."""
        # Non-integer gray: scale a blob image by a non-representable factor
        img = blob_image() * jnp.float32(0.7311)
        cfg_g = SurfConfig(max_keypoints=64, n_octaves=2, gather_mode="gather")
        cfg_m = SurfConfig(max_keypoints=64, n_octaves=2, gather_mode="mxu")
        kp_g, d_g = surf.detect_and_describe(img, cfg_g)
        kp_m, d_m = surf.detect_and_describe(img, cfg_m)
        # detection is gather-mode independent
        np.testing.assert_array_equal(np.asarray(kp_g.valid), np.asarray(kp_m.valid))
        np.testing.assert_allclose(np.asarray(kp_g.xy), np.asarray(kp_m.xy))
        v = np.asarray(kp_g.valid)
        assert v.sum() >= 3
        # descriptor closeness: unit-norm 64-d vectors, tight cosine bound
        dg = np.asarray(d_g)[v]
        dm = np.asarray(d_m)[v]
        cos = np.sum(dg * dm, axis=-1)
        assert np.all(cos > 0.999), f"min cosine {cos.min()}"
        # match-quality parity: self-matching with either bank is identical
        mt_g = match.match_descriptors(
            d_g, kp_g.valid, d_g, kp_g.valid,
            cfg=MatchConfig(max_matches=64, ratio_thresh=0.9),
        )
        mt_m = match.match_descriptors(
            d_m, kp_m.valid, d_m, kp_m.valid,
            cfg=MatchConfig(max_matches=64, ratio_thresh=0.9),
        )
        np.testing.assert_array_equal(
            np.asarray(mt_g.valid), np.asarray(mt_m.valid)
        )

    def test_dense_laplacian_parity(self):
        """laplacian_mode='dense' (one gather per keypoint from per-layer
        trace-sign maps, the TPU fast path) must agree with the 24-corner
        'gather' reference path. Signs can differ only for keypoints whose
        refined size falls between layers AND whose trace changes sign
        across that scale step — structured blob scenes have none."""
        import dataclasses

        img = blob_image() * jnp.float32(2.0) + 40.0
        cfg_d = SurfConfig(max_keypoints=64, n_octaves=2, laplacian_mode="dense")
        cfg_g = dataclasses.replace(cfg_d, laplacian_mode="gather")
        kd = surf.detect(img, cfg_d)
        kg = surf.detect(img, cfg_g)
        v = np.asarray(kd.valid)
        assert v.sum() >= 3
        np.testing.assert_array_equal(
            np.asarray(kd.laplacian)[v], np.asarray(kg.laplacian)[v]
        )
