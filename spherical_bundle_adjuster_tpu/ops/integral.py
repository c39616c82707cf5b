"""Integral images and box sums — the substrate for SURF's box-filter
Hessians and Haar wavelets.

The integral image is two associative scans (`jnp.cumsum` along each axis),
which XLA lowers to efficient parallel prefix sums. Box sums at *static*
offsets are four shifted slices of the padded integral — no gather, fully
fusable elementwise adds. Box sums at *dynamic* (per-keypoint) positions
are four gathers.
"""

from __future__ import annotations

import jax.numpy as jnp


def rgb_to_gray(image):
    """(H, W, 3) uint8/float -> (H, W) float32 luma.

    Matches OpenCV's RGB2GRAY weights (the reference feeds 3-channel images
    to SURF, which converts internally; feature_matcher.cpp:26-40)."""
    img = image.astype(jnp.float32)
    if img.ndim == 2:
        return img
    return img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114


def integral_image(gray):
    """(H, W) -> (H+1, W+1) exclusive-prefix integral image.

    ii[y, x] = sum of gray[:y, :x]; ii[0, :] = ii[:, 0] = 0.
    """
    ii = jnp.cumsum(jnp.cumsum(gray.astype(jnp.float32), axis=0), axis=1)
    return jnp.pad(ii, ((1, 0), (1, 0)))


def shifted_box_sums(ii, boxes, out_h, out_w):
    """Dense box sums at every pixel for a list of static boxes.

    ii: (H+1, W+1) integral image (H, W >= out_h, out_w + max offset).
    boxes: list of (y0, x0, y1, x1, weight) static int/float tuples; the box
      for output pixel (y, x) spans rows [y+y0, y+y1) and cols [x+x0, x+x1).
    Returns (out_h, out_w) weighted sum over the boxes.

    Each box is 4 static slices of `ii` — XLA fuses the whole pattern into
    one elementwise expression over the output tile.
    """
    acc = None
    for (y0, x0, y1, x1, w) in boxes:
        s = (
            ii[y1 : y1 + out_h, x1 : x1 + out_w]
            - ii[y0 : y0 + out_h, x1 : x1 + out_w]
            - ii[y1 : y1 + out_h, x0 : x0 + out_w]
            + ii[y0 : y0 + out_h, x0 : x0 + out_w]
        )
        term = w * s
        acc = term if acc is None else acc + term
    return acc


def box_sum_at(ii, y0, x0, y1, x1):
    """Box sums at dynamic positions (vectorized gathers).

    ii: (H+1, W+1); y0/x0/y1/x1: integer arrays of identical shape giving
    [y0, y1) x [x0, x1) in image coordinates. Out-of-range boxes are
    clamped to the image (matching OpenCV's border clamp in HaarEvaluator).
    """
    h = ii.shape[0] - 1
    w = ii.shape[1] - 1
    y0 = jnp.clip(y0, 0, h)
    y1 = jnp.clip(y1, 0, h)
    x0 = jnp.clip(x0, 0, w)
    x1 = jnp.clip(x1, 0, w)
    return ii[y1, x1] - ii[y0, x1] - ii[y1, x0] + ii[y0, x0]
