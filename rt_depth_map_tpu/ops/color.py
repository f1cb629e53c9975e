"""Color conversions with OpenCV's 8-bit fixed-point semantics.

Re-creates the cvtColor/inRange stages of the per-frame loop (reference
estimator.cpp:29-43): RGB->gray, RGB->HSV (the reference round-trips
RGB->BGR->HSV which is equivalent to RGB->HSV directly), and the HSV
threshold. Integer-exact vs cv2 on uint8 inputs (tests/test_ops_color.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def rgb_to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB (..., 3) uint8 -> gray (...) uint8, OpenCV CV_RGB2GRAY fixed point.

    OpenCV uses Y = (R*4899 + G*9617 + B*1868 + 2^13) >> 14.
    """
    r = rgb[..., 0].astype(jnp.int32)
    g = rgb[..., 1].astype(jnp.int32)
    b = rgb[..., 2].astype(jnp.int32)
    y = (r * 4899 + g * 9617 + b * 1868 + (1 << 13)) >> 14
    return y.astype(jnp.uint8)


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB (..., 3) uint8 -> HSV (..., 3) uint8, OpenCV 8-bit convention.

    H in [0, 180), S/V in [0, 255], computed with OpenCV's hsv_shift=12
    fixed-point tables (sdiv/hdiv) so results are integer-exact.
    """
    r = rgb[..., 0].astype(jnp.int32)
    g = rgb[..., 1].astype(jnp.int32)
    b = rgb[..., 2].astype(jnp.int32)
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = v - mn

    shift = 12
    half = 1 << (shift - 1)
    # sdiv_table[v] = round(255 * 2^12 / v); hdiv_table[d] = round(180*2^12/(6d))
    vf = jnp.maximum(v, 1).astype(jnp.float32)
    sdiv = jnp.round((255 << shift) / vf).astype(jnp.int32)
    df = jnp.maximum(diff, 1).astype(jnp.float32)
    hdiv = jnp.round((180 << shift) / (6.0 * df)).astype(jnp.int32)

    s = jnp.where(v == 0, 0, (diff * sdiv + half) >> shift)

    h_raw = jnp.where(
        v == r,
        g - b,
        jnp.where(v == g, b - r + 2 * diff, r - g + 4 * diff),
    )
    h = (h_raw * hdiv + half) >> shift
    h = jnp.where(h < 0, h + 180, h)
    h = jnp.where(diff == 0, 0, h)
    return jnp.stack(
        [h.astype(jnp.uint8), s.astype(jnp.uint8), v.astype(jnp.uint8)], axis=-1
    )


def in_range(img: jnp.ndarray, low, high) -> jnp.ndarray:
    """cv::inRange: 255 where low <= img <= high on every channel, else 0.

    The HSV object threshold of the detection path (estimator.cpp:43).
    """
    low = jnp.asarray(low, dtype=img.dtype)
    high = jnp.asarray(high, dtype=img.dtype)
    ok = jnp.all((img >= low) & (img <= high), axis=-1)
    return jnp.where(ok, jnp.uint8(255), jnp.uint8(0))
