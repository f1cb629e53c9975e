"""Morphological erode/dilate with elliptical structuring elements.

Re-creates the SWMorphologicalFilter stage (reference mf-sw.cpp:19-28):
opening then closing (erode->dilate->dilate->erode) with a 10x10 ellipse
(MORPH_FILTER_DX/DY=10, mf-sw.h:11-12).

TPU mapping: the elliptical footprint is decomposed into per-row horizontal
segments; each segment is a 1-D `lax.reduce_window` min/max and rows combine
with elementwise min/max. That keeps everything on the VPU with static
shapes -- no gather, no masked conv. Border semantics follow OpenCV's
morphology default (erode pads +inf -> 255, dilate pads -inf -> 0).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def ellipse_kernel(width: int, height: int) -> np.ndarray:
    """cv::getStructuringElement(MORPH_ELLIPSE, (width, height)) parity."""
    r = height // 2
    c = width // 2
    inv_r2 = 1.0 / (r * r) if r > 0 else 0.0
    kernel = np.zeros((height, width), dtype=np.uint8)
    for i in range(height):
        dy = i - r
        if abs(dy) <= r:
            t = c * np.sqrt(max(0.0, (r * r - dy * dy) * inv_r2))
            dx = int(np.round(t))  # saturate_cast<int>: round to nearest
            j1 = max(c - dx, 0)
            j2 = min(c + dx + 1, width)
            kernel[i, j1:j2] = 1
    return kernel


def _row_segments(kernel: np.ndarray):
    """(dy, dx_left, dx_right) per nonzero kernel row, relative to anchor."""
    kh, kw = kernel.shape
    ay, ax = kh // 2, kw // 2
    segs = []
    for i in range(kh):
        cols = np.nonzero(kernel[i])[0]
        if cols.size:
            segs.append((i - ay, int(cols[0]) - ax, int(cols[-1]) - ax))
    return segs


def _morph(img: jnp.ndarray, kernel: np.ndarray, is_erode: bool) -> jnp.ndarray:
    segs = _row_segments(np.asarray(kernel))
    H, W = img.shape
    if jnp.issubdtype(img.dtype, jnp.integer):
        pad_val = 255 if is_erode else 0
    else:
        pad_val = jnp.inf if is_erode else -jnp.inf
    reducer = jax.lax.min if is_erode else jax.lax.max
    x = img

    # Horizontal 1-D min/max per distinct segment width (widths repeat across
    # rows of an ellipse; compute each once).
    widths = {}
    for dy, dxl, dxr in segs:
        widths.setdefault((dxl, dxr), []).append(dy)

    out = None
    for (dxl, dxr), dys in widths.items():
        wlen = dxr - dxl + 1
        padded = jnp.pad(x, ((0, 0), (-dxl, dxr)), constant_values=pad_val)
        row_red = jax.lax.reduce_window(
            padded,
            jnp.asarray(pad_val, x.dtype),
            reducer,
            window_dimensions=(1, wlen),
            window_strides=(1, 1),
            padding="VALID",
        )  # (H, W): horizontal reduction centered at anchor
        for dy in dys:
            if dy > 0:
                shifted = jnp.pad(
                    row_red[dy:], ((0, dy), (0, 0)), constant_values=pad_val
                )
            elif dy < 0:
                shifted = jnp.pad(
                    row_red[:dy], ((-dy, 0), (0, 0)), constant_values=pad_val
                )
            else:
                shifted = row_red
            out = shifted if out is None else reducer(out, shifted)
    return out


def erode(img: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """cv::erode parity (min filter over the kernel footprint)."""
    return _morph(img, kernel, True)


def dilate(img: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """cv::dilate parity (max filter over the kernel footprint)."""
    return _morph(img, kernel, False)


def morph_open_close(img: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Opening then closing: erode->dilate->dilate->erode (mf-sw.cpp:19-28)."""
    x = erode(img, kernel)
    x = dilate(x, kernel)
    x = dilate(x, kernel)
    x = erode(x, kernel)
    return x
