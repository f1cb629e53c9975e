"""StereoBM X-Sobel prefilter (OpenCV `prefilterXSobel` parity).

First stage of the Konolige block matcher the reference configures with
preFilterCap=31 (main.cpp:130, bm-sw.cpp:16). Per pixel:
  d = (s[y-1,x+1]-s[y-1,x-1]) + 2*(s[y,x+1]-s[y,x-1]) + (s[y+1,x+1]-s[y+1,x-1])
  out = clip(d, -cap, cap) + cap
with reflect-101 row borders and the first/last column forced to cap.
Integer-exact vs OpenCV (validated indirectly through full-matcher parity
tests, since OpenCV does not expose the prefilter).
"""

from __future__ import annotations

import jax.numpy as jnp


def xsobel_prefilter(img: jnp.ndarray, cap: int) -> jnp.ndarray:
    """uint8 (H, W) -> uint8 (H, W) prefiltered image."""
    x = img.astype(jnp.int32)
    H, W = x.shape

    # reflect-101 rows: row -1 -> row 1, row H -> row H-2
    up = jnp.concatenate([x[1:2], x[:-1]], axis=0)
    down = jnp.concatenate([x[1:], x[H - 2 : H - 1]], axis=0)

    def dx(row):
        left = jnp.concatenate([row[:, :1], row[:, :-1]], axis=1)
        right = jnp.concatenate([row[:, 1:], row[:, -1:]], axis=1)
        return right - left

    d = dx(up) + 2 * dx(x) + dx(down)
    out = jnp.clip(d, -cap, cap) + cap
    # first and last columns are set to cap (OpenCV val0)
    col_idx = jnp.arange(W)
    edge = (col_idx == 0) | (col_idx == W - 1)
    out = jnp.where(edge[None, :], cap, out)
    return out.astype(jnp.uint8)
