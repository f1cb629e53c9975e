"""Tiled (H, D, W1) <-> (W1, D, H) volume transpose.

The Pallas SGM pipeline needs the cost volume both row-major (vertical
passes stream (D, W1) row slabs) and x-major (horizontal passes stream
(D, H) column slabs). XLA's lowering of the 226MB int16 swapaxes(0, 2)
runs at ~15% of HBM bandwidth (~3.6ms/volume at 720p/D=128); this kernel
does the same transpose as large per-d 2D tiles moved through VMEM with
an in-register transpose, approaching the read+write bandwidth floor.

Both outer dims must be lane-tileable: the wrapper requires axis0 % 8 == 0
and axis2 % 128 == 0 on the INPUT, and the output's lane dim (= input
axis0) % 128 == 0 -- callers pad H to a multiple of 128 once (the dh
horizontal kernels need that padding anyway) and stay in padded-H space.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(x_ref, o_ref):
    # 8 middle-dim slices per program: Mosaic requires the last two block
    # dims to be (8, 128)-tileable, so the d dim is blocked by 8 (static
    # in-block slice indices) instead of 1
    for i in range(8):
        o_ref[:, i, :] = jnp.transpose(x_ref[:, i, :], (1, 0))


def vol_transpose(x, block=384, interpret=False):
    """swapaxes(x, 0, 2) for a 3D volume, tiled per 8 middle-dim slices.

    Equivalent to jnp.transpose(x, (2, 1, 0)); requires x.shape[0] % 128
    == 0, x.shape[2] % 128 == 0 and x.shape[1] % 8 == 0 (the wrapper picks
    outer-dim blocks that divide both, preferring large tiles)."""
    import os

    A, D, B = x.shape
    # XLA's native transpose measures FASTER than this kernel at the
    # flagship shape (1.45ms vs 2.4ms device for (768, 128, 1152) int16,
    # round-3 profile_chain), so it is the default; RTDM_PALLAS_TRANSPOSE=1
    # re-enables the kernel (and RTDM_NO_PALLAS_TRANSPOSE=1 still forces
    # XLA for bench-ladder compatibility).
    use_pallas = os.environ.get("RTDM_PALLAS_TRANSPOSE", "") == "1" and (
        os.environ.get("RTDM_NO_PALLAS_TRANSPOSE", "") in ("", "0"))
    if A % 128 or B % 128 or D % 8 or not use_pallas:
        return jnp.transpose(x, (2, 1, 0))

    def pick(n):
        for cand in (block, 256, 128):
            if n % cand == 0:
                return cand
        return 128

    ab, bb = pick(A), pick(B)
    grid = (D // 8, A // ab, B // bb)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((ab, 8, bb), lambda d, a, b: (a, d, b))],
        out_specs=pl.BlockSpec((bb, 8, ab), lambda d, a, b: (b, d, a)),
        out_shape=jax.ShapeDtypeStruct((B, D, A), x.dtype),
        interpret=interpret,
    )(x)
