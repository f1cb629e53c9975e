"""Label histogram on the MXU: per-root component counts without scatter.

`component_sizes` needs, for every connected-component root r (a linear
pixel index), the number of active pixels whose label equals r, delivered
AT the root's (row, col) position in an (H, W) image. XLA lowers the
natural `zeros.at[labels].add(1)` to a serial per-update scatter (~10ns x
H*W updates ~= 9-10ms at 720p -- scatter cost scales with updates, there
is no TPU scatter unit).

This kernel reformulates the histogram as one-hot matmuls, which the MXU
eats: for a block of P pixels with label rows rho and label cols gamma,

    A[r, c] += sum_p [rho_p == r] * [gamma_p == c]
             = dot(UT, VT^T),  UT[r, p] = (rho_p == r), VT[c, p] = (gamma_p == c)

Both one-hots are built lane-major (pixel index on lanes), so no in-kernel
transposes; the contraction runs over the shared lane dim. Total work is
H*W pixels x H*W bins = 850 GMAC at 720p -- ~2ms of int8 MXU vs ~10ms of
scatter. Counts accumulate exactly (each block contributes <= P < 2^15 per
bin into an i32/f32 accumulator; f32 totals stay < 2^24).

Inactive pixels are excluded by setting rho = -1 (matches no row bin).

dot_dtype int8 (default) runs the MXU at twice the bf16 rate with exact
int32 accumulation; bf16/f32 accumulation stays available (counts < 2^24
remain exact there too).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_P = 4096  # pixels per one-hot matmul (lane-dim of both one-hot factors)
_KB = 4  # (_KB, _P) pixel superblocks per DMA


def _kernel(rho_hbm, gam_hbm, A_ref, rbuf, gbuf, sems, *,
            NB, H, W, dot_dtype, acc_dtype):
    def in_dma(slot, b):
        return [
            pltpu.make_async_copy(rho_hbm.at[b], rbuf.at[slot],
                                  sems.at[slot, 0]),
            pltpu.make_async_copy(gam_hbm.at[b], gbuf.at[slot],
                                  sems.at[slot, 1]),
        ]

    A_ref[...] = jnp.zeros((H, W), acc_dtype)
    for d in in_dma(0, 0):
        d.start()

    riota = jax.lax.broadcasted_iota(jnp.int32, (H, _P), 0)
    ciota = jax.lax.broadcasted_iota(jnp.int32, (W, _P), 0)

    def body(b, _):
        slot = b % 2

        @pl.when(b + 1 < NB)
        def _():
            for d in in_dma(1 - slot, b + 1):
                d.start()

        for d in in_dma(slot, b):
            d.wait()

        for k in range(_KB):
            rho = rbuf[slot, k].reshape(1, _P)
            gam = gbuf[slot, k].reshape(1, _P)
            UT = (riota == rho).astype(dot_dtype)  # (H, P)
            VT = (ciota == gam).astype(dot_dtype)  # (W, P)
            A_ref[...] += jax.lax.dot_general(
                UT, VT, (((1,), (1,)), ((), ())),
                preferred_element_type=acc_dtype,
            )
        return 0

    jax.lax.fori_loop(0, NB, body, 0)


def _banded2d_kernel(rho_hbm, gam_hbm, A_ref, apad, rbuf, gbuf, sems, *,
                     NB, H, W, Sr, Sc, dot_dtype):
    """Row- AND column-banded histogram: each 8-row block is processed as
    W/128 column tiles whose one-hot column factor only spans the
    [x0 - Sc, x0 + 128 + Sc) window -- cutting the MXU work by
    ~W / (2*Sc + 128) vs the row-banded kernel. Exactness for the
    size <= max_size decision follows the same localization argument as
    the row band (see label_histogram_banded), applied to columns: a
    pixel at graph distance k from its root lies within k columns of it,
    so either every counted pixel's root is in-window (count == size) or
    the first max_size + 1 path pixels from the root all count
    (count > max_size)."""
    Br = Sr + 8
    Bc = 2 * Sc + 128
    Hp = NB * 8
    NT = W // 128

    def in_dma(slot, b):
        return [
            pltpu.make_async_copy(rho_hbm.at[b], rbuf.at[slot],
                                  sems.at[slot, 0]),
            pltpu.make_async_copy(gam_hbm.at[b], gbuf.at[slot],
                                  sems.at[slot, 1]),
        ]

    apad[...] = jnp.zeros((Hp + Sr, W + 2 * Sc), jnp.int32)
    for d in in_dma(0, 0):
        d.start()

    riota = jax.lax.broadcasted_iota(jnp.int32, (Br, 8 * 128), 0)
    ciota = jax.lax.broadcasted_iota(jnp.int32, (Bc, 8 * 128), 0)

    def body(b, _):
        slot = b % 2

        @pl.when(b + 1 < NB)
        def _():
            for d in in_dma(1 - slot, b + 1):
                d.start()

        for d in in_dma(slot, b):
            d.wait()

        y0 = pl.multiple_of(b * 8, 8)
        # blocks arrive TILE-MAJOR from the wrapper: rbuf[slot, t] is the
        # (8, 128) pixel tile pre-flattened to (1, 1024) lanes -- direct
        # slices, no in-kernel relayout
        for t in range(NT):
            x0 = 128 * t
            rho_loc = rbuf[slot, t] - y0 + Sr   # (1, 1024)
            gam_loc = gbuf[slot, t] - x0 + Sc
            UT = (riota == rho_loc).astype(dot_dtype)   # (Br, 1024)
            VT = (ciota == gam_loc).astype(dot_dtype)   # (Bc, 1024)
            patch = jax.lax.dot_general(
                UT, VT, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            apad[pl.ds(y0, Br), pl.ds(pl.multiple_of(x0, 128), Bc)] += patch
        return 0

    jax.lax.fori_loop(0, NB, body, 0)
    A_ref[...] = apad[Sr:Sr + H, Sc:Sc + W]


def _banded_kernel(rho_hbm, gam_hbm, A_ref, apad, rbuf, gbuf, sems, *,
                   NB, H, W, Sr, dot_dtype):
    # apad is sized (NB * 8 + Sr, W): the last block's accumulate spans rows
    # [NB*8 - 8, NB*8 + Sr), which exceeds H + Sr when H % 8 != 0
    Br = Sr + 8
    Hp = NB * 8

    def in_dma(slot, b):
        return [
            pltpu.make_async_copy(rho_hbm.at[b], rbuf.at[slot],
                                  sems.at[slot, 0]),
            pltpu.make_async_copy(gam_hbm.at[b], gbuf.at[slot],
                                  sems.at[slot, 1]),
        ]

    apad[...] = jnp.zeros((Hp + Sr, W), jnp.int32)
    for d in in_dma(0, 0):
        d.start()

    riota = jax.lax.broadcasted_iota(jnp.int32, (Br, 8 * W), 0)
    ciota = jax.lax.broadcasted_iota(jnp.int32, (W, 8 * W), 0)

    def body(b, _):
        slot = b % 2

        @pl.when(b + 1 < NB)
        def _():
            for d in in_dma(1 - slot, b + 1):
                d.start()

        for d in in_dma(slot, b):
            d.wait()

        y0 = pl.multiple_of(b * 8, 8)
        # local row bin = rho - (y0 - Sr); roots above the window (or the
        # inactive sentinel) go negative and match no one-hot row
        rho_loc = rbuf[slot] - y0 + Sr  # (1, 8W)
        UT = (riota == rho_loc).astype(dot_dtype)   # (Br, 8W)
        VT = (ciota == gbuf[slot]).astype(dot_dtype)  # (W, 8W)
        patch = jax.lax.dot_general(
            UT, VT, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        apad[pl.ds(y0, Br), :] += patch
        return 0

    jax.lax.fori_loop(0, NB, body, 0)
    A_ref[...] = apad[Sr:Sr + H, :]


def label_histogram_banded(
    labels: jnp.ndarray,
    active: jnp.ndarray,
    max_size: int,
    interpret: bool = False,
    dot_dtype=jnp.int8,
) -> jnp.ndarray:
    """Windowed label histogram, exact for the `size <= max_size` decision.

    Counts each active pixel toward its root's (y, x) bin ONLY when the
    root lies within Sr = roundup(max_size, 8) rows above the pixel's
    8-row block. Localization argument (exact for the decision):
      * a component of size <= max_size spans <= max_size - 1 rows, so
        every pixel's root is within the window -> count == true size;
      * a component of size > max_size either fits the window entirely
        (count == size > max_size) or reaches a pixel whose root is
        farther than Sr rows up -- the connected path from that root back
        down crosses > Sr >= max_size rows, placing > max_size pixels
        inside the window -> count > max_size either way.
    So (count <= max_size) == (true size <= max_size) for every root,
    which is all cv::filterSpeckles needs. Work drops from
    H*W pixels x H*W bins (850 GMAC at 720p, label_histogram_pallas) to
    H*W x (Sr+8)*W (~130 GMAC at max_size=100).

    labels: (H, W) int32 min-linear-index labels (ops/cc.py contract).
    Returns (H, W) int32 windowed counts, addressed at the root position.

    When max_size <= 128 (the cv2 default speckle window is 100) the
    kernel is ALSO column-banded (_banded2d_kernel): the column one-hot
    spans only a +/-Sc window around each 128-lane pixel tile, cutting the
    MXU work by ~W / (2*Sc + 128) (3.3x at 720p) with the same
    exact-decision localization argument applied to columns.
    """
    H, W = labels.shape
    if W % 128:
        raise ValueError(f"W={W} must be a lane multiple")
    Sr = max(8, -(-int(max_size) // 8) * 8)
    Hp = -(-H // 8) * 8
    NB = Hp // 8
    # inactive/pad pixels get a large-negative row so the per-block local
    # row bin (rho - y0 + Sr) can never reach a valid one-hot row
    rho = jnp.where(active, labels // W, -(2**20))
    gam = jnp.where(active, labels - (labels // W) * W, -(2**20))

    import os

    use_2d = int(max_size) <= 128 and os.environ.get(
        "RTDM_NO_HIST2D", "") in ("", "0")
    if use_2d:
        Sc = 128  # >= max_size, lane-aligned apad slices
        NT = W // 128

        def blk(x, fill):
            x = jnp.pad(x.reshape(-1), (0, Hp * W - H * W),
                        constant_values=fill)
            # tile-major: [b, t] = the b-th 8-row block's t-th (8, 128)
            # column tile flattened to 1024 lanes (kernel slices it
            # directly -- no in-kernel relayout)
            x = x.reshape(NB, 8, NT, 128)
            return jnp.transpose(x, (0, 2, 1, 3)).reshape(NB, NT, 1, 1024)

        kernel = functools.partial(
            _banded2d_kernel, NB=NB, H=H, W=W, Sr=Sr, Sc=Sc,
            dot_dtype=dot_dtype,
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((Hp + Sr, W + 2 * Sc), jnp.int32),
                pltpu.VMEM((2, NT, 1, 1024), jnp.int32),
                pltpu.VMEM((2, NT, 1, 1024), jnp.int32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=64 * 2**20,
            ),
            interpret=interpret,
        )(blk(rho, -(2**20)), blk(gam, -(2**20)))

    def blk(x, fill):
        x = jnp.pad(x.reshape(-1), (0, Hp * W - H * W),
                    constant_values=fill)
        return x.reshape(Hp // 8, 1, 8 * W)

    kernel = functools.partial(
        _banded_kernel, NB=NB, H=H, W=W, Sr=Sr, dot_dtype=dot_dtype,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((Hp + Sr, W), jnp.int32),
            pltpu.VMEM((2, 1, 8 * W), jnp.int32),
            pltpu.VMEM((2, 1, 8 * W), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # VT one-hot alone is (W, 8W) int8 = 13MB at 720p
            vmem_limit_bytes=64 * 2**20,
        ),
        interpret=interpret,
    )(blk(rho, -(2**20)), blk(gam, -1))


def label_histogram_pallas(
    labels: jnp.ndarray,
    active: jnp.ndarray,
    interpret: bool = False,
    dot_dtype=jnp.int8,
) -> jnp.ndarray:
    """(H, W) int32 image A with A[y, x] = #{active p : labels[p] == y*W+x}.

    labels: (H, W) int32 linear-index labels (ops/cc.py contract).
    """
    H, W = labels.shape
    N = H * W
    rho = jnp.where(active, labels // W, -1)
    gam = labels - (labels // W) * W
    SB = _KB * _P
    NB = -(-N // SB)
    pad = NB * SB - N

    def blk(x):
        x = jnp.pad(x.reshape(-1), (0, pad), constant_values=-1)
        return x.reshape(NB, _KB, _P)

    acc_dtype = jnp.float32 if dot_dtype == jnp.bfloat16 else jnp.int32
    kernel = functools.partial(
        _kernel, NB=NB, H=H, W=W, dot_dtype=dot_dtype, acc_dtype=acc_dtype,
    )
    A = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, W), acc_dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, _KB, _P), jnp.int32),
            pltpu.VMEM((2, _KB, _P), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(blk(rho), blk(gam))
    # f32 accumulation is exact: every count <= H*W < 2^24
    return A.astype(jnp.int32)
