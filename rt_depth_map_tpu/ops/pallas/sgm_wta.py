"""Fused final SGM pass: bottom-up 3-direction aggregation + WTA.

stereo_sgbm's cost breakdown at 720p (tools/profile_chain.py) put the WTA /
uniqueness / subpixel stage at ~92ms -- XLA re-reads the 472MB aggregated
volume S for every reduction. This kernel never materializes S: it sweeps
bottom-up computing the last three directional aggregations ((-1,0),
(-1,+1), (-1,-1)) with VMEM carries, adds the partial sum of the other
directions streamed from HBM, and immediately reduces each finished S row to
its WTA outputs:

  best   (H, W1) int32   argmin over D, ties -> smallest d
  minS   (H, W1) int32   min over D
  dval   (H, W1) int32   x16 subpixel disparity value (no min_disp offset)
  uniq   (H, W1) int32   1 where the SGBM uniqueness test rejects

Bit-identical to the ops/sgbm.py formulation (all int32)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rt_depth_map_tpu.ops.pallas.sgm_scan import _sgm_step_block, _shift_rows

DISP_SCALE = 16


def _wta_row(S_row, uniqueness_ratio):
    """(W1, D) aggregated costs -> per-column WTA outputs, golden parity."""
    W1, D = S_row.shape
    # Mosaic has no integer argmin: pack (S, d) lexicographically -- one lane
    # reduce yields both the min cost and the smallest-d tie-broken argmin.
    # |S| < 8 paths * win^2 * 236 < 2^19 so S*D + d fits int32 comfortably.
    di = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1)
    kmin = jnp.min(S_row * D + di, axis=1)
    best = kmin % D
    minS = kmin // D
    bestc = best[:, None]
    outside = jnp.abs(di - bestc) > 1
    uniq = jnp.any(
        outside & (S_row * (100 - uniqueness_ratio) < minS[:, None] * 100),
        axis=1,
    ).astype(jnp.int32)

    BIGS = 2**30
    sm = jnp.min(jnp.where(di == bestc - 1, S_row, BIGS), axis=1)
    sp = jnp.min(jnp.where(di == bestc + 1, S_row, BIGS), axis=1)
    has_nb = (best > 0) & (best < D - 1)
    sm = jnp.where(best > 0, sm, minS)
    sp = jnp.where(best < D - 1, sp, minS)
    denom2 = jnp.maximum(sm + sp - 2 * minS, 1)
    num = (sm - sp) * DISP_SCALE + denom2
    # |num| < 2^21 and denom2*2 < 2^18: both exact in f32, so truncating
    # float division + one correction step reproduces integer // exactly.
    # (Mosaic lowers vector int32 division to enormous code.)
    a = jnp.abs(num)
    b = denom2 * 2
    q = (a.astype(jnp.float32) / b.astype(jnp.float32)).astype(jnp.int32)
    q = jnp.where(q * b > a, q - 1, q)
    q = jnp.where((q + 1) * b <= a, q + 1, q)
    sub = jnp.sign(num) * q
    dval = jnp.where(has_nb, best * DISP_SCALE + sub, best * DISP_SCALE)
    return best, minS, dval, uniq


def _kernel(C_hbm, Sp_hbm, best_hbm, minS_hbm, dval_hbm, uniq_hbm,
            carry0, carry1, carry2, crow, sprow, obuf, in_sems, sp_sems,
            out_sems, *, H, W1, D, p1, p2, uniqueness_ratio, reverse):
    # outputs are written in 8-row blocks: HBM (H, W1) int32 arrays are
    # (8, 128)-tiled, so single-row DMA destinations are rejected by Mosaic
    n_blocks = H // 8

    def y_of(i):
        return (H - 1 - i) if reverse else i

    def c_dma(slot, i):
        return pltpu.make_async_copy(C_hbm.at[y_of(i)], crow.at[slot],
                                     in_sems.at[slot])

    def sp_dma(slot, i):
        return pltpu.make_async_copy(Sp_hbm.at[y_of(i)], sprow.at[slot],
                                     sp_sems.at[slot])

    def out_dmas(slot, blk):
        y0 = (H - 8 * (blk + 1)) if reverse else 8 * blk
        y0 = pl.multiple_of(y0, 8)
        targets = (best_hbm, minS_hbm, dval_hbm, uniq_hbm)
        return [
            pltpu.make_async_copy(
                obuf.at[slot, k], t.at[pl.ds(y0, 8), :], out_sems.at[slot, k]
            )
            for k, t in enumerate(targets)
        ]

    carry0[...] = jnp.zeros((W1, D), jnp.int32)
    carry1[...] = jnp.zeros((W1, D), jnp.int32)
    carry2[...] = jnp.zeros((W1, D), jnp.int32)
    c_dma(0, 0).start()
    sp_dma(0, 0).start()

    def body(i, _):
        slot = i % 2
        blk = i // 8
        r = i % 8
        oslot = blk % 2

        @pl.when(i + 1 < H)
        def _():
            c_dma(1 - slot, i + 1).start()
            sp_dma(1 - slot, i + 1).start()

        c_dma(slot, i).wait()
        sp_dma(slot, i).wait()
        C_row = crow[slot]

        # before the first write into a reused block slot, drain its DMA
        @pl.when((r == 0) & (blk >= 2))
        def _():
            for d in out_dmas(oslot, blk - 2):
                d.wait()

        L0 = _sgm_step_block(C_row, carry0[...], p1, p2)
        L1 = _sgm_step_block(C_row, _shift_rows(carry1[...], 1), p1, p2)
        L2 = _sgm_step_block(C_row, _shift_rows(carry2[...], -1), p1, p2)
        carry0[...] = L0
        carry1[...] = L1
        carry2[...] = L2
        S_row = sprow[slot] + L0 + L1 + L2
        best, minS, dval, uniq = _wta_row(S_row, uniqueness_ratio)
        row = (7 - r) if reverse else r
        obuf[oslot, 0, pl.ds(row, 1)] = best.reshape(1, W1)
        obuf[oslot, 1, pl.ds(row, 1)] = minS.reshape(1, W1)
        obuf[oslot, 2, pl.ds(row, 1)] = dval.reshape(1, W1)
        obuf[oslot, 3, pl.ds(row, 1)] = uniq.reshape(1, W1)

        @pl.when(r == 7)
        def _():
            for d in out_dmas(oslot, blk):
                d.start()

        return 0

    jax.lax.fori_loop(0, H, body, 0)
    if n_blocks >= 2:
        for d in out_dmas((n_blocks - 2) % 2, n_blocks - 2):
            d.wait()
    for d in out_dmas((n_blocks - 1) % 2, n_blocks - 1):
        d.wait()


def sgm_final_pass_wta(
    C: jnp.ndarray,
    S_partial: jnp.ndarray,
    p1: int,
    p2: int,
    uniqueness_ratio: int,
    reverse: bool = True,
    interpret: bool = False,
):
    """(best, minS, dval, uniq) each (H, W1) int32. S_partial is the summed
    aggregation of every direction EXCEPT the three this pass computes:
    reverse=True sweeps bottom-up (directions (-1, {0,+1,-1}), the 8-path
    finish), reverse=False top-down (directions (+1, {0,+1,-1}), the 4-path
    finish)."""
    H, W1, D = C.shape
    if D % 128 or W1 % 128:
        # the (8, W1) block output DMAs need a lane-aligned W1
        raise ValueError(f"(W1, D) = ({W1}, {D}) must tile (128, 128)")
    if H % 8 or H < 16:
        raise ValueError("H must be a multiple of 8 and >= 16")
    kernel = functools.partial(
        _kernel, H=H, W1=W1, D=D, p1=p1, p2=max(p2, p1 + 1),
        uniqueness_ratio=uniqueness_ratio, reverse=reverse,
    )
    out = jax.ShapeDtypeStruct((H, W1), jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=(out, out, out, out),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.ANY) for _ in range(4)),
        scratch_shapes=[
            pltpu.VMEM((W1, D), jnp.int32),
            pltpu.VMEM((W1, D), jnp.int32),
            pltpu.VMEM((W1, D), jnp.int32),
            pltpu.VMEM((2, W1, D), jnp.int32),  # C row double buffer
            pltpu.VMEM((2, W1, D), jnp.int32),  # S_partial row double buffer
            pltpu.VMEM((2, 4, 8, W1), jnp.int32),  # out row blocks
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(C, S_partial)
