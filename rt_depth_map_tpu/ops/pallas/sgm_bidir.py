"""Fused bidirectional SGM aggregation kernels.

The single-direction streaming kernels in sgm_hdw.py are bound by the
per-step serial dependency of the SGM recurrence, not by DMA or VPU
throughput (~6us/step at 720p where the step math is ~2us): each L_r row
(column) depends on the previous one, so the VPU stalls on the carry
between steps. The two opposite sweeps of a direction family are
*independent* chains over the same data — running both inside ONE kernel
with two resident carries interleaves their dependency chains step-by-step,
hiding the stall and halving the number of sequential kernel steps per
frame (2*W1 + 2*H single-direction steps -> W1 + H fused iterations).

Visit discipline ("write-raw / read-modify-write"): at fused iteration t
the forward sweep processes block t while the backward sweep processes
block nb-1-t. During the first half each sweep writes its own raw
directional sum; during the second half each sweep re-reads the block the
*other* sweep wrote (always flushed: its writer ran in the first half, a
barrier sits between the halves) and writes the combined result — or, in
the vertical kernel, feeds the completed 8-direction total straight into
the fused WTA. HBM traffic is identical to the chained single-direction
launches it replaces.

Bit-exactness contract: the recurrence steps are sgm_hdw._sgm_step_hdw /
_three_dirs — outputs are bit-identical to the sgm_hdw pass compositions
(tests/test_sgm_bidir.py) and hence to ops/sgbm aggregate_cost and
golden/sgbm.py (cv::StereoSGBM semantics,
/root/reference/stereo-matcher/sw/semi-global-matcher-sw.cpp analog).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rt_depth_map_tpu.ops.pallas.sgm_hdw import (
    _sgm_step_hdw,
    _three_dirs,
    _wta_row_hdw,
)


def _probe_work(slab, n):
    """TIMING PROBE ONLY (RTDM_PROBE_BIDIR_WORK): emulates the op mix of an
    in-kernel BT-cost producer (unpack shifts/ands, BT max/sub/min chains,
    window rolls+selects+adds) on a resident slab, n repetitions. The
    result is XORed into the recurrence output to defeat DCE -- outputs are
    GARBAGE while the knob is set. Used by tools/probe_fused_hide.py to
    measure how much independent per-step arithmetic the bidirectional
    kernels hide in their dependency-stall bubbles (the go/no-go for the
    fused cost-into-aggregation design, docs/PERF_ROADMAP.md)."""
    g = slab
    for _ in range(n):
        # unpack-like: 5 shifts + 5 ands
        a = (g >> 8) & 255
        b = (g >> 16) & 255
        c = (g >> 24) & 255
        d = (g >> 1) & 127
        e = (g >> 3) & 63
        # BT-like: interleaved max/sub/min chains (~20 ops)
        c0 = jnp.maximum(0, jnp.maximum(a - b, c - a))
        c1 = jnp.maximum(0, jnp.maximum(b - d, e - b))
        c2 = jnp.minimum(c0, c1)
        c3 = jnp.maximum(0, jnp.maximum(a - e, d - a))
        c4 = jnp.maximum(0, jnp.maximum(c - d, e - c))
        c5 = jnp.minimum(c3, c4)
        p = c2 + (c5 >> 2)
        # window-like: 4 rolls + 4 selects + 6 adds
        pos = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
        acc = p
        for k in (1, 2):
            l_ = jnp.where(pos < k, p, pltpu.roll(p, k, axis=1))
            r_ = jnp.where(pos >= p.shape[1] - k, p,
                           pltpu.roll(p, -k % p.shape[1], axis=1))
            acc = acc + l_ + r_
        g = acc
    return g


def _horiz_bidir_kernel(Ct_hbm, out_hbm, cF, cB, crF, crB, obF, obB,
                        inF_sems, inB_sems, outF_sems, outB_sems,
                        rdF_sems, rdB_sems, *, W1, H, D, p1, p2,
                        io_dtype, KB, carry_dtype=jnp.int32, probe=0):
    """Both horizontal directions over the x-major (W1, D, H) volume in one
    launch. out_hbm ends as the 2-direction sum Sh_t. Forward visits block
    t ascending, backward block nb-1-t descending; KB columns per DMA."""
    nb = W1 // KB
    half = nb // 2  # wrapper asserts nb even

    def xF(b):
        return b * KB

    def xB(b):
        return (nb - 1 - b) * KB

    def inF(slot, b):
        return pltpu.make_async_copy(Ct_hbm.at[pl.ds(xF(b), KB)],
                                     crF.at[slot], inF_sems.at[slot])

    def inB(slot, b):
        return pltpu.make_async_copy(Ct_hbm.at[pl.ds(xB(b), KB)],
                                     crB.at[slot], inB_sems.at[slot])

    def outF(slot, b):
        return pltpu.make_async_copy(obF.at[slot],
                                     out_hbm.at[pl.ds(xF(b), KB)],
                                     outF_sems.at[slot])

    def outB(slot, b):
        return pltpu.make_async_copy(obB.at[slot],
                                     out_hbm.at[pl.ds(xB(b), KB)],
                                     outB_sems.at[slot])

    def rdF(slot, b):
        return pltpu.make_async_copy(out_hbm.at[pl.ds(xF(b), KB)],
                                     obF.at[slot], rdF_sems.at[slot])

    def rdB(slot, b):
        return pltpu.make_async_copy(out_hbm.at[pl.ds(xB(b), KB)],
                                     obB.at[slot], rdB_sems.at[slot])

    cF[...] = jnp.zeros((D, H), carry_dtype)
    cB[...] = jnp.zeros((D, H), carry_dtype)
    inF(0, 0).start()
    inB(0, 0).start()

    def steps(slot, raw):
        """KB interleaved steps of both chains; raw=True stores each
        direction's own L, raw=False adds the other direction's stored L
        (already DMA'd into the out buffer) before the store."""
        for k in range(KB):
            kb = KB - 1 - k  # backward processes its block right-to-left
            LF = _sgm_step_hdw(crF[slot, k].astype(carry_dtype), cF[...],
                               p1, p2)
            LB = _sgm_step_hdw(crB[slot, kb].astype(carry_dtype), cB[...],
                               p1, p2)
            if probe:  # timing probe only: see _probe_work (garbage output)
                LF = LF ^ (_probe_work(crF[slot, k].astype(jnp.int32),
                                       probe) & 1)
                LB = LB ^ (_probe_work(crB[slot, kb].astype(jnp.int32),
                                       probe) & 1)
            cF[...] = LF
            cB[...] = LB
            if raw:
                obF[slot, k] = LF.astype(io_dtype)
                obB[slot, kb] = LB.astype(io_dtype)
            else:
                # combined 2-direction sum <= 2 * C_max: exact in int16
                # whenever the int16 io gate held (5 * C_max <= 32767)
                obF[slot, k] = (LF + obF[slot, k].astype(carry_dtype)
                                ).astype(io_dtype)
                obB[slot, kb] = (LB + obB[slot, kb].astype(carry_dtype)
                                 ).astype(io_dtype)

    def body1(t, _):
        slot = t % 2

        @pl.when(t + 1 < nb)
        def _():
            inF(1 - slot, t + 1).start()
            inB(1 - slot, t + 1).start()

        inF(slot, t).wait()
        inB(slot, t).wait()

        @pl.when(t >= 2)
        def _():
            outF(slot, t - 2).wait()
            outB(slot, t - 2).wait()

        steps(slot, raw=True)
        outF(slot, t).start()
        outB(slot, t).start()
        return 0

    jax.lax.fori_loop(0, half, body1, 0)
    # barrier: every first-half raw block is in HBM before any read-back
    for t in (half - 2, half - 1):
        if t >= 0:
            outF(t % 2, t).wait()
            outB(t % 2, t).wait()
    # first read-backs of the second half (buffers are free: just waited)
    rdF(half % 2, half).start()
    rdB(half % 2, half).start()

    def body2(t, _):
        slot = t % 2

        @pl.when(t + 1 < nb)
        def _():
            inF(1 - slot, t + 1).start()
            inB(1 - slot, t + 1).start()

        # next read-back waits for the combined-write that frees its buffer
        @pl.when(t + 1 < nb)
        def _():
            @pl.when(t - 1 >= half)
            def _():
                outF(1 - slot, t - 1).wait()
                outB(1 - slot, t - 1).wait()

            rdF(1 - slot, t + 1).start()
            rdB(1 - slot, t + 1).start()

        inF(slot, t).wait()
        inB(slot, t).wait()
        rdF(slot, t).wait()
        rdB(slot, t).wait()
        steps(slot, raw=False)
        outF(slot, t).start()
        outB(slot, t).start()
        return 0

    jax.lax.fori_loop(half, nb, body2, 0)
    for t in (nb - 2, nb - 1):
        if t >= half:
            outF(t % 2, t).wait()
            outB(t % 2, t).wait()


def _carry_dtype(io_dtype, p1, p2):
    """RETIRED (round 5): always int32.

    int16 recurrence carries were provably exact (io int16 certifies
    5 * C_max <= 32767; p1 + p2 <= 16384 keeps the border fill above
    every real candidate) and measured NEUTRAL at best in round 4 (the
    d +/- 1 shifts round-trip through int32 because Mosaic rotate is
    32-bit only, erasing the element-rate win). As of the current
    Mosaic, elementwise int16 `minsi` inside the fused kernels FAILS TO
    LEGALIZE on real hardware ("failed to legalize operation
    'arith.minsi'" on vector<8x128x2xi16>; interpret mode accepts it,
    so only an on-device compile sees the break -- HARVEST_R5 section
    14). A neutral-at-best knob that cannot compile on the target is
    retired; RTDM_INT16_CARRY is accepted and ignored
    (tests/test_int16_carry.py pins the no-op)."""
    del io_dtype, p1, p2
    return jnp.int32


def sgm_horiz_bidir_dh(Ct, p1, p2, interpret=False):
    """Two-direction horizontal SGM sum over the x-major volume Ct
    (W1, D, H) in one fused launch: bit-identical to
    sgm_horiz_pass_dh(reverse=True, partial=sgm_horiz_pass_dh(...)) at half
    the sequential steps (both carries resident, chains interleaved)."""
    W1, D, H = Ct.shape
    H_pad = -(-H // 128) * 128
    if H_pad != H and not interpret:
        Ct = jnp.pad(Ct, ((0, 0), (0, 0), (0, H_pad - H)))
        return sgm_horiz_bidir_dh(Ct, p1, p2, interpret=interpret)[:, :, :H]
    p2 = max(p2, p1 + 1)
    io_dtype = Ct.dtype
    # KB columns per DMA, shrunk until the 4 double-buffered stream
    # buffers + 2 int32 carries fit the VMEM budget (batched calls stack
    # frames along H, growing every buffer proportionally)
    import os

    itemsize = jnp.dtype(io_dtype).itemsize

    def vmem_need(kb):
        # 4 double-buffered (2, KB, D, H) stream buffers + 2 int32 carries
        return 8 * kb * D * H * itemsize + 8 * D * H

    probe = int(os.environ.get("RTDM_PROBE_BIDIR_WORK", "0") or 0)
    if os.environ.get("RTDM_HBIDIR_KB", ""):  # hardware-tuning override
        KB = int(os.environ["RTDM_HBIDIR_KB"])
    else:
        # the launch is fori-trip-overhead-bound (~20us/trip regardless of
        # body size: tools/scratch_pass_floor.py measures null == full
        # recurrence), so the default block is as large as VMEM allows --
        # fewer trips, same DMA bytes and step math
        KB = 32
    # fit clamp (applies to the tuned override too: TUNED.env knobs are
    # swept at b1 shapes, and the batched call stacks frames along H, so a
    # knob swept at batch=1 can blow the budget at batch=4); also enforce
    # the W1 % (2 * KB) visit-discipline constraint by shrinking
    budget = 88 * 2**20  # v5e has 128M physical VMEM
    while KB > 1 and (vmem_need(KB) > budget or W1 % (2 * KB)):
        KB //= 2
    if W1 % (2 * KB):
        raise ValueError(f"W1={W1} must be a multiple of {2 * KB}")
    cdt = _carry_dtype(io_dtype, p1, p2)
    kernel = functools.partial(
        _horiz_bidir_kernel, W1=W1, H=H, D=D, p1=p1, p2=p2,
        io_dtype=io_dtype, KB=KB, carry_dtype=cdt, probe=probe,
    )
    buf = lambda: pltpu.VMEM((2, KB, D, H), io_dtype)  # noqa: E731
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((W1, D, H), io_dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((D, H), cdt),
            pltpu.VMEM((D, H), cdt),
            buf(), buf(), buf(), buf(),
        ] + [pltpu.SemaphoreType.DMA((2,)) for _ in range(6)],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(Ct)


def _vert_bidir_wta_kernel(C_hbm, Sp_hbm, best_hbm, minS_hbm, dval_hbm,
                           uniq_hbm, raw_hbm,
                           cD0, cD1, cD2, cU0, cU1, cU2,
                           crD, crU, shD, shU, rwD, rwU, obD, obU,
                           inD_sems, inU_sems, shD_sems, shU_sems,
                           rwD_sems, rwU_sems, obD_sems, obU_sems,
                           *, H, W1, D, p1, p2, uniqueness_ratio,
                           io_dtype, KB, seg=None, carry_dtype=jnp.int32,
                           probe=0):
    """Down3 + up3 + WTA over (H, D, W1) in one launch. First half: each
    sweep writes its raw 3-direction sum to raw_hbm. Second half: each
    sweep reads the other's raw block, adds its own 3 directions and the
    horizontal partial Sp, and runs per-row WTA (rows [H/2, H) from the
    down sweep, rows [0, H/2) from the up sweep). C_hbm and Sp_hbm may have
    MORE than H rows (padded-H from the horizontal stage / cost out_h);
    rows >= H are never read."""
    nb = H // KB
    half = nb // 2
    per = 8 // KB  # iterations per 8-row WTA output block

    def yD(b):
        return b * KB

    def yU(b):
        return (nb - 1 - b) * KB

    def inD(slot, b):
        return pltpu.make_async_copy(C_hbm.at[pl.ds(yD(b), KB)],
                                     crD.at[slot], inD_sems.at[slot])

    def inU(slot, b):
        return pltpu.make_async_copy(C_hbm.at[pl.ds(yU(b), KB)],
                                     crU.at[slot], inU_sems.at[slot])

    def spD(slot, b):
        return pltpu.make_async_copy(Sp_hbm.at[pl.ds(yD(b), KB)],
                                     shD.at[slot], shD_sems.at[slot])

    def spU(slot, b):
        return pltpu.make_async_copy(Sp_hbm.at[pl.ds(yU(b), KB)],
                                     shU.at[slot], shU_sems.at[slot])

    def rawD(slot, b, write):
        # down sweep's raw buffer: write own rows (1st half), read the up
        # sweep's raw at the same rows (2nd half)
        args = (rwD.at[slot], raw_hbm.at[pl.ds(yD(b), KB)])
        src, dst = args if write else args[::-1]
        return pltpu.make_async_copy(src, dst, rwD_sems.at[slot])

    def rawU(slot, b, write):
        args = (rwU.at[slot], raw_hbm.at[pl.ds(yU(b), KB)])
        src, dst = args if write else args[::-1]
        return pltpu.make_async_copy(src, dst, rwU_sems.at[slot])

    def obD_dmas(slot, blk):
        # down sweep's WTA rows ascend from H/2
        y0 = pl.multiple_of(half * KB + blk * 8, 8)
        targets = (best_hbm, minS_hbm, dval_hbm, uniq_hbm)
        return [
            pltpu.make_async_copy(obD.at[slot, k], t.at[pl.ds(y0, 8), :],
                                  obD_sems.at[slot, k])
            for k, t in enumerate(targets)
        ]

    def obU_dmas(slot, blk):
        # up sweep's WTA rows descend from H/2
        y0 = pl.multiple_of(half * KB - (blk + 1) * 8, 8)
        targets = (best_hbm, minS_hbm, dval_hbm, uniq_hbm)
        return [
            pltpu.make_async_copy(obU.at[slot, k], t.at[pl.ds(y0, 8), :],
                                  obU_sems.at[slot, k])
            for k, t in enumerate(targets)
        ]

    # Lane-stacked batching (seg = per-frame W1): the diagonal carries'
    # x +/- 1 shifts must re-create each frame's zero image border instead
    # of leaking the neighbor frame's edge column. The masks are
    # loop-invariant iota expressions hoisted out of both fori_loops.
    if seg is not None and seg != W1:
        pos = jax.lax.broadcasted_iota(jnp.int32, (1, W1), 1)
        e_lo = (pos % seg) == 0
        e_hi = (pos % seg) == (seg - 1)
    else:
        e_lo = e_hi = None

    for c in (cD0, cD1, cD2, cU0, cU1, cU2):
        c[...] = jnp.zeros((D, W1), carry_dtype)
    inD(0, 0).start()
    inU(0, 0).start()

    def body1(t, _):
        slot = t % 2

        @pl.when(t + 1 < nb)
        def _():
            inD(1 - slot, t + 1).start()
            inU(1 - slot, t + 1).start()

        inD(slot, t).wait()
        inU(slot, t).wait()

        @pl.when(t >= 2)
        def _():
            rawD(slot, t - 2, write=True).wait()
            rawU(slot, t - 2, write=True).wait()

        for k in range(KB):
            ku = KB - 1 - k  # up sweep walks its block bottom-to-top
            CD = crD[slot, k].astype(carry_dtype)
            CU = crU[slot, ku].astype(carry_dtype)
            D0, D1, D2 = _three_dirs(CD, cD0[...], cD1[...], cD2[...],
                                     p1, p2, e_lo, e_hi)
            U0, U1, U2 = _three_dirs(CU, cU0[...], cU1[...], cU2[...],
                                     p1, p2, e_lo, e_hi)
            if probe:  # timing probe only: see _probe_work (garbage output)
                D0 = D0 ^ (_probe_work(CD, probe) & 1)
                U0 = U0 ^ (_probe_work(CU, probe) & 1)
            cD0[...], cD1[...], cD2[...] = D0, D1, D2
            cU0[...], cU1[...], cU2[...] = U0, U1, U2
            rwD[slot, k] = (D0 + D1 + D2).astype(io_dtype)
            rwU[slot, ku] = (U0 + U1 + U2).astype(io_dtype)
        rawD(slot, t, write=True).start()
        rawU(slot, t, write=True).start()
        return 0

    jax.lax.fori_loop(0, half, body1, 0)
    for t in (half - 2, half - 1):
        if t >= 0:
            rawD(t % 2, t, write=True).wait()
            rawU(t % 2, t, write=True).wait()
    rawD(half % 2, half, write=False).start()
    rawU(half % 2, half, write=False).start()
    spD(half % 2, half).start()
    spU(half % 2, half).start()

    def body2(t, _):
        slot = t % 2
        t2 = t - half
        blk = t2 // per
        oslot = blk % 2

        @pl.when(t + 1 < nb)
        def _():
            inD(1 - slot, t + 1).start()
            inU(1 - slot, t + 1).start()
            # raw/sp read prefetch reuses buffers whose last reader was the
            # compute of iteration t-1 (no outgoing DMA from them in this
            # half), so program order alone makes the reuse safe
            rawD(1 - slot, t + 1, write=False).start()
            rawU(1 - slot, t + 1, write=False).start()
            spD(1 - slot, t + 1).start()
            spU(1 - slot, t + 1).start()

        inD(slot, t).wait()
        inU(slot, t).wait()
        rawD(slot, t, write=False).wait()
        rawU(slot, t, write=False).wait()
        spD(slot, t).wait()
        spU(slot, t).wait()

        @pl.when((t2 % per == 0) & (blk >= 2))
        def _():
            for d in obD_dmas(oslot, blk - 2):
                d.wait()
            for d in obU_dmas(oslot, blk - 2):
                d.wait()

        for k in range(KB):
            ku = KB - 1 - k
            CD = crD[slot, k].astype(carry_dtype)
            CU = crU[slot, ku].astype(carry_dtype)
            D0, D1, D2 = _three_dirs(CD, cD0[...], cD1[...], cD2[...],
                                     p1, p2, e_lo, e_hi)
            U0, U1, U2 = _three_dirs(CU, cU0[...], cU1[...], cU2[...],
                                     p1, p2, e_lo, e_hi)
            if probe:  # timing probe only: see _probe_work (garbage output)
                D0 = D0 ^ (_probe_work(CD, probe) & 1)
                U0 = U0 ^ (_probe_work(CU, probe) & 1)
            cD0[...], cD1[...], cD2[...] = D0, D1, D2
            cU0[...], cU1[...], cU2[...] = U0, U1, U2
            # the 8-direction total can exceed int16 (8 * C_max): sum in
            # int32 regardless of the carry dtype
            SD = (D0.astype(jnp.int32) + D1.astype(jnp.int32)
                  + D2.astype(jnp.int32) + rwD[slot, k].astype(jnp.int32)
                  + shD[slot, k].astype(jnp.int32))
            SU = (U0.astype(jnp.int32) + U1.astype(jnp.int32)
                  + U2.astype(jnp.int32) + rwU[slot, ku].astype(jnp.int32)
                  + shU[slot, ku].astype(jnp.int32))
            bD, mD, dD, qD = _wta_row_hdw(SD, D, uniqueness_ratio)
            bU, mU, dU, qU = _wta_row_hdw(SU, D, uniqueness_ratio)
            r = (t2 * KB + k) % 8
            obD[oslot, 0, pl.ds(r, 1)] = bD.reshape(1, W1)
            obD[oslot, 1, pl.ds(r, 1)] = mD.reshape(1, W1)
            obD[oslot, 2, pl.ds(r, 1)] = dD.reshape(1, W1)
            obD[oslot, 3, pl.ds(r, 1)] = qD.reshape(1, W1)
            ru = 7 - ((t2 * KB + (KB - 1 - ku)) % 8)
            obU[oslot, 0, pl.ds(ru, 1)] = bU.reshape(1, W1)
            obU[oslot, 1, pl.ds(ru, 1)] = mU.reshape(1, W1)
            obU[oslot, 2, pl.ds(ru, 1)] = dU.reshape(1, W1)
            obU[oslot, 3, pl.ds(ru, 1)] = qU.reshape(1, W1)

        @pl.when(t2 % per == per - 1)
        def _():
            for d in obD_dmas(oslot, blk):
                d.start()
            for d in obU_dmas(oslot, blk):
                d.start()

        return 0

    jax.lax.fori_loop(half, nb, body2, 0)
    n_blocks = (half * KB) // 8
    for blk in (n_blocks - 2, n_blocks - 1):
        if blk >= 0:
            for d in obD_dmas(blk % 2, blk):
                d.wait()
            for d in obU_dmas(blk % 2, blk):
                d.wait()


def vbidir_vmem_bytes(H, W1, D, KB, io_itemsize=2):
    """Scoped-VMEM bytes the fused vert-bidir kernel will request: 6
    (D, W1) int32 carries + 6 (2, KB, D, W1) io-dtype stream buffers + 2
    small (2, 4, 8, W1) int32 output staging buffers. The default Mosaic
    scoped limit is 16MB; tune_kb uses this to SKIP candidates that would
    OOM instead of paying a ~40s failing compile (VERDICT round 2 weak
    item 3: KB=4 -> 17.45M, KB=8 -> 30.95M at 720p, both died)."""
    del H
    carries = 6 * D * W1 * 4
    bufs = 6 * 2 * KB * D * W1 * io_itemsize
    staging = 2 * 2 * 4 * 8 * W1 * 4
    return carries + bufs + staging


def sgm_vert_bidir_wta_hdw(C, S_partial, p1, p2, uniqueness_ratio,
                           interpret=False, true_h=None, seg=None):
    """Fused down3 + up3 + WTA over (H, D, W1) cost C with horizontal
    partial S_partial: one launch replacing sgm_down_pass_hdw +
    sgm_final_wta_hdw(reverse=True) bit-exactly, at half the sequential
    steps. Returns (best, minS, dval, uniq), each (H, W1) int32.

    Both C and S_partial may carry extra (padded) rows beyond the true
    image height (pass it as true_h when C is padded); rows >= true_h are
    never read (the horizontal stage works in 128-padded H space, and the
    cost kernel can emit that space directly via out_h).

    seg: per-frame width when W1 lane-stacks B frames (W1 = B * seg,
    multi-stream batching): diagonal carry shifts zero each frame's border
    column, making the stacked run bit-identical to B per-frame runs while
    the per-row dependency stall amortizes over B frames."""
    H = C.shape[0] if true_h is None else true_h
    D, W1 = C.shape[1], C.shape[2]
    if W1 % 128 or H % 16:
        raise ValueError(f"(H, W1) = ({H}, {W1}) must tile (16, 128)")
    if seg is not None and (W1 % seg or seg % 128):
        raise ValueError(f"seg={seg} must divide W1={W1} and tile 128 lanes")
    assert C.shape[0] >= H
    assert S_partial.shape[0] >= H and S_partial.shape[1:] == (D, W1)
    import os

    p2 = max(p2, p1 + 1)
    io_dtype = C.dtype
    # default block: largest allowed (fori-trip overhead dominates, see
    # sgm_horiz_bidir_dh); the kernel structure caps KB at 8. Lane-stacked
    # batched launches (seg set, W1 = B * seg) default to KB=2: the
    # per-trip unroll is KB x 6 recurrence steps over (D, B*seg) -- at
    # KB>=4 the Mosaic register allocator has twice hung/killed the
    # compile helper at the b4 flagship shape, while KB=2 compiles in
    # ~2.5 min and the wider lanes already amortize the trip overhead.
    default_kb = "2" if (seg is not None and seg != W1) else "8"
    KB = int(os.environ.get("RTDM_VBIDIR_KB", default_kb))
    while KB > 1 and (
        8 % KB or H % (2 * KB)
        or vbidir_vmem_bytes(H, W1, D, KB,
                             jnp.dtype(io_dtype).itemsize) > 88 * 2**20
    ):
        KB //= 2
    if 8 % KB or H % (2 * KB):
        raise ValueError(f"KB={KB} must divide 8 and 2*KB must divide H={H}")
    cdt = _carry_dtype(io_dtype, p1, p2)
    probe = int(os.environ.get("RTDM_PROBE_BIDIR_WORK", "0") or 0)
    kernel = functools.partial(
        _vert_bidir_wta_kernel, H=H, W1=W1, D=D, p1=p1, p2=p2,
        uniqueness_ratio=uniqueness_ratio, io_dtype=io_dtype, KB=KB,
        seg=seg, carry_dtype=cdt, probe=probe,
    )
    out = jax.ShapeDtypeStruct((H, W1), jnp.int32)
    buf = lambda dt: pltpu.VMEM((2, KB, D, W1), dt)  # noqa: E731
    carry = lambda: pltpu.VMEM((D, W1), cdt)  # noqa: E731
    outs = pl.pallas_call(
        kernel,
        out_shape=(out,) * 4 + (jax.ShapeDtypeStruct((H, D, W1), io_dtype),),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=tuple(pl.BlockSpec(memory_space=pl.ANY)
                        for _ in range(5)),
        scratch_shapes=[carry() for _ in range(6)]
        + [buf(io_dtype) for _ in range(4)]       # crD crU shD shU
        + [buf(io_dtype) for _ in range(2)]       # rwD rwU
        + [pltpu.VMEM((2, 4, 8, W1), jnp.int32) for _ in range(2)]
        + [pltpu.SemaphoreType.DMA((2,)) for _ in range(6)]
        + [pltpu.SemaphoreType.DMA((2, 4)) for _ in range(2)],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(C, S_partial)
    return outs[0], outs[1], outs[2], outs[3]
