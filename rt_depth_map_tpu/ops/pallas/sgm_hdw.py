"""SGM aggregation + fused WTA in the (H, D, W1) volume layout.

In this layout each image row's costs form a (D, W1) slab: D on sublanes,
W1 on lanes. That makes the WTA reduction (over D) a SUBLANE reduce whose
(W1,) result already lives on lanes -- the row-store relayout that made the
first fused-WTA attempt cost ~40ms/frame disappears. The fused final pass
therefore never materializes the summed volume S:

  down pass:  3 directions (+1, {0,+1,-1}), writes the partial sum
              (optionally accumulating horizontal partials streamed in);
  final pass: 3 directions (-1, {0,+1,-1}) + per-row WTA/uniqueness/subpixel
              reduced in-kernel, 8-row block outputs.

d+/-1 shifts in the SGM recurrence are sublane shifts (axis 0 concats);
diagonal x-shifts are lane shifts (axis 1). Bit-identical to the
(H, W1, D) XLA reference path."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_COST = 32767
DISP_SCALE = 16

# v5e has 128MB physical VMEM; XLA's scoped-vmem check allows a Mosaic
# kernel only what its custom call requests via vmem_limit_bytes (default
# 16MB). The flagship shapes fit the default, but the 1080p/D=256 stretch
# point's scratch exceeds it in every pass (round-3 stretch OOM,
# VERDICT.md item 3) -- so each wrapper computes its scratch footprint and
# requests that plus headroom, shrinking its DMA block when the physical
# budget is the binding constraint.
_VMEM_CAP = 100 * 2**20


def _vmem_limit(scratch_bytes):
    return min(_VMEM_CAP, max(16 * 2**20, scratch_bytes + 6 * 2**20))


def _roll_shift(a, d, fill, axis):
    """Shift toward higher indices along `axis` by d (may be negative),
    filling vacated positions with `fill`. pltpu.roll + iota mask: the
    jnp.concatenate formulation forces a Mosaic relayout per step (the
    concat operands are misaligned to the (8, 128) tile grid), measured
    ~400us/full-plane at 720p; rolls are native."""
    N = a.shape[axis]
    pos = jax.lax.broadcasted_iota(jnp.int32, a.shape, axis)
    if a.dtype == jnp.int16:
        # Mosaic rotate only handles 32-bit data; roll through int32
        rolled = pltpu.roll(a.astype(jnp.int32), d % N,
                            axis=axis).astype(jnp.int16)
    else:
        rolled = pltpu.roll(a, d % N, axis=axis)
    mask = pos < d if d > 0 else pos >= N + d
    return jnp.where(mask, jnp.asarray(fill, a.dtype), rolled)


def _sgm_step_hdw(C_slab, Lp, p1, p2):
    """(D, W1) recurrence step; D on sublanes. Dtype-generic: follows
    Lp.dtype (int32 default; int16 carries when the wrapper proves the
    bounds -- L_r <= C_max and every intermediate <= C_max + p1 + p2,
    so a border fill of MAX_COST - p1 - p2 keeps all arithmetic exact
    and overflow-free; the fill value never wins a min either way, so
    outputs are bit-identical across dtypes)."""
    fill = MAX_COST if Lp.dtype == jnp.int32 else MAX_COST - p1 - p2
    p1 = jnp.asarray(p1, Lp.dtype)
    p2 = jnp.asarray(p2, Lp.dtype)
    if Lp.dtype == jnp.int16:
        # Mosaic has no int16 reductions; reduce through int32
        minLp = jnp.min(Lp.astype(jnp.int32), axis=0,
                        keepdims=True).astype(jnp.int16)
    else:
        minLp = jnp.min(Lp, axis=0, keepdims=True)
    lm = _roll_shift(Lp, 1, fill, 0)
    lp_ = _roll_shift(Lp, -1, fill, 0)
    delta = minLp + p2
    # min(lm, lp_) first: one shared +p1 instead of two (bit-exact; min
    # commutes with the constant add) -- the step runs ~1.3M times/frame
    m = jnp.minimum(jnp.minimum(Lp, delta), jnp.minimum(lm, lp_) + p1)
    return C_slab.astype(Lp.dtype) + m - delta


def _shift_lanes(L, dx, edge=None):
    """Zero-fill shift along W1 (lanes): previous pixel of direction
    (dy, dx) at column x is column x - dx of the previous row.

    edge (optional): (1, W1) bool plane marking the columns the shift
    vacates -- used when several frames are stacked along the lane axis
    (multi-stream batching): zeroing every per-frame border column after
    a full-width roll reproduces, per frame, exactly the zero image
    border OpenCV's aggregation starts from, so the stacked run is
    bit-identical to per-frame runs."""
    if dx == 0:
        return L
    if edge is None:
        return _roll_shift(L, dx, 0, 1)
    if L.dtype == jnp.int16:
        # Mosaic rotate is 32-bit only (same constraint _roll_shift works
        # around): round-trip int16 carries through int32
        rolled = pltpu.roll(L.astype(jnp.int32), dx % L.shape[1],
                            axis=1).astype(jnp.int16)
    else:
        rolled = pltpu.roll(L, dx % L.shape[1], axis=1)
    return jnp.where(edge, 0, rolled)


def _three_dirs(C_slab, c0, c1, c2, p1, p2, e_lo=None, e_hi=None):
    L0 = _sgm_step_hdw(C_slab, c0, p1, p2)
    L1 = _sgm_step_hdw(C_slab, _shift_lanes(c1, 1, e_lo), p1, p2)
    L2 = _sgm_step_hdw(C_slab, _shift_lanes(c2, -1, e_hi), p1, p2)
    return L0, L1, L2


def _down_kernel(C_hbm, Sp_hbm, S_hbm, c0, c1, c2, crow, sprow, outb,
                 in_sems, sp_sems, out_sems, *, H, W1, D, p1, p2,
                 with_partial, io_dtype, KB):
    """Top-down 3-direction pass, KB rows per DMA.

    Single-row streaming paid ~2us of DMA issue per row x 3 streams x 720
    rows (~4ms/frame at 720p, dominating the pass); KB-row blocks cut the
    DMA count by KB while the recurrence stays row-sequential in-register.
    """
    nb = H // KB

    def c_dma(slot, b):
        return pltpu.make_async_copy(C_hbm.at[pl.ds(b * KB, KB)],
                                     crow.at[slot], in_sems.at[slot])

    def sp_dma(slot, b):
        return pltpu.make_async_copy(Sp_hbm.at[pl.ds(b * KB, KB)],
                                     sprow.at[slot], sp_sems.at[slot])

    def out_dma(slot, b):
        return pltpu.make_async_copy(outb.at[slot],
                                     S_hbm.at[pl.ds(b * KB, KB)],
                                     out_sems.at[slot])

    c0[...] = jnp.zeros((D, W1), jnp.int32)
    c1[...] = jnp.zeros((D, W1), jnp.int32)
    c2[...] = jnp.zeros((D, W1), jnp.int32)
    c_dma(0, 0).start()
    if with_partial:
        sp_dma(0, 0).start()

    def body(b, _):
        slot = b % 2

        @pl.when(b + 1 < nb)
        def _():
            c_dma(1 - slot, b + 1).start()
            if with_partial:
                sp_dma(1 - slot, b + 1).start()

        c_dma(slot, b).wait()
        if with_partial:
            sp_dma(slot, b).wait()

        @pl.when(b >= 2)
        def _():
            out_dma(slot, b - 2).wait()

        for k in range(KB):
            C_slab = crow[slot, k].astype(jnp.int32)
            L0, L1, L2 = _three_dirs(C_slab, c0[...], c1[...], c2[...],
                                     p1, p2)
            c0[...] = L0
            c1[...] = L1
            c2[...] = L2
            acc = L0 + L1 + L2
            if with_partial:
                acc = acc + sprow[slot, k].astype(jnp.int32)
            # 5-dir partial sums stay < 5 * win^2 * 236 < 2^15: int16 I/O
            outb[slot, k] = acc.astype(io_dtype)
        out_dma(slot, b).start()
        return 0

    jax.lax.fori_loop(0, nb, body, 0)
    if nb >= 2:
        out_dma((nb - 2) % 2, nb - 2).wait()
    out_dma((nb - 1) % 2, nb - 1).wait()


def _wta_row_hdw(S_slab, D, uniqueness_ratio):
    """(D, W1) aggregated costs -> per-column WTA outputs (all (W1,) on
    lanes; golden parity). Dpow = 256 packs (S, d) into int32."""
    W1 = S_slab.shape[1]
    di = jax.lax.broadcasted_iota(jnp.int32, (D, 1), 0)
    kmin = jnp.min(S_slab * 256 + di, axis=0)
    best = kmin % 256
    minS = kmin // 256

    bestb = best[None, :]
    outside = jnp.abs(di - bestb) > 1
    uniq = jnp.any(
        outside & (S_slab * (100 - uniqueness_ratio) < minS[None, :] * 100),
        axis=0,
    ).astype(jnp.int32)

    BIGS = 2**30
    sm = jnp.min(jnp.where(di == bestb - 1, S_slab, BIGS), axis=0)
    sp = jnp.min(jnp.where(di == bestb + 1, S_slab, BIGS), axis=0)
    has_nb = (best > 0) & (best < D - 1)
    sm = jnp.where(best > 0, sm, minS)
    sp = jnp.where(best < D - 1, sp, minS)
    denom2 = jnp.maximum(sm + sp - 2 * minS, 1)
    num = (sm - sp) * DISP_SCALE + denom2
    a = jnp.abs(num)
    b = denom2 * 2
    q = (a.astype(jnp.float32) / b.astype(jnp.float32)).astype(jnp.int32)
    q = jnp.where(q * b > a, q - 1, q)
    q = jnp.where((q + 1) * b <= a, q + 1, q)
    sub = jnp.sign(num) * q
    dval = jnp.where(has_nb, best * DISP_SCALE + sub, best * DISP_SCALE)
    return best, minS, dval, uniq


def _final_kernel(C_hbm, Sp_hbm, best_hbm, minS_hbm, dval_hbm, uniq_hbm,
                  c0, c1, c2, crow, sprow, obuf, in_sems, sp_sems, out_sems,
                  *, H, W1, D, p1, p2, uniqueness_ratio, reverse, KB=4):
    def out_dmas(slot, blk):
        y0 = pl.multiple_of((H - 8 * (blk + 1)) if reverse else 8 * blk, 8)
        targets = (best_hbm, minS_hbm, dval_hbm, uniq_hbm)
        return [
            pltpu.make_async_copy(
                obuf.at[slot, k], t.at[pl.ds(y0, 8), :], out_sems.at[slot, k]
            )
            for k, t in enumerate(targets)
        ]

    c0[...] = jnp.zeros((D, W1), jnp.int32)
    c1[...] = jnp.zeros((D, W1), jnp.int32)
    c2[...] = jnp.zeros((D, W1), jnp.int32)
    # KB input rows per DMA (single-row streaming is DMA-issue-bound, see
    # _down_kernel); output stays 8-row blocked (DMA sublane alignment),
    # so KB trips group into 8-row output blocks `per` trips at a time
    per = 8 // KB
    nb = H // KB

    def y0_of(b):
        return (H - KB * (b + 1)) if reverse else (b * KB)

    def c_blk_dma(slot, b):
        return pltpu.make_async_copy(C_hbm.at[pl.ds(y0_of(b), KB)],
                                     crow.at[slot], in_sems.at[slot])

    def sp_blk_dma(slot, b):
        return pltpu.make_async_copy(Sp_hbm.at[pl.ds(y0_of(b), KB)],
                                     sprow.at[slot], sp_sems.at[slot])

    c_blk_dma(0, 0).start()
    sp_blk_dma(0, 0).start()

    def body(b, _):
        slot = b % 2
        blk = b // per  # 8-row output block index
        oslot = blk % 2

        @pl.when(b + 1 < nb)
        def _():
            c_blk_dma(1 - slot, b + 1).start()
            sp_blk_dma(1 - slot, b + 1).start()

        c_blk_dma(slot, b).wait()
        sp_blk_dma(slot, b).wait()

        @pl.when((b % per == 0) & (blk >= 2))
        def _():
            for d in out_dmas(oslot, blk - 2):
                d.wait()

        for k in range(KB):
            # global sweep step i = KB*b + k; source row y_of(i) is buffer
            # row k when forward, KB-1-k when reversed (blocks march
            # opposite to y; in-block order compensates)
            kk = (KB - 1 - k) if reverse else k
            r = KB * (b % per) + k  # row position within the 8-row blk
            C_slab = crow[slot, kk].astype(jnp.int32)
            L0, L1, L2 = _three_dirs(C_slab, c0[...], c1[...], c2[...],
                                     p1, p2)
            c0[...] = L0
            c1[...] = L1
            c2[...] = L2
            S_slab = sprow[slot, kk].astype(jnp.int32) + L0 + L1 + L2
            best, minS, dval, uniq = _wta_row_hdw(S_slab, D,
                                                  uniqueness_ratio)
            row = (7 - r) if reverse else r  # fill order matches sweep
            obuf[oslot, 0, pl.ds(row, 1)] = best.reshape(1, W1)
            obuf[oslot, 1, pl.ds(row, 1)] = minS.reshape(1, W1)
            obuf[oslot, 2, pl.ds(row, 1)] = dval.reshape(1, W1)
            obuf[oslot, 3, pl.ds(row, 1)] = uniq.reshape(1, W1)

        @pl.when(b % per == per - 1)
        def _():
            for d in out_dmas(oslot, blk):
                d.start()

        return 0

    jax.lax.fori_loop(0, nb, body, 0)
    n_blocks = H // 8
    if n_blocks >= 2:
        for d in out_dmas((n_blocks - 2) % 2, n_blocks - 2):
            d.wait()
    for d in out_dmas((n_blocks - 1) % 2, n_blocks - 1):
        d.wait()


def _sgm_step_hd(C_slab, Lp, p1, p2):
    """(H, D) recurrence step; D on lanes (the transposed-slab layout the
    horizontal passes stream)."""
    minLp = jnp.min(Lp, axis=1, keepdims=True)
    lm = _roll_shift(Lp, 1, MAX_COST, 1)
    lp_ = _roll_shift(Lp, -1, MAX_COST, 1)
    delta = minLp + p2
    m = jnp.minimum(jnp.minimum(Lp, lm + p1), jnp.minimum(lp_ + p1, delta))
    return C_slab + m - delta


def _horiz_kernel(Ct_hbm, Sp_hbm, out_hbm, carry, crow, sprow, outb,
                  in_sems, sp_sems, out_sems, *, W1, H, D, p1, p2,
                  reverse, with_partial, io_dtype, KB):
    """One horizontal direction, KB columns per DMA (see _down_kernel: the
    single-column form was DMA-issue-bound at ~2us x 3 streams x 1152
    columns ~= 7ms/frame at 720p)."""
    nb = W1 // KB

    def x0_of(b):
        # first source column of block b (blocks march opposite to x when
        # reversed; in-block processing order compensates)
        return (W1 - KB * (b + 1)) if reverse else (b * KB)

    def c_dma(slot, b):
        return pltpu.make_async_copy(Ct_hbm.at[pl.ds(x0_of(b), KB)],
                                     crow.at[slot], in_sems.at[slot])

    def sp_dma(slot, b):
        return pltpu.make_async_copy(Sp_hbm.at[pl.ds(x0_of(b), KB)],
                                     sprow.at[slot], sp_sems.at[slot])

    def out_dma(slot, b):
        return pltpu.make_async_copy(outb.at[slot],
                                     out_hbm.at[pl.ds(x0_of(b), KB)],
                                     out_sems.at[slot])

    carry[...] = jnp.zeros((H, D), jnp.int32)
    c_dma(0, 0).start()
    if with_partial:
        sp_dma(0, 0).start()

    korder = range(KB - 1, -1, -1) if reverse else range(KB)

    def body(b, _):
        slot = b % 2

        @pl.when(b + 1 < nb)
        def _():
            c_dma(1 - slot, b + 1).start()
            if with_partial:
                sp_dma(1 - slot, b + 1).start()

        c_dma(slot, b).wait()
        if with_partial:
            sp_dma(slot, b).wait()

        @pl.when(b >= 2)
        def _():
            out_dma(slot, b - 2).wait()

        for k in korder:
            L = _sgm_step_hd(crow[slot, k].astype(jnp.int32), carry[...],
                             p1, p2)
            carry[...] = L
            acc = L
            if with_partial:
                acc = acc + sprow[slot, k].astype(jnp.int32)
            outb[slot, k] = acc.astype(io_dtype)
        out_dma(slot, b).start()
        return 0

    jax.lax.fori_loop(0, nb, body, 0)
    if nb >= 2:
        out_dma((nb - 2) % 2, nb - 2).wait()
    out_dma((nb - 1) % 2, nb - 1).wait()


def _horiz_dh_kernel(Ct_hbm, Sp_hbm, out_hbm, carry, crow, sprow, outb,
                     in_sems, sp_sems, out_sems, *, W1, H, D, p1, p2,
                     reverse, with_partial, io_dtype, KB):
    """One horizontal direction over the x-major (W1, D, H) volume.

    The (H, D) carry of the first horizontal kernel put D on LANES, making
    the per-step min-reduce over D and the d+/-1 shifts lane operations --
    measured ~6.6us/column at 720p vs the ~1.9us/direction the (D, W1)
    vertical passes pay for the same math with D on SUBLANES (sublane
    reduce + sublane shifts run at VPU rate). This kernel streams (D, H)
    slabs so the recurrence math matches the vertical passes' layout; the
    recurrence itself is _sgm_step_hdw with W1 -> H."""
    nb = W1 // KB

    def x0_of(b):
        return (W1 - KB * (b + 1)) if reverse else (b * KB)

    def c_dma(slot, b):
        return pltpu.make_async_copy(Ct_hbm.at[pl.ds(x0_of(b), KB)],
                                     crow.at[slot], in_sems.at[slot])

    def sp_dma(slot, b):
        return pltpu.make_async_copy(Sp_hbm.at[pl.ds(x0_of(b), KB)],
                                     sprow.at[slot], sp_sems.at[slot])

    def out_dma(slot, b):
        return pltpu.make_async_copy(outb.at[slot],
                                     out_hbm.at[pl.ds(x0_of(b), KB)],
                                     out_sems.at[slot])

    carry[...] = jnp.zeros((D, H), jnp.int32)
    c_dma(0, 0).start()
    if with_partial:
        sp_dma(0, 0).start()

    korder = range(KB - 1, -1, -1) if reverse else range(KB)

    def body(b, _):
        slot = b % 2

        @pl.when(b + 1 < nb)
        def _():
            c_dma(1 - slot, b + 1).start()
            if with_partial:
                sp_dma(1 - slot, b + 1).start()

        c_dma(slot, b).wait()
        if with_partial:
            sp_dma(slot, b).wait()

        @pl.when(b >= 2)
        def _():
            out_dma(slot, b - 2).wait()

        for k in korder:
            L = _sgm_step_hdw(crow[slot, k].astype(jnp.int32), carry[...],
                              p1, p2)
            carry[...] = L
            acc = L
            if with_partial:
                acc = acc + sprow[slot, k].astype(jnp.int32)
            outb[slot, k] = acc.astype(io_dtype)
        out_dma(slot, b).start()
        return 0

    jax.lax.fori_loop(0, nb, body, 0)
    if nb >= 2:
        out_dma((nb - 2) % 2, nb - 2).wait()
    out_dma((nb - 1) % 2, nb - 1).wait()


def sgm_horiz_pass_dh(Ct, p1, p2, reverse=False, partial=None,
                      interpret=False):
    """One horizontal SGM direction over the x-major volume Ct (W1, D, H),
    left-to-right (reverse=False) or right-to-left (reverse=True), plus
    `partial` when given. Bit-identical to sgm_horiz_pass_hdw modulo the
    slab transpose; the (D, H) slab layout keeps the recurrence on the
    sublane-cheap path (see _horiz_dh_kernel)."""
    W1, D, H = Ct.shape
    # Mosaic requires HBM-sliced DMA blocks lane-aligned to 128; H sits on
    # lanes here, so pad it up (each H column evolves independently along
    # the x recurrence -- padded lanes compute garbage that is cropped).
    H_pad = -(-H // 128) * 128
    if H_pad != H and not interpret:
        Ct = jnp.pad(Ct, ((0, 0), (0, 0), (0, H_pad - H)))
        if partial is not None:
            partial = jnp.pad(partial, ((0, 0), (0, 0), (0, H_pad - H)))
        out = sgm_horiz_pass_dh(Ct, p1, p2, reverse=reverse, partial=partial,
                                interpret=interpret)
        return out[:, :, :H]
    p2 = max(p2, p1 + 1)
    with_partial = partial is not None
    io_dtype = Ct.dtype
    isz = jnp.dtype(io_dtype).itemsize

    def scratch_bytes(kb):
        return D * H * 4 + 3 * 2 * kb * D * H * isz

    # largest fitting block (the launch is fori-trip-overhead-bound, see
    # sgm_horiz_bidir_dh note; KB=8 start cost the chained stretch path
    # ~2x the trips VMEM allows)
    KB = 32
    while KB > 1 and (W1 % KB or scratch_bytes(KB) > _VMEM_CAP - 8 * 2**20):
        KB //= 2
    if W1 % KB:
        KB = 1
    kernel = functools.partial(
        _horiz_dh_kernel, W1=W1, H=H, D=D, p1=p1, p2=p2, reverse=reverse,
        with_partial=with_partial, io_dtype=io_dtype, KB=KB,
    )
    args = (Ct, partial) if with_partial else (Ct, Ct)  # dummy 2nd when unused
    scratch = [
        pltpu.VMEM((D, H), jnp.int32),
        pltpu.VMEM((2, KB, D, H), io_dtype),
        pltpu.VMEM((2, KB, D, H), io_dtype),
        pltpu.VMEM((2, KB, D, H), io_dtype),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((W1, D, H), io_dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=_vmem_limit(scratch_bytes(KB)),
        ),
        interpret=interpret,
    )(*args)


def sgm_horiz_pass_hdw(Ct, p1, p2, reverse=False, partial=None,
                       interpret=False):
    """One horizontal SGM direction over the x-major volume Ct (W1, H, D):
    left-to-right (reverse=False) or right-to-left (reverse=True), plus
    `partial` when given (the other direction's result, so one launch
    finishes the 2-direction horizontal sum Sh).

    The whole x recurrence runs inside ONE kernel launch with the (H, D)
    carry resident in VMEM -- the lax.scan formulation paid per-step
    dispatch overhead over W1 steps (~15ms/frame at 720p). Bit-identical to
    scanning ops/sgbm.py `_sgm_step` over x."""
    W1, H, D = Ct.shape
    p2 = max(p2, p1 + 1)
    with_partial = partial is not None
    io_dtype = Ct.dtype
    isz = jnp.dtype(io_dtype).itemsize
    KB = 8 if W1 % 8 == 0 else 1  # columns per DMA (DMA-issue-bound else)
    while KB > 1 and (H * D * 4 + 3 * 2 * KB * H * D * isz
                      > _VMEM_CAP - 8 * 2**20):
        KB //= 2
    kernel = functools.partial(
        _horiz_kernel, W1=W1, H=H, D=D, p1=p1, p2=p2, reverse=reverse,
        with_partial=with_partial, io_dtype=io_dtype, KB=KB,
    )
    args = (Ct, partial) if with_partial else (Ct, Ct)  # dummy 2nd when unused
    scratch = [
        pltpu.VMEM((H, D), jnp.int32),
        pltpu.VMEM((2, KB, H, D), io_dtype),
        pltpu.VMEM((2, KB, H, D), io_dtype),
        pltpu.VMEM((2, KB, H, D), io_dtype),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((W1, H, D), io_dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=_vmem_limit(
                H * D * 4 + 3 * 2 * KB * H * D * isz),
        ),
        interpret=interpret,
    )(*args)


def sgm_down_pass_hdw(C, p1, p2, partial=None, interpret=False):
    """Top-down 3-direction aggregation over (H, D, W1) cost, plus
    `partial` when given. I/O dtype follows C (int16 halves the DMA; the
    5-direction partial sums stay within int16)."""
    H, D, W1 = C.shape
    p2 = max(p2, p1 + 1)
    with_partial = partial is not None
    io_dtype = C.dtype
    isz = jnp.dtype(io_dtype).itemsize
    # largest fitting row block (trip-overhead-bound, same rationale as
    # the horizontal passes)
    KB = 16
    while KB > 1 and (H % KB or 3 * D * W1 * 4 + 3 * 2 * KB * D * W1 * isz
                      > _VMEM_CAP - 8 * 2**20):
        KB //= 2
    if H % KB:
        KB = 1
    kernel = functools.partial(
        _down_kernel, H=H, W1=W1, D=D, p1=p1, p2=p2,
        with_partial=with_partial, io_dtype=io_dtype, KB=KB,
    )
    args = (C, partial) if with_partial else (C, C)  # dummy 2nd when unused
    scratch = [
        pltpu.VMEM((D, W1), jnp.int32),
        pltpu.VMEM((D, W1), jnp.int32),
        pltpu.VMEM((D, W1), jnp.int32),
        pltpu.VMEM((2, KB, D, W1), io_dtype),
        pltpu.VMEM((2, KB, D, W1), io_dtype),
        pltpu.VMEM((2, KB, D, W1), io_dtype),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, D, W1), io_dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=_vmem_limit(
                3 * D * W1 * 4 + 3 * 2 * KB * D * W1 * isz),
        ),
        interpret=interpret,
    )(*args)


def sgm_final_wta_hdw(C, S_partial, p1, p2, uniqueness_ratio,
                      reverse=True, interpret=False):
    """Final 3-direction aggregation fused with WTA over (H, D, W1):
    bottom-up (reverse=True, the 8-path finish) or top-down (the 4-path
    finish). Returns (best, minS, dval, uniq), each (H, W1) int32."""
    H, D, W1 = C.shape
    if W1 % 128 or H % 8 or H < 16:
        raise ValueError(f"(H, W1) = ({H}, {W1}) must tile (8/16, 128)")
    p2 = max(p2, p1 + 1)
    isz = (jnp.dtype(C.dtype).itemsize
           + jnp.dtype(S_partial.dtype).itemsize)

    def scratch_total(kb):
        return (3 * D * W1 * 4 + 2 * kb * D * W1 * isz
                + 2 * 4 * 8 * W1 * 4)

    # largest 8-dividing row block that fits (trip-overhead-bound like
    # the other streaming passes; KB=4 was hardcoded through round 4)
    KB = 8
    while KB > 4 and scratch_total(KB) > _VMEM_CAP - 8 * 2**20:
        KB //= 2
    kernel = functools.partial(
        _final_kernel, H=H, W1=W1, D=D, p1=p1, p2=p2,
        uniqueness_ratio=uniqueness_ratio, reverse=reverse, KB=KB,
    )
    out = jax.ShapeDtypeStruct((H, W1), jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=(out,) * 4,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=tuple(pl.BlockSpec(memory_space=pl.ANY) for _ in range(4)),
        scratch_shapes=[
            pltpu.VMEM((D, W1), jnp.int32),
            pltpu.VMEM((D, W1), jnp.int32),
            pltpu.VMEM((D, W1), jnp.int32),
            pltpu.VMEM((2, KB, D, W1), C.dtype),
            pltpu.VMEM((2, KB, D, W1), S_partial.dtype),
            pltpu.VMEM((2, 4, 8, W1), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=_vmem_limit(scratch_total(KB)),
        ),
        interpret=interpret,
    )(C, S_partial)
