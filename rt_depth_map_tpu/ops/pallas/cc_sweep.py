"""In-VMEM segmented-min propagation for connected components (TPU).

The XLA formulation (ops/cc.py) runs Hillis-Steele segmented sweeps as
chains of pad/slice/select ops; XLA cannot fuse an 11-deep shift chain, so
every doubling step materializes a full (H, W) int32 plane through HBM --
~630MB of traffic per convergence round at 720p (~2ms/round), and the
speckle filter needs several rounds across its two propagation loops
(measured 10.6ms at 720p on scene-like disparity).

At 720p the whole problem fits in VMEM, so this kernel runs ALL rounds
on-chip: one load, sweeps as VPU lane/sublane shifts on VMEM-resident
data, one store. The convergence `while_loop` runs inside the kernel; HBM
traffic is one read + one write of the fields total.

Generalizations over the round-1 XLA path, both driven by callers:
  * N stacked fields propagate together over the SAME edge set (the bbox
    extraction of ops/detect.py min-propagates label / -maxidx / minx /
    -maxx simultaneously);
  * optional diagonal edges (8-connectivity, cv::findContours blob
    semantics): each convergence round starts with one shift-based hop
    across the diagonal links, exactly like ops/cc.py's `_diag_hop`.

Register-pressure design (round-3 rewrite; the round-2 version OOM'd):
the first version unrolled every doubling step of every field inside one
while-loop body; at (N=4, 720, 1280) Mosaic's register allocator needed
228MB of spill slots and the compile permanently failed (vmem OOM, see
VERDICT.md round 2). Two structural rules keep the live set bounded now:

  1. the Hillis-Steele doubling unrolls STATICALLY by default (safe:
     only one scan of one field is ever live at a time, see rule 2, so
     the round-2 spill blow-up cannot recur); the dynamic-`pltpu.roll`
     fori_loop variant -- one small body for the register allocator at
     ~20us/iteration of Mosaic loop overhead -- stays selectable via
     RTDM_CC_DYN_ROLL=1 as the low-register-pressure fallback;
  2. fields propagate SEQUENTIALLY, each in its own convergence
     while_loop, DMA'd HBM->VMEM->HBM one at a time -- VMEM cost is
     independent of N (correct because fields propagate independently
     over the same fixed edge set; the fixed point is per-field).

Mosaic notes (see memory: mosaic-pallas-pitfalls): i1 vectors cannot be
shifted/reduced (bitcast_vreg i1->i32 fails to legalize), so every mask
here is an int32 0/1 plane and OR is `maximum`. Inactive pixels need no
explicit select: all edges into them are absent, so each forms its own
one-pixel segment and keeps its value through every scan.

Semantics: min-propagate each field along allowed 4- or 8-neighbor edges
to the fixed point (each pixel ends with the minimum field value of its
connected component). Identical contract to iterating ops/cc.py's `sweep`
to convergence -- the fixed point is unique, so the sweep schedule does
not matter. Used by connected_components_scan (field = linear index),
component_sizes' root-value read-back (field = root-held sizes), and
connected_components_bbox (4 fields).

Reference behavior: cv::filterSpeckles / cv::findContours connected
regions (/root/reference uses cv2's post-filters and contour detection;
SURVEY.md section 2.9a, estimator.cpp:47-56).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 2**30


def _shift(a, d, fill, axis):
    """Static shift toward higher indices along `axis` by d (d may be
    negative), filling vacated positions with `fill`. Implemented as a
    circular pltpu.roll + iota boundary mask: misaligned jnp.concatenate
    shifts force a Mosaic relayout per step (~400us/plane measured at
    720p), rolls are native."""
    H, W = a.shape
    N = a.shape[axis]
    pos = jax.lax.broadcasted_iota(jnp.int32, (H, W), axis)
    rolled = pltpu.roll(a, d % N, axis=axis)
    mask = pos < d if d > 0 else pos >= N + d
    return jnp.where(mask, fill, rolled)


def _shift_lanes(a, d, fill):
    return _shift(a, d, fill, 1)


def _shift_sub(a, d, fill):
    return _shift(a, d, fill, 0)


def _shift2(a, dy, dx, fill):
    out = _shift_sub(a, dy, fill) if dy else a
    return _shift_lanes(out, dx, fill) if dx else out


def _seg_min_axis_fori(m, start, axis, reverse):
    """Doubling as a fori_loop with a dynamic roll amount (1 << i): ONE
    small body for the register allocator, but Mosaic charges ~20us of
    loop overhead per iteration (measured, tools/probe_roll_micro.py), so
    the statically-unrolled variant below is the default. Kept selectable
    (RTDM_CC_DYN_ROLL=1) as the low-register-pressure fallback."""
    N = m.shape[axis]
    steps = (N - 1).bit_length()  # ceil(log2(N)); max d = 2^(steps-1) < N
    pos = jax.lax.broadcasted_iota(jnp.int32, m.shape, axis)

    def step(i, carry):
        m, s = carry
        d = jax.lax.shift_left(jnp.int32(1), i)
        if reverse:
            # shift toward lower indices by d == roll by N - d
            amt = jnp.int32(N) - d
            mask = pos >= amt
        else:
            amt = d
            mask = pos < d
        mm = jnp.where(mask, _BIG, pltpu.roll(m, amt, axis=axis))
        ss = jnp.where(mask, 1, pltpu.roll(s, amt, axis=axis))
        m = jnp.where(s > 0, m, jnp.minimum(m, mm))
        s = jnp.maximum(s, ss)
        return m, s

    m, _ = jax.lax.fori_loop(0, steps, step, (m, start))
    return m


def _seg_min_axis_static(m, start, axis, reverse):
    """Doubling with STATIC shift amounts, fully unrolled: Mosaic lowers
    each roll natively and there is no loop overhead. Safe against the
    round-2 register-spill OOM because only ONE scan of ONE field is ever
    unrolled at a time (fields are sequential, scans are sequential)."""
    N = m.shape[axis]
    shift = _shift_lanes if axis == 1 else _shift_sub
    sgn = -1 if reverse else 1
    s = start
    d = 1
    while d < N:
        mm = shift(m, sgn * d, _BIG)
        ss = shift(s, sgn * d, 1)
        m = jnp.where(s > 0, m, jnp.minimum(m, mm))
        s = jnp.maximum(s, ss)
        d *= 2
    return m


def _seg_min_axis(m, start, axis, reverse):
    import os

    if os.environ.get("RTDM_CC_DYN_ROLL") == "1":
        return _seg_min_axis_fori(m, start, axis, reverse)
    return _seg_min_axis_static(m, start, axis, reverse)


def _kernel(field_hbm, ah_hbm, av_hbm, se_hbm, sw_hbm, out_hbm,
            fbuf, ahbuf, avbuf, sebuf, swbuf, sems, *,
            N, H, W, max_rounds, diag):
    # one grid step per field: the while_loop body exists ONCE in the
    # program, so its register-allocator spill slots are allocated once.
    # (An in-kernel Python loop over fields allocated ~57MB of spill slots
    # PER FIELD -- Mosaic does not reuse spill ranges across sequential
    # while_loops -- reproducing the round-2 OOM at N=4.)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _load_masks():
        # edge masks are field-invariant; scratch persists across the
        # sequential TPU grid, so load them once
        srcs = [(ah_hbm, ahbuf), (av_hbm, avbuf)]
        if diag:
            srcs += [(se_hbm, sebuf), (sw_hbm, swbuf)]
        copies = [
            pltpu.make_async_copy(src, dst, sems.at[j])
            for j, (src, dst) in enumerate(srcs)
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

    # int32 0/1 "no edge" planes; edge x ~ x+1 stored at lane x (lane W-1
    # has no edge), edge y ~ y+1 at row y (row H-1 has no edge).
    noh = 1 - ahbuf[...].astype(jnp.int32)  # ah is 0/1; avoid i1 compares
    nov = 1 - avbuf[...].astype(jnp.int32)

    # start flags per scan direction: the segment breaks where the edge
    # INTO the pixel (in scan direction) is missing.
    sh_f = _shift_lanes(noh, 1, 1)   # no edge from x-1
    sh_b = noh                       # no edge from x+1 (reverse scan)
    sv_f = _shift_sub(nov, 1, 1)
    sv_b = nov

    if diag:
        # diagonal edge masks, pre-shifted so each selects at the TARGET
        # pixel of its hop; se at (y, x) links (y, x)~(y+1, x+1), sw at
        # (y, x) links (y, x+1)~(y+1, x)  (ops/cc.py `_diag_hop` parity)
        se = sebuf[...].astype(jnp.int32)
        sw = swbuf[...].astype(jnp.int32)
        m_se_dn = _shift2(se, 1, 1, 0)   # receive at (y+1, x+1) from (y, x)
        m_se_up = se                     # receive at (y, x) from (y+1, x+1)
        m_sw_dn = _shift_sub(sw, 1, 0)   # receive at (y+1, x) from (y, x+1)
        m_sw_up = _shift_lanes(sw, 1, 0)  # receive at (y, x+1) from (y+1, x)

        def diag_hop(f):
            f = jnp.minimum(
                f, jnp.where(m_se_dn > 0, _shift2(f, 1, 1, _BIG), _BIG))
            f = jnp.minimum(
                f, jnp.where(m_se_up > 0, _shift2(f, -1, -1, _BIG), _BIG))
            f = jnp.minimum(
                f, jnp.where(m_sw_dn > 0, _shift2(f, 1, -1, _BIG), _BIG))
            f = jnp.minimum(
                f, jnp.where(m_sw_up > 0, _shift2(f, -1, 1, _BIG), _BIG))
            return f

    def sweep(f):
        if diag:
            f = diag_hop(f)
        rf = _seg_min_axis(f, sh_f, 1, False)
        rb = _seg_min_axis(f, sh_b, 1, True)
        f = jnp.minimum(rf, rb)
        cf = _seg_min_axis(f, sv_f, 0, False)
        cb = _seg_min_axis(f, sv_b, 0, True)
        return jnp.minimum(cf, cb)

    def body(state):
        f, _, r = state
        nf = sweep(f)
        n_changed = jnp.sum(
            jnp.where(nf != f, jnp.int32(1), jnp.int32(0)))
        return nf, n_changed, r + 1

    def cond(state):
        _, n_changed, r = state
        return (n_changed > 0) & (r < max_rounds)

    # this grid step's field: DMA in, converge, DMA out -- VMEM use is
    # O(1) in N (rule 2 in the module docstring)
    cp_in = pltpu.make_async_copy(field_hbm.at[i], fbuf, sems.at[4])
    cp_in.start()
    cp_in.wait()
    final, _, _ = jax.lax.while_loop(
        cond, body, (fbuf[...], jnp.int32(1), jnp.int32(0)))
    fbuf[...] = final
    cp_out = pltpu.make_async_copy(fbuf, out_hbm.at[i], sems.at[4])
    cp_out.start()
    cp_out.wait()


def seg_min_propagate_pallas(field, active, allowed_h, allowed_v,
                             allowed_se=None, allowed_sw=None,
                             interpret=False, max_rounds=None):
    """Min-propagate `field` along allowed edges of `active` pixels to the
    fixed point.

    field: int32 (H, W) or (N, H, W) -- N fields propagate together over
    the same edges (one load of the masks; each field converges in its own
    on-chip while_loop).
    allowed_h: (H, W-1) edges (y,x)~(y,x+1); allowed_v: (H-1, W) edges
    (y,x)~(y+1,x). For 8-connectivity pass allowed_se ((H-1, W-1) edges
    (y,x)~(y+1,x+1)) and allowed_sw ((H-1, W-1) edges (y,x+1)~(y+1,x)).
    Inactive pixels keep their input value (they have no edges, so each is
    its own one-pixel segment; `active` is accepted for interface parity
    with the XLA path but not needed on-chip). Returns field's shape."""
    del active
    squeeze = field.ndim == 2
    if squeeze:
        field = field[None]
    N, H, W = field.shape
    diag = allowed_se is not None
    ah = jnp.pad(allowed_h, ((0, 0), (0, 1))).astype(jnp.int8)
    av = jnp.pad(allowed_v, ((0, 1), (0, 0))).astype(jnp.int8)
    if diag:
        se = jnp.pad(allowed_se, ((0, 1), (0, 1))).astype(jnp.int8)
        sw = jnp.pad(allowed_sw, ((0, 1), (0, 1))).astype(jnp.int8)
    else:
        se = sw = ah  # unused dummy operands (kernel never reads them)
    # a sweep propagates across >= one full row/column run; image-spanning
    # snakes need at most H+W direction turns (max_rounds override is for
    # perf diagnostics: rounds = t(converged)/t(per-round))
    if max_rounds is None:
        max_rounds = H + W
    kernel = functools.partial(_kernel, N=N, H=H, W=W,
                               max_rounds=max_rounds, diag=diag)
    out = pl.pallas_call(
        kernel,
        grid=(N,),
        out_shape=jax.ShapeDtypeStruct((N, H, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((H, W), jnp.int32),
            pltpu.VMEM((H, W), jnp.int8),
            pltpu.VMEM((H, W), jnp.int8),
            pltpu.VMEM((H, W), jnp.int8),
            pltpu.VMEM((H, W), jnp.int8),
            pltpu.SemaphoreType.DMA((5,)),
        ],
        compiler_params=pltpu.CompilerParams(
            # int32 start-flag planes + scan temporaries exceed the 16MB
            # default at 720p; v5e has 128MB physical VMEM.
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(field.astype(jnp.int32), ah, av, se, sw)
    return out[0] if squeeze else out


def cc_fits_vmem(H, W, n_fields=1):
    """True when the in-VMEM propagation kernel's working set fits.

    Fields stream through one (H, W) VMEM buffer, so the live set is
    independent of n_fields: ~8 int32 start/diag-mask planes + the field
    carry + per-step scan temporaries + register-allocator headroom.
    Budgeted at 20 int32 planes against a 90MB ceiling (the kernel asks
    for 100MB; the measured 720p compile uses ~60MB incl. spills)."""
    del n_fields
    planes = 20
    return (H * W * 4 * planes <= 90 * 2**20
            and W % 128 == 0 and H % 8 == 0)
