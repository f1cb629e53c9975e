"""Fused block-matching cost + WTA as a Pallas TPU kernel.

The XLA path materializes the (D, H, W) SAD volume to HBM (472MB at the
flagship point) and re-reads it for every WTA reduction. This kernel never
builds it: each grid program owns an R-row output stripe, streams the
prefiltered inputs once, and loops over disparities keeping only running
WTA state in VMEM:

  per 8-disparity block: ONE dynamic lane roll of the right plane (the
         per-d rolls were pure per-iteration overhead -- the 8 in-block
         disparities are static lane slices of the rolled plane, the same
         restructuring that paid off in sgm_cost.py);
  per d: |L - R_d|, vertical then horizontal sliding window sums (sublane /
         lane rolls -- jnp.concatenate shifts forced Mosaic relayouts) ->
         the (R, W) cost plane C_d;
  WTA:   a 4-slot sorted insertion of packed (cost, D-1-d) keys. The best
         key gives the winner (ties -> largest d, matching cv2); the three
         runners-up are enough to recover min-cost-outside-best+/-1 for the
         uniqueness test (the excluded set has at most 3 members, so the
         4 smallest always contain the outside minimum). Neighbor costs for
         the subpixel parabola are captured streamingly: cost[best-1] is the
         previous plane whenever a new best lands, cost[best+1] is the plane
         at d == best+1.

Outputs per pixel: best_d, best_cost, c_m1, c_p1, min_outside -- the
validity masking / subpixel packing / texture test remain elementwise XLA
(cheap), keeping this kernel bit-compatible with ops/bm.py stereo_bm
(cv::StereoBM semantics as configured at reference bm-sw.cpp:16-25).

Measurement knobs (swept by tools/tune_kb.py):
  RTDM_BM_R       -- output rows per stripe (default 8; must divide H and
                     be a multiple of 8). Larger stripes amortize the
                     per-iteration loop overhead over 2-4x more vector work.
  RTDM_BM_VARIANT -- "full" (default) computes the horizontal window as a
                     lane-roll doubling tree; "mxuh" computes it as ONE
                     int8 MXU dot against a banded 0/1 weight matrix
                     (bit-exact for pre_filter_cap <= 63: |L-R| <= 126
                     fits int8; int32 accumulation).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIGKEY = jnp.iinfo(jnp.int32).max


def _kernel(*refs, R, W, Wp, D, Dpow, bs, Rh_pad, variant):
    if variant == "mxuh":
        (lp_hbm, rp_hbm, band_hbm, bestd_ref, bestc_ref, cm1_ref, cp1_ref,
         mout_ref, lin, rin, band, in_sems, band_sem) = refs
    else:
        (lp_hbm, rp_hbm, bestd_ref, bestc_ref, cm1_ref, cp1_ref, mout_ref,
         lin, rin, in_sems) = refs
    w2 = bs // 2
    i = pl.program_id(0)

    if variant == "mxuh":
        # the banded window-weight matrix is resident in VMEM for the whole
        # launch (scratch persists across grid programs; filled once)
        @pl.when(i == 0)
        def _():
            bdma = pltpu.make_async_copy(band_hbm, band, band_sem)
            bdma.start()
            bdma.wait()

    # stream this stripe's input rows (stripes overlap by 2*w2 rows, so
    # BlockSpec blocking cannot express them -- manual DMA from ANY space;
    # Rh_pad rows per stripe keeps the slice 8-row aligned)
    lp_dma = pltpu.make_async_copy(
        lp_hbm.at[pl.ds(i * R, Rh_pad)], lin, in_sems.at[0]
    )
    rp_dma = pltpu.make_async_copy(
        rp_hbm.at[pl.ds(i * R, Rh_pad)], rin, in_sems.at[1]
    )
    lp_dma.start()
    rp_dma.start()
    lp_dma.wait()
    rp_dma.wait()
    lp_s = lin[...]
    rp_s = rin[...]

    maxD = D - 1  # min_disparity == 0 on this path
    lane_pos = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)

    def vert_sum(ad):
        # out[t] = sum ad[t .. t+bs-1] for t < R, via sublane rolls (the
        # ad[r : r + R] slices were sublane-misaligned -> relayouts);
        # wrapped rows land at sublane >= Rh_pad - r >= R, outside the slice
        vacc = ad
        for r in range(1, bs):
            vacc = vacc + pltpu.roll(ad, -r % Rh_pad, axis=0)
        return vacc[0:R]

    def shl(v, s):
        # out[:, x] = v[:, x + s], zero fill (static s), roll + mask
        return jnp.where(
            lane_pos >= W - s, 0, pltpu.roll(v, -s % W, axis=1)
        )

    def horiz_sum(v):
        """Centered zero-padded sliding sum of width bs along lanes via a
        power-of-two doubling tree (Mosaic has no cumsum): left-aligned sums
        s_{2^k}[x] = sum v[x .. x+2^k-1], combined per set bit of bs, then
        re-centered by w2."""
        sums = {1: v}
        k = 1
        while k * 2 <= bs:
            sums[k * 2] = sums[k] + shl(sums[k], k)
            k *= 2
        acc = None
        off = 0
        for bit in sorted(sums, reverse=True):
            if bs & bit:
                part = shl(sums[bit], off) if off else sums[bit]
                acc = part if acc is None else acc + part
                off += bit
        # acc[x] = sum v[x .. x+bs-1]; recenter: out[x] = sum v[x-w2..x+w2]
        return jnp.where(lane_pos < w2, 0, pltpu.roll(acc, w2, axis=1))

    def wta_update(d, cd, state):
        k1, k2, k3, k4, cm1, cp1, prev, bestd = state
        key = cd * Dpow + (D - 1 - d)
        is_new = key < k1
        # neighbor captures (before reordering)
        cm1 = jnp.where(is_new, prev, cm1)
        # 4-slot sorted insert
        n1 = jnp.minimum(k1, key)
        r1 = jnp.maximum(k1, key)
        n2 = jnp.minimum(k2, r1)
        r2 = jnp.maximum(k2, r1)
        n3 = jnp.minimum(k3, r2)
        r3 = jnp.maximum(k3, r2)
        n4 = jnp.minimum(k4, r3)
        bestd = jnp.where(is_new, d, bestd)
        cp1 = jnp.where(d == bestd + 1, cd, cp1)
        return n1, n2, n3, n4, cm1, cp1, cd, bestd

    def block(db, state):
        # ONE dynamic roll per disparity, sliced at lane 0: a static-
        # offset slice of a pre-rolled plane carries a lazy offset layout
        # and every binary op mixing it with the aligned left plane pays a
        # relayout (the sgm_cost.py bt-vs-btns finding); a dynamic roll
        # amount forces one canonical materialization. rolled_d[x] =
        # rp_pad[(x + maxD - d) mod Wp]; valid reads never wrap (the index
        # x + maxD - d lands in [0, W + maxD) <= Wp).
        for k in range(8):
            d = 8 * db + k
            sk = (8 * db + k - maxD) % Wp
            ad = jnp.abs(lp_s - pltpu.roll(rp_s, sk, axis=1)[:, :W])
            if variant == "mxuh":
                # horizontal window as ONE int8 MXU dot over the banded
                # weight matrix (|L-R| <= 2*pre_filter_cap <= 126 fits
                # int8; exact int32 accumulation), then vertical rolls
                h = jax.lax.dot_general(
                    ad.astype(jnp.int8), band[...],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                cd = vert_sum(h)
            else:
                cd = horiz_sum(vert_sum(ad))
            state = wta_update(d, cd, state)
        return state

    BIG = jnp.full((R, W), _BIGKEY, jnp.int32)
    Z = jnp.zeros((R, W), jnp.int32)
    k1, k2, k3, k4, cm1, cp1, _, bestd = jax.lax.fori_loop(
        0, D // 8, block, (BIG, BIG, BIG, BIG, Z, Z, Z, Z)
    )

    best_cost = k1 // Dpow
    best_d = bestd

    def unpack(k):
        return k // Dpow, (D - 1) - (k % Dpow)

    mo = jnp.full((R, W), 2**28, jnp.int32)
    for k in (k2, k3, k4):
        c, dd = unpack(k)
        outside = (jnp.abs(dd - best_d) > 1) & (k != _BIGKEY)
        mo = jnp.where(outside, jnp.minimum(mo, c), mo)

    bestd_ref[...] = best_d
    bestc_ref[...] = best_cost
    cm1_ref[...] = cm1
    cp1_ref[...] = cp1
    mout_ref[...] = mo


def bm_cost_wta(
    lp: jnp.ndarray,
    rp: jnp.ndarray,
    num_disp: int,
    block_size: int,
    interpret: bool = False,
    pre_filter_cap: int = 31,
):
    """(best_d, best_cost, c_m1, c_p1, min_outside) each (H, W) int32 for
    min_disparity=0. lp/rp: (H, W) prefiltered uint8/int planes. Requires
    W % 128 == 0, H % 8 == 0, num_disp % 8 == 0."""
    H, W = lp.shape
    D = num_disp
    bs = block_size
    w2 = bs // 2
    # measurement / operational override; any malformed or incompatible
    # value degrades to the default stripe height instead of raising
    try:
        R = int(os.environ.get("RTDM_BM_R", "8"))
    except ValueError:
        R = 8
    if R <= 0 or R % 8 or H % R:
        R = 8
    variant = os.environ.get("RTDM_BM_VARIANT", "full")
    if variant == "mxuh" and pre_filter_cap > 63:
        variant = "full"  # |L-R| would overflow int8; keep bit-exactness
    if W % 128 or H % 8:
        raise ValueError(f"(H, W) = ({H}, {W}) must tile (8, 128)")
    if D % 8 or D < 8:
        raise ValueError("num_disp must be a positive multiple of 8")
    Dpow = 1 << 8  # d fits 8 bits (D <= 256); cost*256 + d < 2^31
    maxD = D - 1

    # zero row padding for the vertical window halo; zero column padding on
    # the right image for the disparity shifts (wraparound never reaches a
    # valid position). Per-stripe DMA slices must be 8-row aligned, so
    # stripes read Rh_pad rows and the arrays get enough bottom padding for
    # the last stripe.
    Rh = R + 2 * w2
    Rh_pad = ((Rh + 7) // 8) * 8
    bot = w2 + (Rh_pad - Rh)
    lp_pad = jnp.pad(lp.astype(jnp.int32), ((w2, bot), (0, 0)))
    Wp = ((W + maxD + 127) // 128) * 128
    rp_pad = jnp.pad(
        rp.astype(jnp.int32), ((w2, bot), (maxD, Wp - W - maxD))
    )

    n_stripes = H // R
    kernel = functools.partial(
        _kernel, R=R, W=W, Wp=Wp, D=D, Dpow=Dpow, bs=bs, Rh_pad=Rh_pad,
        variant=variant,
    )
    operands = [lp_pad, rp_pad]
    scratches = [
        pltpu.VMEM((Rh_pad, W), jnp.int32),
        pltpu.VMEM((Rh_pad, Wp), jnp.int32),
    ]
    sems = [pltpu.SemaphoreType.DMA((2,))]
    if variant == "mxuh":
        # banded weight matrix of the width-bs zero-padded window:
        # band[t, j] = 1 iff |t - j| <= w2. Columns j < w2 are zeroed to
        # match the "full" variant's recentering shift, which zero-fills
        # the left border instead of computing partial windows.
        import numpy as _np

        t = _np.arange(W)
        band_np = (_np.abs(t[:, None] - t[None, :]) <= w2).astype(_np.int8)
        band_np[:, :w2] = 0
        operands.append(jnp.asarray(band_np))
        scratches.append(pltpu.VMEM((W, W), jnp.int8))
        sems.append(pltpu.SemaphoreType.DMA(()))
    out = jax.ShapeDtypeStruct((H, W), jnp.int32)
    outs = pl.pallas_call(
        kernel,
        grid=(n_stripes,),
        out_shape=(out,) * 5,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(operands),
        out_specs=tuple(
            pl.BlockSpec((R, W), lambda i: (i, 0)) for _ in range(5)
        ),
        scratch_shapes=scratches + sems,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*operands)
    return outs
