"""Fused block-matching cost + WTA as a Pallas TPU kernel.

The XLA path materializes the (D, H, W) SAD volume to HBM (472MB at the
flagship point) and re-reads it for every WTA reduction. This kernel never
builds it: each grid program owns an 8-row output stripe, streams the
prefiltered inputs once, and loops over disparities keeping only running
WTA state in VMEM:

  per d: right image shifted by d via a dynamic lane roll (the right plane
         is pre-padded with maxD zero columns so no wraparound reaches a
         valid position), |L - R_d|, vertical then horizontal sliding sums
         (prefix sums) -> the (8, W) cost plane C_d;
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
(cheap), keeping this kernel bit-compatible with ops/bm.py stereo_bm.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIGKEY = jnp.iinfo(jnp.int32).max


def _kernel(lp_hbm, rp_hbm, bestd_ref, bestc_ref, cm1_ref, cp1_ref, mout_ref,
            lin, rin, in_sems, *, R, W, Wp, D, Dpow, bs, Rh_pad):
    w2 = bs // 2
    i = pl.program_id(0)

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

    def vert_sum(ad):
        # sum of bs consecutive rows -> (R, W) (rows are few: unrolled adds)
        acc = ad[0:R]
        for r in range(1, bs):
            acc = acc + ad[r : r + R]
        return acc

    def shl(v, s):
        # out[:, x] = v[:, x + s], zero fill (static s)
        return jnp.concatenate(
            [v[:, s:], jnp.zeros((v.shape[0], s), jnp.int32)], axis=1
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
        return jnp.concatenate(
            [jnp.zeros((v.shape[0], w2), jnp.int32), acc[:, : W - w2]], axis=1
        )

    def body(d, state):
        k1, k2, k3, k4, cm1, cp1, prev, bestd = state
        shift = (Wp + d - maxD) % Wp
        rshift = pltpu.roll(rp_s, shift, axis=1)
        ad = jnp.abs(lp_s - rshift[:, :W])
        cd = horiz_sum(vert_sum(ad))  # (R, W) SAD cost plane at disparity d

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

    BIG = jnp.full((R, W), _BIGKEY, jnp.int32)
    Z = jnp.zeros((R, W), jnp.int32)
    k1, k2, k3, k4, cm1, cp1, _, bestd = jax.lax.fori_loop(
        0, D, body, (BIG, BIG, BIG, BIG, Z, Z, Z, Z)
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
):
    """(best_d, best_cost, c_m1, c_p1, min_outside) each (H, W) int32 for
    min_disparity=0. lp/rp: (H, W) prefiltered uint8/int planes. Requires
    W % 128 == 0, H % 8 == 0, num_disp >= 4."""
    H, W = lp.shape
    D = num_disp
    bs = block_size
    w2 = bs // 2
    R = 8
    if W % 128 or H % R:
        raise ValueError(f"(H, W) = ({H}, {W}) must tile ({R}, 128)")
    if D < 4:
        raise ValueError("num_disp must be >= 4 for the 4-slot WTA")
    Dpow = 1 << 8  # d fits 8 bits (D <= 256); cost*256 + d < 2^31
    maxD = D - 1

    # zero row padding for the vertical window halo; zero column padding on
    # the right image for the disparity shifts (wraparound never reaches a
    # valid x: position x reads lane x + maxD - d in [0, W + maxD)).
    # Per-stripe DMA slices must be 8-row aligned, so stripes read Rh_pad
    # rows and the arrays get enough bottom padding for the last stripe.
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
        _kernel, R=R, W=W, Wp=Wp, D=D, Dpow=Dpow, bs=bs, Rh_pad=Rh_pad
    )
    out = jax.ShapeDtypeStruct((H, W), jnp.int32)
    outs = pl.pallas_call(
        kernel,
        grid=(n_stripes,),
        out_shape=(out,) * 5,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=tuple(
            pl.BlockSpec((R, W), lambda i: (i, 0)) for _ in range(5)
        ),
        scratch_shapes=[
            pltpu.VMEM((Rh_pad, W), jnp.int32),
            pltpu.VMEM((Rh_pad, Wp), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(lp_pad, rp_pad)
    return outs
