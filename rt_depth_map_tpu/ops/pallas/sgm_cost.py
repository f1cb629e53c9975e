"""SGBM Birchfield-Tomasi cost volume as a Pallas TPU kernel.

The XLA formulation builds 128 sliced cost planes plus two windowed-sum
passes over the 472MB volume (~30ms at 720p). This kernel streams 8-row
stripes of the six precomputed per-image planes (sobel & raw, each with
their half-pixel min/max envelopes), loops over disparities with dynamic
lane rolls (no gathers), applies the replicate-border 2-D window sums
in-registers, and writes the volume ONCE.

Output layout is (H, D, W1) -- per-d planes are row-major writable (the
d-minor layout would need a per-row transpose). The caller transposes to
the (H, W1, D) the aggregation path consumes; that single XLA transpose is
bandwidth-bound (~3ms) vs the ~20ms saved here.

Semantics are bit-identical to ops/sgbm.py sgbm_cost_volume (all int32,
OpenCV calcPixelCostBT + replicated block sums)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rt_depth_map_tpu.ops.sgbm import _halfpix, sgbm_preprocess


def _kernel(*refs, R, W1, Wp, D, minX1, min_disp, bs, Rh, out_dtype,
            n_chunks, variant, n_stripes=None, BU=1):
    # Carried-static-roll scheme (production variants): the per-disparity
    # alignment rolls of the packed right planes were DYNAMIC (sk depends
    # on the fori block index), and Mosaic lowers a dynamic-amount lane
    # roll ~1.6x slower than a static one (tools/cost_floor.py bt 1.58ms
    # vs btsr0 0.97ms over null at 720p/D=128). Instead the block-base
    # alignment lives in two scratch planes advanced by a STATIC roll of 8
    # per block; the 8 in-block disparities are static rolls 0..7 on top.
    use_carry = variant in ("full", "mxuh")
    if variant == "mxuh":
        (planes_hbm, band_hbm, C_hbm, pin, obuf, band, rollA, rollB,
         in_sems, out_sems, band_sem) = refs
    elif use_carry:
        (planes_hbm, C_hbm, pin, obuf, rollA, rollB,
         in_sems, out_sems) = refs
    else:
        planes_hbm, C_hbm, pin, obuf, in_sems, out_sems = refs
    w2 = bs // 2
    i = pl.program_id(0)
    d_chunk = D // n_chunks  # disparities per output DMA

    if variant == "mxuh":
        # banded window matrix resident in VMEM for the whole launch (the
        # scratch persists across grid programs; filled once)
        @pl.when(i == 0)
        def _():
            bdma = pltpu.make_async_copy(band_hbm, band, band_sem)
            bdma.start()
            bdma.wait()

    # planes_hbm is pre-sliced into overlapping stripes (12, n, Rh, Wp):
    # indexing the untiled stripe dim frees R from the 8-sublane slice
    # alignment an (i*R, Rh) row window would need, so R can be chosen to
    # make Rh = R + (bs-1) land exactly on a sublane multiple (no padded
    # dead rows in the window compute).
    in_dma = pltpu.make_async_copy(planes_hbm.at[:, i], pin, in_sems)
    in_dma.start()
    in_dma.wait()
    # plane order: ls, lu0, lu1, lraw, lru0, lru1, packA, packB -- the six
    # right-image planes are 8-bit values packed four/two to an int32
    # (packA = rs | rv0<<8 | rv1<<16 | rraw<<24, packB = rrv0 | rrv1<<8):
    # the per-disparity lane-misaligned slices are the kernel's dominant
    # cost (measured: full BT arithmetic with ALIGNED slices is free,
    # tools/cost_floor.py btns vs bt), so each disparity slices 2 packed
    # planes instead of 6 and unpacks with cheap shifts/ands after.
    P = pin[...]

    def left(k):
        # left-image planes sampled at x = j + minX1 (static shift)
        return P[k][:, minX1 : minX1 + W1]

    ls, lu0, lu1 = left(0), left(1), left(2)
    lraw, lru0, lru1 = left(3), left(4), left(5)

    lane_pos = jax.lax.broadcasted_iota(jnp.int32, (Rh, W1), 1)

    def horiz_win(v):
        """Replicate-border sliding sum of width bs along lanes, as native
        rolls + edge-replication masks (the jnp.concatenate extension
        forced a Mosaic relayout per concat -- misaligned operands)."""
        acc = v
        le = v[:, :1]
        re = v[:, -1:]
        for k in range(1, w2 + 1):
            l = jnp.where(lane_pos < k, le, pltpu.roll(v, k, axis=1))
            r = jnp.where(lane_pos >= W1 - k, re, pltpu.roll(v, -k % W1,
                                                             axis=1))
            acc = acc + l + r
        return acc

    def bt(u, u0, u1, v, v0, v1):
        c0 = jnp.maximum(0, jnp.maximum(u - v1, v0 - u))
        c1 = jnp.maximum(0, jnp.maximum(v - u1, u0 - v))
        return jnp.minimum(c0, c1)

    def out_dma(chunk, prog):
        # C_hbm is the (H, D//8, 8, W1) view of the (H, D, W1) volume (free
        # reshape outside: the (8, W1) tile layout is identical); one DMA
        # ships d_chunk disparities at once -- per-8-disparity DMAs were
        # issue-bound (16 DMAs x ~2us x 90 stripes ~= 3ms/frame at 720p).
        # Lane-stacked batching (n_stripes set): program prog handles frame
        # prog // n_stripes, stripe prog % n_stripes, and the frame's
        # volume lands at lane offset b * W1 of the (Ho, D//8, 8, B*W1)
        # output (the layout the batched vertical/WTA stage consumes).
        if n_stripes is None:
            dst = C_hbm.at[
                pl.ds(prog * R, R), pl.ds(chunk * (d_chunk // 8), d_chunk // 8)
            ]
        else:
            s = prog % n_stripes
            b = prog // n_stripes
            dst = C_hbm.at[
                pl.ds(s * R, R),
                pl.ds(chunk * (d_chunk // 8), d_chunk // 8),
                slice(None),
                pl.ds(pl.multiple_of(b * W1, 128), W1),
            ]
        return pltpu.make_async_copy(obuf.at[chunk], dst, out_sems.at[chunk])

    # Disparity loop structure: a fori_loop over 8-disparity blocks (a fully
    # unrolled 128-step loop takes Mosaic ~4 minutes to compile), with ONE
    # dynamic lane roll per right-image plane per block; the 8 in-block
    # disparities are then static slices of the rolled planes, and the
    # in-block store index k is static (dynamic sublane store indices hang
    # the compiler). Results collect in obuf per d_chunk; the chunk's single
    # DMA fires when its last block completes.
    n_blocks = D // 8
    blocks_per_chunk = d_chunk // 8

    # the scratch obuf persists across grid programs: don't overwrite a
    # chunk before the previous program's DMA of it has landed
    @pl.when(i > 0)
    def _():
        for c in range(n_chunks):
            out_dma(c, i - 1).wait()

    def vert_win(h):
        # vertical window: sublane rolls + one tile-aligned slice (the
        # h[r : r + R] slices were sublane-misaligned -> relayouts);
        # wrapped rows land at sublane >= Rh - r >= R, outside the slice
        vacc = h
        for r in range(1, bs):
            vacc = vacc + pltpu.roll(h, -r % Rh, axis=0)
        return vacc[0:R]

    if variant == "btsr0":
        # measurement only (wrong disparity indexing): one STATIC base
        # roll for the whole program; per-k STATIC rolls on top. Probes
        # the static-roll cost structure the carried-roll restructure
        # would have, vs the dynamic rolls of "bt"/"full".
        baseA = pltpu.roll(P[6], (32 - minX1) % Wp, axis=1)
        baseB = pltpu.roll(P[7], (32 - minX1) % Wp, axis=1)

    def pix_at(db, k):
        # ONE dynamic roll per packed plane per disparity, sliced at
        # lane 0: a static-offset slice of a pre-rolled plane gets a
        # lazy offset layout, and every of the ~8 binary ops mixing it
        # with the offset-0 left planes then pays a full relayout
        # (measured +4.2ms/frame, tools/cost_floor.py bt vs btns); a
        # dynamic roll amount forces ONE canonical materialization.
        sk = (8 * db + k - minX1) % Wp
        if variant == "btns":
            # measurement only: one shared alignment for all k (wrong
            # disparity indexing) -- the no-relayout floor
            sk = (8 * db + 8 - minX1) % Wp

        if variant == "btsr0":
            a = pltpu.roll(baseA, k, axis=1)[:, :W1]
            b = pltpu.roll(baseB, k, axis=1)[:, :W1]
        elif use_carry:
            # static roll k on the carried block base (see header note);
            # rolls compose additively mod Wp, so
            # roll(roll(P, -minX1), 8*db + k) == roll(P, sk) bit-exactly
            a = pltpu.roll(rollA[...], k, axis=1)[:, :W1]
            b = pltpu.roll(rollB[...], k, axis=1)[:, :W1]
        else:
            a = pltpu.roll(P[6], sk, axis=1)[:, :W1]
            b = pltpu.roll(P[7], sk, axis=1)[:, :W1]
        rs_ = a & 255
        rv0_ = (a >> 8) & 255
        rv1_ = (a >> 16) & 255
        pix = bt(ls, lu0, lu1, rs_, rv0_, rv1_)
        if variant not in ("bt1", "btns"):
            # "bt1" drops the raw-image BT term (half the arithmetic)
            # to split arithmetic cost from loop/slice overhead
            rraw_ = (a >> 24) & 255
            rrv0_ = b & 255
            rrv1_ = (b >> 8) & 255
            pix = pix + (
                bt(lraw, lru0, lru1, rraw_, rrv0_, rrv1_) >> 2
            )  # (Rh, W1)
        return pix

    def block(db, _):
        chunk = db // blocks_per_chunk
        dd = db % blocks_per_chunk

        # variant is a measurement knob (tools/cost_floor.py): the
        # non-"full"/"mxuh" settings keep the loop + DMA structure but
        # drop compute stages to expose each stage's cost in isolation.
        if variant in ("null", "bt", "bt1", "btns", "btsr0", "bth"):
            for k in range(8):
                pix = pix_at(db, k)
                if variant == "null":
                    acc = ls[0:R]
                elif variant == "bth":
                    acc = horiz_win(pix)[0:R]
                else:
                    acc = pix[0:R]
                obuf[chunk, :, dd, k, :] = acc.astype(out_dtype)
        elif variant == "mxuh":
            for k in range(8):
                pix = pix_at(db, k)
                # horizontal replicate-border window as ONE int8 MXU
                # dot against the banded weight matrix (weights 1-3;
                # pix <= 2*ftzero + 63 <= 127 for ftzero <= 32, so
                # int8 products are exact; int32 accumulation)
                h = jax.lax.dot_general(
                    pix.astype(jnp.int8), band[...],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                obuf[chunk, :, dd, k, :] = vert_win(h).astype(out_dtype)
        else:  # "full": window sums on PAIRED disparity planes
            # pix <= 2*ftzero + (255 >> 2) <= 189 and the 5x5 window sum
            # <= 25 * 189 = 4725 < 2^15, so two disparities ride one
            # int32 in 16-bit fields with no cross-field carry: both
            # window passes (the kernel's second-largest cost after the
            # BT relayouts) run at half the plane ops.
            for k2 in range(4):
                p0 = pix_at(db, 2 * k2)
                p1_ = pix_at(db, 2 * k2 + 1)
                packed = p0 + (p1_ << 16)
                vacc = vert_win(horiz_win(packed))
                obuf[chunk, :, dd, 2 * k2, :] = (
                    vacc & 0xFFFF).astype(out_dtype)
                obuf[chunk, :, dd, 2 * k2 + 1, :] = (
                    vacc >> 16).astype(out_dtype)

        @pl.when(dd == blocks_per_chunk - 1)
        def _():
            out_dma(chunk, i).start()

        if use_carry:
            # advance the carried alignment to the next 8-disparity block
            rollA[...] = pltpu.roll(rollA[...], 8, axis=1)
            rollB[...] = pltpu.roll(rollB[...], 8, axis=1)
        return 0

    if use_carry:
        rollA[...] = pltpu.roll(P[6], (-minX1) % Wp, axis=1)
        rollB[...] = pltpu.roll(P[7], (-minX1) % Wp, axis=1)

    if BU == 1:
        jax.lax.fori_loop(0, n_blocks, block, 0)
    else:
        # BU blocks per fori trip: the per-trip overhead (~2us) was ~40%
        # of the kernel's null floor at 576 trips/frame (tools/
        # cost_floor.py); unrolling trades it for compile time.
        def trip(t, _):
            for u in range(BU):
                block(t * BU + u, 0)
            return 0

        jax.lax.fori_loop(0, n_blocks // BU, trip, 0)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        for c in range(n_chunks):
            out_dma(c, i).wait()


def sgm_cost_volume_pallas(
    left: jnp.ndarray,
    right: jnp.ndarray,
    num_disp: int,
    block_size: int,
    pre_filter_cap: int = 0,
    layout: str = "hwd",
    dtype=jnp.int32,
    interpret: bool = False,
    out_h: int | None = None,
    _variant: str = "full",
):
    """(C, minX1, width1) -- bit-identical to ops.sgbm.sgbm_cost_volume for
    min_disparity == 0. layout: "hwd" -> (H, W1, D) (one XLA transpose, the
    layout the lax.scan aggregation consumes); "hdw" -> the kernel-native
    (H, D, W1) (no transpose; consumed by ops/pallas/sgm_hdw.py). Requires
    W1 % 128 == 0, H % 8 == 0, D % 8 == 0.

    out_h (hdw layout only): allocate the output with out_h >= H rows and
    write only the first H -- rows [H, out_h) are UNDEFINED. Lets the fused
    bidirectional path consume the volume in its 128-padded-H space without
    an extra XLA pad copy of the full volume (pad rows evolve independently
    through the horizontal recurrence and are never read back, so real rows
    stay bit-exact).

    _variant is a measurement knob (tools/cost_floor.py): "full" is
    production; "null"/"bt"/"bth" drop compute stages to isolate their
    cost; "mxuh" replaces the horizontal window rolls with an int8 MXU
    banded-matrix dot (bit-exact to "full" when ftzero <= 32, i.e.
    pre_filter_cap <= 31: pix <= 2*ftzero + 63 <= 127 fits int8).

    Multi-stream batching: (B, H, W) inputs produce the LANE-STACKED
    volume (Ho, D, B*W1) in one launch (grid = B * stripes; frame b's
    volume occupies lanes [b*W1, (b+1)*W1)) -- the layout the batched
    vertical/WTA stage consumes directly. hdw layout only; each frame's
    lanes are bit-identical to its single-frame volume."""
    ftzero = max(pre_filter_cap, 15) | 1
    batched = left.ndim == 3
    B = left.shape[0] if batched else 1
    H, W = left.shape[-2:]
    D = num_disp
    minX1 = D  # min_disp == 0
    W1 = W - D
    bs = block_size
    w2 = bs // 2
    if W1 % 128 or H % 8 or D % 8:
        raise ValueError(f"(H, W1, D) = ({H}, {W1}, {D}) must tile (8, 128, 8)")
    if out_h is not None and (layout != "hdw" or out_h < H or out_h % 8):
        raise ValueError("out_h needs layout='hdw', out_h >= H, out_h % 8 == 0")
    if batched and layout != "hdw":
        raise ValueError("batched cost volume requires layout='hdw'")
    Ho = H if out_h is None else out_h
    # Stripe height: the window compute runs on Rh_pad = round8(R + bs - 1)
    # sublanes per R output rows, so prefer the largest R (within the obuf
    # VMEM budget) whose Rh lands exactly on a sublane multiple. At bs=5,
    # R=20 gives Rh=24 with zero padded dead rows (1.2x window compute per
    # output row vs 1.5x at R=16); int32 volumes use R=12 (Rh=16) to keep
    # obuf (the full stripe x D collect buffer) within ~7MB of VMEM.
    halo = 2 * w2
    if jnp.dtype(dtype).itemsize == 2:
        candidates = (24 - halo, 16, 8)
    else:
        candidates = (16 - halo, 8)
    import os

    try:  # operational override; malformed values keep the default set
        candidates = (int(os.environ["RTDM_COST_R"]),) + candidates
    except (KeyError, ValueError):
        pass

    def scratch_bytes(r):
        # pin (8, Rh_pad, Wp) int32 + obuf (2-chunk output collect)
        rh_pad = ((r + halo + 7) // 8) * 8
        wp = ((W + 127) // 128) * 128
        return (8 * rh_pad * wp * 4
                + r * D * (W - D) * jnp.dtype(dtype).itemsize)

    # the scratch must fit the scoped-vmem budget: at 720p/D=128 every
    # candidate fits the 16M default, but 1080p/D=256 needs the limit
    # raised AND large stripes rejected (R=20 asks 17.7M vs 16M default)
    budget = 88 * 2**20
    R = next((r for r in candidates
              if r > 0 and H % r == 0 and scratch_bytes(r) <= budget), None)
    if R is None:
        R = 8  # H % 8 == 0 is a documented precondition
    vmem_limit = min(100 * 2**20, max(32 * 2**20, scratch_bytes(R) * 2))

    Wp = ((W + 127) // 128) * 128
    Rh = R + halo
    Rh_pad = ((Rh + 7) // 8) * 8

    def prep(p):
        # replicate rows at image borders (the vertical window clamps), pad
        # to the stripe alignment, zero-pad columns to Wp, then pre-slice
        # the overlapping (Rh_pad)-row stripes the kernel DMAs per program
        p = jnp.concatenate(
            [jnp.repeat(p[:1], w2, axis=0), p,
             jnp.repeat(p[-1:], w2 + (Rh_pad - Rh), axis=0)],
            axis=0,
        )
        p = jnp.pad(p, ((0, 0), (0, Wp - W)))
        return jnp.stack([p[i * R : i * R + Rh_pad] for i in range(H // R)])

    def frame_planes(lf, rf):
        ls, lraw = sgbm_preprocess(lf, ftzero)
        rs, rraw = sgbm_preprocess(rf, ftzero)
        lu0, lu1 = _halfpix(ls)
        lru0, lru1 = _halfpix(lraw)
        rv0, rv1 = _halfpix(rs)
        rrv0, rrv1 = _halfpix(rraw)
        # right-image planes are 8-bit values (sobel-clamped <= 2*ftzero <=
        # 126, raw <= 255, half-pixel interpolants within those ranges),
        # packed 4+2 per int32 so the kernel's per-disparity lane-misaligned
        # slices touch 2 planes instead of 6 (see _kernel plane-order note)
        packA = (rs + (rv0 << 8) + (rv1 << 16) + (rraw << 24)).astype(jnp.int32)
        packB = (rrv0 + (rrv1 << 8)).astype(jnp.int32)
        return jnp.stack(
            [prep(x.astype(jnp.int32)) for x in
             (ls, lu0, lu1, lraw, lru0, lru1, packA, packB)]
        )  # (8, H // R, Rh_pad, Wp)

    if batched:
        # frame-major stripe stacking: program i = b * n_stripes + s
        planes = jnp.concatenate(
            [frame_planes(left[b], right[b]) for b in range(B)], axis=1
        )
    else:
        planes = frame_planes(left, right)

    n_chunks = 2 if (D // 8) % 2 == 0 else 1
    try:  # blocks per fori trip (measured neutral at 720p: the fori trip
        # overhead is not the cost kernel's floor; knob kept for other
        # shapes) -- malformed values keep the default
        BU = int(os.environ.get("RTDM_COST_BU", "1"))
    except ValueError:
        BU = 1
    if BU < 1 or (D // 8) % BU:
        BU = 1
    kernel = functools.partial(
        _kernel, R=R, W1=W1, Wp=Wp, D=D, minX1=minX1, min_disp=0, bs=bs,
        Rh=Rh_pad, out_dtype=dtype, n_chunks=n_chunks, variant=_variant,
        n_stripes=(H // R) if batched else None, BU=BU,
    )
    operands = [planes]
    scratches = [
        pltpu.VMEM((8, Rh_pad, Wp), jnp.int32),
        pltpu.VMEM(
            (n_chunks, R, D // 8 // n_chunks, 8, W1), dtype
        ),
    ]
    sems = [
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA((n_chunks,)),
    ]
    if _variant == "mxuh":
        if ftzero > 32:
            raise ValueError("mxuh requires ftzero <= 32 (int8 pix)")
        # banded weight matrix of the width-bs replicate-border window:
        # band[t, j] = #{k in [-w2, w2] : replicate(j + k) == t}
        import numpy as _np

        band_np = _np.zeros((W1, W1), _np.int8)
        for j in range(W1):
            for k in range(-w2, w2 + 1):
                band_np[min(max(j + k, 0), W1 - 1), j] += 1
        operands.append(jnp.asarray(band_np))
        scratches.append(pltpu.VMEM((W1, W1), jnp.int8))
        sems.append(pltpu.SemaphoreType.DMA(()))
    if _variant in ("full", "mxuh"):
        # carried-static-roll alignment planes (see _kernel header note)
        scratches.append(pltpu.VMEM((Rh_pad, Wp), jnp.int32))
        scratches.append(pltpu.VMEM((Rh_pad, Wp), jnp.int32))
    C4 = pl.pallas_call(
        kernel,
        grid=(B * (H // R),),
        out_shape=jax.ShapeDtypeStruct((Ho, D // 8, 8, B * W1), dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(operands),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratches + sems,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=vmem_limit,
        ),
        interpret=interpret,
    )(*operands)
    # (Ho, D//8, 8, B*W1) -> (Ho, D, B*W1) merges two contiguous dims whose
    # (8, W1) tile layout is unchanged: free
    C_hdw = C4.reshape(Ho, D, B * W1)
    if layout == "hdw":
        return C_hdw, minX1, W1
    C = jnp.transpose(C_hdw, (0, 2, 1))
    return C, minX1, W1
