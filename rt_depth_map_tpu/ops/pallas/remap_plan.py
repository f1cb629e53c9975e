"""Gather-free bilinear remap from a compile-time-constant map (TPU).

cv::remap with the rectification maps (reference estimator.cpp:32-38) is a
per-pixel 2D gather. XLA lowers it to a serial TPU gather at ~1 index/cycle
(~1.7ms per 720p channel-plane, ~8.5ms/frame over the 5 remapped planes).
But the maps are CONSTANTS of the jitted frame program, and rectification
warps are smooth: per 8-row output block only a ~12..70-row source band is
touched, and per 8x128 output tile the horizontal displacement spans ~30..60
distinct values. That turns the gather into a small, statically-planned
select network -- pure VPU shifts/compares/selects, no gather unit:

  planner (numpy, trace time):
    quantize the map exactly like ops/remap.py (1/32-px fixed point), then
    for every output row y and source column c compute R0(y, c) = the
    lowest source row any output pixel of row y reads at column c. The
    smoothness bound |d iy/d x| < 1 makes every read at (y, c) fall in
    R0(y, c) + {0..NK-1} with NK <= 4 (asserted; planner returns None and
    callers fall back to the gather path if any bound fails).
  kernel (per 8-row output block):
    1. DMA the source row band into VMEM.
    2. vertical stage: for each band row r, select it into NK planes
       V_k[y, c] = src[R0(y, c) + k, c]  (compare R0rel == r - k).
    3. pack V_0..V_{NK-1} into one int32 word per (y, c) -- the vertical
       2-tap pair of every output pixel now sits in ONE lane at a known
       byte offset (o = iy - R0, a static plane).
    4. horizontal stage, per 128-lane output tile: roll a pow2-sized lane
       window of the packed plane by each displacement s in the tile's
       static [smin, smax] range and select where t == s (and t == s-1 for
       the x+1 tap).
    5. unpack the 4 taps by variable byte shifts, apply the 10-bit
       fixed-point bilinear weights, mask invalid (out-of-image) pixels.

Bit-exact vs ops/remap.py's uint8 path (same quantization, same border
semantics), which is itself within +/-1 LSB of cv::remap CV_16SC2.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RB = 8      # output rows per block
CB = 128    # output columns per tile
_SENT = 32000  # R0rel sentinel for never-read source columns


@dataclass(frozen=True)
class RemapPlan:
    """Static remap schedule for one (grid, source-shape) pair. All arrays
    are numpy; they become constants of the jitted program."""
    src_h: int
    src_w: int
    out_h: int           # padded output rows (multiple of RB)
    out_w: int           # padded output cols (multiple of CB)
    crop_h: int          # caller's grid rows (<= out_h)
    crop_w: int
    nk: int              # vertical planes (max rows read per (y, c))
    bh: int              # VMEM band rows (max over blocks, multiple of 8)
    w2pad: int           # padded source columns (W + 2 -> multiple of 128)
    hpad: int            # padded source rows (covers every band DMA)
    winw: int            # pow2 lane window for the horizontal stage
    r0rel: np.ndarray = field(repr=False)    # (out_h, w2pad) int32
    tplane: np.ndarray = field(repr=False)   # (out_h, out_w) int32
    opack: np.ndarray = field(repr=False)    # (out_h, out_w) int32
    r0_blk: np.ndarray = field(repr=False)   # (NB,) int32 band start rows
    blen: np.ndarray = field(repr=False)     # (NB,) int32 band row counts
    w0neg: np.ndarray = field(repr=False)    # (NB, NCB) int32 w2pad - w0
    base0: np.ndarray = field(repr=False)    # (NB, NCB) int32 (winw-smin)%winw
    smin: np.ndarray = field(repr=False)     # (NB, NCB) int32
    slen: np.ndarray = field(repr=False)     # (NB, NCB) int32


def _quantize(grid: np.ndarray):
    """ops/remap.py's exact CV_16SC2 1/32-px quantization."""
    mx = grid[..., 0].astype(np.float64)
    my = grid[..., 1].astype(np.float64)
    ix = np.floor(mx).astype(np.int32)
    iy = np.floor(my).astype(np.int32)
    fx = np.round((mx - ix) * 32.0).astype(np.int32)
    fy = np.round((my - iy) * 32.0).astype(np.int32)
    ix = ix + (fx >> 5)
    iy = iy + (fy >> 5)
    return ix, iy, fx & 31, fy & 31


def plan_remap(grid: np.ndarray, src_hw: tuple[int, int],
               max_nk: int = 4, max_bh: int = 128,
               max_slen: int = 192,
               valid_override: np.ndarray | None = None) -> RemapPlan | None:
    # max_slen leaves room for the one boundary tile of an edge-padded
    # (non-multiple-of-128) grid, where the replicated map columns make t
    # fall by 1 per lane (spread ~128 + the local dx spread).
    """Build a RemapPlan for a constant (Ho, Wo, 2) float map into an
    (H, W) source. Returns None when the warp violates the smoothness /
    locality bounds the kernel relies on (caller falls back to the gather
    formulation)."""
    H, W = src_hw
    gh, gw = grid.shape[:2]
    out_h = -(-gh // RB) * RB
    out_w = -(-gw // CB) * CB
    if out_h != gh or out_w != gw:
        # replicate edge map entries; the padded outputs are cropped away
        grid = np.pad(grid, ((0, out_h - gh), (0, out_w - gw), (0, 0)),
                      mode="edge")
    ix, iy, fx, fy = _quantize(grid)
    valid = (ix >= -1) & (ix <= W - 1) & (iy >= -1) & (iy <= H - 1)
    if valid_override is not None:
        # caller-supplied per-entry validity (frame-stacked sources whose
        # per-frame extent is tighter than (H, W) -- engine batch path);
        # coords of overridden entries must still be in-extent/local.
        ov = valid_override
        if ov.shape != (out_h, out_w):
            ov = np.pad(ov, ((0, out_h - ov.shape[0]),
                             (0, out_w - ov.shape[1])), mode="edge")
        valid = valid & ov
    iyc = np.clip(iy + 1, 0, H)    # rows of the 1-padded source
    ixc = np.clip(ix + 1, 0, W)    # cols of the 1-padded source

    w2 = W + 2
    # the horizontal window must cover one 128-lane output tile + up to 127
    # lanes of window misalignment + the tile's dx spread; the fixed pow2
    # (in-kernel rolls wrap without an integer modulo) 512-lane window
    # leaves 256 lanes of dx budget. Source columns pad up to >= 512.
    winw = 512
    w2pad = max(winw, -(-w2 // 128) * 128)

    oy = np.broadcast_to(np.arange(out_h)[:, None], ixc.shape)
    BIGR = np.int32(2**30)
    r0 = np.full((out_h, w2pad), BIGR, np.int32)
    rmax = np.full((out_h, w2pad), -1, np.int32)
    for shift in (0, 1):
        cols = ixc + shift
        np.minimum.at(r0, (oy.ravel(), cols.ravel()), iyc.ravel())
        np.maximum.at(rmax, (oy.ravel(), cols.ravel()), (iyc + 1).ravel())
    read = rmax >= 0
    nk = int((rmax[read] - r0[read] + 1).max()) if read.any() else 2
    if nk > max_nk:
        return None

    o = iyc - r0[oy, ixc]
    o2 = iyc - r0[oy, ixc + 1]
    if not ((o >= 0).all() and (o + 1 <= nk - 1).all()
            and (o2 >= 0).all() and (o2 + 1 <= nk - 1).all()):
        return None

    nb, ncb = out_h // RB, out_w // CB
    r0_blk = np.zeros(nb, np.int32)
    blen = np.zeros(nb, np.int32)
    r0rel = np.full((out_h, w2pad), _SENT, np.int32)
    for b in range(nb):
        rd = read[b * RB:(b + 1) * RB]
        rr = r0[b * RB:(b + 1) * RB]
        lo = int(rr[rd].min()) if rd.any() else 0
        hi = int(rr[rd].max()) + nk  # exclusive: rows lo .. hi-1
        lo = (lo // 8) * 8
        r0_blk[b] = lo
        blen[b] = hi - lo
        r0rel[b * RB:(b + 1) * RB][rd] = (rr - lo)[rd]
    bh = -(-int(blen.max()) // 8) * 8
    if bh > max_bh:
        return None
    hpad = max(H + 2, int((r0_blk + bh).max()))

    w0neg = np.zeros((nb, ncb), np.int32)
    base0 = np.zeros((nb, ncb), np.int32)
    smin_t = np.zeros((nb, ncb), np.int32)
    slen_t = np.zeros((nb, ncb), np.int32)
    tplane = np.zeros((out_h, out_w), np.int32)
    lx = np.arange(out_w, dtype=np.int32) % CB
    for b in range(nb):
        ys = slice(b * RB, (b + 1) * RB)
        for cb in range(ncb):
            xs = slice(cb * CB, (cb + 1) * CB)
            cmin = int(ixc[ys, xs].min())
            cmax = int(ixc[ys, xs].max()) + 1
            w0 = min(max((cmin // 128) * 128, 0), w2pad - winw)
            if cmax - w0 > winw - 1:
                return None
            t = ixc[ys, xs] - w0 - lx[None, xs]
            tplane[ys, xs] = t
            w0neg[b, cb] = w2pad - w0
            smin_t[b, cb] = t.min()
            # +2, not +1: the x+1 tap selects where t == s-1, so the scan
            # must also visit s = tmax + 1
            slen_t[b, cb] = int(t.max()) - int(t.min()) + 2
            base0[b, cb] = (winw - int(t.min())) % winw
    if int(slen_t.max()) > max_slen:
        return None

    opack = (fx | (fy << 5) | (valid.astype(np.int32) << 10)
             | (o << 11) | (o2 << 13)).astype(np.int32)
    return RemapPlan(
        src_h=H, src_w=W, out_h=out_h, out_w=out_w, crop_h=gh, crop_w=gw,
        nk=nk, bh=bh, w2pad=w2pad, hpad=hpad, winw=winw,
        r0rel=r0rel, tplane=tplane, opack=opack,
        r0_blk=r0_blk, blen=blen, w0neg=w0neg, base0=base0,
        smin=smin_t, slen=slen_t,
    )


def _kernel(r0_blk, blen, w0neg, base0, smin, slen,   # SMEM tables
            planes_hbm, r0rel, tplane, opack, out,    # tensor operands
            band, vbuf, pvbuf, in_sem, *, C, NK, BH, W2P, WINW, NCB):
    b = pl.program_id(0)
    # the planner aligns every band start to a multiple of 8 (sublane
    # tiling); Mosaic cannot prove that for a runtime SMEM value, so hint it
    dma = pltpu.make_async_copy(
        planes_hbm.at[:, pl.ds(pl.multiple_of(r0_blk[b], 8), BH)],
        band, in_sem)
    dma.start()
    dma.wait()

    r0r = r0rel[...]

    for ck in range(C * NK):
        vbuf[ck] = jnp.zeros((RB, W2P), jnp.int32)

    def vbody(r, _):
        rows = [band[c, pl.ds(r, 1), :] for c in range(C)]
        for k in range(NK):
            m = r0r == (r - k)
            for c in range(C):
                vbuf[c * NK + k] = jnp.where(
                    m, jnp.broadcast_to(rows[c], (RB, W2P)),
                    vbuf[c * NK + k])
        return 0

    jax.lax.fori_loop(0, blen[b], vbody, 0)

    for c in range(C):
        pv = vbuf[c * NK]
        for k in range(1, NK):
            pv = pv | (vbuf[c * NK + k] << (8 * k))
        pvbuf[c] = pv

    opk = opack[...]
    tpl = tplane[...]
    for cb in range(NCB):
        sw = [
            pltpu.roll(pvbuf[c], w0neg[b, cb], axis=1)[:, :WINW]
            for c in range(C)
        ]
        tloc = tpl[:, cb * CB:(cb + 1) * CB]
        s0 = smin[b, cb]
        bs0 = base0[b, cb]

        def hbody(j, carry):
            sels = list(carry)
            s = s0 + j
            amt = bs0 - j
            amt = jnp.where(amt < 0, amt + WINW, amt)
            m0 = tloc == s
            m1 = tloc == s - 1
            for c in range(C):
                rolled = pltpu.roll(sw[c], amt, axis=1)[:, :CB]
                sels[2 * c] = jnp.where(m0, rolled, sels[2 * c])
                sels[2 * c + 1] = jnp.where(m1, rolled, sels[2 * c + 1])
            return tuple(sels)

        zero = jnp.zeros((RB, CB), jnp.int32)
        sels = jax.lax.fori_loop(0, slen[b, cb], hbody, (zero,) * (2 * C))

        ob = opk[:, cb * CB:(cb + 1) * CB]
        fxv = ob & 31
        fyv = (ob >> 5) & 31
        vld = (ob >> 10) & 1
        o8 = ((ob >> 11) & 3) * 8
        o28 = ((ob >> 13) & 3) * 8
        w00 = (32 - fxv) * (32 - fyv)
        w01 = fxv * (32 - fyv)
        w10 = (32 - fxv) * fyv
        w11 = fxv * fyv
        for c in range(C):
            pv0, pv1 = sels[2 * c], sels[2 * c + 1]
            p00 = (pv0 >> o8) & 255
            p10 = (pv0 >> (o8 + 8)) & 255
            p01 = (pv1 >> o28) & 255
            p11 = (pv1 >> (o28 + 8)) & 255
            acc = p00 * w00 + p01 * w01 + p10 * w10 + p11 * w11
            res = (acc + 512) >> 10
            out[c, :, cb * CB:(cb + 1) * CB] = jnp.where(vld > 0, res, 0)


def remap_bilinear_planned(img: jnp.ndarray, plan: RemapPlan,
                           interpret: bool = False) -> jnp.ndarray:
    """Remap uint8 `img` ((H, W) or (H, W, C<=4)) by the constant map the
    plan was built from. Bit-exact vs ops.remap.remap_bilinear."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    H, W, C = img.shape
    assert (H, W) == (plan.src_h, plan.src_w), "plan/source shape mismatch"
    # (C, hpad, w2pad) int32 planes of the 1-padded source
    p = jnp.pad(img, ((1, 1), (1, 1), (0, 0)))
    p = jnp.pad(p, ((0, plan.hpad - (H + 2)), (0, plan.w2pad - (W + 2)),
                    (0, 0)))
    planes = jnp.transpose(p, (2, 0, 1)).astype(jnp.int32)

    nb = plan.out_h // RB
    kernel = functools.partial(
        _kernel, C=C, NK=plan.nk, BH=plan.bh, W2P=plan.w2pad,
        WINW=plan.winw, NCB=plan.out_w // CB)
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        out_shape=jax.ShapeDtypeStruct((C, plan.out_h, plan.out_w),
                                       jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # r0_blk
            pl.BlockSpec(memory_space=pltpu.SMEM),      # blen
            pl.BlockSpec(memory_space=pltpu.SMEM),      # w0neg
            pl.BlockSpec(memory_space=pltpu.SMEM),      # base0
            pl.BlockSpec(memory_space=pltpu.SMEM),      # smin
            pl.BlockSpec(memory_space=pltpu.SMEM),      # slen
            pl.BlockSpec(memory_space=pl.ANY),          # planes
            pl.BlockSpec((RB, plan.w2pad), lambda b: (b, 0)),   # r0rel
            pl.BlockSpec((RB, plan.out_w), lambda b: (b, 0)),   # tplane
            pl.BlockSpec((RB, plan.out_w), lambda b: (b, 0)),   # opack
        ],
        out_specs=pl.BlockSpec((C, RB, plan.out_w), lambda b: (0, b, 0)),
        scratch_shapes=[
            pltpu.VMEM((C, plan.bh, plan.w2pad), jnp.int32),
            pltpu.VMEM((C * plan.nk, RB, plan.w2pad), jnp.int32),
            pltpu.VMEM((C, RB, plan.w2pad), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(
        jnp.asarray(plan.r0_blk), jnp.asarray(plan.blen),
        jnp.asarray(plan.w0neg), jnp.asarray(plan.base0),
        jnp.asarray(plan.smin), jnp.asarray(plan.slen),
        planes,
        jnp.asarray(plan.r0rel), jnp.asarray(plan.tplane),
        jnp.asarray(plan.opack),
    )
    res = jnp.transpose(out[:, :plan.crop_h, :plan.crop_w],
                        (1, 2, 0)).astype(img.dtype)
    return res[..., 0] if squeeze else res
