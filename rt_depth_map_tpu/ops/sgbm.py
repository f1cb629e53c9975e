"""Semi-global matching as a jittable JAX program (cv::StereoSGBM parity).

Bit-exact vs the golden numpy implementation (golden/sgbm.py), which pins the
SWSemiGlobalMatcher semantics of the reference (sgbm-sw.cpp:12-25,
SURVEY.md section 2.9b): Birchfield-Tomasi pixel cost on the clipped x-Sobel
response plus quarter-weighted raw BT, replicated block window sums, SGM path
aggregation over 4 (MODE_SGBM) or 8 (MODE_HH) directions, WTA with smallest-d
tie-break, SGBM uniqueness test, parabolic subpixel, inline cost-based
left-right check, speckle filter.

TPU formulation notes (SURVEY.md section 7 step 6):
  * Cost volume is laid out (H, W1, D) with D on the lane dimension
    (D is 64/128/192 -> lane-aligned); all arithmetic is int32 on the VPU.
  * Each SGM direction is one `lax.scan` whose carry is the previous
    scanline's L_r -- (H, D) for horizontal scans over W1 steps, (W1, D) for
    vertical/diagonal scans over H steps. Every step is a handful of
    elementwise min/add ops over ~W*D lanes, which XLA fuses into a single
    loop body; the 8 directions run as 6 scans (the two horizontal
    directions scan over x, all vertical/diagonal ones over y).
  * Diagonal directions shift the carry by +/-1 column with zero fill each
    step, which reproduces OpenCV's zero border initialization exactly
    (zero rows have min 0, so delta = P2 and m = 0 at borders).
  * The left-right consistency check packs (cost, d) keys and resolves the
    per-right-pixel winner with shift-reduces over the candidate disparities
    (no scatter/gather) while reproducing the sequential "first
    strictly-lower-cost wins" update order.
  * On TPU-compatible shapes the cost volume and the vertical/diagonal
    aggregation passes run as Pallas kernels (ops/pallas/).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from rt_depth_map_tpu.config import MatcherConfig
from rt_depth_map_tpu.ops.speckle import filter_speckles


def _env_flag(name: str) -> bool:
    """Operational kill-switches for newly-landed kernel paths (bench
    resilience: a Mosaic regression in one kernel must not take down the
    whole pipeline -- flip the env var to fall back to the proven path)."""
    import os

    return os.environ.get(name, "") not in ("", "0")

DISP_SHIFT = 4
DISP_SCALE = 1 << DISP_SHIFT
MAX_COST = 32767  # python int: jnp scalars at module scope become lifted consts (jit fast-path bug)


def _clip_tab(v: jnp.ndarray, ftzero: int) -> jnp.ndarray:
    return jnp.clip(v, -ftzero, ftzero) + ftzero


def sgbm_preprocess(img: jnp.ndarray, ftzero: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sobel-clipped, raw) planes; golden/sgbm.py `sgbm_preprocess` parity."""
    x = img.astype(jnp.int32)
    up = jnp.concatenate([x[:1], x[:-1]], axis=0)
    down = jnp.concatenate([x[1:], x[-1:]], axis=0)

    def dx(row):
        left = jnp.concatenate([row[:, :1], row[:, :-1]], axis=1)
        right = jnp.concatenate([row[:, 1:], row[:, -1:]], axis=1)
        return right - left

    sob = _clip_tab(2 * dx(x) + dx(up) + dx(down), ftzero)
    sob = sob.at[:, 0].set(0).at[:, -1].set(0)
    raw = x.at[:, 0].set(0).at[:, -1].set(0)
    return sob, raw


def _halfpix(p: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    left = jnp.concatenate([p[:, :1], p[:, :-1]], axis=1)
    right = jnp.concatenate([p[:, 1:], p[:, -1:]], axis=1)
    al = (p + left) // 2
    ar = (p + right) // 2
    al = al.at[:, 0].set(p[:, 0])
    ar = ar.at[:, -1].set(p[:, -1])
    mn = jnp.minimum(p, jnp.minimum(al, ar))
    mx = jnp.maximum(p, jnp.maximum(al, ar))
    return mn, mx


def _bt_cost_plane(pl: jnp.ndarray, pr: jnp.ndarray, min_disp: int,
                   num_disp: int) -> jnp.ndarray:
    """Sampling-insensitive BT cost, (H, W, D) int32 (golden `_bt_cost_plane`).

    fori_loop over d with dynamic slices of the once-padded right-image
    planes (the D-unrolled plane stack made XLA compiles take minutes)."""
    H, W = pl.shape
    u0, u1 = _halfpix(pl)
    v0, v1 = _halfpix(pr)
    M = num_disp + abs(min_disp) + 1
    padc = ((0, 0), (M, M))
    pr_pad = jnp.pad(pr, padc)
    v0_pad = jnp.pad(v0, padc)
    v1_pad = jnp.pad(v1, padc)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)

    def body(i, vol):
        dd = min_disp + i
        # right-image planes sampled at x - dd (zero outside the image)
        start = (0, M - dd)
        v = jax.lax.dynamic_slice(pr_pad, start, (H, W))
        vv0 = jax.lax.dynamic_slice(v0_pad, start, (H, W))
        vv1 = jax.lax.dynamic_slice(v1_pad, start, (H, W))
        c0 = jnp.maximum(0, jnp.maximum(pl - vv1, vv0 - pl))
        c1 = jnp.maximum(0, jnp.maximum(v - u1, u0 - v))
        inb = (xs - dd >= 0) & (xs - dd < W)
        c = jnp.where(inb, jnp.minimum(c0, c1), 0)
        return jax.lax.dynamic_update_slice(vol, c[..., None], (0, 0, i))

    return jax.lax.fori_loop(
        0, num_disp, body, jnp.zeros((H, W, num_disp), jnp.int32)
    )


def sgbm_cost_volume(
    left: jnp.ndarray,
    right: jnp.ndarray,
    num_disp: int,
    block_size: int,
    min_disp: int = 0,
    pre_filter_cap: int = 0,
) -> Tuple[jnp.ndarray, int, int]:
    """Windowed BT cost C: (H, width1, D) int32; golden `sgbm_cost_volume`."""
    ftzero = max(pre_filter_cap, 15) | 1
    H, W = left.shape
    minX1 = max(min_disp + num_disp, 0)
    maxX1 = W + min(min_disp, 0)
    width1 = maxX1 - minX1

    ls, lr = sgbm_preprocess(left, ftzero)
    rs, rr = sgbm_preprocess(right, ftzero)
    pix = _bt_cost_plane(ls, rs, min_disp, num_disp) + (
        _bt_cost_plane(lr, rr, min_disp, num_disp) >> 2
    )
    pix = pix[:, minX1:maxX1]  # (H, W1, D)

    sw2 = block_size // 2
    acc = _sliding_sum_replicate(pix, block_size, axis=1)
    out = _sliding_sum_replicate(acc, block_size, axis=0)
    del sw2
    return out, minX1, width1


def _sliding_sum_replicate(x: jnp.ndarray, size: int, axis: int) -> jnp.ndarray:
    """out[i] = sum_{o=-w2..w2} x[clamp(i+o, 0, N-1)] along `axis` --
    replicate-border window sum as prefix sums plus border-multiplicity
    corrections (no gathers; the fancy-index formulation costs ~10ms at 720p
    on TPU)."""
    w2 = size // 2
    N = x.shape[axis]
    c = jnp.cumsum(x, axis=axis, dtype=x.dtype)
    pad_hi = [(0, 0)] * x.ndim
    pad_hi[axis] = (0, w2)
    pad_lo = [(0, 0)] * x.ndim
    pad_lo[axis] = (w2 + 1, 0)
    ext = jnp.pad(jnp.pad(c, pad_hi, mode="edge"), pad_lo)
    hi = jax.lax.slice_in_dim(ext, 2 * w2 + 1, 2 * w2 + 1 + N, axis=axis)
    lo = jax.lax.slice_in_dim(ext, 0, N, axis=axis)
    interior = hi - lo  # zero-padded window sum

    # replicate semantics: clamped out-of-range taps read the border element
    idx_shape = [1] * x.ndim
    idx_shape[axis] = N
    i = jax.lax.broadcasted_iota(jnp.int32, tuple(idx_shape), axis)
    low_cnt = jnp.maximum(w2 - i, 0).astype(x.dtype)
    hi_cnt = jnp.maximum(i + w2 - (N - 1), 0).astype(x.dtype)
    first = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
    last = jax.lax.slice_in_dim(x, N - 1, N, axis=axis)
    return interior + low_cnt * first + hi_cnt * last


def _sgm_step(Crow: jnp.ndarray, Lp: jnp.ndarray, p1: int, p2: int) -> jnp.ndarray:
    """One SGM recurrence step; Crow/Lp: (N, D). Zero Lp rows reproduce the
    OpenCV zero border (min over zeros = 0 -> delta = p2, m = 0)."""
    N = Lp.shape[0]
    minLp = jnp.min(Lp, axis=1, keepdims=True)
    lm = jnp.concatenate([jnp.full((N, 1), MAX_COST), Lp[:, :-1]], axis=1)
    lp_ = jnp.concatenate([Lp[:, 1:], jnp.full((N, 1), MAX_COST)], axis=1)
    delta = minLp + p2
    m = jnp.minimum(jnp.minimum(Lp, lm + p1), jnp.minimum(lp_ + p1, delta))
    return Crow + m - delta


def _aggregate_dir(C: jnp.ndarray, p1: int, p2: int, dy: int, dx: int) -> jnp.ndarray:
    """One-direction SGM aggregation; golden `_aggregate_dir` parity.

    C: (H, W1, D) int32. Horizontal directions scan over x with an (H, D)
    carry; all others scan over y with a (W1, D) carry shifted by dx/step.
    """
    H, W1, D = C.shape

    if dy == 0:
        # scan along x in direction of travel; carry = previous column's L
        xsC = jnp.swapaxes(C, 0, 1)  # (W1, H, D)
        if dx < 0:
            xsC = xsC[::-1]

        def stepx(Lp, Crow):
            L = _sgm_step(Crow, Lp, p1, p2)
            return L, L

        _, Ls = jax.lax.scan(stepx, jnp.zeros((H, D), jnp.int32), xsC)
        if dx < 0:
            Ls = Ls[::-1]
        return jnp.swapaxes(Ls, 0, 1)

    rows = C if dy > 0 else C[::-1]

    def stepy(Lprev, Crow):
        if dx == 0:
            Lp = Lprev
        elif dx > 0:
            Lp = jnp.concatenate(
                [jnp.zeros((dx, D), jnp.int32), Lprev[:-dx]], axis=0
            )
        else:
            Lp = jnp.concatenate(
                [Lprev[-dx:], jnp.zeros((-dx, D), jnp.int32)], axis=0
            )
        L = _sgm_step(Crow, Lp, p1, p2)
        return L, L

    _, Ls = jax.lax.scan(stepy, jnp.zeros((W1, D), jnp.int32), rows)
    return Ls if dy > 0 else Ls[::-1]


_DIRS_PASS1 = [(0, 1), (1, 1), (1, 0), (1, -1)]
_DIRS_PASS2 = [(0, -1), (-1, -1), (-1, 0), (-1, 1)]


def _use_pallas(cfg: MatcherConfig, H: int, width1: int, D: int) -> bool:
    """Fused Pallas path: explicit backend=pallas, or auto + shapes that tile
    the TPU vector layout. On CPU the kernels run in interpreter mode (only
    selected when explicitly requested -- too slow for auto).

    D needs only %16 (cv2's own StereoSGBM constraint; the kernels block
    disparities in 8s) -- the reference's width-scaled default D=192 rides
    this path. The vertical stage's W1 % 128 requirement is met by
    zero-padding W1 (exact: the SGM step is shift-invariant in its carry,
    so a uniform-carry zero column is indistinguishable from the
    fresh-start fill when a sweep re-enters real columns)."""
    shapes_ok = D % 16 == 0 and width1 % 8 == 0 and H >= 2
    if not shapes_ok:
        return False
    if cfg.backend == "pallas":
        return True
    return cfg.backend == "auto" and jax.default_backend() != "cpu"


def aggregate_cost(C: jnp.ndarray, p1: int, p2: int, num_paths: int) -> jnp.ndarray:
    """Sum of directional aggregations. num_paths: 5 (cv2 MODE_SGBM
    single-pass parity: the 4 causal directions + the within-row reverse
    horizontal -- golden/sgbm.py note), 8 (MODE_HH), or 4 (causal only,
    kept for the tiled/sharded direction-family tests)."""
    dirs = list(_DIRS_PASS1)
    if num_paths == 5:
        dirs += [(0, -1)]
    elif num_paths >= 8:
        dirs += list(_DIRS_PASS2)
    S = jnp.zeros_like(C)
    for dy, dx in dirs:
        S = S + _aggregate_dir(C, p1, p2, dy, dx)
    return S


def wta_uniq_subpix(
    S: jnp.ndarray, uniqueness_ratio: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-pixel WTA + uniqueness + parabolic subpixel from an aggregated
    cost volume S (..., D) int32. Returns (best, minS, dval_x16, bad_uniq);
    dval excludes the min_disparity offset (caller adds minD * DISP_SCALE).

    WTA ties -> smallest d via one packed-key (S, d) lane reduction (yields
    min cost AND argmin in a single volume pass); |S| < 2^19 so S*D + d
    fits int32. Golden parity: golden/sgbm.py WTA/uniqueness/subpixel."""
    D = S.shape[-1]
    ish = (1,) * (S.ndim - 1) + (D,)
    di = jax.lax.broadcasted_iota(jnp.int32, ish, S.ndim - 1)
    kmin = jnp.min(S * D + di, axis=-1)
    best = kmin % D
    minS = kmin // D

    # uniqueness (SGBM form): reject if any d outside best+/-1 has
    # S[d]*(100-ratio) < minS*100
    outside = jnp.abs(di - best[..., None]) > 1
    bad_uniq = jnp.any(
        outside & (S * (100 - uniqueness_ratio) < minS[..., None] * 100),
        axis=-1,
    )

    # parabolic subpixel (only with both neighbors in range)
    has_nb = (best > 0) & (best < D - 1)
    BIGS = jnp.int32(2**30)
    sm = jnp.min(jnp.where(di == best[..., None] - 1, S, BIGS), axis=-1)
    sp = jnp.min(jnp.where(di == best[..., None] + 1, S, BIGS), axis=-1)
    sm = jnp.where(best > 0, sm, minS)
    sp = jnp.where(best < D - 1, sp, minS)
    denom2 = jnp.maximum(sm + sp - 2 * minS, 1)
    num = (sm - sp) * DISP_SCALE + denom2
    sub = jnp.sign(num) * (jnp.abs(num) // (denom2 * 2))
    dval = jnp.where(has_nb, best * DISP_SCALE + sub, best * DISP_SCALE)
    return best, minS, dval, bad_uniq


def _lr_check_sgbm(
    disp: jnp.ndarray, best: jnp.ndarray, minS: jnp.ndarray,
    minX1: int, width1: int, min_disp: int, num_disp: int, max_diff: int,
    use_pallas: bool = False, interpret: bool = False,
) -> jnp.ndarray:
    """Inline SGBM left-right check (golden lines: disp2 from integer bestDisp
    with minS cost; invalidate when BOTH floor and ceil candidates disagree).

    disp: (H, W) int16 x16; best/minS: (H, W1) over the computed x range.
    """
    H, W = disp.shape
    INVALID = (min_disp - 1) * DISP_SCALE
    d16 = disp.astype(jnp.int32)

    ys1 = jax.lax.broadcasted_iota(jnp.int32, (H, width1), 0)
    xs1 = jax.lax.broadcasted_iota(jnp.int32, (H, width1), 1) + minX1
    d_int = best + min_disp
    valid1 = d16[:, minX1 : minX1 + width1] != INVALID
    x2 = xs1 - d_int
    in_rng = valid1 & (x2 >= 0) & (x2 < W)

    # Packed (cost, best) key: within one bin x2 the left x ascends exactly
    # with the integer disparity (x = x2 + d_int), so lexicographic
    # (minS, best) reproduces the sequential strict-lower-cost, leftmost-
    # first update order AND carries the winner's disparity in the key.
    # minS < 8 paths * win^2 * 236 < 2^23; Dpow = 256. The winner per right
    # pixel and the read-backs are shift-reduces over the D candidate
    # integer disparities -- no scatter, no gather (ops/bm.py _lr_check) --
    # run as fori_loops over dynamic slices of once-padded planes (the
    # D-unrolled form cost the flagship program minutes of XLA compile).
    Dpow = 256  # best in [0, D), D <= 255 at any supported operating point
    BIGKEY = jnp.iinfo(jnp.int32).max
    SENT = jnp.iinfo(jnp.int32).min

    key1 = jnp.where(in_rng, minS * Dpow + best, BIGKEY)
    # full-width planes (computed range only)
    keyW = jnp.full((H, W), BIGKEY, jnp.int32)
    keyW = jax.lax.dynamic_update_slice(keyW, key1, (0, minX1))
    d_intW = jnp.full((H, W), SENT, jnp.int32)
    d_intW = jax.lax.dynamic_update_slice(d_intW, d_int, (0, minX1))

    xsW = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ok_range = (xsW >= minX1) & (xsW < minX1 + width1)
    d1 = d16
    validW = ok_range & (d1 != INVALID)
    _d = d1 >> DISP_SHIFT
    d_ = (d1 + DISP_SCALE - 1) >> DISP_SHIFT
    _x = xsW - _d
    x_ = xsW - d_
    oka = (_x >= 0) & (_x < W)
    okb = (x_ >= 0) & (x_ < W)

    import os

    if (
        use_pallas and min_disp == 0 and W % 128 == 0 and H % 8 == 0
        and not _env_flag("RTDM_NO_PALLAS_LR")
    ):
        # both shift-reduces as one in-VMEM Pallas kernel (bit-exact;
        # ops/pallas/lr_resolve.py)
        from rt_depth_map_tpu.ops.pallas.lr_resolve import lr_resolve_pallas

        d2a, d2b = lr_resolve_pallas(
            d_intW, keyW, (_d, d_), n_w=num_disp, r_lo=min_disp - 1,
            n_r=num_disp + 2, Dpow=Dpow, c0=min_disp, invalid=INVALID,
            interpret=interpret,
        )
        d2a = jnp.where(oka, d2a, INVALID)
        d2b = jnp.where(okb, d2b, INVALID)
        bad = (
            validW
            & oka & (d2a >= min_disp) & (jnp.abs(d2a - _d) > max_diff)
            & okb & (d2b >= min_disp) & (jnp.abs(d2b - d_) > max_diff)
        )
        return jnp.where(bad, jnp.asarray(INVALID, disp.dtype), disp)

    M = num_disp + abs(min_disp) + 2
    d_intW_pad = jnp.pad(d_intW, ((0, 0), (M, M)), constant_values=SENT)
    keyW_pad = jnp.pad(keyW, ((0, 0), (M, M)), constant_values=BIGKEY)

    def win_body(i, acc):
        dd = min_disp + i
        ds = jax.lax.dynamic_slice(d_intW_pad, (0, M + dd), (H, W))
        ks = jax.lax.dynamic_slice(keyW_pad, (0, M + dd), (H, W))
        return jnp.minimum(acc, jnp.where(ds == dd, ks, BIGKEY))

    best_key = jax.lax.fori_loop(
        0, num_disp, win_body, jnp.full((H, W), BIGKEY, jnp.int32)
    )
    has = best_key != BIGKEY
    disp2 = jnp.where(has, best_key % Dpow + min_disp, INVALID)

    # validate every computed-range pixel against both floor & ceil
    # candidates via two more shift-reduces (_d and d_ each span at most
    # [minD-1, minD+D]).
    disp2_pad = jnp.pad(disp2, ((0, 0), (M, M)), constant_values=INVALID)

    def rb_body(i, acc):
        dd = min_disp - 1 + i
        sh = jax.lax.dynamic_slice(disp2_pad, (0, M - dd), (H, W))
        a, b = acc
        return jnp.where(_d == dd, sh, a), jnp.where(d_ == dd, sh, b)

    d2a, d2b = jax.lax.fori_loop(
        0, num_disp + 2, rb_body,
        (jnp.full((H, W), INVALID, jnp.int32),
         jnp.full((H, W), INVALID, jnp.int32)),
    )
    d2a = jnp.where(oka, d2a, INVALID)
    d2b = jnp.where(okb, d2b, INVALID)
    bad = (
        validW
        & oka & (d2a >= min_disp) & (jnp.abs(d2a - _d) > max_diff)
        & okb & (d2b >= min_disp) & (jnp.abs(d2b - d_) > max_diff)
    )
    return jnp.where(bad, jnp.asarray(INVALID, disp.dtype), disp)


def stereo_sgbm(
    left: jnp.ndarray,
    right: jnp.ndarray,
    cfg: MatcherConfig,
) -> jnp.ndarray:
    """int16 x16 disparity map, cv::StereoSGBM parity (golden bit-exact).

    left/right: (H, W) uint8 rectified grayscale.
    """
    H, W = left.shape
    D = cfg.num_disparities
    minD = cfg.min_disparity
    INVALID = (minD - 1) * DISP_SCALE
    p1 = cfg.p1
    p2 = max(cfg.p2, p1 + 1)

    use_pallas = (
        _use_pallas(cfg, H, W - D if minD == 0 else 0, D)
        and minD == 0
        and (W - D) % 128 == 0
        and H % 8 == 0
        and H >= 16
        and D % 8 == 0
    )
    # Pad-to-kernel-grid: shapes that miss the fused-kernel alignment
    # (the reference's width-scaled D=192 at 1280 gives W1=1088 % 128 !=
    # 0, and the calibration ROI 934x404 misses both gates) silently rode
    # the ~8x slower XLA formulation. Edge-replicating the right/bottom
    # borders up to the kernel grid and cropping back keeps every
    # interior pixel's cost window identical; only pixels whose SGM
    # sweeps graze the replicated border can deviate from the unpadded
    # result (tools/accuracy_report.py --device measures this path vs cv2
    # at the width-scaled D=192 cells; docs/ACCURACY.md records the
    # numbers: every judged cell PASSes with worst 0.774%, indistinguishable
    # from the strict rounds). RTDM_NO_PAD_FIT=1 restores strict shapes.
    wants_pallas = (
        minD == 0 and D % 8 == 0 and W - D >= 128
        and (cfg.backend == "pallas"
             or (cfg.backend == "auto" and jax.default_backend() != "cpu"))
        and not _env_flag("RTDM_NO_PAD_FIT")
    )
    # Pad-fit also fires when the Pallas gates pass but H % 16 != 0 keeps
    # the 8-path run off the FUSED BIDIRECTIONAL kernels (half the
    # sequential steps): 1080-class heights (1080 % 16 == 8) otherwise
    # ride the chained single-direction passes. The 8 edge-replicated
    # bottom rows are the same divergence class the width pad-fit
    # already accepts (only sweeps grazing the replicated border can
    # deviate; docs/ACCURACY.md measures the padded cells in-budget).
    # Gated to D <= 128: at the stretch point (D=256, W1=1664) the bidir
    # kernels measured SLOWER than the chained passes (89.6 vs 101.4 ms,
    # HARVEST_R5 tools/probe_stretch.py) -- the wider (D, W1) slabs blow
    # the bidir kernels' register/VMEM sweet spot. RTDM_H_PAD_BIDIR=1/0
    # forces either way.
    import os

    hpb_env = os.environ.get("RTDM_H_PAD_BIDIR", "")
    wants_bidir_pad = (
        use_pallas and H % 16 != 0 and cfg.num_paths >= 8
        and not _env_flag("RTDM_NO_BIDIR")
        and (hpb_env == "1" or (hpb_env in ("", "auto") and D <= 128))
    )
    if (not use_pallas or wants_bidir_pad) and wants_pallas:
        Hp2 = max(-(-H // 16) * 16, 16)
        W1p2 = -(-(W - D) // 128) * 128
        Wp2 = W1p2 + D
        if (Hp2, Wp2) != (H, W) and _use_pallas(cfg, Hp2, W1p2, D):
            lp = jnp.pad(left, ((0, Hp2 - H), (0, Wp2 - W)), mode="edge")
            rp = jnp.pad(right, ((0, Hp2 - H), (0, Wp2 - W)), mode="edge")
            return stereo_sgbm(lp, rp, cfg)[:H, :W]
    if use_pallas:
        # Full (H, D, W1)-layout Pallas pipeline (ops/pallas/sgm_hdw.py):
        # the cost kernel's native layout feeds the vertical passes' (D, W1)
        # carries directly, and the final pass fuses WTA as sublane reduces
        # whose results land on lanes -- S is never materialized.
        from rt_depth_map_tpu.ops.pallas.sgm_cost import sgm_cost_volume_pallas
        from rt_depth_map_tpu.ops.pallas.sgm_hdw import (
            sgm_down_pass_hdw,
            sgm_final_wta_hdw,
            sgm_horiz_pass_dh,
        )

        interp = jax.default_backend() == "cpu"
        # int16 end-to-end when every materialized volume provably fits:
        # pix <= 2*ftzero + 255>>2, C <= bs^2 * pix, and the largest
        # materialized partial is 5 directions (each L_r <= C). Halves all
        # streaming DMA at the reference operating point (bs=5). Arithmetic
        # stays int32 in-registers either way.
        ftzero = max(cfg.pre_filter_cap, 15) | 1
        pix_max = 2 * ftzero + (255 >> 2)
        vol_dtype = (
            jnp.int16
            if 5 * cfg.block_size * cfg.block_size * pix_max <= 32767
            else jnp.int32
        )
        # Fused bidirectional launches (ops/pallas/sgm_bidir.py) halve the
        # sequential step count of the 8-path aggregation: the recurrences
        # are dependency-stall-bound, so interleaving the two opposite
        # sweeps' chains in one kernel hides the stall. Bit-identical to
        # the chained single-direction fallback below.
        use_bidir = (
            cfg.num_paths >= 8 and (W - D) % 8 == 0 and H % 16 == 0
            and not _env_flag("RTDM_NO_BIDIR")
        )
        # When the fused bidirectional path will run, the cost kernel emits
        # the 128-padded-H space that path lives in directly (out_h): skips
        # an XLA pad copy of the full volume (~0.5ms at 720p). Rows >= H
        # are undefined but never influence real rows (no lane mixing in
        # the horizontal recurrence; vertical+WTA reads rows < H only).
        Hp = -(-H // 128) * 128
        C_hdw, minX1, width1 = sgm_cost_volume_pallas(
            left, right, D, cfg.block_size, cfg.pre_filter_cap,
            layout="hdw", dtype=vol_dtype, interpret=interp,
            out_h=Hp if use_bidir else None,
        )
        # horizontal passes: single-launch Pallas scans over x with the
        # carry resident in VMEM (lax.scan paid ~15ms/frame of per-step
        # dispatch at 720p). The (W1, D, H) x-major layout keeps D on
        # SUBLANES so the per-step min-reduce/shift over D runs at the same
        # VPU rate as the vertical passes (see _horiz_dh_kernel).
        if use_bidir:
            from rt_depth_map_tpu.ops.pallas.sgm_bidir import (
                sgm_horiz_bidir_dh,
                sgm_vert_bidir_wta_hdw,
            )
            from rt_depth_map_tpu.ops.pallas.vol_transpose import (
                vol_transpose,
            )

            # The vertical stage wants W1 % 128; when the operating point
            # misses it (e.g. the reference default D=192 at W=1280 ->
            # W1=1088) pad with ZERO-cost columns. Exact: zero-cost
            # columns converge to a d-uniform carry in one step, and the
            # SGM step is shift-invariant in its carry, so a sweep
            # re-entering real columns sees exactly the fresh-start fill;
            # padded-column outputs are cropped below.
            W1p = -(-width1 // 128) * 128
            C_run = C_hdw
            if W1p != width1:
                C_run = jnp.pad(C_hdw, ((0, 0), (0, 0), (0, W1p - width1)))
            # The horizontal stage lives in 128-padded H space (its DMA
            # slabs put H on lanes); the cost kernel emitted C_hdw with Hp
            # rows already (out_h above), and the vertical stage reads
            # only the first H rows of the padded C and Sh.
            Ct_p = vol_transpose(C_run, interpret=interp)  # (W1p, D, Hp)
            Sh_t = sgm_horiz_bidir_dh(Ct_p, p1, p2, interpret=interp)
            Sh = vol_transpose(Sh_t, interpret=interp)  # (Hp, D, W1p)
            best, minS, dval, uniq = sgm_vert_bidir_wta_hdw(
                C_run, Sh, p1, p2, cfg.uniqueness_ratio, interpret=interp,
                true_h=H,
            )
            if W1p != width1:
                best = best[:, :width1]
                minS = minS[:, :width1]
                dval = dval[:, :width1]
                uniq = uniq[:, :width1]
        elif cfg.num_paths >= 8:
            Ct = jnp.transpose(C_hdw, (2, 1, 0))  # (W1, D, H)
            hf = sgm_horiz_pass_dh(Ct, p1, p2, reverse=False,
                                   interpret=interp)
            Sh_t = sgm_horiz_pass_dh(Ct, p1, p2, reverse=True,
                                     partial=hf, interpret=interp)
            Sh = jnp.transpose(Sh_t, (2, 1, 0))  # (H, D, W1)
            Sa = sgm_down_pass_hdw(C_hdw, p1, p2, partial=Sh,
                                   interpret=interp)
            best, minS, dval, uniq = sgm_final_wta_hdw(
                C_hdw, Sa, p1, p2, cfg.uniqueness_ratio, reverse=True,
                interpret=interp,
            )
        else:
            Ct = jnp.transpose(C_hdw, (2, 1, 0))  # (W1, D, H)
            hf = sgm_horiz_pass_dh(Ct, p1, p2, reverse=False,
                                   interpret=interp)
            if cfg.num_paths == 5:
                # cv2 MODE_SGBM parity: + the reverse horizontal (5 dirs)
                Sh_t = sgm_horiz_pass_dh(Ct, p1, p2, reverse=True,
                                         partial=hf, interpret=interp)
            else:
                Sh_t = hf
            Sh = jnp.transpose(Sh_t, (2, 1, 0))  # (H, D, W1)
            best, minS, dval, uniq = sgm_final_wta_hdw(
                C_hdw, Sh, p1, p2, cfg.uniqueness_ratio, reverse=False,
                interpret=interp,
            )
        bad_uniq = uniq > 0
        dval = dval + minD * DISP_SCALE
    else:
        C, minX1, width1 = sgbm_cost_volume(
            left, right, D, cfg.block_size, minD, cfg.pre_filter_cap
        )
        S = aggregate_cost(
            C, p1, p2,
            8 if cfg.num_paths >= 8 else (5 if cfg.num_paths == 5 else 4))
        best, minS, dval, bad_uniq = wta_uniq_subpix(S, cfg.uniqueness_ratio)
        dval = dval + minD * DISP_SCALE

    disp1 = jnp.where(bad_uniq, INVALID, dval).astype(jnp.int16)
    disp = jnp.full((H, W), INVALID, dtype=jnp.int16)
    disp = jax.lax.dynamic_update_slice(disp, disp1, (0, minX1))

    if cfg.disp12_max_diff >= 0:
        disp = _lr_check_sgbm(
            disp, best, minS, minX1, width1, minD, D, cfg.disp12_max_diff,
            use_pallas=use_pallas,
            interpret=jax.default_backend() == "cpu",
        )
    if cfg.speckle_window_size > 0 and cfg.speckle_range >= 0:
        disp = filter_speckles(
            disp, INVALID, cfg.speckle_window_size, cfg.speckle_range * DISP_SCALE
        )
    return disp


def stereo_sgbm_batch(
    lefts: jnp.ndarray,
    rights: jnp.ndarray,
    cfg: MatcherConfig,
) -> jnp.ndarray:
    """(B, H, W) uint8 pairs -> (B, H, W) int16 disparities, each frame
    bit-identical to stereo_sgbm.

    On the fused Pallas path EVERY recurrence stage runs as ONE launch
    over all B frames (the multi-stream point of BASELINE.md), stacked
    along whichever axis its serial recurrence does NOT traverse so the
    per-step dependency stall amortizes over B frames:

      * cost volume: one launch, grid = B x stripes, emitting the
        lane-stacked (Hp, D, B*W1) volume directly (no stack copy);
      * horizontal bidir: frames stacked along the lane (H) axis of the
        x-major volume -- the x recurrence never mixes lanes, stacking is
        exact (one free 4-D view + XLA transpose on each side);
      * vertical bidir + WTA: frames stacked along the lane (W1) axis
        with per-frame border masking of the diagonal carry shifts
        (seg=W1, bit-exact: each frame's shifted-in column is the zero
        image border OpenCV starts from);
      * LR check: frames stacked along rows (the shift-reduces are
        row-local), one Pallas launch at H -> B*H.

    Only the speckle filter (whole-image connected components: its
    propagation field would not fit VMEM stacked) remains per-frame."""
    B, H, W = lefts.shape
    D = cfg.num_disparities
    minD = cfg.min_disparity
    W1 = W - D
    fused = (
        _use_pallas(cfg, H, W1 if minD == 0 else 0, D)
        and minD == 0
        and W1 % 128 == 0
        and H % 16 == 0
        and cfg.num_paths >= 8
        and not _env_flag("RTDM_NO_BIDIR")
        and not _env_flag("RTDM_NO_BATCH_STACK")
    )
    if not fused:
        # python-unrolled, not lax.map: the per-frame matcher contains
        # Pallas calls and XLA's fusion pass CHECK-crashes on custom calls
        # inside scan bodies at 720p shapes (see the fused path below)
        return jnp.stack(
            [stereo_sgbm(lefts[i], rights[i], cfg) for i in range(B)]
        )

    from rt_depth_map_tpu.ops.pallas.sgm_bidir import (
        sgm_horiz_bidir_dh,
        sgm_vert_bidir_wta_hdw,
    )
    from rt_depth_map_tpu.ops.pallas.sgm_cost import sgm_cost_volume_pallas

    interp = jax.default_backend() == "cpu"
    p1 = cfg.p1
    p2 = max(cfg.p2, p1 + 1)
    INVALID = (minD - 1) * DISP_SCALE
    ftzero = max(cfg.pre_filter_cap, 15) | 1
    pix_max = 2 * ftzero + (255 >> 2)
    vol_dtype = (
        jnp.int16
        if 5 * cfg.block_size * cfg.block_size * pix_max <= 32767
        else jnp.int32
    )

    Hp = -(-H // 128) * 128
    # ONE batched cost launch -> lane-stacked (Hp, D, B*W1); rows >= H
    # undefined, never read back
    C, minX1, _ = sgm_cost_volume_pallas(
        lefts, rights, D, cfg.block_size, cfg.pre_filter_cap,
        layout="hdw", dtype=vol_dtype, interpret=interp, out_h=Hp,
    )

    # x-major view for the horizontal stage: frames stacked along the lane
    # (H) axis. The 4-D views on both sides of the XLA transpose are free
    # (they split/merge contiguous minor dims).
    Ct = jnp.transpose(
        C.reshape(Hp, D, B, W1), (3, 1, 2, 0)
    ).reshape(W1, D, B * Hp)
    Sh_t = sgm_horiz_bidir_dh(Ct, p1, p2, interpret=interp)
    Sh = jnp.transpose(
        Sh_t.reshape(W1, D, B, Hp), (3, 1, 2, 0)
    ).reshape(Hp, D, B * W1)

    # ONE lane-stacked vertical + WTA launch (seg masks the per-frame
    # borders of the diagonal carry shifts); outputs (H, B*W1) int32
    best, minS, dval, uniq = sgm_vert_bidir_wta_hdw(
        C, Sh, p1, p2, cfg.uniqueness_ratio, interpret=interp,
        true_h=H, seg=W1,
    )

    def unstack(a):  # (H, B*W1) -> (B, H, W1)
        return jnp.transpose(a.reshape(H, B, W1), (1, 0, 2))

    best, minS, dval, uniq = (unstack(a) for a in (best, minS, dval, uniq))
    dval = dval + minD * DISP_SCALE
    disp1 = jnp.where(uniq > 0, INVALID, dval).astype(jnp.int16)
    disp = jnp.full((B, H, W), INVALID, dtype=jnp.int16)
    disp = jax.lax.dynamic_update_slice(disp, disp1, (0, 0, minX1))

    if cfg.disp12_max_diff >= 0:
        # the LR shift-reduces are row-local: one launch over row-stacked
        # (B*H, W) planes is bit-identical to B per-frame launches
        disp = _lr_check_sgbm(
            disp.reshape(B * H, W), best.reshape(B * H, W1),
            minS.reshape(B * H, W1), minX1, W1, minD, D,
            cfg.disp12_max_diff, use_pallas=True, interpret=interp,
        ).reshape(B, H, W)
    if cfg.speckle_window_size > 0 and cfg.speckle_range >= 0:
        disp = jnp.stack([
            filter_speckles(
                disp[i], INVALID, cfg.speckle_window_size,
                cfg.speckle_range * DISP_SCALE,
            )
            for i in range(B)
        ])
    return disp
