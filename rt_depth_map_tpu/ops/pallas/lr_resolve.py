"""Left-right consistency resolution as one Pallas TPU kernel.

cv::validateDisparity / the SGBM inline LR check (reference semantics per
ops/bm.py _lr_check and ops/sgbm.py _lr_check_sgbm) both reduce to the same
row-local shift-reduce pair over the candidate integer disparities dd:

  winner:    best_key[x] = min_dd { key[x + dd]  if d_match[x + dd] == dd }
  disp2[x]   = best_key & (Dpow - 1) + c0   (INVALID when no candidate)
  read-back: rb_j[x]    = disp2[x - rm_j[x]]  for each match plane rm_j

The XLA formulation runs the loops as fori_loops over dynamic slices of
once-padded (H, W) planes -- ~2*(D+2) full-plane HBM slices (~4ms at
720p/D=128). Everything is row-local within a +/-D column window, so this
kernel keeps a whole row stripe in VMEM and runs both loops on-chip: one
dynamic lane roll per 8 candidate disparities (static in-block lane
slices), one HBM read of the four input planes and one write of the
read-backs.

Bit-exact vs the XLA loops by construction: min is order-independent, and
each pixel's read-back matches exactly one dd (extra block-padding dd
values are guarded by a scalar compare).

Knob: RTDM_LR_R -- output rows per stripe (default 8; multiple of 8
dividing H), swept by tools/tune_kb.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIGKEY = jnp.iinfo(jnp.int32).max


def _kernel(d_ref, k_ref, *rest, R, W, Wp1, Wp2, P, n_w, r_lo, n_r,
            dmask, c0, invalid):
    n_rb = (len(rest) - 1) // 2  # match planes (outputs mirror them)
    rms = rest[:n_rb]
    outs = rest[n_rb : 2 * n_rb]
    scr = rest[-1]
    i = pl.program_id(0)

    dp = d_ref[...]
    kp = k_ref[...]

    # winner: min over candidates dd of key[x + dd] where d_match matches
    nb1 = (n_w + 7) // 8

    def win_block(b, best):
        # one DYNAMIC roll per candidate: a static-offset slice of a
        # pre-rolled plane carries a lazy offset layout and every binary
        # op mixing it with aligned operands pays a relayout (the
        # sgm_cost.py bt-vs-btns finding); a dynamic amount forces one
        # canonical materialization
        for k in range(8):
            dd = 8 * b + k
            s = (Wp1 - dd) % Wp1
            ds = pltpu.roll(dp, s, axis=1)[:, :W]
            ks = pltpu.roll(kp, s, axis=1)[:, :W]
            hit = (ds == dd) & (dd < n_w)
            best = jnp.minimum(best, jnp.where(hit, ks, _BIGKEY))
        return best

    best = jax.lax.fori_loop(
        0, nb1, win_block, jnp.full((R, W), _BIGKEY, jnp.int32)
    )
    disp2 = jnp.where(best != _BIGKEY, (best & dmask) + c0, invalid)

    # stage disp2 into the P-offset scratch row band: reads at x - dd then
    # become static lane slices of one rolled plane per 8 dd. The pad
    # columns hold INVALID (out-of-range x - dd), written once -- the
    # scratch persists across grid programs and only [P, P+W) is per-stripe.
    @pl.when(i == 0)
    def _():
        scr[...] = jnp.full((R, Wp2), invalid, jnp.int32)

    scr[:, P : P + W] = disp2
    sc = scr[...]

    nb2 = (n_r + 7) // 8
    accs = [jnp.full((R, W), invalid, jnp.int32) for _ in range(n_rb)]

    def rb_block(b, accs):
        for k in range(8):
            dd = r_lo + 8 * b + k
            # dynamic roll per candidate (same relayout rationale as
            # win_block)
            sh = pltpu.roll(sc, (dd - P) % Wp2, axis=1)[:, :W]
            ok = dd < r_lo + n_r
            accs = tuple(
                jnp.where((rm[...] == dd) & ok, sh, acc)
                for rm, acc in zip(rms, accs)
            )
        return accs

    accs = jax.lax.fori_loop(0, nb2, rb_block, tuple(accs))
    for out, acc in zip(outs, accs):
        out[...] = acc


def lr_resolve_pallas(
    d_match: jnp.ndarray,
    key: jnp.ndarray,
    rms: tuple,
    *,
    n_w: int,
    r_lo: int,
    n_r: int,
    Dpow: int,
    c0: int,
    invalid: int,
    interpret: bool = False,
):
    """Read-back planes (one per rm in `rms`, each (H, W) int32).

    d_match/key: (H, W) int32 candidate-disparity and packed-key planes
    (key already BIG at non-candidate pixels). Winner search runs over
    dd in [0, n_w); read-back over dd in [r_lo, r_lo + n_r); pixels whose
    rm value is outside that range keep `invalid`. Dpow must be a power of
    two; disp2 = best_key % Dpow + c0. Requires W % 128 == 0, H % 8 == 0.
    """
    H, W = d_match.shape
    if W % 128 or H % 8:
        raise ValueError(f"(H, W) = ({H}, {W}) must tile (8, 128)")
    if Dpow & (Dpow - 1):
        raise ValueError("Dpow must be a power of two (Mosaic-safe masking)")
    # malformed or incompatible values degrade to the default stripe height
    try:
        R = int(os.environ.get("RTDM_LR_R", "8"))
    except ValueError:
        R = 8
    if R <= 0 or R % 8 or H % R:
        R = 8

    max_dd = max(n_w - 1, r_lo + n_r - 1)
    Wp1 = -(-(W + n_w - 1 + 8) // 128) * 128
    P = -(-max_dd // 128) * 128
    Wp2 = P + W + 128

    SENT = jnp.iinfo(jnp.int32).min
    dpad = jnp.pad(d_match.astype(jnp.int32), ((0, 0), (0, Wp1 - W)),
                   constant_values=SENT)
    kpad = jnp.pad(key.astype(jnp.int32), ((0, 0), (0, Wp1 - W)),
                   constant_values=_BIGKEY)

    kernel = functools.partial(
        _kernel, R=R, W=W, Wp1=Wp1, Wp2=Wp2, P=P, n_w=n_w, r_lo=r_lo,
        n_r=n_r, dmask=Dpow - 1, c0=c0, invalid=invalid,
    )
    out = jax.ShapeDtypeStruct((H, W), jnp.int32)
    outs = pl.pallas_call(
        kernel,
        grid=(H // R,),
        out_shape=(out,) * len(rms),
        in_specs=[pl.BlockSpec((R, Wp1), lambda i: (i, 0))] * 2
        + [pl.BlockSpec((R, W), lambda i: (i, 0))] * len(rms),
        out_specs=tuple(
            pl.BlockSpec((R, W), lambda i: (i, 0)) for _ in rms
        ),
        scratch_shapes=[pltpu.VMEM((R, Wp2), jnp.int32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(dpad, kpad, *[rm.astype(jnp.int32) for rm in rms])
    return outs if isinstance(outs, tuple) else (outs,)
