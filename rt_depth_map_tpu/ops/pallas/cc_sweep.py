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
traffic is one read + one write of the field total.

Mosaic notes (see memory: mosaic-pallas-pitfalls): i1 vectors cannot be
shifted/reduced (bitcast_vreg i1->i32 fails to legalize), so every mask
here is an int32 0/1 plane and OR is `maximum`. Inactive pixels need no
explicit select: all edges into them are absent, so each forms its own
one-pixel segment and keeps its value through every scan.

Semantics: min-propagate `field` along allowed 4-neighbor edges to the
fixed point (each pixel ends with the minimum field value of its connected
component). Identical contract to iterating ops/cc.py's `sweep` to
convergence -- the fixed point is unique, so the sweep schedule does not
matter. Used by connected_components_scan (field = linear index) and
component_sizes' root-value read-back (field = root-held sizes).

Reference behavior: cv::filterSpeckles connected regions
(/root/reference uses cv2's matcher post-filters; SURVEY.md section 2.9a).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 2**30


def _shift(a, d, fill, axis):
    """Shift toward higher indices along `axis` by d (d may be negative),
    filling vacated positions with `fill`. Implemented as a circular
    pltpu.roll + iota boundary mask: misaligned jnp.concatenate shifts
    force a Mosaic relayout per step (~400us/plane measured at 720p),
    rolls are native."""
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


def _seg_min_axis(m, start, axis, reverse):
    """Segmented prefix-min (Hillis-Steele doubling) along `axis`; segments
    begin where `start` (int32 0/1) is 1 (in scan direction)."""
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


def _kernel(field_hbm, ah_hbm, av_hbm, out_hbm,
            fbuf, ahbuf, avbuf, sems, *, H, W, max_rounds):
    copies = [
        pltpu.make_async_copy(src, dst, sems.at[i])
        for i, (src, dst) in enumerate(
            [(field_hbm, fbuf), (ah_hbm, ahbuf), (av_hbm, avbuf)]
        )
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

    def sweep(f):
        rf = _seg_min_axis(f, sh_f, 1, False)
        rb = _seg_min_axis(f, sh_b, 1, True)
        f = jnp.minimum(rf, rb)
        cf = _seg_min_axis(f, sv_f, 0, False)
        cb = _seg_min_axis(f, sv_b, 0, True)
        return jnp.minimum(cf, cb)

    def body(state):
        f, _, r = state
        new = sweep(f)
        n_changed = jnp.sum(jnp.where(new != f, jnp.int32(1), jnp.int32(0)))
        return new, n_changed, r + 1

    def cond(state):
        _, n_changed, r = state
        return (n_changed > 0) & (r < max_rounds)

    f0 = fbuf[...]
    final, _, _ = jax.lax.while_loop(cond, body, (f0, jnp.int32(1),
                                                  jnp.int32(0)))
    out_hbm[...] = final


def seg_min_propagate_pallas(field, active, allowed_h, allowed_v,
                             interpret=False):
    """Min-propagate `field` (int32 (H, W)) along allowed 4-neighbor edges
    of `active` pixels to the fixed point. allowed_h: (H, W-1) edges
    (y,x)~(y,x+1); allowed_v: (H-1, W) edges (y,x)~(y+1,x). Inactive pixels
    keep their input value (they have no edges, so each is its own
    one-pixel segment; `active` is accepted for interface parity with the
    XLA path but not needed on-chip)."""
    del active
    H, W = field.shape
    ah = jnp.pad(allowed_h, ((0, 0), (0, 1))).astype(jnp.int8)
    av = jnp.pad(allowed_v, ((0, 1), (0, 0))).astype(jnp.int8)
    # a sweep propagates across >= one full row/column run; image-spanning
    # snakes need at most H+W direction turns
    max_rounds = H + W
    kernel = functools.partial(_kernel, H=H, W=W, max_rounds=max_rounds)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((H, W), jnp.int32),
            pltpu.VMEM((H, W), jnp.int8),
            pltpu.VMEM((H, W), jnp.int8),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            # int32 start-flag planes + scan temporaries exceed the 16MB
            # default at 720p; v5e has 128MB physical VMEM.
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(field.astype(jnp.int32), ah, av)


def cc_fits_vmem(H, W):
    """True when the in-VMEM propagation kernel's working set fits: the
    field + four int32 start-flag planes + scan temporaries (~8 int32
    planes peak) under the raised 100MB vmem limit."""
    return H * W * 4 * 12 <= 90 * 2**20 and W % 128 == 0 and H % 8 == 0
