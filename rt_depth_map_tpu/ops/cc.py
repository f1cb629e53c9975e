"""Connected components by segmented-scan label propagation (gather-free).

TPU gathers/scatters are the slowest primitive in the whole pipeline; the
classic hook+pointer-jumping CC (flat[flat] per round) costs seconds at 720p.
This formulation never gathers: per round,

  1. neighbor hop: min over the 4- or 8-neighborhood along allowed edges
     (pure shifts + selects on the VPU);
  2. row sweep: segmented min-scan along x (forward + backward), segments
     delimited by missing horizontal edges -- one `associative_scan`
     (log2 W steps of elementwise ops);
  3. column sweep: same along y.

Each round propagates labels across an entire row/column run at once, so
convergence takes O(boundary turns) rounds (2-3 for blob-like components, a
`while_loop` guarantees the fixed point in general) instead of O(diameter)
hops. Labels converge to the component's minimum linear index -- the same
labeling contract as hook-and-jump, so sizes/bboxes downstream are unchanged.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_BIG = 2**30  # python int, not jnp scalar: module-scope device constants get lifted
# as executable parameters and the jit fast path drops them on re-dispatch


def _use_pallas_cc(H, W, n_fields=1):
    """Gate for the in-VMEM propagation kernel (ops/pallas/cc_sweep.py).

    RTDM_NO_PALLAS_CC=1 is the kill-switch (consumed at trace time): a
    Mosaic regression in the CC kernel must be disarmable without a code
    change -- round 2's flagship bench died for want of exactly this
    (VERDICT.md round 2, item 1)."""
    if os.environ.get("RTDM_NO_PALLAS_CC") == "1":
        return False
    from rt_depth_map_tpu.ops.pallas.cc_sweep import cc_fits_vmem

    return jax.default_backend() not in ("cpu",) and cc_fits_vmem(H, W, n_fields)


def cc_round_cap() -> int | None:
    """Production propagation-round cap (RTDM_CC_MAX_ROUNDS; 0 disables).

    Real-scene masks/disparities converge in 2-4 sweeps; the cap only
    binds on adversarial inputs (dense random noise from a degraded
    sensor), whose unbounded convergence cost 819 ms/frame in round 4
    (HARVEST_R4.txt:21-23). The default 16 is ~4x the worst converged
    round count ever observed on real scenes, and bounds the speckle/CC
    stages' worst case at ~6x their nominal time instead of ~300x."""
    try:
        v = int(os.environ.get("RTDM_CC_MAX_ROUNDS", "16"))
    except ValueError:
        v = 16
    return None if v <= 0 else v


def _shift_along(a: jnp.ndarray, n: int, axis: int, fill) -> jnp.ndarray:
    """Shift forward by n along axis (positive n moves content toward higher
    indices), filling with `fill`."""
    pad = [(0, 0), (0, 0)]
    if n > 0:
        pad[axis] = (n, 0)
        sl = [slice(None), slice(None)]
        sl[axis] = slice(0, a.shape[axis])
        return jnp.pad(a, pad, constant_values=fill)[tuple(sl)]
    pad[axis] = (0, -n)
    sl = [slice(None), slice(None)]
    sl[axis] = slice(-n, a.shape[axis] - n)
    return jnp.pad(a, pad, constant_values=fill)[tuple(sl)]


def _seg_min_dir(labels, start, axis: int, reverse: bool) -> jnp.ndarray:
    """Segmented prefix-min via Hillis-Steele doubling (log2 N rounds of
    shifts -- no associative_scan, whose compiled executables currently trip
    a buffer-count cache bug on the CPU backend)."""
    N = labels.shape[axis]
    m, s = labels, start
    d = 1
    sgn = -1 if reverse else 1
    while d < N:
        mm = _shift_along(m, sgn * d, axis, _BIG)
        ss = _shift_along(s, sgn * d, axis, True)
        m = jnp.where(s, m, jnp.minimum(m, mm))
        s = s | ss
        d *= 2
    return m


def _seg_min_scan(labels: jnp.ndarray, allowed: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Min label within each allowed-edge run along `axis` (both directions).

    labels: (H, W) int32. allowed: edge mask along `axis` with one fewer
    element on that axis (True = neighbors connected).
    """
    pad = [(0, 0), (0, 0)]
    pad[axis] = (1, 0)
    start_f = jnp.pad(~allowed, pad, constant_values=True)
    fwd = _seg_min_dir(labels, start_f, axis, reverse=False)

    pad[axis] = (0, 1)
    start_b = jnp.pad(~allowed, pad, constant_values=True)
    bwd = _seg_min_dir(labels, start_b, axis, reverse=True)
    return jnp.minimum(fwd, bwd)


def _shift2(a: jnp.ndarray, dy: int, dx: int, fill) -> jnp.ndarray:
    H, W = a.shape
    out = a
    if dy > 0:
        out = jnp.concatenate([jnp.full((dy, W), fill, a.dtype), out[:-dy]], 0)
    elif dy < 0:
        out = jnp.concatenate([out[-dy:], jnp.full((-dy, W), fill, a.dtype)], 0)
    if dx > 0:
        out = jnp.concatenate([jnp.full((H, dx), fill, a.dtype), out[:, :-dx]], 1)
    elif dx < 0:
        out = jnp.concatenate([out[:, -dx:], jnp.full((H, -dx), fill, a.dtype)], 1)
    return out


def connected_components_scan(
    values: jnp.ndarray,
    active: jnp.ndarray,
    max_diff,
    connectivity: int = 4,
    max_rounds: int | None = None,
) -> jnp.ndarray:
    """Labels (min linear index per component) of `active` pixels whose
    edge-adjacent values differ by <= max_diff; inactive pixels keep a unique
    self-label. connectivity: 4 (speckle/cv2.filterSpeckles) or 8
    (cv2.findContours blobs).

    max_rounds: optional cap on propagation sweeps (worst-case runtime
    bound; convergence needs one sweep per direction turn of the longest
    component "snake", so real scenes converge in 2-4 while adversarial
    noise can need O(H+W) -- the 819ms random-noise artifact of round 4).
    Under the cap, labels may stop short of the fixed point: every label
    group is then a connected SUBSET of its true component (propagation
    never crosses component edges), which downstream consumers must treat
    conservatively (see filter_speckles' decision argument)."""
    H, W = values.shape
    v = values.astype(jnp.int32)
    md = jnp.asarray(max_diff, jnp.int32)
    idx = (
        jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W
        + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    )

    allowed_h = active[:, :-1] & active[:, 1:] & (jnp.abs(v[:, :-1] - v[:, 1:]) <= md)
    allowed_v = active[:-1, :] & active[1:, :] & (jnp.abs(v[:-1, :] - v[1:, :]) <= md)
    diag = []
    if connectivity == 8:
        # edge (y, x) ~ (y+1, x+1) and (y, x+1) ~ (y+1, x)
        a_se = (
            active[:-1, :-1] & active[1:, 1:]
            & (jnp.abs(v[:-1, :-1] - v[1:, 1:]) <= md)
        )
        a_sw = (
            active[:-1, 1:] & active[1:, :-1]
            & (jnp.abs(v[:-1, 1:] - v[1:, :-1]) <= md)
        )
        diag = [a_se, a_sw]

    def hop(labels):
        """One shift-based neighborhood min (handles diagonal links)."""
        lab = jnp.where(active, labels, _BIG)
        out = lab
        l = jnp.where(allowed_h, lab[:, :-1], _BIG)
        out = jnp.concatenate([out[:, :1], jnp.minimum(out[:, 1:], l)], axis=1)
        r = jnp.where(allowed_h, lab[:, 1:], _BIG)
        out = jnp.concatenate([jnp.minimum(out[:, :-1], r), out[:, -1:]], axis=1)
        u = jnp.where(allowed_v, lab[:-1], _BIG)
        out = jnp.concatenate([out[:1], jnp.minimum(out[1:], u)], axis=0)
        d = jnp.where(allowed_v, lab[1:], _BIG)
        out = jnp.concatenate([jnp.minimum(out[:-1], d), out[-1:]], axis=0)
        if connectivity == 8:
            a_se, a_sw = diag
            se = jnp.where(a_se, lab[:-1, :-1], _BIG)  # -> (y+1, x+1)
            out = out.at[1:, 1:].min(se)
            nw = jnp.where(a_se, lab[1:, 1:], _BIG)  # -> (y, x)
            out = out.at[:-1, :-1].min(nw)
            sw = jnp.where(a_sw, lab[:-1, 1:], _BIG)  # -> (y+1, x)
            out = out.at[1:, :-1].min(sw)
            ne = jnp.where(a_sw, lab[1:, :-1], _BIG)  # -> (y, x+1)
            out = out.at[:-1, 1:].min(ne)
        return jnp.where(active, out, labels)

    def sweep(labels):
        new = labels
        if connectivity == 8:
            # the row/col scans only follow axis-aligned edges; one shift
            # hop per sweep carries labels across diagonal links
            new = hop(new)
        new = jnp.where(active, _seg_min_scan(new, allowed_h, axis=1), new)
        new = jnp.where(active, _seg_min_scan(new, allowed_v, axis=0), new)
        return new

    from rt_depth_map_tpu.ops.pallas.cc_sweep import seg_min_propagate_pallas

    if _use_pallas_cc(H, W):
        # all convergence rounds on-chip: one HBM read + write of the
        # field vs ~630MB/round of materialized sweep planes in XLA
        d_se, d_sw = diag if connectivity == 8 else (None, None)
        return seg_min_propagate_pallas(idx, active, allowed_h, allowed_v,
                                        d_se, d_sw, max_rounds=max_rounds)

    def body(state):
        labels, _, r = state
        # two sweeps per trip halve the while-loop round count
        new = sweep(sweep(labels))
        return new, jnp.any(new != labels), r + 2

    cap = jnp.int32(max_rounds if max_rounds is not None else 2**30)
    labels, _, _ = jax.lax.while_loop(
        lambda s: s[1] & (s[2] < cap), body, (idx, jnp.bool_(True),
                                              jnp.int32(0)))
    return labels


def connected_components_bbox(
    active: jnp.ndarray, connectivity: int = 8,
    max_rounds: int | None = None,
):
    """(labels, minx, maxx) per pixel for components of `active`.

    Bounding-box extremes are idempotent min/max aggregates, so they ride
    the same segmented-scan propagation as the labels -- no scatter (the
    4-scatter bbox extraction costs ~25ms at 720p; this converges with the
    labels in the same ~3 sweeps). miny/maxy come free from the label
    structure: labels are min linear indices so labels//W == miny, and the
    co-propagated max linear index //W == maxy (returned as maxidx).

    Returns (labels, maxidx, minx, maxx), each (H, W) int32; inactive pixels
    hold their self values.
    """
    H, W = active.shape
    idx = (
        jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W
        + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    )
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)

    allowed_h = active[:, :-1] & active[:, 1:]
    allowed_v = active[:-1, :] & active[1:, :]
    diag = []
    if connectivity == 8:
        diag = [active[:-1, :-1] & active[1:, 1:],
                active[:-1, 1:] & active[1:, :-1]]

    def hop_many(fields):
        """Shift-based neighbor-min over all fields at once (diagonal links
        for 8-connectivity; the row/col scans cover the axis edges)."""
        outs = []
        for f in fields:
            lab = jnp.where(active, f, _BIG)
            out = lab
            l = jnp.where(allowed_h, lab[:, :-1], _BIG)
            out = jnp.concatenate([out[:, :1], jnp.minimum(out[:, 1:], l)], 1)
            r = jnp.where(allowed_h, lab[:, 1:], _BIG)
            out = jnp.concatenate([jnp.minimum(out[:, :-1], r), out[:, -1:]], 1)
            u = jnp.where(allowed_v, lab[:-1], _BIG)
            out = jnp.concatenate([out[:1], jnp.minimum(out[1:], u)], 0)
            d = jnp.where(allowed_v, lab[1:], _BIG)
            out = jnp.concatenate([jnp.minimum(out[:-1], d), out[-1:]], 0)
            if connectivity == 8:
                a_se, a_sw = diag
                se = jnp.where(a_se, lab[:-1, :-1], _BIG)
                out = out.at[1:, 1:].min(se)
                nw = jnp.where(a_se, lab[1:, 1:], _BIG)
                out = out.at[:-1, :-1].min(nw)
                sw = jnp.where(a_sw, lab[:-1, 1:], _BIG)
                out = out.at[1:, :-1].min(sw)
                ne = jnp.where(a_sw, lab[1:, :-1], _BIG)
                out = out.at[:-1, 1:].min(ne)
            outs.append(jnp.where(active, out, f))
        return outs

    def sweep(fields):
        if connectivity == 8:
            fields = hop_many(fields)
        fields = [
            jnp.where(active, _seg_min_scan(f, allowed_h, axis=1), f)
            for f in fields
        ]
        return [
            jnp.where(active, _seg_min_scan(f, allowed_v, axis=0), f)
            for f in fields
        ]

    init = (idx, -idx, xs, -xs)  # label, -maxidx, minx, -maxx

    from rt_depth_map_tpu.ops.pallas.cc_sweep import seg_min_propagate_pallas

    if _use_pallas_cc(H, W, 4):
        # all 4 bbox aggregates ride one in-VMEM propagation (one edge-mask
        # load, one convergence loop per field on-chip)
        d_se, d_sw = diag if connectivity == 8 else (None, None)
        out = seg_min_propagate_pallas(jnp.stack(init), active,
                                       allowed_h, allowed_v, d_se, d_sw,
                                       max_rounds=max_rounds)
        return out[0], -out[1], out[2], -out[3]

    def body(state):
        fields, _, r = state
        new = sweep(sweep(list(fields)))
        changed = False
        for a, b in zip(fields, new):
            changed = jnp.any(a != b) | changed
        return tuple(new), changed, r + 2

    cap = jnp.int32(max_rounds if max_rounds is not None else 2**30)
    (labels, neg_maxidx, minx, neg_maxx), _, _ = jax.lax.while_loop(
        lambda s: s[1] & (s[2] < cap), body, (init, jnp.bool_(True),
                                              jnp.int32(0))
    )
    return labels, -neg_maxidx, minx, -neg_maxx


def component_small(
    labels: jnp.ndarray,
    active: jnp.ndarray,
    values: jnp.ndarray,
    max_diff,
    max_size: int,
    connectivity: int = 4,
    interpret: bool = False,
    force_pallas: bool = False,
    max_rounds: int | None = None,
) -> jnp.ndarray:
    """(H, W) bool: active pixel's component has <= max_size pixels.

    The speckle filter only needs this DECISION, not exact sizes, so the
    fast path uses the banded windowed histogram
    (ops/pallas/histogram.py label_histogram_banded): counts are exact
    for components <= max_size and provably > max_size for larger ones,
    at ~1/6 the matmul work of the full histogram. The root's decision is
    then min-propagated to its members over the same component edges.
    Falls back to exact component_sizes off-TPU / on kill-switch.

    Reference behavior: cv::filterSpeckles' size test (SURVEY.md
    section 2.9a item 4)."""
    H, W = labels.shape
    # force_pallas skips only the backend/vmem-fit heuristic; shape
    # preconditions are enforced by the kernels themselves
    # (label_histogram_banded raises on W % 128 and handles H % 8 != 0
    # via its padded accumulator).
    use_fast = force_pallas or (
        _use_pallas_cc(H, W) and W % 128 == 0
    )
    if not use_fast:
        sizes = component_sizes(labels, active, values=values,
                                max_diff=max_diff,
                                connectivity=connectivity)
        return active & (sizes <= max_size)

    from rt_depth_map_tpu.ops.pallas.cc_sweep import seg_min_propagate_pallas
    from rt_depth_map_tpu.ops.pallas.histogram import label_histogram_banded

    A = label_histogram_banded(labels, active, max_size,
                               interpret=interpret)
    idx = (
        jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W
        + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    )
    is_root = active & (labels == idx)
    # 0 = small at root, 1 = big at root, BIG elsewhere; the root is its
    # component's minimum, so min-propagation hands every member the
    # root's decision
    field = jnp.where(is_root & (A > max_size), 1, jnp.where(is_root, 0, _BIG))

    v = values.astype(jnp.int32)
    md = jnp.asarray(max_diff, jnp.int32)
    allowed_h = active[:, :-1] & active[:, 1:] & (jnp.abs(v[:, :-1] - v[:, 1:]) <= md)
    allowed_v = active[:-1, :] & active[1:, :] & (jnp.abs(v[:-1, :] - v[1:, :]) <= md)
    a_se = a_sw = None
    if connectivity == 8:
        a_se = (active[:-1, :-1] & active[1:, 1:]
                & (jnp.abs(v[:-1, :-1] - v[1:, 1:]) <= md))
        a_sw = (active[:-1, 1:] & active[1:, :-1]
                & (jnp.abs(v[:-1, 1:] - v[1:, :-1]) <= md))
    field = seg_min_propagate_pallas(field, active, allowed_h, allowed_v,
                                     a_se, a_sw, interpret=interpret,
                                     max_rounds=max_rounds)
    return active & (field == 0)


def component_sizes(
    labels: jnp.ndarray,
    active: jnp.ndarray,
    values: jnp.ndarray = None,
    max_diff=None,
    connectivity: int = 4,
) -> jnp.ndarray:
    """(H, W) size of each pixel's component (0 for inactive pixels).

    Per-root totals come from the MXU one-hot histogram kernel on TPU
    (ops/pallas/histogram.py, ~2ms at 720p) or a scatter-add elsewhere
    (update-bound, ~9ms at 720p on TPU: XLA scatter cost scales with
    updates, not bins); the per-pixel read-back is NOT a second gather
    (~8ms) but a 2-3 sweep min-propagation of the root values over the same
    component edges, when `values`/`max_diff` describing those edges are
    provided."""
    H, W = labels.shape
    use_mxu = (
        jax.default_backend() not in ("cpu",) and H * W >= 128 * 128
    )
    if use_mxu:
        from rt_depth_map_tpu.ops.pallas.histogram import (
            label_histogram_pallas,
        )

        sizes2d = label_histogram_pallas(labels, active)
        sizes = sizes2d.reshape(-1)
    else:
        ones = active.astype(jnp.int32).reshape(-1)
        sizes = jnp.zeros(H * W, jnp.int32).at[labels.reshape(-1)].add(ones)
        sizes2d = sizes.reshape(H, W)
    if values is None:
        return jnp.where(active, sizes[labels.reshape(-1)].reshape(H, W), 0)

    # roots read their own bin elementwise (label == own linear index there)
    idx = (
        jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W
        + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    )
    is_root = active & (labels == idx)
    field = jnp.where(is_root, sizes2d, _BIG)

    v = values.astype(jnp.int32)
    md = jnp.asarray(max_diff, jnp.int32)
    allowed_h = active[:, :-1] & active[:, 1:] & (jnp.abs(v[:, :-1] - v[:, 1:]) <= md)
    allowed_v = active[:-1, :] & active[1:, :] & (jnp.abs(v[:-1, :] - v[1:, :]) <= md)
    if connectivity == 8:
        a_se = (active[:-1, :-1] & active[1:, 1:]
                & (jnp.abs(v[:-1, :-1] - v[1:, 1:]) <= md))
        a_sw = (active[:-1, 1:] & active[1:, :-1]
                & (jnp.abs(v[:-1, 1:] - v[1:, :-1]) <= md))

    def _diag_hop(f):
        """Min-propagate across the diagonal edges (the row/col scans only
        follow axis-aligned edges; without this a diagonal-only-connected
        pixel would keep the _BIG sentinel)."""
        lab = jnp.where(active, f, _BIG)
        out = lab
        se = jnp.where(a_se, lab[:-1, :-1], _BIG)
        out = out.at[1:, 1:].min(se)
        nw = jnp.where(a_se, lab[1:, 1:], _BIG)
        out = out.at[:-1, :-1].min(nw)
        sw = jnp.where(a_sw, lab[:-1, 1:], _BIG)
        out = out.at[1:, :-1].min(sw)
        ne = jnp.where(a_sw, lab[1:, :-1], _BIG)
        out = out.at[:-1, 1:].min(ne)
        return jnp.where(active, out, f)

    from rt_depth_map_tpu.ops.pallas.cc_sweep import seg_min_propagate_pallas

    if _use_pallas_cc(H, W):
        field = seg_min_propagate_pallas(
            field, active, allowed_h, allowed_v,
            a_se if connectivity == 8 else None,
            a_sw if connectivity == 8 else None)
        return jnp.where(active, field, 0)

    def body(state):
        f, _ = state
        new = f if connectivity == 4 else _diag_hop(f)
        new = jnp.where(active, _seg_min_scan(new, allowed_h, axis=1), new)
        new = jnp.where(active, _seg_min_scan(new, allowed_v, axis=0), new)
        return new, jnp.any(new != f)

    field, _ = jax.lax.while_loop(lambda s: s[1], body, (field, jnp.bool_(True)))
    return jnp.where(active, field, 0)
