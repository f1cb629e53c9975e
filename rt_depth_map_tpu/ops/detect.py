"""Object detection on the thresholded mask: connected components ->
bounding boxes -> matcher ROI.

Re-creates the reference's findContours(RETR_EXTERNAL) ->
fill_bounding_rects_of_contours -> find_relevant_matching_region chain
(estimator.cpp:47-56, 164-204) as static-shape JAX:

  * cv::findContours traces 8-connected blobs; the bounding rect of an outer
    contour is the bounding box of its connected component, so components are
    labeled directly (8-connected label propagation + pointer jumping, same
    scheme as ops/speckle.py).
  * Boxes whose bbox AREA (w*h, cv::Rect::area -- not pixel count) is below
    minSize are dropped (estimator.cpp:169-171).
  * The reference emits boxes in contour discovery order = raster order of
    each blob's topmost-leftmost pixel; labels are min linear indices, so
    sorting ascending reproduces that order.
  * Output is a fixed (max_objects, 5) int32 [x, y, w, h, valid] array
    (dynamic object count under static shapes, SURVEY.md section 7 hard
    part 7); overflow components beyond max_objects are dropped.
  * The matcher ROI is the union bbox of all valid boxes
    (find_relevant_matching_region, estimator.cpp:176-204).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_BIG = 2**30  # python int, not jnp scalar: module-scope device constants get lifted
# as executable parameters and the jit fast path drops them on re-dispatch


def connected_components8(active: jnp.ndarray) -> jnp.ndarray:
    """int32 labels (min linear index per component) of 8-connected blobs;
    inactive pixels keep a unique self-label. Gather-free segmented-scan
    implementation (ops/cc.py)."""
    from rt_depth_map_tpu.ops.cc import connected_components_scan

    zeros = jnp.zeros(active.shape, jnp.int32)
    return connected_components_scan(zeros, active, 0, connectivity=8)


def detect_objects(
    mask: jnp.ndarray,
    min_size: jnp.ndarray | int,
    max_objects: int,
) -> jnp.ndarray:
    """(max_objects, 5) int32 [x, y, w, h, valid] boxes in raster order.

    mask: (H, W) uint8/bool filtered object mask. min_size: minimum bbox
    area (cv::Rect::area semantics), python int or traced scalar.
    """
    H, W = mask.shape
    active = mask != 0
    labels = connected_components8(active)
    flat_labels = labels.reshape(-1)

    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).reshape(-1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).reshape(-1)
    act = active.reshape(-1)
    n = H * W
    tgt = jnp.where(act, flat_labels, n)

    minx = jnp.full(n + 1, _BIG, jnp.int32).at[tgt].min(jnp.where(act, xs, _BIG))
    maxx = jnp.full(n + 1, -1, jnp.int32).at[tgt].max(jnp.where(act, xs, -1))
    miny = jnp.full(n + 1, _BIG, jnp.int32).at[tgt].min(jnp.where(act, ys, _BIG))
    maxy = jnp.full(n + 1, -1, jnp.int32).at[tgt].max(jnp.where(act, ys, -1))

    # component roots: the pixel whose linear index IS its label
    idx1 = jnp.arange(n, dtype=jnp.int32)
    is_root = act & (flat_labels == idx1)
    bw = maxx[:n] - minx[:n] + 1
    bh = maxy[:n] - miny[:n] + 1
    keep = is_root & (bw * bh >= jnp.asarray(min_size, jnp.int32))

    # first max_objects roots in raster (== label) order: top_k of -index
    score = jnp.where(keep, -idx1, -jnp.int32(2**30))
    neg, root_idx = jax.lax.top_k(score, max_objects)
    valid = neg != -jnp.int32(2**30)
    r = jnp.where(valid, root_idx, 0)
    # top_k returns descending score == ascending index: raster order already
    boxes = jnp.stack(
        [minx[r], miny[r], bw[r], bh[r], valid.astype(jnp.int32)], axis=1
    )
    return jnp.where(valid[:, None], boxes, 0)


def matching_region(boxes: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Union bbox (x, y, w, h) of valid boxes (find_relevant_matching_region,
    estimator.cpp:176-204). With no valid boxes returns (0, 0, 0, 0): the
    reference skips matching entirely in that case (estimator.cpp:48 guards on
    contours.size()), and an empty ROI is the matcher's own no-restriction
    marker, so the engine can gate on boxes[:, 4] without overflow-prone
    sentinel coordinates."""
    v = boxes[:, 4] > 0
    any_v = jnp.any(v)
    LO, HI = jnp.int32(-(10**6)), jnp.int32(10**6)
    minx = jnp.min(jnp.where(v, boxes[:, 0], HI))
    miny = jnp.min(jnp.where(v, boxes[:, 1], HI))
    maxx = jnp.max(jnp.where(v, boxes[:, 0] + boxes[:, 2], LO))
    maxy = jnp.max(jnp.where(v, boxes[:, 1] + boxes[:, 3], LO))
    z = jnp.int32(0)
    return (
        jnp.where(any_v, minx, z),
        jnp.where(any_v, miny, z),
        jnp.where(any_v, maxx - minx, z),
        jnp.where(any_v, maxy - miny, z),
    )
