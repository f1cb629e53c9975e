"""Banded windowed histogram + component_small vs exact sizes.

The banded histogram (ops/pallas/histogram.py label_histogram_banded) only
guarantees (count <= max_size) == (true size <= max_size) per root; these
tests check that decision -- and the exact-count property for small
components -- against brute-force flood-fill sizes, on masks engineered to
exercise the window edge (snakes taller than the window, components of
size exactly max_size / max_size + 1).
"""

import collections

import numpy as np
import jax.numpy as jnp
import pytest

from rt_depth_map_tpu.ops.cc import component_small, connected_components_scan
from rt_depth_map_tpu.ops.pallas.histogram import label_histogram_banded
from rt_depth_map_tpu.ops.speckle import filter_speckles


def brute_sizes(active, values, max_diff, connectivity=4):
    """root linear index -> component size (flood fill)."""
    H, W = active.shape
    seen = np.zeros_like(active, bool)
    out = {}
    if connectivity == 8:
        nbrs = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1),
                (1, -1), (1, 0), (1, 1)]
    else:
        nbrs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    for y in range(H):
        for x in range(W):
            if active[y, x] and not seen[y, x]:
                comp = []
                q = collections.deque([(y, x)])
                seen[y, x] = True
                while q:
                    cy, cx = q.popleft()
                    comp.append((cy, cx))
                    for dy, dx in nbrs:
                        ny, nx = cy + dy, cx + dx
                        if (0 <= ny < H and 0 <= nx < W and active[ny, nx]
                                and not seen[ny, nx]
                                and abs(int(values[ny, nx])
                                        - int(values[cy, cx])) <= max_diff):
                            seen[ny, nx] = True
                            q.append((ny, nx))
                root = min(p[0] * W + p[1] for p in comp)
                out[root] = len(comp)
    return out


def _mask_with_snakes(H, W, seed):
    """Random blobs + a vertical snake taller than typical windows."""
    rng = np.random.default_rng(seed)
    m = (rng.random((H, W)) < 0.25)
    # vertical snake: 1px wide, spans most of the image height
    x = 5
    for y in range(2, H - 2):
        m[y, x] = True
        if y % 7 == 0 and x + 1 < W - 1:
            m[y, x + 1] = True
            x += 1
    return m


@pytest.mark.parametrize("seed,max_size", [(0, 6), (1, 10), (2, 25)])
def test_banded_histogram_decision(seed, max_size):
    H, W = 48, 128  # W must be a lane multiple
    m = _mask_with_snakes(H, W, seed)
    vals = np.zeros((H, W), np.int32)
    sizes = brute_sizes(m, vals, 0, 4)

    labels = connected_components_scan(
        jnp.asarray(vals), jnp.asarray(m), 0, 4)
    A = np.asarray(label_histogram_banded(labels, jnp.asarray(m), max_size,
                                          interpret=True))
    for root, size in sizes.items():
        got = A[root // W, root % W]
        if size <= max_size:
            assert got == size, (root, size, got)  # exact for small comps
        else:
            assert got > max_size, (root, size, got)


@pytest.mark.parametrize("H", [41, 47, 52])
def test_banded_histogram_h_not_multiple_of_8(H):
    """Regression (round-3 advisor, histogram.py apad sizing): when
    H % 8 != 0 the last block's accumulate used to write past the (H+Sr, W)
    scratch, silently corrupting counts; apad is now (Hp+Sr, W)."""
    W, max_size = 128, 10
    m = _mask_with_snakes(H, W, seed=4)
    vals = np.zeros((H, W), np.int32)
    sizes = brute_sizes(m, vals, 0, 4)
    labels = connected_components_scan(
        jnp.asarray(vals), jnp.asarray(m), 0, 4)
    A = np.asarray(label_histogram_banded(labels, jnp.asarray(m), max_size,
                                          interpret=True))
    for root, size in sizes.items():
        got = A[root // W, root % W]
        if size <= max_size:
            assert got == size, (root, size, got)
        else:
            assert got > max_size, (root, size, got)


@pytest.mark.parametrize("connectivity", [4, 8])
def test_component_small_matches_brute(connectivity):
    H, W = 40, 128
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 4, (H, W)).astype(np.int32)
    m = rng.random((H, W)) < 0.55
    max_diff, max_size = 1, 8
    sizes = brute_sizes(m, vals, max_diff, connectivity)

    labels = connected_components_scan(
        jnp.asarray(vals), jnp.asarray(m), max_diff, connectivity)
    small = np.asarray(component_small(
        labels, jnp.asarray(m), jnp.asarray(vals), max_diff, max_size,
        connectivity, interpret=True, force_pallas=True))

    # expand brute decision to members
    lab = np.asarray(labels)
    for y in range(H):
        for x in range(W):
            if m[y, x]:
                want = sizes[lab[y, x]] <= max_size
                assert small[y, x] == want, (y, x)
            else:
                assert not small[y, x]


def test_filter_speckles_pallas_path_bitexact():
    """The TPU fast path (banded histogram decision) must produce the
    same filtered disparity as the exact-sizes path."""
    H, W = 48, 128
    rng = np.random.default_rng(3)
    disp = rng.integers(-16, 400, (H, W)).astype(np.int16)
    disp[rng.random((H, W)) < 0.3] = -16
    ref = np.asarray(filter_speckles(jnp.asarray(disp), -16, 12, 32))

    from rt_depth_map_tpu.ops.cc import component_small as cs
    from rt_depth_map_tpu.ops import speckle as speckle_mod

    labels = connected_components_scan(
        jnp.asarray(disp), jnp.asarray(disp != -16), 32, 4)
    small = cs(labels, jnp.asarray(disp != -16), jnp.asarray(disp), 32, 12,
               4, interpret=True, force_pallas=True)
    got = np.asarray(jnp.where(small, jnp.int16(-16), jnp.asarray(disp)))
    np.testing.assert_array_equal(got, ref)
    assert speckle_mod is not None


def _mask_with_horizontal_snakes(H, W, seed):
    """Wide 1-px-tall snakes crossing 128-lane tile borders (exercises the
    COLUMN window of the 2D-banded kernel) plus random blobs."""
    rng = np.random.default_rng(seed)
    m = rng.random((H, W)) < 0.15
    y = 3
    for x in range(2, W - 2):
        m[y, x] = True
        if x % 9 == 0 and y + 1 < H - 1:
            m[y + 1, x] = True
            y += 1
    return m


@pytest.mark.parametrize("seed,max_size", [(3, 8), (5, 20), (6, 100)])
def test_banded2d_multi_tile_decision(seed, max_size):
    """W = 384 spans 3 column tiles: components wider than a tile and
    components whose root sits in a neighboring tile must still get the
    exact small-size count / provable > max_size decision."""
    H, W = 40, 384
    m = _mask_with_horizontal_snakes(H, W, seed)
    vals = np.zeros((H, W), np.int32)
    sizes = brute_sizes(m, vals, 0, 4)
    labels = connected_components_scan(
        jnp.asarray(vals), jnp.asarray(m), 0, 4)
    A = np.asarray(label_histogram_banded(labels, jnp.asarray(m), max_size,
                                          interpret=True))
    for root, size in sizes.items():
        got = A[root // W, root % W]
        if size <= max_size:
            assert got == size, (root, size, got)
        else:
            assert got > max_size, (root, size, got)


def test_banded2d_matches_row_banded_decision():
    """The 2D-banded and row-banded kernels agree on the decision for
    every root (RTDM_NO_HIST2D toggles the row-banded fallback)."""
    import os

    H, W, max_size = 32, 256, 12
    m = _mask_with_horizontal_snakes(H, W, seed=9)
    vals = np.zeros((H, W), np.int32)
    labels = connected_components_scan(
        jnp.asarray(vals), jnp.asarray(m), 0, 4)
    A2 = np.asarray(label_histogram_banded(labels, jnp.asarray(m), max_size,
                                           interpret=True))
    os.environ["RTDM_NO_HIST2D"] = "1"
    try:
        A1 = np.asarray(label_histogram_banded(labels, jnp.asarray(m),
                                               max_size, interpret=True))
    finally:
        os.environ.pop("RTDM_NO_HIST2D")
    np.testing.assert_array_equal(A2 <= max_size, A1 <= max_size)
