"""Pallas production kernels vs the XLA reference path (interpret mode).

The TPU deployment runs the Pallas streaming kernels (ops/pallas/*); on CPU
they execute in interpreter mode when backend="pallas" is forced. These tests
pin bit-exactness of the full matcher outputs (BM and SGM, 4 and 8 paths)
against backend="xla" at Pallas-compatible shapes, so a kernel regression
fails in CI instead of only in the manual on-TPU verify step.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rt_depth_map_tpu.config import MatcherConfig
from rt_depth_map_tpu.ops.bm import stereo_bm
from rt_depth_map_tpu.ops.sgbm import stereo_sgbm


def stereo_pair(seed, H, W, shift):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=(H, W + 64), dtype=np.uint8)
    k = np.ones(5) / 5.0
    base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, base)
    base = np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, base)
    base = base.astype(np.uint8)
    return base[:, :W].copy(), base[:, shift : shift + W].copy()


@pytest.mark.parametrize("full_checks", [False, True])
def test_bm_pallas_matches_xla(full_checks):
    left, right = stereo_pair(11, 16, 256, 7)
    kw = dict(
        kind="bm", num_disparities=16, block_size=9, pre_filter_cap=31,
        texture_threshold=10 if full_checks else 0,
        uniqueness_ratio=10 if full_checks else 0,
        speckle_window_size=50 if full_checks else 0,
        speckle_range=32,
        disp12_max_diff=1 if full_checks else -1,
    )
    ref = stereo_bm(jnp.asarray(left), jnp.asarray(right),
                    MatcherConfig(backend="xla", **kw))
    got = stereo_bm(jnp.asarray(left), jnp.asarray(right),
                    MatcherConfig(backend="pallas", **kw))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize(
    "env",
    [
        {"RTDM_BM_R": "16"},
        {"RTDM_BM_VARIANT": "mxuh"},
        {"RTDM_BM_R": "16", "RTDM_BM_VARIANT": "mxuh"},
        {"RTDM_LR_R": "16"},
        {"RTDM_NO_PALLAS_LR": "1"},
        # TUNED.env machine defaults (R must divide H: these cases use the
        # 48-row pair below so 24/48 are actually exercised, not silently
        # degraded to the default stripe)
        {"RTDM_BM_R": "24"},
        {"RTDM_BM_R": "48"},
        {"RTDM_BM_R": "24", "RTDM_BM_VARIANT": "mxuh"},
        {"RTDM_BM_R": "48", "RTDM_BM_VARIANT": "mxuh"},
    ],
)
def test_bm_pallas_knobs_bit_exact(env, monkeypatch):
    # The stripe-height / MXU-window measurement knobs must not change a
    # single output bit (they only restructure the window summation).
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    H = 48 if int(env.get("RTDM_BM_R", "8")) > 16 else 16
    left, right = stereo_pair(11, H, 256, 7)
    kw = dict(
        kind="bm", num_disparities=16, block_size=13, pre_filter_cap=31,
        texture_threshold=10, uniqueness_ratio=10, speckle_window_size=50,
        speckle_range=32, disp12_max_diff=1,
    )
    ref = stereo_bm(jnp.asarray(left), jnp.asarray(right),
                    MatcherConfig(backend="xla", **kw))
    got = stereo_bm(jnp.asarray(left), jnp.asarray(right),
                    MatcherConfig(backend="pallas", **kw))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("paths,H", [(4, 16), (5, 16), (8, 16), (8, 24)])
def test_sgm_pallas_matches_xla(paths, H, monkeypatch):
    # Pallas SGM path wants D % 128 == 0, (W - D) % 128 == 0, H % 8 == 0,
    # H >= 16 -- the smallest such operating point. H=24 (H % 16 != 0)
    # exercises the NON-fused vertical chain (horiz x2 + down + final
    # WTA): since round 5 such heights pad-fit to H % 16 and take the
    # fused bidir kernels, so pin pad-fit off to keep the chained path
    # covered (it remains the RTDM_NO_PAD_FIT / kill-switch path).
    if H % 16:
        monkeypatch.setenv("RTDM_NO_PAD_FIT", "1")
    left, right = stereo_pair(12, H, 256, 9)
    kw = dict(
        kind="sgm", num_disparities=128, block_size=5, pre_filter_cap=63,
        p1=600, p2=2400, num_paths=paths, uniqueness_ratio=10,
        speckle_window_size=50, speckle_range=32, disp12_max_diff=1,
    )
    ref = stereo_sgbm(jnp.asarray(left), jnp.asarray(right),
                      MatcherConfig(backend="xla", **kw))
    got = stereo_sgbm(jnp.asarray(left), jnp.asarray(right),
                      MatcherConfig(backend="pallas", **kw))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_sgm_pallas_h_padfit_bidir_close_to_xla():
    """1080-class heights (H % 16 == 8) pad-fit onto the fused bidir
    kernels with edge-replicated bottom rows (round-5 stretch fix).
    Divergence vs the strict un-padded result is confined to pixels
    whose vertical sweeps graze the replicated border; assert the
    agreement stays far inside the 1% judged budget and the top half
    (which only the converged down-sweep reaches) is bit-exact."""
    left, right = stereo_pair(12, 24, 256, 9)
    kw = dict(
        kind="sgm", num_disparities=128, block_size=5, pre_filter_cap=63,
        p1=600, p2=2400, num_paths=8, uniqueness_ratio=10,
        speckle_window_size=0, speckle_range=32, disp12_max_diff=1,
    )
    ref = stereo_sgbm(jnp.asarray(left), jnp.asarray(right),
                      MatcherConfig(backend="xla", **kw))
    got = stereo_sgbm(jnp.asarray(left), jnp.asarray(right),
                      MatcherConfig(backend="pallas", **kw))
    ref, got = np.asarray(ref), np.asarray(got)
    mismatch = (ref != got).mean()
    assert mismatch < 0.01, mismatch
    np.testing.assert_array_equal(got[:12], ref[:12])


@pytest.mark.parametrize("D,W,H", [
    (48, 176, 16),   # D % 128 != 0, W1 = 128 (the reference-default-D
                     # class: D=192 at 1280 wide scales to this)
    (48, 200, 16),   # W1 = 152 % 128 != 0 -> zero-padded W1 aggregation
    (48, 200, 24),   # same, on the non-fused vertical chain (H % 16 != 0)
])
def test_sgm_pallas_nonmult128_disparities(D, W, H, monkeypatch):
    """Shapes off the kernel grid (the width-scaled reference default
    D=192 at 1280 gives W1 % 128 != 0; the calibration ROI misses H % 8)
    now ride the PAD-FIT pallas path: edge-replicated right/bottom
    borders, computed on the kernel grid, cropped back. Deviations vs
    the strict XLA result are confined to border-grazing sweeps and must
    stay far inside the 1% bad-pixel budget; RTDM_NO_PAD_FIT=1 restores
    the bit-exact strict-shape behavior."""
    left, right = stereo_pair(21, H, W, 9)
    kw = dict(
        kind="sgm", num_disparities=D, block_size=5, pre_filter_cap=63,
        p1=600, p2=2400, num_paths=8, uniqueness_ratio=10,
        speckle_window_size=50, speckle_range=32, disp12_max_diff=1,
    )
    ref = np.asarray(stereo_sgbm(jnp.asarray(left), jnp.asarray(right),
                                 MatcherConfig(backend="xla", **kw)))
    got = np.asarray(stereo_sgbm(jnp.asarray(left), jnp.asarray(right),
                                 MatcherConfig(backend="pallas", **kw)))
    assert got.shape == ref.shape
    both = (got != -16) & (ref != -16)
    bad = (np.abs(got.astype(np.int32) - ref.astype(np.int32)) > 16) & both
    frac = bad.sum() / max(both.sum(), 1)
    assert frac <= 0.01, f"pad-fit divergence {frac:.4f} > 1%"

    monkeypatch.setenv("RTDM_NO_PAD_FIT", "1")
    strict = np.asarray(stereo_sgbm(jnp.asarray(left), jnp.asarray(right),
                                    MatcherConfig(backend="pallas", **kw)))
    np.testing.assert_array_equal(strict, ref)


def test_sgm_pallas_int16_streaming_path():
    # block_size=5 keeps 5 * bs^2 * pix_max <= 32767 -> int16 volume I/O;
    # block_size=11 forces int32. Both must match the XLA reference.
    left, right = stereo_pair(13, 16, 256, 5)
    for bs, H in ((5, 16), (11, 16)):
        kw = dict(
            kind="sgm", num_disparities=128, block_size=bs,
            pre_filter_cap=63, p1=8 * bs * bs, p2=32 * bs * bs, num_paths=8,
            uniqueness_ratio=10, speckle_window_size=0, disp12_max_diff=-1,
        )
        ref = stereo_sgbm(jnp.asarray(left), jnp.asarray(right),
                          MatcherConfig(backend="xla", **kw))
        got = stereo_sgbm(jnp.asarray(left), jnp.asarray(right),
                          MatcherConfig(backend="pallas", **kw))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("reverse", [False, True])
def test_sgm_horiz_dh_matches_hd(reverse):
    # the (D, H)-slab horizontal kernel (sublane-cheap recurrence) must be
    # bit-exact vs the original (H, D)-slab kernel modulo the transpose
    from rt_depth_map_tpu.ops.pallas.sgm_hdw import (
        sgm_horiz_pass_dh,
        sgm_horiz_pass_hdw,
    )

    rng = np.random.default_rng(33)
    W1, H, D = 64, 16, 128
    Ct = jnp.asarray(rng.integers(0, 1500, (W1, H, D)).astype(np.int16))
    hf_ref = sgm_horiz_pass_hdw(Ct, 600, 2400, reverse=False, interpret=True)
    ref = sgm_horiz_pass_hdw(Ct, 600, 2400, reverse=reverse,
                             partial=hf_ref, interpret=True)
    Ct2 = jnp.swapaxes(Ct, 1, 2)  # (W1, D, H)
    hf2 = sgm_horiz_pass_dh(Ct2, 600, 2400, reverse=False, interpret=True)
    got = sgm_horiz_pass_dh(Ct2, 600, 2400, reverse=reverse,
                            partial=hf2, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(jnp.swapaxes(got, 1, 2)), np.asarray(ref)
    )


@pytest.mark.parametrize("dot_dtype", ["int8", "bfloat16"])
def test_label_histogram_matches_scatter(dot_dtype):
    # the MXU one-hot histogram (ops/pallas/histogram.py) must reproduce the
    # scatter-add per-root component counts exactly (f32 accumulation is
    # exact below 2^24; int8 accumulates in int32)
    rng = np.random.default_rng(21)
    H, W = 48, 256
    lab = np.sort(rng.integers(0, H * W, H * W).astype(np.int32)).reshape(
        H, W
    )
    act = rng.random((H, W)) > 0.15
    ref = np.zeros(H * W, np.int64)
    np.add.at(ref, lab.reshape(-1)[act.reshape(-1)], 1)

    from rt_depth_map_tpu.ops.pallas.histogram import label_histogram_pallas

    got = np.asarray(
        label_histogram_pallas(
            jnp.asarray(lab), jnp.asarray(act), interpret=True,
            dot_dtype=jnp.dtype(dot_dtype).type,
        )
    )
    np.testing.assert_array_equal(got.reshape(-1), ref)


def test_seg_min_propagate_matches_xla_cc():
    # the in-VMEM propagation kernel must reach the same fixed point as the
    # XLA segmented-sweep CC: min linear index per 4-connected component
    from rt_depth_map_tpu.ops.cc import connected_components_scan
    from rt_depth_map_tpu.ops.pallas.cc_sweep import seg_min_propagate_pallas

    rng = np.random.default_rng(7)
    H, W = 32, 128
    # blobby disparity field with invalid speckles
    v = (rng.integers(0, 4, (H, W)) * 32).astype(np.int32)
    act = rng.random((H, W)) > 0.25
    vj = jnp.asarray(v)
    actj = jnp.asarray(act)
    ref = connected_components_scan(vj, actj, jnp.int32(16), 4)  # XLA path (cpu)

    idx = (np.arange(H)[:, None] * W + np.arange(W)[None, :]).astype(np.int32)
    ah = act[:, :-1] & act[:, 1:] & (np.abs(v[:, :-1] - v[:, 1:]) <= 16)
    av = act[:-1, :] & act[1:, :] & (np.abs(v[:-1, :] - v[1:, :]) <= 16)
    got = seg_min_propagate_pallas(
        jnp.asarray(idx), actj, jnp.asarray(ah), jnp.asarray(av),
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_seg_min_propagate_8conn_bbox_matches_xla():
    # 4-field (label/-maxidx/minx/-maxx) propagation with diagonal edges
    # must match the XLA connected_components_bbox fixed point
    from rt_depth_map_tpu.ops.cc import connected_components_bbox
    from rt_depth_map_tpu.ops.pallas.cc_sweep import seg_min_propagate_pallas

    rng = np.random.default_rng(3)
    H, W = 24, 128
    act = rng.random((H, W)) > 0.55  # sparse: many diagonal-only links
    actj = jnp.asarray(act)
    ref = connected_components_bbox(actj, 8)  # XLA path (cpu backend)

    idx = (np.arange(H)[:, None] * W + np.arange(W)[None, :]).astype(np.int32)
    xs = np.broadcast_to(np.arange(W, dtype=np.int32), (H, W))
    ah = act[:, :-1] & act[:, 1:]
    av = act[:-1, :] & act[1:, :]
    a_se = act[:-1, :-1] & act[1:, 1:]
    a_sw = act[:-1, 1:] & act[1:, :-1]
    fields = jnp.stack([jnp.asarray(idx), jnp.asarray(-idx),
                        jnp.asarray(xs), jnp.asarray(-xs)])
    got = seg_min_propagate_pallas(
        fields, actj, jnp.asarray(ah), jnp.asarray(av),
        jnp.asarray(a_se), jnp.asarray(a_sw), interpret=True,
    )
    for g, r, s in zip(got, ref, (1, -1, 1, -1)):
        np.testing.assert_array_equal(np.asarray(g) * s, np.asarray(r))


@pytest.mark.parametrize("case", ["warp", "xshift", "identity"])
def test_remap_planned_matches_gather(case):
    # the statically-planned select-network remap must be bit-exact vs the
    # gather formulation (itself +/-1 LSB vs cv::remap)
    from rt_depth_map_tpu.ops.remap import remap_bilinear
    from rt_depth_map_tpu.ops.pallas.remap_plan import (
        plan_remap,
        remap_bilinear_planned,
    )

    rng = np.random.default_rng(0)
    H, W = 64, 256
    img = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    gy, gx = np.mgrid[0:H, 0:W].astype(np.float64)
    if case == "warp":
        mx = gx + 6 * np.sin(gy / 11.0) + 2 * np.cos(gx / 29.0) - 3
        my = gy + 2.5 * np.sin(gx / 23.0) + 3 * np.cos(gy / 7.0) - 2
    elif case == "xshift":
        mx, my = gx + 1.5, gy + 0.0
    else:
        mx, my = gx, gy
    grid = np.stack([mx, my], -1).astype(np.float32)
    plan = plan_remap(grid, (H, W))
    assert plan is not None
    ref = np.asarray(remap_bilinear(jnp.asarray(img), jnp.asarray(grid)))
    got = np.asarray(
        remap_bilinear_planned(jnp.asarray(img), plan, interpret=True)
    )
    np.testing.assert_array_equal(ref, got)


def test_remap_planned_real_calibration_roi():
    # real Bouguet map, awkward ROI crop (non-multiple-of-8/128 output),
    # 4-channel (the engine's packed gray+RGB left stack)
    import os.path

    from rt_depth_map_tpu.calib.rectify import compute_rectification
    from rt_depth_map_tpu.ops.remap import remap_bilinear
    from rt_depth_map_tpu.ops.pallas.remap_plan import (
        plan_remap,
        remap_bilinear_planned,
    )

    cdir = "/root/reference/backup/320x240"
    if not os.path.isdir(cdir):
        pytest.skip("reference calibration data not available")
    W, H = 320, 240
    r = compute_rectification(
        f"{cdir}/intrinsics.yml", f"{cdir}/extrinsics.yml", (W, H)
    )
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (H, W, 4), dtype=np.uint8)
    grid = r.map_left.astype(np.float32)[17:196, 33:290]
    plan = plan_remap(grid, (H, W))
    assert plan is not None
    ref = np.asarray(remap_bilinear(jnp.asarray(img), jnp.asarray(grid)))
    got = np.asarray(
        remap_bilinear_planned(jnp.asarray(img), plan, interpret=True)
    )
    assert got.shape == ref.shape
    np.testing.assert_array_equal(ref, got)


def test_seg_min_propagate_spiral_converges():
    # worst-case component: a spiral corridor needs many direction turns --
    # exercises the while_loop round bound rather than typical 2-3 rounds
    from rt_depth_map_tpu.ops.pallas.cc_sweep import seg_min_propagate_pallas

    H, W = 16, 128
    act = np.zeros((H, W), bool)
    act[0, :] = True
    act[:, -1] = True
    act[-1, :] = True
    act[2:, 0] = True
    act[2, :64] = True  # inward turn
    idx = (np.arange(H)[:, None] * W + np.arange(W)[None, :]).astype(np.int32)
    ah = act[:, :-1] & act[:, 1:]
    av = act[:-1, :] & act[1:, :]
    got = np.asarray(seg_min_propagate_pallas(
        jnp.asarray(idx), jnp.asarray(act), jnp.asarray(ah), jnp.asarray(av),
        interpret=True,
    ))
    assert (got[act] == got[act].min()).all()  # single component, one label


def test_cost_mxuh_variant_bit_exact():
    # the MXU banded-matrix horizontal window (tools/cost_floor.py
    # candidate) must stay bit-exact vs the production rolls variant
    from rt_depth_map_tpu.ops.pallas.sgm_cost import sgm_cost_volume_pallas

    rng = np.random.default_rng(7)
    l = jnp.asarray(rng.integers(0, 256, (64, 576), dtype=np.uint8))
    r = jnp.asarray(rng.integers(0, 256, (64, 576), dtype=np.uint8))
    a, _, _ = sgm_cost_volume_pallas(l, r, 64, 5, 0, layout="hdw",
                                     dtype=jnp.int16, interpret=True)
    b, _, _ = sgm_cost_volume_pallas(l, r, 64, 5, 0, layout="hdw",
                                     dtype=jnp.int16, interpret=True,
                                     _variant="mxuh")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize(
    "seed,D,bs,cap,tex,uniq,sws,d12",
    [
        (21, 8, 5, 15, 0, 0, 0, -1),
        (22, 24, 7, 63, 5, 15, 30, 0),
        (23, 32, 11, 31, 20, 5, 80, 2),
        (24, 48, 15, 40, 10, 10, 100, 1),
        (25, 16, 21, 25, 0, 25, 60, 1),
    ],
)
def test_bm_pallas_cross_config_parity(seed, D, bs, cap, tex, uniq, sws, d12):
    """Randomized operating points across the whole BM config space --
    every (window, disparity-count, cap, check-threshold) combination must
    keep the fused kernel bit-exact vs the XLA path."""
    left, right = stereo_pair(seed, 24, 256, seed % 11)
    kw = dict(
        kind="bm", num_disparities=D, block_size=bs, pre_filter_cap=cap,
        texture_threshold=tex, uniqueness_ratio=uniq,
        speckle_window_size=sws, speckle_range=16, disp12_max_diff=d12,
    )
    ref = stereo_bm(jnp.asarray(left), jnp.asarray(right),
                    MatcherConfig(backend="xla", **kw))
    got = stereo_bm(jnp.asarray(left), jnp.asarray(right),
                    MatcherConfig(backend="pallas", **kw))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_bm_pad_fit_off_grid_shapes(monkeypatch):
    """BM pad-to-kernel-grid (ops/bm.py): shapes off the (H % 8, W % 128)
    grid -- e.g. the calibration ROI -- ride the padded Pallas path. BM
    matching only looks leftward, so right-edge replication cannot win a
    match for real pixels; divergence vs the strict XLA result must stay
    far inside the 1% budget, and RTDM_NO_PAD_FIT=1 restores bit-exact
    strict-shape behavior."""
    from rt_depth_map_tpu.ops.bm import stereo_bm

    H, W = 44, 200  # off both gates
    left, right = stereo_pair(31, H, W, 6)
    kw = dict(kind="bm", num_disparities=32, block_size=9,
              pre_filter_cap=31, texture_threshold=10, uniqueness_ratio=10,
              speckle_window_size=50, speckle_range=32, disp12_max_diff=1)
    ref = np.asarray(stereo_bm(jnp.asarray(left), jnp.asarray(right),
                               MatcherConfig(backend="xla", **kw)))
    got = np.asarray(stereo_bm(jnp.asarray(left), jnp.asarray(right),
                               MatcherConfig(backend="pallas", **kw)))
    assert got.shape == ref.shape
    both = (got != -16) & (ref != -16)
    bad = (np.abs(got.astype(np.int32) - ref.astype(np.int32)) > 16) & both
    frac = bad.sum() / max(both.sum(), 1)
    assert frac <= 0.01, f"BM pad-fit divergence {frac:.4f} > 1%"

    monkeypatch.setenv("RTDM_NO_PAD_FIT", "1")
    strict = np.asarray(stereo_bm(jnp.asarray(left), jnp.asarray(right),
                                  MatcherConfig(backend="pallas", **kw)))
    np.testing.assert_array_equal(strict, ref)
