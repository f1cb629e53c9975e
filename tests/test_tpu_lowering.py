"""TPU (Mosaic) lowering guard for every production Pallas kernel.

`jax.export` with platforms=["tpu"] runs the full pallas -> Mosaic MLIR
conversion on a CPU-only host, so a kernel change that breaks TPU dialect
construction (bad layouts, unsupported ops, mis-sized blocks) fails HERE
instead of at the first on-hardware compile. It does NOT cover the Mosaic
back-end compile itself (libtpu-only) -- the harvest / verify runs do.

Shapes are the smallest each kernel accepts; env knobs cover the swept
variants (RTDM_BM_VARIANT=mxuh etc.).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import export


def _export(fn, *args):
    exp = export.export(jax.jit(fn), platforms=["tpu"])(*args)
    assert len(exp.mlir_module_serialized) > 0


def s(shape, dtype):
    return jax.ShapeDtypeStruct(shape, dtype)


@pytest.mark.parametrize("variant", ["full", "mxuh"])
def test_bm_kernel_lowers(variant, monkeypatch):
    monkeypatch.setenv("RTDM_BM_VARIANT", variant)
    monkeypatch.setenv("RTDM_BM_R", "16")
    from rt_depth_map_tpu.ops.pallas.bm_kernel import bm_cost_wta

    img = s((16, 256), jnp.uint8)
    _export(lambda a, b: bm_cost_wta(a, b, 16, 13, pre_filter_cap=31),
            img, img)


def test_lr_resolve_lowers():
    from rt_depth_map_tpu.ops.pallas.lr_resolve import lr_resolve_pallas

    p = s((16, 256), jnp.int32)
    _export(
        lambda dm, k: lr_resolve_pallas(
            dm, k, (dm, dm), n_w=16, r_lo=-1, n_r=18, Dpow=256, c0=0,
            invalid=-16,
        ),
        p, p,
    )


@pytest.mark.parametrize("variant", ["full", "mxuh"])
def test_sgm_cost_lowers(variant):
    from rt_depth_map_tpu.ops.pallas.sgm_cost import sgm_cost_volume_pallas

    img = s((16, 256), jnp.uint8)
    # cap=31 keeps ftzero within the mxuh int8 bound (production flagship
    # uses cap=0 -> ftzero=15)
    _export(
        lambda a, b: sgm_cost_volume_pallas(
            a, b, 128, 5, pre_filter_cap=31, layout="hdw",
            dtype=jnp.int16, _variant=variant,
        )[0],
        img, img,
    )


def test_sgm_bidir_kernels_lower():
    from rt_depth_map_tpu.ops.pallas.sgm_bidir import (
        sgm_horiz_bidir_dh,
        sgm_vert_bidir_wta_hdw,
    )

    Ct = s((128, 128, 128), jnp.int16)  # (W1, D, Hp)
    _export(lambda c: sgm_horiz_bidir_dh(c, 600, 2400), Ct)
    C = s((16, 128, 128), jnp.int16)  # (H, D, W1)
    _export(
        lambda c, sp: sgm_vert_bidir_wta_hdw(c, sp, 600, 2400, 10),
        C, C,
    )


def test_vol_transpose_lowers():
    from rt_depth_map_tpu.ops.pallas.vol_transpose import vol_transpose

    _export(lambda x: vol_transpose(x), s((128, 128, 128), jnp.int16))


def test_cc_and_histogram_lower():
    from rt_depth_map_tpu.ops.pallas.cc_sweep import seg_min_propagate_pallas
    from rt_depth_map_tpu.ops.pallas.histogram import label_histogram_pallas

    H, W = 128, 128
    fld = s((H, W), jnp.int32)
    act = s((H, W), jnp.bool_)
    ah = s((H, W - 1), jnp.bool_)
    av = s((H - 1, W), jnp.bool_)
    _export(
        lambda f, a, h, v: seg_min_propagate_pallas(f, a, h, v, None, None),
        fld, act, ah, av,
    )
    _export(lambda l, a: label_histogram_pallas(l, a), fld, act)


def test_remap_planned_lowers():
    from rt_depth_map_tpu.ops.pallas.remap_plan import (
        plan_remap,
        remap_bilinear_planned,
    )

    H, W = 32, 256
    gy, gx = np.mgrid[0:H, 0:W].astype(np.float32)
    # small smooth warp (identity fails no bound; keep it representative)
    grid = np.stack([gx + 0.3 * np.sin(gy / 7.0), gy + 0.2], axis=-1)
    plan = plan_remap(grid, (H, W))
    if plan is None:
        pytest.skip("planner declined this grid")
    _export(
        lambda x: remap_bilinear_planned(x, plan), s((H, W), jnp.uint8)
    )


def test_flagship_frame_program_lowers():
    """Composition-level guard: the full 720p SGM-128 8-path frame program
    (rectify + matcher + filter + reproject, every Pallas kernel at its
    production shape) exports for TPU."""
    import __graft_entry__ as g

    fn, args = g.entry()
    _export(fn, *args)


def test_batch4_program_lowers():
    """The judged multi-stream point (4x 720p SGM batched per chip) has its
    own lane-stacked matcher path (stereo_sgbm_batch); export it for TPU."""
    import numpy as np

    from rt_depth_map_tpu.config import EngineConfig, MatcherConfig
    from rt_depth_map_tpu.pipeline import Engine
    from rt_depth_map_tpu.sources import SyntheticStereoSource

    W, H, B = 1280, 720, 4
    cfg = EngineConfig(
        width=W, height=H, number_of_disparities=128, batch=B,
        matcher=MatcherConfig(kind="sgm", num_disparities=128,
                              block_size=5, num_paths=8, pre_filter_cap=0),
    )
    src = SyntheticStereoSource(W, H, seed=0)
    eng = Engine(cfg, source=src)
    left, right, _, _ = src.render(0)
    L = jnp.asarray(np.stack([left] * B))
    R = jnp.asarray(np.stack([right] * B))
    exp = export.export(eng._step_batch, platforms=["tpu"])(
        L, R, jnp.asarray(eng.hsv_low), jnp.asarray(eng.hsv_high),
        jnp.int32(eng.min_object_size),
    )
    assert len(exp.mlir_module_serialized) > 0


def test_fallback_sgm_kernels_lower():
    """The RTDM_NO_BIDIR / 4-path fallbacks route through the
    single-direction kernels; keep their TPU lowering pinned too."""
    from rt_depth_map_tpu.ops.pallas.sgm_hdw import (
        sgm_down_pass_hdw,
        sgm_final_wta_hdw,
        sgm_horiz_pass_dh,
    )
    from rt_depth_map_tpu.ops.pallas.sgm_scan import sgm_aggregate_vertical

    Ct = s((128, 128, 128), jnp.int16)  # (W1, D, Hp)
    _export(lambda c: sgm_horiz_pass_dh(c, 600, 2400, reverse=False), Ct)
    C = s((16, 128, 128), jnp.int16)  # (H, D, W1)
    _export(lambda c: sgm_down_pass_hdw(c, 600, 2400), C)
    _export(
        lambda c, sp: sgm_final_wta_hdw(c, sp, 600, 2400, 10, reverse=True),
        C, C,
    )
    Chwd = s((16, 128, 128), jnp.int32)  # (H, W1, D)
    _export(
        lambda c: sgm_aggregate_vertical(c, 600, 2400, reverse=False), Chwd
    )
