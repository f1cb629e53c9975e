"""In-context stage breakdown of the engine frame program.

Times progressively larger prefixes of the frame pipeline with the chained
methodology of tools/profile_chain.py (the axon tunnel makes per-iteration
block_until_ready untrustworthy); successive differences approximate the
in-context cost of each stage (XLA may schedule stages differently inside
the full program, so treat deltas as estimates).

Usage: python tools/profile_engine_stages.py [WxH] [D] [iters]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from rt_depth_map_tpu.config import EngineConfig, MatcherConfig
from rt_depth_map_tpu.ops.color import in_range, rgb_to_gray, rgb_to_hsv
from rt_depth_map_tpu.ops.detect import detect_objects, matching_region
from rt_depth_map_tpu.ops.morphology import morph_open_close
from rt_depth_map_tpu.ops.remap import remap_bilinear
from rt_depth_map_tpu.ops.reproject import (
    calc_depth,
    disparity_fixed_to_float,
    reproject_to_3d,
)
from rt_depth_map_tpu.ops.sgbm import stereo_sgbm
from rt_depth_map_tpu.pipeline.engine import MORPH_DX, MORPH_DY, Engine
from rt_depth_map_tpu.ops.morphology import ellipse_kernel
from rt_depth_map_tpu.sources import SyntheticStereoSource


def chain_time(name, step, x0, iters, prev=None):
    f = jax.jit(step)
    fin = jax.jit(
        lambda x: jax.tree_util.tree_reduce(
            lambda a, b: a + b,
            jax.tree_util.tree_map(
                lambda v: v.astype(jnp.float32).sum(), x
            ),
        )
    )
    t0 = time.perf_counter()
    x = f(x0)
    _ = np.asarray(fin(x))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        x = f(x)
    _ = np.asarray(fin(x))
    dt = (time.perf_counter() - t0) / iters
    delta = "" if prev is None else f"  (+{(dt - prev) * 1e3:7.2f}ms)"
    print(
        f"{name:<26} compile={compile_s:6.1f}s  run={dt * 1e3:8.2f}ms{delta}",
        flush=True,
    )
    return dt


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "1280x720"
    W, H = (int(v) for v in size.split("x"))
    D = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    mcfg = MatcherConfig(kind="sgm", num_disparities=D, block_size=5,
                         num_paths=8, pre_filter_cap=0)
    cfg = EngineConfig(width=W, height=H, number_of_disparities=D,
                       matcher=mcfg)
    src = SyntheticStereoSource(W, H, seed=0)
    eng = Engine(cfg, source=src)
    mcfg = eng.matcher_config
    rx, ry, rw, rh = eng.roi
    grid_l = jnp.asarray(eng.map_left)[ry : ry + rh, rx : rx + rw]
    grid_r = jnp.asarray(eng.map_right)[ry : ry + rh, rx : rx + rw]
    Q = jnp.asarray(eng.Q, jnp.float32)
    kernel = ellipse_kernel(MORPH_DX, MORPH_DY)
    hsv_lo = jnp.asarray(eng.hsv_low)
    hsv_hi = jnp.asarray(eng.hsv_high)
    msize = jnp.int32(eng.min_object_size)

    lrgb, rrgb = src.render(0)[:2]
    lrgb = jnp.asarray(lrgb)
    rrgb = jnp.asarray(rrgb)

    def perturb(x, h):
        return x ^ (h & 1).astype(x.dtype)

    def rect_part(l):
        lg = rgb_to_gray(l)
        rg = rgb_to_gray(rrgb)
        lstack = jnp.concatenate([lg[..., None], l], axis=-1)
        lrect4 = remap_bilinear(lstack, grid_l)
        rrect = remap_bilinear(rg, grid_r)
        return lrect4[..., 0], lrect4[..., 1:], rrect

    def s1_rect(l):
        lrect, rgbr, rrect = rect_part(l)
        h = (lrect.astype(jnp.int32).sum() + rrect.astype(jnp.int32).sum()
             + rgbr.astype(jnp.int32).sum())
        return perturb(l, h)

    def detect_part(rgbr):
        hsv = rgb_to_hsv(rgbr)
        mask = in_range(hsv, hsv_lo, hsv_hi)
        filt = morph_open_close(mask, kernel)
        boxes = detect_objects(filt, msize, cfg.max_objects)
        return filt, boxes

    def s2_detect(l):
        lrect, rgbr, rrect = rect_part(l)
        filt, boxes = detect_part(rgbr)
        h = (lrect.astype(jnp.int32).sum() + rrect.astype(jnp.int32).sum()
             + filt.astype(jnp.int32).sum() + boxes.sum())
        return perturb(l, h)

    nop = mcfg.replace(speckle_window_size=0, disp12_max_diff=-1)
    lr_only = mcfg.replace(speckle_window_size=0)

    def s3_matcher(l):
        lrect, rgbr, rrect = rect_part(l)
        filt, boxes = detect_part(rgbr)
        disp = stereo_sgbm(lrect, rrect, nop)
        h = (disp.astype(jnp.int32).sum() + filt.astype(jnp.int32).sum()
             + boxes.sum())
        return perturb(l, h)

    def s4_lr(l):
        lrect, rgbr, rrect = rect_part(l)
        filt, boxes = detect_part(rgbr)
        disp = stereo_sgbm(lrect, rrect, lr_only)
        h = (disp.astype(jnp.int32).sum() + filt.astype(jnp.int32).sum()
             + boxes.sum())
        return perturb(l, h)

    def s5_speckle(l):
        lrect, rgbr, rrect = rect_part(l)
        filt, boxes = detect_part(rgbr)
        disp = stereo_sgbm(lrect, rrect, mcfg)
        h = (disp.astype(jnp.int32).sum() + filt.astype(jnp.int32).sum()
             + boxes.sum())
        return perturb(l, h)

    def s6_full(l):
        lrect, rgbr, rrect = rect_part(l)
        filt, boxes = detect_part(rgbr)
        disp = stereo_sgbm(lrect, rrect, mcfg)
        dint = disparity_fixed_to_float(disp)
        xyz = reproject_to_3d(dint, Q, mcfg.min_disparity, True)
        depth_cm, mean_z, count = calc_depth(
            xyz, filt, boxes, cfg.calibration_unit_mm
        )
        h = (disp.astype(jnp.int32).sum() + count.sum()
             + depth_cm.astype(jnp.int32).sum())
        return perturb(l, h)

    t = chain_time("1 rectify(remap x2)", s1_rect, lrgb, iters)
    t = chain_time("2 +detect", s2_detect, lrgb, iters, t)
    t = chain_time("3 +sgm nopost", s3_matcher, lrgb, iters, t)
    t = chain_time("4 +lr check", s4_lr, lrgb, iters, t)
    t = chain_time("5 +speckle", s5_speckle, lrgb, iters, t)
    t = chain_time("6 +depth (full)", s6_full, lrgb, iters, t)


if __name__ == "__main__":
    main()
