"""Per-stage device timing through the axon TPU tunnel.

Methodology (the only one that survives the tunnel's quirks):
  * iteration i+1's input depends on iteration i's output (chained), so
    executions serialize on device and cannot be elided or cached;
  * block_until_ready can return optimistically through the tunnel, so the
    measurement ends with a dependent-scalar device->host pull (np.asarray),
    which cannot complete before every chained execution has; the ~25ms
    tunnel round-trip is amortized over N iterations.

Usage: python tools/profile_chain.py [WxH] [D] [iters]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from rt_depth_map_tpu.config import MatcherConfig
from rt_depth_map_tpu.ops import (
    ellipse_kernel,
    in_range,
    morph_open_close,
    remap_bilinear,
    rgb_to_gray,
    rgb_to_hsv,
)
from rt_depth_map_tpu.ops.bm import stereo_bm
from rt_depth_map_tpu.ops.detect import detect_objects
from rt_depth_map_tpu.ops.sgbm import aggregate_cost, sgbm_cost_volume, stereo_sgbm
from rt_depth_map_tpu.ops.speckle import filter_speckles


def chain_time(name, step, x0, iters=20):
    """step: x -> x (same structure); chained executions + one final pull."""
    f = jax.jit(step)
    fin = jax.jit(lambda x: jax.tree_util.tree_reduce(
        lambda a, b: a + b, jax.tree_util.tree_map(lambda v: v.sum().astype(jnp.float32), x)))
    t0 = time.perf_counter()
    x = f(x0)
    _ = np.asarray(fin(x))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        x = f(x)
    _ = np.asarray(fin(x))  # real completion barrier
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:<28} compile={compile_s:6.1f}s  run={dt * 1e3:9.2f}ms",
          flush=True)
    return dt


def main():
    import os

    _plat = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if _plat:  # sitecustomize may have config-forced a PJRT plugin
        jax.config.update("jax_platforms", _plat)
    size = sys.argv[1] if len(sys.argv) > 1 else "1280x720"
    W, H = (int(v) for v in size.split("x"))
    D = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    rng = np.random.default_rng(0)
    L = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))
    R = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))
    RGB = jnp.asarray(rng.integers(0, 256, (H, W, 3), dtype=np.uint8))

    cfg = MatcherConfig(kind="sgm", num_disparities=D, block_size=5,
                        num_paths=8, pre_filter_cap=0, backend="xla")
    nop = cfg.replace(speckle_window_size=0, disp12_max_diff=-1)
    bcfg = MatcherConfig(kind="bm", num_disparities=D, block_size=13,
                         backend="xla")

    def perturb(img, out):
        h = (jnp.sum(out.astype(jnp.int32)) & 1).astype(jnp.uint8)
        return img ^ h

    def matcher_step(m):
        def step(l):
            return perturb(L, m(l, R))
        return step

    # Stage order = measurement priority: a partial run under a timeout
    # must still yield the production-path numbers (pallas matchers, the
    # round-2 fused kernels) before the legacy XLA formulations whose
    # compiles are the slowest part of this script.
    for name, c in [
        ("sgm8 pallas full", cfg.replace(backend="pallas")),
        ("sgm8 pallas nopost", nop.replace(backend="pallas")),
        ("sgm4 pallas full", cfg.replace(backend="pallas", num_paths=4)),
        ("bm pallas full", bcfg.replace(backend="pallas")),
        ("bm pallas nopost", bcfg.replace(backend="pallas",
                                          speckle_window_size=0,
                                          disp12_max_diff=-1)),
        ("bm xla full", bcfg),
        ("bm xla nopost", bcfg.replace(speckle_window_size=0,
                                       disp12_max_diff=-1)),
    ]:
        fn = stereo_bm if c.kind == "bm" else stereo_sgbm
        chain_time(name, matcher_step(lambda l, r, c=c, fn=fn: fn(l, r, c)), L,
                   iters)

    disp0 = stereo_sgbm(L, R, nop.replace(backend="pallas"))

    def speckle_step(d):
        out = filter_speckles(d, -16, 100, 32 * 16)
        return d ^ (jnp.sum(out.astype(jnp.int32)) & 1).astype(jnp.int16)

    chain_time("speckle", speckle_step, disp0, iters)

    # LR consistency check in isolation: the in-VMEM Pallas kernel vs the
    # XLA shift-reduce loops (ops/pallas/lr_resolve.py)
    from rt_depth_map_tpu.ops.bm import _lr_check

    cost0 = jnp.asarray(rng.integers(0, 1 << 18, (H, W)), jnp.int32)

    def lr_step(use_pallas):
        def step(d):
            out = _lr_check(d, cost0, 0, D, 1, use_pallas=use_pallas,
                            interpret=jax.default_backend() == "cpu")
            return d ^ (jnp.sum(out.astype(jnp.int32)) & 1).astype(jnp.int16)
        return step

    chain_time("lr_check pallas", lr_step(True), disp0, iters)
    chain_time("lr_check xla", lr_step(False), disp0, iters)

    mask0 = jnp.asarray((rng.random((H, W)) < 0.01).astype(np.uint8) * 255)

    def detect_step(m):
        b = detect_objects(m, 500, 8)
        return m ^ (jnp.sum(b) & 1).astype(jnp.uint8)

    chain_time("detect", detect_step, mask0, iters)

    k = ellipse_kernel(10, 10)

    def morph_step(x):
        out = morph_open_close(
            in_range(rgb_to_hsv(x), jnp.asarray([0, 150, 0], jnp.uint8),
                     jnp.asarray([9, 255, 255], jnp.uint8)), k)
        return x ^ (jnp.sum(out.astype(jnp.int32)) & 1).astype(jnp.uint8)

    chain_time("hsv+inrange+morph", morph_step, RGB, iters)

    grid = jnp.asarray(
        np.stack(np.meshgrid(np.arange(W, dtype=np.float32),
                             np.arange(H, dtype=np.float32)), axis=-1)
    )

    def remap_step(x):
        out = remap_bilinear(x, grid)
        return x ^ (jnp.sum(out.astype(jnp.int32)) & 1).astype(jnp.uint8)

    chain_time("remap gray", remap_step, L, iters)

    # --- round-2 kernels: fused bidirectional passes, Pallas transpose,
    # striped cost volume, batched matcher -------------------------------
    try:
        from rt_depth_map_tpu.ops.pallas.sgm_bidir import (
            sgm_horiz_bidir_dh,
            sgm_vert_bidir_wta_hdw,
        )
        from rt_depth_map_tpu.ops.pallas.sgm_cost import (
            sgm_cost_volume_pallas,
        )
        from rt_depth_map_tpu.ops.pallas.sgm_hdw import (
            sgm_down_pass_hdw,
            sgm_final_wta_hdw,
            sgm_horiz_pass_dh,
        )
        from rt_depth_map_tpu.ops.pallas.vol_transpose import vol_transpose

        def cost_pal_step(l):
            c = sgm_cost_volume_pallas(l, R, D, 5, 0, layout="hdw",
                                       dtype=jnp.int16)[0]
            return perturb(L, c)

        chain_time("pallas cost (striped)", cost_pal_step, L, iters)

        Ch = sgm_cost_volume_pallas(L, R, D, 5, 0, layout="hdw",
                                    dtype=jnp.int16)[0]
        Hp = -(-H // 128) * 128
        Chp = jnp.pad(Ch, ((0, Hp - H), (0, 0), (0, 0)))
        Ct0 = vol_transpose(Chp)

        def vt_step(c):
            t = vol_transpose(c)
            return c + (jnp.min(t) & 1)

        chain_time("vol_transpose (pallas)", vt_step, Chp, iters)

        def xt_step(c):
            t = jnp.transpose(c, (2, 1, 0))
            return c + (jnp.min(t) & 1)

        chain_time("vol_transpose (xla)", xt_step, Chp, iters)

        def hbidir_step(c):
            s = sgm_horiz_bidir_dh(c, 600, 2400)
            return c + (jnp.min(s) & 1)

        chain_time("horiz bidir (fused)", hbidir_step, Ct0, iters)

        def h2_step(c):
            hf = sgm_horiz_pass_dh(c, 600, 2400, reverse=False)
            s = sgm_horiz_pass_dh(c, 600, 2400, reverse=True, partial=hf)
            return c + (jnp.min(s) & 1)

        chain_time("horiz 2-pass (old)", h2_step, Ct0, iters)

        Sh0 = jnp.transpose(sgm_horiz_bidir_dh(Ct0, 600, 2400), (2, 1, 0))

        def vbidir_step(c):
            b, m, dv, u = sgm_vert_bidir_wta_hdw(c, Sh0[:H], 600, 2400, 10)
            return c + (jnp.min(dv) & 1).astype(c.dtype)

        chain_time("vert bidir+wta (fused)", vbidir_step, Ch, iters)

        def v2_step(c):
            sa = sgm_down_pass_hdw(c, 600, 2400, partial=Sh0[:H])
            b, m, dv, u = sgm_final_wta_hdw(c, sa, 600, 2400, 10,
                                            reverse=True)
            return c + (jnp.min(dv) & 1).astype(c.dtype)

        chain_time("vert down+final (old)", v2_step, Ch, iters)
    except Exception as e:  # pragma: no cover
        print("round-2 kernel stages skipped:", e)

    try:
        from rt_depth_map_tpu.ops.sgbm import stereo_sgbm_batch

        B = 4
        Ls = jnp.stack([L ^ i for i in range(B)])
        Rs = jnp.stack([R for _ in range(B)])
        pcfg = cfg.replace(backend="pallas")

        def batch_step(ls):
            d = stereo_sgbm_batch(ls, Rs, pcfg)
            return ls ^ (jnp.sum(d.astype(jnp.int32)) & 1).astype(jnp.uint8)

        chain_time(f"sgm8 pallas batch{B} (/frame: /{B})", batch_step, Ls,
                   max(4, iters // 4))
    except Exception as e:  # pragma: no cover
        print("batched matcher stage skipped:", e)

    # --- planned remap vs gather remap on a REAL rectification grid,
    # packed 4-channel as the engine dispatches it (engine.py pre_fn) ----
    try:
        from rt_depth_map_tpu.calib.rectify import compute_rectification
        from rt_depth_map_tpu.ops.pallas.remap_plan import (
            plan_remap,
            remap_bilinear_planned,
        )

        cal = f"/root/reference/backup/{W}x{H}"
        rect = compute_rectification(
            f"{cal}/intrinsics.yml", f"{cal}/extrinsics.yml", (W, H)
        )
        rx, ry, rw, rh = rect.roi
        grid_np = rect.map_left.astype(np.float32)[ry : ry + rh,
                                                   rx : rx + rw]
        plan = plan_remap(grid_np, (H, W))
        RGBA = jnp.concatenate([L[..., None], RGB], axis=-1)

        def planned_step(x):
            out = remap_bilinear_planned(x, plan)
            return x ^ (jnp.sum(out.astype(jnp.int32)) & 1).astype(jnp.uint8)

        grid_roi = jnp.asarray(grid_np)

        def gather_step(x):
            out = remap_bilinear(x, grid_roi)
            return x ^ (jnp.sum(out.astype(jnp.int32)) & 1).astype(jnp.uint8)

        if plan is None:
            print("planned remap: plan_remap returned None for this grid")
        else:
            chain_time("remap planned 4ch (roi)", planned_step, RGBA, iters)
        chain_time("remap gather 4ch (roi)", gather_step, RGBA, iters)
    except Exception as e:  # pragma: no cover
        print("planned remap stage skipped:", e)

    # --- legacy XLA formulations (slowest compiles, reference-only) -----
    for name, c in [
        ("sgm8 xla full", cfg),
        ("sgm8 xla nopost", nop),
    ]:
        chain_time(name, matcher_step(lambda l, r, c=c: stereo_sgbm(l, r, c)),
                   L, iters)

    C0 = sgbm_cost_volume(L, R, D, 5, 0, 0)[0]

    def agg_step(c):
        s = aggregate_cost(c, 600, 2400, 8)
        return c + (jnp.min(s) & 1)

    chain_time("sgm aggregate x8 (scan)", agg_step, C0, iters)

    try:
        from rt_depth_map_tpu.ops.pallas.sgm_scan import sgm_aggregate_vertical

        def pal_step(c):
            s = sgm_aggregate_vertical(c, 600, 2400, False)
            return c + (jnp.min(s) & 1)

        chain_time("pallas 3-dir pass", pal_step, C0, iters)
    except Exception as e:  # pragma: no cover
        print("pallas pass skipped:", e)

    def cost_step(l):
        c = sgbm_cost_volume(l, R, D, 5, 0, 0)[0]
        return perturb(L, c)

    chain_time("sgm cost volume (xla)", cost_step, L, iters)


if __name__ == "__main__":
    main()
