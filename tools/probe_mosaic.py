"""Compile each suspect Pallas kernel standalone on the real TPU.

The jax.export lowering guard (tests/test_tpu_lowering.py) covers TPU
dialect construction but not the Mosaic back-end compile; this probe runs
the actual compile per kernel at flagship shapes so a back-end rejection
(e.g. unprovable DMA alignment) is attributed to one kernel instead of
surfacing as a whole-program bench failure.
"""
import os
import sys
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

# calibration fixtures; RTDM_CALIB_DIR overrides for other machine layouts
CALIB_DIR = os.environ.get("RTDM_CALIB_DIR", "/root/reference/backup")


def probe(name, fn, *args):
    try:
        lowered = jax.jit(fn).lower(*args)
        lowered.compile()
        print(f"PROBE {name}: OK", flush=True)
        return True
    except Exception as e:  # noqa: BLE001 -- report and continue
        msg = str(e).replace("\n", " | ")[:300]
        print(f"PROBE {name}: FAIL {type(e).__name__}: {msg}", flush=True)
        traceback.print_exc(file=sys.stderr)
        return False


def probe_run(name, fn, *args, iters=10):
    """Compile AND execute (timed): catches run-time Mosaic faults and
    reports ms/launch (N chained launches, one D2H pull -- tunnel-safe)."""
    try:
        jitted = jax.jit(fn)
        out = jitted(*args)
        leaves = jax.tree_util.tree_leaves(out)
        _ = np.asarray(jnp.asarray(leaves[0]).sum())
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.int32)
        for _ in range(iters):
            out = jitted(*args)
            leaves = jax.tree_util.tree_leaves(out)
            acc = acc + jnp.asarray(leaves[0]).astype(jnp.int32).sum()
        _ = np.asarray(acc)
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"PROBE {name}: OK {dt:.2f}ms/launch", flush=True)
        return True
    except Exception as e:  # noqa: BLE001 -- report and continue
        msg = str(e).replace("\n", " | ")[:300]
        print(f"PROBE {name}: FAIL {type(e).__name__}: {msg}", flush=True)
        traceback.print_exc(file=sys.stderr)
        return False


def _scene_disp(H, W, seed=0):
    """Scene-like int16 disparity (x16 units) with invalids, matching what
    the speckle filter sees: smooth regions + texture + invalid speckles."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    d = (40 + 30 * np.sin(xx / 97.0) + 20 * np.cos(yy / 53.0)).astype(np.int32)
    d = d * 16 + rng.integers(-8, 8, (H, W))
    invalid = rng.random((H, W)) < 0.12
    d = np.where(invalid, -16, d)
    return jnp.asarray(d.astype(np.int16))


def main():
    which = sys.argv[1:] or ["transpose", "remap"]

    if "cc" in which:
        # the in-VMEM CC propagation kernel (round-2 regression site):
        # compile AND run speckle (N=1, 4-conn) and bbox detect (N=4,
        # 8-conn) at flagship 720p on scene-like data
        from rt_depth_map_tpu.ops.detect import detect_objects
        from rt_depth_map_tpu.ops.speckle import filter_speckles

        H, W = 720, 1280
        disp = _scene_disp(H, W)
        # production parameters: speckleRange=32 in x16 disparity units
        probe_run("cc speckle 720p (N=1 4conn)",
                  lambda d: filter_speckles(d, -16, 100, 32 * 16), disp)
        rng = np.random.default_rng(1)
        blobs = np.zeros((H, W), np.uint8)
        for _ in range(12):
            cy, cx = rng.integers(40, H - 40), rng.integers(40, W - 40)
            ry, rx = rng.integers(8, 60), rng.integers(8, 60)
            yy, xx = np.mgrid[0:H, 0:W]
            blobs |= ((yy - cy) ** 2 / ry**2 + (xx - cx) ** 2 / rx**2 < 1
                      ).astype(np.uint8)
        mask = jnp.asarray(blobs)
        probe_run("cc detect 720p (N=4 8conn)",
                  lambda m: detect_objects(m, 100, 16), mask)

    if "transpose" in which:
        from rt_depth_map_tpu.ops.pallas.vol_transpose import vol_transpose

        x = jax.ShapeDtypeStruct((768, 128, 1280), jnp.int16)
        probe("vol_transpose 768x128x1280", vol_transpose, x)

    if "remap" in which:
        from rt_depth_map_tpu.calib import compute_rectification
        from rt_depth_map_tpu.ops.pallas.remap_plan import (
            plan_remap,
            remap_bilinear_planned,
        )

        W, H = 1280, 720
        rect = compute_rectification(
            f"{CALIB_DIR}/1280x720/intrinsics.yml",
            f"{CALIB_DIR}/1280x720/extrinsics.yml",
            (W, H),
        )
        grid = np.asarray(rect.map_left)
        if grid.shape[0] == 2:
            grid = np.moveaxis(grid, 0, -1)
        plan = plan_remap(grid[..., :2], (H, W))
        if plan is None:
            print("PROBE remap: plan_remap returned None", flush=True)
            return
        img = jax.ShapeDtypeStruct((H, W, 4), jnp.uint8)
        probe("remap_planned 720p", lambda a: remap_bilinear_planned(a, plan),
              img)


if __name__ == "__main__":
    main()
