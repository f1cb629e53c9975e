"""Compile each suspect Pallas kernel standalone on the real TPU.

The jax.export lowering guard (tests/test_tpu_lowering.py) covers TPU
dialect construction but not the Mosaic back-end compile; this probe runs
the actual compile per kernel at flagship shapes so a back-end rejection
(e.g. unprovable DMA alignment) is attributed to one kernel instead of
surfacing as a whole-program bench failure.
"""
import sys
import traceback

import numpy as np
import jax
import jax.numpy as jnp


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


def main():
    which = sys.argv[1:] or ["transpose", "remap"]

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
            "/root/reference/backup/1280x720/intrinsics.yml",
            "/root/reference/backup/1280x720/extrinsics.yml",
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
