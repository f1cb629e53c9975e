"""Per-stage device timing at the flagship operating point.

Usage: python tools/profile_stages.py [WxH] [D]
Feeds FRESH random inputs each timed iteration (repeating identical inputs
understates H2D and invites transport-level caching artifacts).
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
from rt_depth_map_tpu.ops.sgbm import (
    aggregate_cost,
    sgbm_cost_volume,
    stereo_sgbm,
    _lr_check_sgbm,
)
from rt_depth_map_tpu.ops.speckle import filter_speckles


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "1280x720"
    W, H = (int(v) for v in size.split("x"))
    D = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    rng = np.random.default_rng(0)

    def pair():
        return (
            jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8)),
            jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8)),
        )

    def bench(name, fn, argf, n=5):
        f = jax.jit(fn)
        args = argf()
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        t1 = time.perf_counter()
        ts = []
        for _ in range(n):
            args = argf()
            t2 = time.perf_counter()
            jax.block_until_ready(f(*args))
            ts.append(time.perf_counter() - t2)
        print(f"{name:<28} compile={t1 - t0:6.1f}s  run={min(ts) * 1e3:9.2f}ms")

    cfg = MatcherConfig(
        kind="sgm", num_disparities=D, block_size=5, num_paths=8,
        pre_filter_cap=0,
    )
    nop = cfg.replace(speckle_window_size=0, disp12_max_diff=-1)

    bench("sgm cost volume", lambda l, r: sgbm_cost_volume(l, r, D, 5, 0, 0)[0], pair)
    C0 = sgbm_cost_volume(*pair(), D, 5, 0, 0)[0]

    def cpair():
        return (C0,)

    bench("sgm aggregate x8", lambda c: aggregate_cost(c, 600, 2400, 8), cpair)
    bench("sgm wta only (nopost)", lambda l, r: stereo_sgbm(l, r, nop), pair)
    bench(
        "sgm + lr", lambda l, r: stereo_sgbm(l, r, nop.replace(disp12_max_diff=1)),
        pair,
    )
    bench("sgm full", lambda l, r: stereo_sgbm(l, r, cfg), pair)

    bcfg = MatcherConfig(kind="bm", num_disparities=D, block_size=13)
    bench("bm full", lambda l, r: stereo_bm(l, r, bcfg), pair)

    disp0 = stereo_sgbm(*pair(), nop)
    bench(
        "speckle", lambda d: filter_speckles(d, -16, 100, 32 * 16),
        lambda: (disp0,), n=3,
    )
    mask0 = jnp.asarray((rng.random((H, W)) < 0.01).astype(np.uint8) * 255)
    bench("detect", lambda m: detect_objects(m, 500, 8), lambda: (mask0,), n=3)

    k = ellipse_kernel(10, 10)

    def rgbf():
        return (jnp.asarray(rng.integers(0, 256, (H, W, 3), dtype=np.uint8)),)

    bench(
        "hsv+inrange+morph",
        lambda x: morph_open_close(
            in_range(
                rgb_to_hsv(x),
                jnp.asarray([0, 150, 0], jnp.uint8),
                jnp.asarray([9, 255, 255], jnp.uint8),
            ),
            k,
        ),
        rgbf,
    )
    grid = jnp.asarray(
        np.stack(
            np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32)),
            axis=-1,
        )
    )
    bench("remap gray", lambda x: remap_bilinear(x, grid), lambda: (pair()[0],))
    bench("gray", lambda x: rgb_to_gray(x), rgbf)


if __name__ == "__main__":
    main()
