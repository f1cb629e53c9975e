"""Pre-warm the persistent compilation cache for the standard operating
points (deployment cold-start recipe).

A cache-cold machine pays ~90-100 s of XLA+Mosaic compile for a 720p
cell, dominated by the CC seg-min propagation kernel (~85 s; see
HARVEST_R5 section 7 for the dissection and the rejected diets). This
tool compiles every kernel of the requested cells ONCE into the
persistent cache (RTDM_COMPILE_CACHE, default ~/.cache/rt_depth_map_tpu/
jax), after which engine/CLI/bench starts are < 10 s.

Usage: python tools/prewarm_cache.py [cells...]
  cells: WxHxD[:bm|:sgm][,batch] (default: the BENCH_MATRIX set)
"""

import os
import sys
import time

import numpy as np


def main():
    import jax

    _plat = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if _plat:
        jax.config.update("jax_platforms", _plat)
    cache = os.environ.get(
        "RTDM_COMPILE_CACHE",
        os.path.expanduser("~/.cache/rt_depth_map_tpu/jax"))
    if cache and cache != "0":
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from rt_depth_map_tpu.config import EngineConfig, MatcherConfig
    from rt_depth_map_tpu.pipeline import Engine
    from rt_depth_map_tpu.sources import SyntheticStereoSource
    from rt_depth_map_tpu.tuned import apply_tuned_env

    apply_tuned_env()

    cells = sys.argv[1:] or [
        "320x240x64:bm", "320x240x64:sgm",
        "1280x720x128:bm", "1280x720x128:sgm",
        "1920x1080x256:sgm",
    ]
    for cell in cells:
        spec = cell.split(":")
        W, H, D = (int(v) for v in spec[0].split("x"))
        kind = spec[1] if len(spec) > 1 else "sgm"
        if kind == "sgm":
            mcfg = MatcherConfig(kind="sgm", num_disparities=D, block_size=5,
                                 num_paths=8, pre_filter_cap=0)
        else:
            mcfg = MatcherConfig(kind="bm", num_disparities=D, block_size=13)
        cfg = EngineConfig(width=W, height=H, number_of_disparities=D,
                           matcher=mcfg)
        eng = Engine(cfg, source=SyntheticStereoSource(W, H, seed=0))
        rng = np.random.default_rng(0)
        rgb = np.asarray(rng.integers(0, 256, (H, W, 3), np.uint8))
        t0 = time.perf_counter()
        out = eng._step(rgb, rgb, np.asarray(eng.hsv_low),
                        np.asarray(eng.hsv_high),
                        np.int32(eng.min_object_size))
        jax.block_until_ready(out)
        print(f"prewarmed {cell}: {time.perf_counter() - t0:.1f}s",
              flush=True)


if __name__ == "__main__":
    main()
