"""Benchmark: steady-state frames/s of the full device pipeline on one chip.

Operating point (BASELINE.md target): 1280x720, 128-disparity 8-path SGM,
full detection/depth pipeline; target >= 60 fps/chip, so
vs_baseline = fps / 60. Prints ONE JSON line.

Env:
  BENCH_SMALL=1   tiny shapes (CI/CPU sanity: 320x240 BM-64)
  BENCH_MATCHER   "sgm" (default) | "bm"
  BENCH_FRAMES    timed frames (default 20)
"""

import json
import os
import sys
import time

import numpy as np


def main():
    small = os.environ.get("BENCH_SMALL") == "1"
    matcher_kind = os.environ.get("BENCH_MATCHER", "sgm")
    frames = int(os.environ.get("BENCH_FRAMES", "20"))

    import jax

    from rt_depth_map_tpu.config import EngineConfig, MatcherConfig
    from rt_depth_map_tpu.pipeline import Engine
    from rt_depth_map_tpu.sources import SyntheticStereoSource

    if small:
        W, H, D = 320, 240, 64
        matcher_kind = os.environ.get("BENCH_MATCHER", "bm")
    else:
        W, H, D = 1280, 720, 128

    if matcher_kind == "sgm":
        mcfg = MatcherConfig(
            kind="sgm", num_disparities=D, block_size=5, num_paths=8,
            pre_filter_cap=0,
        )
    else:
        mcfg = MatcherConfig(kind="bm", num_disparities=D, block_size=13)

    cfg = EngineConfig(width=W, height=H, number_of_disparities=D, matcher=mcfg)
    src = SyntheticStereoSource(W, H, seed=0)
    engine = Engine(cfg, source=src)

    # pre-render a few frames so host render cost is out of the loop
    rendered = [src.render(i)[:2] for i in range(3)]
    compile_s = engine.warmup()

    # timed steady state
    t0 = time.perf_counter()
    for i in range(frames):
        left, right = rendered[i % len(rendered)]
        result = engine.process_pair(left, right)
    jax.block_until_ready(result.disparity)
    dt = time.perf_counter() - t0
    fps = frames / dt

    metric = f"fps_{W}x{H}_{matcher_kind}{D}"
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / 60.0, 4),
                "extra": {
                    "device": str(jax.devices()[0]),
                    "compile_s": round(compile_s, 1),
                    "frames": frames,
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
