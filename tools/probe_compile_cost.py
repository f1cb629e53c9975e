"""Cold-compile cost per Pallas kernel + whole engine program.

Round-3/5 criterion: every bench cell compile_s < 60 cold, < 10 warm.
This probe times each kernel's jit compile with the persistent cache
DISABLED (true cold) at the flagship (or given) shape, so the diet can
target the dominant kernel instead of guessing.

Usage: python tools/probe_compile_cost.py [WxH] [D] [--engine]
"""

import os
import sys
import time

os.environ["RTDM_COMPILE_CACHE"] = "0"

import numpy as np
import jax
import jax.numpy as jnp

_plat = os.environ.get("JAX_PLATFORMS", "").strip().lower()
if _plat:
    jax.config.update("jax_platforms", _plat)


def t(name, fn, *args):
    t0 = time.perf_counter()
    out = jax.jit(fn).lower(*args).compile()
    dt = time.perf_counter() - t0
    print(f"{name:<34} compile={dt:7.1f}s", flush=True)
    del out
    return dt


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "1280x720"
    W, H = (int(v) for v in size.split("x"))
    D = int(sys.argv[2]) if len(sys.argv) > 2 and not sys.argv[2].startswith(
        "--") else 128
    rng = np.random.default_rng(0)
    L = jnp.asarray(rng.integers(0, 256, (H, W), np.uint8))
    R = jnp.asarray(rng.integers(0, 256, (H, W), np.uint8))
    W1 = W - D
    Hp = -(-H // 128) * 128
    total = 0.0

    from rt_depth_map_tpu.ops.pallas.sgm_cost import sgm_cost_volume_pallas

    total += t("cost hdw int16", lambda l, r: sgm_cost_volume_pallas(
        l, r, D, 5, 0, layout="hdw", dtype=jnp.int16, out_h=Hp)[0], L, R)

    C = jnp.zeros((Hp, D, W1), jnp.int16)
    from rt_depth_map_tpu.ops.pallas.vol_transpose import vol_transpose

    total += t("vol_transpose", lambda c: vol_transpose(c), C)

    Ct = jnp.zeros((W1, D, Hp), jnp.int16)
    from rt_depth_map_tpu.ops.pallas.sgm_bidir import (
        sgm_horiz_bidir_dh,
        sgm_vert_bidir_wta_hdw,
    )

    total += t("horiz bidir", lambda c: sgm_horiz_bidir_dh(c, 600, 2400), Ct)
    Sh = jnp.zeros((Hp, D, W1), jnp.int16)
    total += t("vert bidir + WTA", lambda c, s: sgm_vert_bidir_wta_hdw(
        c, s, 600, 2400, 10, true_h=H - H % 16 if H % 16 else H), C, Sh)

    disp = jnp.zeros((H, W), jnp.int16)
    from rt_depth_map_tpu.ops.speckle import filter_speckles

    total += t("speckle (CC+hist+decide)", lambda d: filter_speckles(
        d, -16, 100, 32 * 16), disp)

    mask = jnp.zeros((H, W), jnp.uint8)
    from rt_depth_map_tpu.ops.detect import detect_objects

    total += t("detect (CC bbox + topk)", lambda m: detect_objects(
        m, 100, 8), mask)

    print(f"{'sum of kernel pieces':<34} compile={total:7.1f}s")

    if "--engine" in sys.argv:
        from rt_depth_map_tpu.config import EngineConfig, MatcherConfig
        from rt_depth_map_tpu.pipeline import Engine
        from rt_depth_map_tpu.sources import SyntheticStereoSource

        mcfg = MatcherConfig(kind="sgm", num_disparities=D, block_size=5,
                             num_paths=8, pre_filter_cap=0)
        cfg = EngineConfig(width=W, height=H, number_of_disparities=D,
                           matcher=mcfg)
        eng = Engine(cfg, source=SyntheticStereoSource(W, H, seed=0))
        rgb = jnp.asarray(rng.integers(0, 256, (H, W, 3), np.uint8))
        t0 = time.perf_counter()
        out = eng._step(rgb, rgb, jnp.asarray(eng.hsv_low),
                        jnp.asarray(eng.hsv_high),
                        jnp.int32(eng.min_object_size))
        jax.block_until_ready(out)
        print(f"{'FULL engine step (trace+compile+run)':<34} "
              f"compile={time.perf_counter() - t0:7.1f}s", flush=True)


if __name__ == "__main__":
    main()
