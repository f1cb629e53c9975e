"""Adversarial-input worst-case timing (VERDICT round-4 item 6).

Two measurements at 720p, chained-timing methodology (profile_chain.py):
  1. filter_speckles on dense random-noise disparity -- the input that
     cost 819 ms/call in round 4 (unbounded CC convergence); now bounded
     by RTDM_CC_MAX_ROUNDS.
  2. the full single-frame engine step on random-noise camera images vs
     the nominal synthetic scene -- the frame-level <= 2x criterion.

Usage: python tools/probe_adversarial.py [iters]
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

_plat = os.environ.get("JAX_PLATFORMS", "").strip().lower()
if _plat:
    jax.config.update("jax_platforms", _plat)

from rt_depth_map_tpu.config import EngineConfig, MatcherConfig  # noqa: E402
from rt_depth_map_tpu.ops.speckle import filter_speckles  # noqa: E402
from rt_depth_map_tpu.pipeline import Engine  # noqa: E402
from rt_depth_map_tpu.sources import SyntheticStereoSource  # noqa: E402


def chain(name, step, x0, iters):
    f = jax.jit(step)
    t0 = time.perf_counter()
    x = f(x0)
    _ = np.asarray(jax.tree_util.tree_leaves(x)[0]).sum()
    cs = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        x = f(x)
    _ = np.asarray(jax.tree_util.tree_leaves(x)[0]).sum()
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:<40} compile={cs:6.1f}s run={dt * 1e3:9.2f}ms", flush=True)
    return dt


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    W, H = 1280, 720
    rng = np.random.default_rng(0)

    # 1. speckle on dense random noise (x16 disparity units)
    noise = jnp.asarray(
        rng.integers(0, 128 * 16, (H, W), np.int32).astype(np.int16))

    def sp(d):
        out = filter_speckles(d, -16, 100, 32 * 16)
        return out ^ (out[0, 0] & 1)  # chain

    t_noise = chain("speckle(random-noise disparity)", sp, noise, iters)

    # 2. full engine step: nominal vs adversarial frames
    mcfg = MatcherConfig(kind="sgm", num_disparities=128, block_size=5,
                        p1=600, p2=2400, uniqueness_ratio=10,
                        speckle_window_size=100, speckle_range=32,
                        disp12_max_diff=1, num_paths=8, pre_filter_cap=0)
    cfg = EngineConfig(width=W, height=H, number_of_disparities=128,
                       matcher=mcfg)
    src = SyntheticStereoSource(W, H, seed=0)
    eng = Engine(cfg, source=src)
    hsv_lo = jnp.asarray(eng.hsv_low)
    hsv_hi = jnp.asarray(eng.hsv_high)
    msz = jnp.int32(eng.min_object_size)

    def step(pair):
        l, r = pair
        out = eng._step(l, r, hsv_lo, hsv_hi, msz)
        h = (out["count"].sum() & 1).astype(jnp.uint8)
        return (l ^ h, r ^ h)

    l0, r0 = src.render(0)[:2]
    nominal = (jnp.asarray(l0), jnp.asarray(r0))
    t_nom = chain("engine step (nominal scene)", step, nominal, iters)

    adv = (jnp.asarray(rng.integers(0, 256, (H, W, 3), np.uint8)),
           jnp.asarray(rng.integers(0, 256, (H, W, 3), np.uint8)))
    t_adv = chain("engine step (random-noise frames)", step, adv, iters)
    ratio = t_adv / t_nom
    print(f"adversarial/nominal frame-time ratio: {ratio:.2f}x "
          f"(criterion: <= 2x)", flush=True)


if __name__ == "__main__":
    main()
