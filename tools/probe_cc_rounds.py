"""Diagnose the CC propagation kernel: per-round cost vs round count.

Runs the label propagation on the bench-realistic SGM disparity with
max_rounds pinned at 1/2/4/8 and unlimited; per-round cost is the slope,
round count = (t_unlimited - t_0) / slope. Distinguishes "dynamic roll is
slow" from "convergence takes ~100 rounds" (VERDICT round 3, speckle item).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from rt_depth_map_tpu.config import MatcherConfig
from rt_depth_map_tpu.ops.pallas.cc_sweep import seg_min_propagate_pallas
from rt_depth_map_tpu.ops.sgbm import stereo_sgbm
from rt_depth_map_tpu.sources import SyntheticStereoSource


def chain_time(name, step, x0, iters=8):
    f = jax.jit(step)
    t0 = time.perf_counter()
    x = f(x0)
    _ = np.asarray(x.sum())
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        x = f(x)
    _ = np.asarray(x.sum())
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:<26} compile={compile_s:6.1f}s  run={dt * 1e3:9.2f}ms",
          flush=True)
    return dt


def main():
    W, H, D = 1280, 720, 128
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    src = SyntheticStereoSource(W, H, seed=0)
    fl, frt = src.grab()
    L = jnp.asarray(fl.array[..., 0])
    R = jnp.asarray(frt.array[..., 0])
    nop = MatcherConfig(kind="sgm", num_disparities=D, block_size=5,
                        num_paths=8, pre_filter_cap=0, backend="pallas",
                        speckle_window_size=0, disp12_max_diff=-1)
    disp0 = stereo_sgbm(L, R, nop)
    jax.block_until_ready(disp0)
    v = np.asarray(disp0).astype(np.int32)
    md = 32 * 16
    active = jnp.asarray(v != -16)
    ah = active[:, :-1] & active[:, 1:] & (jnp.abs(
        jnp.asarray(v)[:, :-1] - jnp.asarray(v)[:, 1:]) <= md)
    av = active[:-1, :] & active[1:, :] & (jnp.abs(
        jnp.asarray(v)[:-1, :] - jnp.asarray(v)[1:, :]) <= md)
    idx = (jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W
           + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1))

    def mk(mr):
        def step(f):
            out = seg_min_propagate_pallas(f, active, ah, av,
                                           max_rounds=mr)
            # feed a perturbed field back so executions chain
            return jnp.minimum(out, idx) + (out[0, 0] & 1)
        return step

    times = {}
    for mr in (1, 2, 4, 8, None):
        times[mr] = chain_time(f"labels max_rounds={mr}", mk(mr), idx, iters)
    slope = (times[8] - times[1]) / 7
    base = times[1] - slope
    rounds = (times[None] - base) / slope if slope > 0 else float("nan")
    print(f"per-round = {slope * 1e3:.2f}ms  fixed = {base * 1e3:.2f}ms  "
          f"implied rounds to converge = {rounds:.0f}", flush=True)


if __name__ == "__main__":
    main()
