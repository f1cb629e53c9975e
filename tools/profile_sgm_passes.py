"""Micro-timing of the individual SGM Pallas passes at the flagship shape.

Same chained-execution methodology as tools/profile_chain.py (the axon
tunnel makes per-iteration block_until_ready untrustworthy).

Usage: python tools/profile_sgm_passes.py [WxH] [D] [iters]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from rt_depth_map_tpu.config import MatcherConfig
from rt_depth_map_tpu.ops.pallas.sgm_cost import sgm_cost_volume_pallas
from rt_depth_map_tpu.ops.pallas.sgm_hdw import (
    sgm_down_pass_hdw,
    sgm_final_wta_hdw,
    sgm_horiz_pass_hdw,
)
from rt_depth_map_tpu.ops.sgbm import stereo_sgbm
from rt_depth_map_tpu.ops.speckle import filter_speckles


def chain_time(name, step, x0, iters=20):
    f = jax.jit(step)
    fin = jax.jit(lambda x: jax.tree_util.tree_reduce(
        lambda a, b: a + b,
        jax.tree_util.tree_map(lambda v: v.sum().astype(jnp.float32), x)))
    t0 = time.perf_counter()
    x = f(x0)
    _ = np.asarray(fin(x))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        x = f(x)
    _ = np.asarray(fin(x))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:<28} compile={compile_s:6.1f}s  run={dt * 1e3:9.2f}ms",
          flush=True)
    return dt


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "1280x720"
    W, H = (int(v) for v in size.split("x"))
    D = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    P1, P2 = 600, 2400

    rng = np.random.default_rng(0)
    L = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))
    R = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))

    def perturb16(x, out):
        h = (jnp.sum(out.astype(jnp.int32)) & 1).astype(x.dtype)
        return x ^ h

    # cost kernel: (H, D, W1) int16
    def cost_step(l):
        C, _, _ = sgm_cost_volume_pallas(l, R, D, 5, 0, layout="hdw",
                                         dtype=jnp.int16)
        return perturb16(L, C)

    chain_time("pallas cost hdw", cost_step, L, iters)

    C, _, _ = sgm_cost_volume_pallas(L, R, D, 5, 0, layout="hdw",
                                     dtype=jnp.int16)
    Ct = jnp.transpose(C, (2, 0, 1))  # (W1, H, D)
    jax.block_until_ready((C, Ct))

    def tr_step(c):
        t = jnp.transpose(c, (2, 0, 1))
        return c + (t.astype(jnp.int32).sum() & 1).astype(c.dtype)

    chain_time("transpose hdw->whd", tr_step, C, iters)

    def hf_step(ct):
        out = sgm_horiz_pass_hdw(ct, P1, P2, reverse=False)
        return perturb16(ct, out)

    chain_time("horiz fwd", hf_step, Ct, iters)

    hf = sgm_horiz_pass_hdw(Ct, P1, P2, reverse=False)
    jax.block_until_ready(hf)

    def hb_step(ct):
        out = sgm_horiz_pass_hdw(ct, P1, P2, reverse=True, partial=hf)
        return perturb16(ct, out)

    chain_time("horiz rev (+partial)", hb_step, Ct, iters)

    Sh = jnp.transpose(
        sgm_horiz_pass_hdw(Ct, P1, P2, reverse=True, partial=hf), (1, 2, 0)
    )
    jax.block_until_ready(Sh)

    def down_step(c):
        out = sgm_down_pass_hdw(c, P1, P2, partial=Sh)
        return perturb16(c, out)

    chain_time("down 3-dir (+partial)", down_step, C, iters)

    Sa = sgm_down_pass_hdw(C, P1, P2, partial=Sh)
    jax.block_until_ready(Sa)

    def final_step(c):
        best, minS, dval, uniq = sgm_final_wta_hdw(c, Sa, P1, P2, 10,
                                                   reverse=True)
        return c + (best.sum() & 1).astype(c.dtype)

    chain_time("final up+WTA", final_step, C, iters)

    cfg = MatcherConfig(kind="sgm", num_disparities=D, block_size=5,
                        num_paths=8, pre_filter_cap=0, backend="pallas")
    nop = cfg.replace(speckle_window_size=0, disp12_max_diff=-1)
    disp0 = stereo_sgbm(L, R, nop)
    jax.block_until_ready(disp0)

    def speckle_step(d):
        out = filter_speckles(d, -16, 100, 32 * 16)
        return d ^ (jnp.sum(out.astype(jnp.int32)) & 1).astype(jnp.int16)

    chain_time("speckle (on sgm disp)", speckle_step, disp0, iters)

    full = stereo_sgbm(L, R, cfg)
    nopost = stereo_sgbm(L, R, nop)
    jax.block_until_ready((full, nopost))

    def full_step(l):
        return perturb16(L, stereo_sgbm(l, R, cfg))

    def nop_step(l):
        return perturb16(L, stereo_sgbm(l, R, nop))

    chain_time("sgm8 pallas nopost", nop_step, L, iters)
    chain_time("sgm8 pallas full", full_step, L, iters)


if __name__ == "__main__":
    main()
