"""Fine-grained timing of the speckle-filter sub-steps at 720p on a
bench-realistic SGM disparity (chained methodology, see profile_chain.py).

Parts measured separately:
  * connected_components_scan (label propagation while_loop)
  * scatter-add histogram (per-root sizes)
  * read-back propagation (root sizes -> pixels)
  * component_sizes end-to-end, filter_speckles end-to-end
  * the LR disp12 check (the other "post" cost)
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from rt_depth_map_tpu.config import MatcherConfig
from rt_depth_map_tpu.ops.cc import (
    component_sizes,
    connected_components_scan,
)
from rt_depth_map_tpu.ops.sgbm import stereo_sgbm
from rt_depth_map_tpu.ops.speckle import filter_speckles

_BIG = 2**30


def chain_time(name, step, x0, iters=16):
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
    print(f"{name:<30} compile={compile_s:6.1f}s  run={dt * 1e3:9.2f}ms",
          flush=True)
    return dt


def main():
    W, H, D = 1280, 720, 128
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 16

    # bench-realistic input: the synthetic source (textured scene), not
    # uniform noise (noise fragments into thousands of tiny components and
    # inflates the while_loop trip count beyond anything the bench sees)
    from rt_depth_map_tpu.sources import SyntheticStereoSource

    src = SyntheticStereoSource(W, H, seed=0)
    fl, frt = src.grab()
    L = jnp.asarray(fl.array[..., 0])
    R = jnp.asarray(frt.array[..., 0])

    cfg = MatcherConfig(kind="sgm", num_disparities=D, block_size=5,
                        num_paths=8, pre_filter_cap=0, backend="pallas")
    nop = cfg.replace(speckle_window_size=0, disp12_max_diff=-1)
    disp0 = stereo_sgbm(L, R, nop)
    jax.block_until_ready(disp0)
    dnp = np.asarray(disp0)
    n_invalid = int((dnp == -16).sum())
    print(f"disp {dnp.shape} invalid_frac={n_invalid / dnp.size:.3f}",
          flush=True)

    def p16(x, out):
        return x ^ (jnp.sum(out.astype(jnp.int32)) & 1).astype(x.dtype)

    max_diff = 32 * 16

    def labels_step(d):
        lab = connected_components_scan(d, d != -16, jnp.int32(max_diff), 4)
        return p16(d, lab)

    chain_time("labels (cc scan loop)", labels_step, disp0, iters)

    lab0 = connected_components_scan(disp0, disp0 != -16,
                                     jnp.int32(max_diff), 4)
    act0 = disp0 != -16
    jax.block_until_ready((lab0, act0))

    Hh, Ww = disp0.shape

    def scatter_step(lab):
        ones = act0.astype(jnp.int32).reshape(-1)
        sizes = jnp.zeros(Hh * Ww, jnp.int32).at[lab.reshape(-1)].add(ones)
        return lab ^ (sizes.sum() & 1)

    chain_time("scatter-add sizes", scatter_step, lab0, iters)

    def gather_step(lab):
        ones = act0.astype(jnp.int32).reshape(-1)
        sizes = jnp.zeros(Hh * Ww, jnp.int32).at[lab.reshape(-1)].add(ones)
        per_px = sizes[lab.reshape(-1)].reshape(Hh, Ww)
        return lab ^ (per_px.sum() & 1)

    chain_time("scatter + gather readback", gather_step, lab0, iters)

    def sizes_step(lab):
        cs = component_sizes(lab, act0, values=disp0, max_diff=max_diff,
                             connectivity=4)
        return lab ^ (cs.sum() & 1)

    chain_time("component_sizes (full)", sizes_step, lab0, iters)

    def speckle_step(d):
        out = filter_speckles(d, -16, 100, max_diff)
        return d ^ (jnp.sum(out.astype(jnp.int32)) & 1).astype(jnp.int16)

    chain_time("filter_speckles e2e", speckle_step, disp0, iters)

    # LR disp12 check in isolation: full minus speckle-only
    lr = cfg.replace(speckle_window_size=0)
    spk = cfg.replace(disp12_max_diff=-1)

    def mk(c):
        def step(l):
            return p16(L, stereo_sgbm(l, R, c))
        return step

    chain_time("sgm8 nopost", mk(nop), L, iters)
    chain_time("sgm8 +lr only", mk(lr), L, iters)
    chain_time("sgm8 +speckle only", mk(spk), L, iters)
    chain_time("sgm8 full", mk(cfg), L, iters)


if __name__ == "__main__":
    main()
