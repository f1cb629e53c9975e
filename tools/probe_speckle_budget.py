"""Isolate every sub-cost of speckle+detect at 720p on real TPU.

All numbers include the ~2.8ms per-launch tunnel floor (measure the noop
line first and subtract). Targets (VERDICT round 3 item 2): speckle +
detect <= 5ms combined inside the frame program.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from rt_depth_map_tpu.config import MatcherConfig
from rt_depth_map_tpu.ops.cc import (
    component_sizes,
    connected_components_bbox,
    connected_components_scan,
)
from rt_depth_map_tpu.ops.detect import detect_objects
from rt_depth_map_tpu.ops.pallas.histogram import label_histogram_pallas
from rt_depth_map_tpu.ops.sgbm import stereo_sgbm
from rt_depth_map_tpu.ops.speckle import filter_speckles
from rt_depth_map_tpu.sources import SyntheticStereoSource


def chain_time(name, step, x0, iters=12):
    f = jax.jit(step)
    t0 = time.perf_counter()
    x = f(x0)
    _ = np.asarray(jax.tree_util.tree_leaves(x)[0].sum())
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        x = f(x)
    _ = np.asarray(jax.tree_util.tree_leaves(x)[0].sum())
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:<34} compile={compile_s:6.1f}s  run={dt * 1e3:9.2f}ms",
          flush=True)
    return dt


def main():
    W, H, D = 1280, 720, 128
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    src = SyntheticStereoSource(W, H, seed=0)
    fl, frt = src.grab()
    L = jnp.asarray(fl.array[..., 0])
    R = jnp.asarray(frt.array[..., 0])
    nop = MatcherConfig(kind="sgm", num_disparities=D, block_size=5,
                        num_paths=8, pre_filter_cap=0, backend="pallas",
                        speckle_window_size=0, disp12_max_diff=-1)
    disp0 = stereo_sgbm(L, R, nop)
    jax.block_until_ready(disp0)
    md = 32 * 16

    chain_time("noop (launch floor)", lambda d: d + 1, disp0, iters)

    active = disp0 != -16
    labels0 = connected_components_scan(disp0, active, jnp.int32(md), 4)
    labels0 = jax.block_until_ready(labels0)

    def hist_step(lab):
        h = label_histogram_pallas(lab, active)
        return lab + (h[0, 0] & 1)

    chain_time("mxu histogram only", hist_step, labels0, iters)

    def labels_step(d):
        lab = connected_components_scan(d, d != -16, jnp.int32(md), 4)
        return d ^ (lab[0, 0] & 1).astype(jnp.int16)

    chain_time("labels propagation only", labels_step, disp0, iters)

    def sizes_step(d):
        s = component_sizes(labels0, d != -16, values=d, max_diff=md,
                            connectivity=4)
        return d ^ (s[0, 0] & 1).astype(jnp.int16)

    chain_time("component_sizes (hist+readback)", sizes_step, disp0, iters)

    def speckle_step(d):
        out = filter_speckles(d, -16, 100, md)
        return d ^ (jnp.sum(out.astype(jnp.int32)) & 1).astype(jnp.int16)

    chain_time("filter_speckles e2e", speckle_step, disp0, iters)

    rng = np.random.default_rng(1)
    blobs = np.zeros((H, W), np.uint8)
    yy, xx = np.mgrid[0:H, 0:W]
    for _ in range(12):
        cy, cx = rng.integers(40, H - 40), rng.integers(40, W - 40)
        ry, rx = rng.integers(8, 60), rng.integers(8, 60)
        blobs |= ((yy - cy) ** 2 / ry**2 + (xx - cx) ** 2 / rx**2 < 1
                  ).astype(np.uint8)
    mask = jnp.asarray(blobs)

    def bbox_step(m):
        lab, mx, mnx, mxx = connected_components_bbox(m != 0, 8)
        return m ^ ((lab[0, 0] + mx[0, 0] + mnx[0, 0] + mxx[0, 0]) & 1
                    ).astype(jnp.uint8)

    chain_time("cc_bbox (4-field propagation)", bbox_step, mask, iters)

    def detect_step(m):
        b = detect_objects(m, 100, 16)
        return m ^ (jnp.sum(b) & 1).astype(jnp.uint8)

    chain_time("detect_objects e2e", detect_step, mask, iters)


if __name__ == "__main__":
    main()
