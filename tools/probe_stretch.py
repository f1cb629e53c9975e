"""Stretch-cell dissection: the PRODUCTION matcher chain at 1920x1080
D=256, with and without the round-5 H-pad-to-bidir route, plus the
production per-pass timings (chained methodology, profile_chain.py).

Usage: python tools/probe_stretch.py [iters]
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

from rt_depth_map_tpu.config import MatcherConfig  # noqa: E402
from rt_depth_map_tpu.ops.sgbm import stereo_sgbm  # noqa: E402
from rt_depth_map_tpu.ops.pallas.sgm_cost import sgm_cost_volume_pallas  # noqa: E402
from rt_depth_map_tpu.ops.pallas.sgm_bidir import (  # noqa: E402
    sgm_horiz_bidir_dh,
    sgm_vert_bidir_wta_hdw,
)
from rt_depth_map_tpu.ops.pallas.vol_transpose import vol_transpose  # noqa: E402


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
    print(f"{name:<38} compile={cs:6.1f}s run={dt * 1e3:9.2f}ms", flush=True)
    return dt


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    W, H, D = 1920, 1080, 256
    rng = np.random.default_rng(0)
    L = jnp.asarray(rng.integers(0, 256, (H, W), np.uint8))
    R = jnp.asarray(rng.integers(0, 256, (H, W), np.uint8))
    kw = dict(kind="sgm", num_disparities=D, block_size=5, num_paths=8,
              pre_filter_cap=0, backend="pallas", uniqueness_ratio=10,
              speckle_window_size=100, speckle_range=32, disp12_max_diff=1)

    def matcher_step(c):
        def step(l):
            out = stereo_sgbm(l, R, c)
            h = (jnp.sum(out.astype(jnp.int32)) & 1).astype(jnp.uint8)
            return l ^ h
        return step

    if os.environ.get("RTDM_SKIP_FULL", "") in ("", "0"):
        cfg = MatcherConfig(**kw)
        os.environ["RTDM_NO_PAD_FIT"] = "1"
        chain("matcher strict (chained vert, r4)", matcher_step(cfg), L,
              iters)
        os.environ["RTDM_NO_PAD_FIT"] = "0"
        cfg2 = MatcherConfig(**kw)  # distinct cfg -> distinct jit entry
        chain("matcher H-pad bidir (r5)", matcher_step(cfg2), L, iters)

    # Per-pass dissection via CUMULATIVE compositions chained on the
    # IMAGES (differences give per-stage cost): chaining on the ~1GB
    # materialized volumes directly measured seconds of allocator/
    # transfer churn instead of kernel time -- volumes must stay
    # jit-internal at this scale.
    Hq = 1088
    Lq = jnp.asarray(rng.integers(0, 256, (Hq, W), np.uint8))
    Rq = jnp.asarray(rng.integers(0, 256, (Hq, W), np.uint8))
    Hp = -(-Hq // 128) * 128

    def upto(stage):
        def step(l):
            C, _, _ = sgm_cost_volume_pallas(l, Rq, D, 5, 0, layout="hdw",
                                             dtype=jnp.int16, out_h=Hp)
            out = C
            if stage >= 1:
                out = vol_transpose(C)          # (W1, D, Hp)
            if stage >= 2:
                out = sgm_horiz_bidir_dh(out, 600, 2400)
            if stage >= 3:
                out = vol_transpose(out)        # (Hp, D, W1)
            if stage >= 4:
                b, m, dv, u = sgm_vert_bidir_wta_hdw(
                    C, out, 600, 2400, 10, true_h=Hq)
                out = b
            return l ^ (jnp.sum(out.astype(jnp.int32)) & 1
                        ).astype(jnp.uint8)
        return step

    names = ["cost only", "+ transpose 1", "+ horiz bidir",
             "+ transpose 2", "+ vert bidir/WTA"]
    for s, name in enumerate(names):
        chain(f"  cum {name}", upto(s), Lq, iters)


if __name__ == "__main__":
    main()
