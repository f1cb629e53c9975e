"""Sweep the fused-kernel DMA block sizes (RTDM_HBIDIR_KB / RTDM_VBIDIR_KB)
at the flagship shape and print the fastest setting for this hardware.

The knobs are read at trace time (ops/pallas/sgm_bidir.py), so each setting
is timed with a freshly traced jit. Chained-execution methodology as in
tools/profile_chain.py (axon tunnel: block_until_ready is untrustworthy,
one dependent pull at the end).

Usage: python tools/tune_kb.py [WxH] [D] [iters]
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from rt_depth_map_tpu.ops.pallas.sgm_bidir import (
    sgm_horiz_bidir_dh,
    sgm_vert_bidir_wta_hdw,
)
from rt_depth_map_tpu.ops.pallas.sgm_cost import sgm_cost_volume_pallas


def chain_time(step, x0, iters):
    f = jax.jit(step)
    fin = jax.jit(lambda x: jax.tree_util.tree_reduce(
        lambda a, b: a + b,
        jax.tree_util.tree_map(lambda v: v.sum().astype(jnp.float32), x)))
    x = f(x0)
    _ = np.asarray(fin(x))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        x = f(x)
    _ = np.asarray(fin(x))
    return (time.perf_counter() - t0) / iters


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "1280x720"
    W, H = (int(v) for v in size.split("x"))
    D = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    P1, P2 = 600, 2400

    rng = np.random.default_rng(0)
    L = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))
    R = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))
    C, _, _ = sgm_cost_volume_pallas(L, R, D, 5, 0, layout="hdw",
                                     dtype=jnp.int16)
    W1 = C.shape[2]
    H_pad = -(-H // 128) * 128
    Ct = jnp.pad(jnp.transpose(C, (2, 1, 0)), ((0, 0), (0, 0),
                                               (0, H_pad - H)))
    Sh = jnp.transpose(sgm_horiz_bidir_dh(Ct, P1, P2), (2, 1, 0))[:H]
    jax.block_until_ready((C, Ct, Sh))

    def perturb16(x, out):
        h = (jnp.sum(out.astype(jnp.int32)) & 1).astype(x.dtype)
        return x ^ h

    best_h, best_v = None, None

    print(f"shape {W}x{H} D={D} W1={W1} (times are ms/launch)", flush=True)
    results_h = {}
    # launches are fori-trip-overhead-bound (~20us/trip), so large blocks
    # matter most; the kernels' own fit clamp shrinks infeasible values
    for kb in (4, 8, 16, 32):
        if W1 % (2 * kb):
            continue
        os.environ["RTDM_HBIDIR_KB"] = str(kb)

        def h_step(ct):
            return perturb16(ct, sgm_horiz_bidir_dh(ct, P1, P2))

        try:
            dt = chain_time(h_step, Ct, iters)
        except Exception as e:  # noqa: BLE001 -- report and keep sweeping
            print(f"  hbidir KB={kb}: FAILED {type(e).__name__}: {e}",
                  flush=True)
            continue
        results_h[kb] = dt
        print(f"  hbidir KB={kb}: {dt * 1e3:8.2f}", flush=True)
    if results_h:
        best_h = min(results_h, key=results_h.get)

    from rt_depth_map_tpu.ops.pallas.sgm_bidir import vbidir_vmem_bytes

    results_v = {}
    for kb in (2, 4, 8):
        if 8 % kb or H % (2 * kb):
            continue
        need = vbidir_vmem_bytes(H, W1, D, kb, 2)
        if need > 88 * 2**20:
            # would OOM the kernel's raised 100M scoped-vmem budget; a
            # failing compile costs ~40s of harvest for a known answer
            print(f"  vbidir KB={kb}: skipped (needs {need / 2**20:.1f}M "
                  f"scoped vmem > 88M)", flush=True)
            continue
        os.environ["RTDM_VBIDIR_KB"] = str(kb)

        def v_step(c):
            best, minS, dval, uniq = sgm_vert_bidir_wta_hdw(c, Sh, P1, P2, 10)
            return c ^ (best.sum() & 1).astype(c.dtype)

        try:
            dt = chain_time(v_step, C, iters)
        except Exception as e:  # noqa: BLE001
            print(f"  vbidir KB={kb}: FAILED {type(e).__name__}: {e}",
                  flush=True)
            continue
        results_v[kb] = dt
        print(f"  vbidir KB={kb}: {dt * 1e3:8.2f}", flush=True)
    if results_v:
        best_v = min(results_v, key=results_v.get)

    results_r = {}
    for r in (24, 20, 16, 12, 8):
        if H % r:
            continue
        os.environ["RTDM_COST_R"] = str(r)

        def c_step(lr):
            l, rr = lr
            c, _, _ = sgm_cost_volume_pallas(l, rr, D, 5, 0, layout="hdw",
                                             dtype=jnp.int16)
            h = (jnp.sum(c.astype(jnp.int32)) & 1).astype(jnp.uint8)
            return l ^ h, rr ^ h

        try:
            dt = chain_time(c_step, (L, R), iters)
        except Exception as e:  # noqa: BLE001
            print(f"  cost R={r}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        results_r[r] = dt
        print(f"  cost R={r}: {dt * 1e3:8.2f}", flush=True)
    del os.environ["RTDM_COST_R"]
    best_r = min(results_r, key=results_r.get) if results_r else None

    # BM kernel: stripe height x window variant (ops/pallas/bm_kernel.py)
    from rt_depth_map_tpu.ops.pallas.bm_kernel import bm_cost_wta
    from rt_depth_map_tpu.ops.prefilter import xsobel_prefilter

    lp = xsobel_prefilter(L, 31)
    rp = xsobel_prefilter(R, 31)
    jax.block_until_ready((lp, rp))
    results_bm = {}
    for var in ("full", "mxuh"):
        os.environ["RTDM_BM_VARIANT"] = var
        for r in (8, 16, 24, 48):
            if H % r:
                continue
            os.environ["RTDM_BM_R"] = str(r)

            def bm_step(lr):
                l, rr = lr
                outs = bm_cost_wta(l, rr, D, 13, pre_filter_cap=31)
                h = (sum(o.sum() for o in outs) & 1).astype(l.dtype)
                return l ^ h, rr ^ h

            try:
                dt = chain_time(bm_step, (lp, rp), iters)
            except Exception as e:  # noqa: BLE001
                print(f"  bm {var} R={r}: FAILED {type(e).__name__}: {e}",
                      flush=True)
                continue
            results_bm[(var, r)] = dt
            print(f"  bm {var} R={r}: {dt * 1e3:8.2f}", flush=True)
    del os.environ["RTDM_BM_VARIANT"], os.environ["RTDM_BM_R"]
    best_bm = min(results_bm, key=results_bm.get) if results_bm else (None,) * 2

    # LR-check kernel stripe height (ops/pallas/lr_resolve.py)
    from rt_depth_map_tpu.ops.bm import _lr_check

    disp16 = jnp.asarray(rng.integers(-16, 16 * D, (H, W)), jnp.int16)
    cost32 = jnp.asarray(rng.integers(0, 1 << 18, (H, W)), jnp.int32)
    results_lr = {}
    for r in (8, 16, 24, 48):
        if H % r:
            continue
        os.environ["RTDM_LR_R"] = str(r)

        def lr_step(d):
            out = _lr_check(d, cost32, 0, D, 1, use_pallas=True)
            return d ^ (jnp.sum(out.astype(jnp.int32)) & 1).astype(jnp.int16)

        try:
            dt = chain_time(lr_step, disp16, iters)
        except Exception as e:  # noqa: BLE001
            print(f"  lr R={r}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        results_lr[r] = dt
        print(f"  lr R={r}: {dt * 1e3:8.2f}", flush=True)
    del os.environ["RTDM_LR_R"]
    best_lr = min(results_lr, key=results_lr.get) if results_lr else None

    print(f"BEST: RTDM_HBIDIR_KB={best_h} RTDM_VBIDIR_KB={best_v} "
          f"RTDM_COST_R={best_r} RTDM_BM_VARIANT={best_bm[0]} "
          f"RTDM_BM_R={best_bm[1]} RTDM_LR_R={best_lr}", flush=True)


if __name__ == "__main__":
    main()
