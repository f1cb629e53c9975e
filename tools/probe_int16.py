"""HISTORICAL (round 4): A/B of the int16-carry variant of the
bidirectional SGM kernels. RTDM_INT16_CARRY was RETIRED in round 5
(_carry_dtype always returns int32: elementwise int16 min no longer
legalizes on hardware -- HARVEST_R5 section 14), so both arms of this
probe now measure the identical int32 path.

Usage: python tools/probe_int16.py [WxH] [D] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    _plat = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if _plat:
        jax.config.update("jax_platforms", _plat)
    cache = os.path.expanduser("~/.cache/rt_depth_map_tpu/jax")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    size = sys.argv[1] if len(sys.argv) > 1 else "1280x720"
    W, H = (int(v) for v in size.split("x"))
    D = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    W1 = W - D
    Hp = -(-H // 128) * 128

    from rt_depth_map_tpu.ops.pallas.sgm_bidir import (
        sgm_horiz_bidir_dh, sgm_vert_bidir_wta_hdw,
    )

    rng = np.random.default_rng(0)
    C = jnp.asarray(rng.integers(0, 4725, (Hp, D, W1)), jnp.int16)
    Sh = jnp.asarray(rng.integers(0, 9450, (Hp, D, W1)), jnp.int16)
    Ct = jnp.asarray(rng.integers(0, 4725, (W1, D, Hp)), jnp.int16)
    p1, p2 = 600, 2400

    def chain(name, step, x0):
        f = jax.jit(step)
        fin = jax.jit(lambda x: jax.tree_util.tree_reduce(
            lambda a, b: a + b,
            jax.tree_util.tree_map(lambda v: v.sum().astype(jnp.float32),
                                   x)))
        t0 = time.perf_counter()
        x = f(x0)
        _ = np.asarray(fin(x))
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            x = f(x)
        _ = np.asarray(fin(x))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:<38} compile={c:6.1f}s  run={dt * 1e3:8.2f}ms",
              flush=True)

    def vert_step(state):
        Cx, Shx = state
        best, minS, dval, uniq = sgm_vert_bidir_wta_hdw(
            Cx, Shx, p1, p2, 10, true_h=H)
        return (Cx + ((jnp.sum(best) + jnp.sum(dval)) & 1).astype(Cx.dtype),
                Shx)

    def horiz_step(Ctx):
        out = sgm_horiz_bidir_dh(Ctx, p1, p2)
        return Ctx + (jnp.sum(out.astype(jnp.int32)) & 1).astype(Ctx.dtype)

    for flag in ("0", "1"):
        os.environ["RTDM_INT16_CARRY"] = flag
        tag = "int16" if flag == "1" else "int32"
        chain(f"vert+wta b1 {tag} carries", vert_step, (C, Sh))
        chain(f"hbidir b1 {tag} carries", horiz_step, Ct)


if __name__ == "__main__":
    main()
