"""Go/no-go probe for the fused cost-into-aggregation design.

Measures the two fused bidirectional SGM kernels at the flagship shape
with and without RTDM_PROBE_BIDIR_WORK=N units of injected per-step
producer-like arithmetic (see sgm_bidir._probe_work: the op mix of an
in-kernel BT cost producer). If the injected work mostly HIDES in the
recurrences' dependency-stall bubbles, building the real fused kernels
(docs/PERF_ROADMAP.md) pays; if each unit costs its full arithmetic
time, the design loses to the standalone cost kernel and the round-5
perf budget must come from elsewhere.

Usage: python tools/probe_fused_hide.py [H W1 D iters]
Sweeps probe = 0, 1, 2 in-process (the env var is read at trace time,
and each (probe,) value produces a distinct jit cache entry via the
changed kernel body -- we re-set the env var before first trace of each
variant; shapes are identical so nothing else changes).
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

from rt_depth_map_tpu.ops.pallas.sgm_bidir import (  # noqa: E402
    sgm_horiz_bidir_dh,
    sgm_vert_bidir_wta_hdw,
)


def chain(step, x0, iters):
    f = jax.jit(step)
    fin = jax.jit(lambda t: sum(
        jnp.asarray(v).astype(jnp.float32).sum() for v in t))
    t0 = time.perf_counter()
    x = f(x0)
    _ = np.asarray(fin(x if isinstance(x, tuple) else (x,)))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        x = f(x if isinstance(x, tuple) else x)
    _ = np.asarray(fin(x if isinstance(x, tuple) else (x,)))
    return compile_s, (time.perf_counter() - t0) / iters


def main():
    H = int(sys.argv[1]) if len(sys.argv) > 1 else 720
    W1 = int(sys.argv[2]) if len(sys.argv) > 2 else 1152
    D = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    Hp = -(-H // 128) * 128
    rng = np.random.default_rng(0)
    Ct = jnp.asarray(rng.integers(0, 5000, (W1, D, Hp), np.int16))
    C = jnp.asarray(rng.integers(0, 5000, (Hp, D, W1), np.int16))
    Sp = jnp.asarray(rng.integers(0, 9000, (Hp, D, W1), np.int16))

    for probe in (0, 1, 2):
        os.environ["RTDM_PROBE_BIDIR_WORK"] = str(probe)

        def hstep(x, _p=probe):
            # consume + regenerate so iterations chain
            y = sgm_horiz_bidir_dh(x, 600, 2400)
            return (y & 0x3FFF).astype(jnp.int16)

        cs, dt = chain(hstep, Ct, iters)
        print(f"hbidir probe={probe}: compile={cs:6.1f}s run={dt*1e3:8.3f}ms",
              flush=True)

    for probe in (0, 1, 2):
        os.environ["RTDM_PROBE_BIDIR_WORK"] = str(probe)

        def vstep(args, _p=probe):
            c, s = args
            best, minS, dval, uniq = sgm_vert_bidir_wta_hdw(
                c, s, 600, 2400, 10, true_h=H)
            mix = (best + minS + dval + uniq)
            c2 = (c ^ mix[:1, :1].astype(jnp.int16)).astype(jnp.int16)
            return (c2, s)

        cs, dt = chain(vstep, (C, Sp), iters)
        print(f"vbidir probe={probe}: compile={cs:6.1f}s run={dt*1e3:8.3f}ms",
              flush=True)


if __name__ == "__main__":
    main()
