"""A/B volume-transpose strategies at the flagship shape.

The SGM pipeline pays two (Hp, D, W1) <-> (W1, D, Hp) int16 transposes per
frame (~1.7ms each measured vs a 0.53ms r+w bandwidth floor). Candidates:
  * xla-i16:   jnp.transpose on the int16 volume (current production)
  * xla-i32:   bitcast adjacent W1-lane pairs to int32, transpose the
               (A, D, B/2) int32 volume (half the elements; consumers
               unpack two columns per int32 -- ~1 extra op per column)
  * pallas:    the tiled vol_transpose kernel (RTDM_PALLAS_TRANSPOSE=1)

Usage: python tools/probe_transpose.py [WxH] [D] [iters]
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
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/rt_depth_map_tpu/jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    size = sys.argv[1] if len(sys.argv) > 1 else "1280x720"
    W, H = (int(v) for v in size.split("x"))
    D = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 24
    W1 = W - D
    Hp = -(-H // 128) * 128

    rng = np.random.default_rng(0)
    C = jnp.asarray(rng.integers(0, 4725, (Hp, D, W1)), jnp.int16)

    def chain(name, step, x0):
        f = jax.jit(step)
        fin = jax.jit(lambda x: x.astype(jnp.float32).sum())
        t0 = time.perf_counter()
        x = f(x0)
        _ = np.asarray(fin(x))
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            x = f(x)
        _ = np.asarray(fin(x))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:<34} compile={c:6.1f}s  run={dt * 1e3:8.2f}ms",
              flush=True)

    def xla_i16(x):
        # forward + back (the per-frame pair), xor keeps the chain honest
        t = jnp.transpose(x, (2, 1, 0))
        return jnp.transpose(t, (2, 1, 0)) ^ jnp.int16(1)

    def xla_i32(x):
        p = jax.lax.bitcast_convert_type(
            x.reshape(Hp, D, W1 // 2, 2), jnp.int32)
        t = jnp.transpose(p, (2, 1, 0))
        b = jnp.transpose(t, (2, 1, 0))
        back = jax.lax.bitcast_convert_type(b, jnp.int16).reshape(
            Hp, D, W1)
        return back ^ jnp.int16(1)

    chain("xla transpose pair int16", xla_i16, C)
    chain("xla transpose pair int32-paired", xla_i32, C)

    os.environ["RTDM_PALLAS_TRANSPOSE"] = "1"
    from rt_depth_map_tpu.ops.pallas.vol_transpose import vol_transpose

    def pallas_t(x):
        t = vol_transpose(x)
        return vol_transpose(t) ^ jnp.int16(1)

    chain("pallas vol_transpose pair int16", pallas_t, C)
    os.environ.pop("RTDM_PALLAS_TRANSPOSE")


if __name__ == "__main__":
    main()
