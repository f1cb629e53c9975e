"""Scratch: isolate the per-step cost floor of the streaming SGM passes.

Variants of the horizontal (D, H)-slab pass at 720p shapes:
  a) full recurrence (production _horiz_dh_kernel math)
  b) null compute: copy in->out, keep DMA structure (loop + DMA floor)
  c) math but NO carry dependency (carry never updated: measures the
     serial-dependency stall vs (a))
  d) int16 recurrence math (upcast-free; measures dtype throughput)
Chained timing per profile_chain.py methodology.
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rt_depth_map_tpu.ops.pallas.sgm_hdw import _sgm_step_hdw, MAX_COST

W1, D, H = 1152, 128, 768  # H padded to lane multiple as production does
KB = 8
P1, P2 = 200, 801


def make_kernel(variant):
    def kern(Ct_hbm, out_hbm, carry, crow, outb, in_sems, out_sems):
        nb = W1 // KB

        def c_dma(slot, b):
            return pltpu.make_async_copy(Ct_hbm.at[pl.ds(b * KB, KB)],
                                         crow.at[slot], in_sems.at[slot])

        def out_dma(slot, b):
            return pltpu.make_async_copy(outb.at[slot],
                                         out_hbm.at[pl.ds(b * KB, KB)],
                                         out_sems.at[slot])

        carry[...] = jnp.zeros((D, H), jnp.int32)
        c_dma(0, 0).start()

        def body(b, _):
            slot = b % 2

            @pl.when(b + 1 < nb)
            def _():
                c_dma(1 - slot, b + 1).start()

            c_dma(slot, b).wait()

            @pl.when(b >= 2)
            def _():
                out_dma(slot, b - 2).wait()

            for k in range(KB):
                if variant == "null":
                    outb[slot, k] = crow[slot, k]
                elif variant == "full":
                    L = _sgm_step_hdw(crow[slot, k].astype(jnp.int32),
                                      carry[...], P1, P2)
                    carry[...] = L
                    outb[slot, k] = L.astype(jnp.int16)
                elif variant == "nodep":
                    L = _sgm_step_hdw(crow[slot, k].astype(jnp.int32),
                                      carry[...], P1, P2)
                    outb[slot, k] = L.astype(jnp.int16)
                elif variant == "i16":
                    C = crow[slot, k]
                    Lp = carry[...].astype(jnp.int16)
                    # Mosaic can't reduce int16 ("Reductions over int16 not
                    # implemented"); reduce the i32 carry and cast after
                    minLp = jnp.min(carry[...], axis=0,
                                    keepdims=True).astype(jnp.int16)
                    lm = jnp.concatenate(
                        [jnp.full((1, H), jnp.int16(MAX_COST)), Lp[:-1]],
                        axis=0)
                    lp_ = jnp.concatenate(
                        [Lp[1:], jnp.full((1, H), jnp.int16(MAX_COST))],
                        axis=0)
                    delta = minLp + jnp.int16(P2)
                    m = jnp.minimum(jnp.minimum(Lp, lm + jnp.int16(P1)),
                                    jnp.minimum(lp_ + jnp.int16(P1), delta))
                    L = C + m - delta
                    carry[...] = L.astype(jnp.int32)
                    outb[slot, k] = L
            out_dma(slot, b).start()
            return 0

        jax.lax.fori_loop(0, nb, body, 0)
        if nb >= 2:
            out_dma((nb - 2) % 2, nb - 2).wait()
        out_dma((nb - 1) % 2, nb - 1).wait()

    return kern


def run(variant):
    f = pl.pallas_call(
        make_kernel(variant),
        out_shape=jax.ShapeDtypeStruct((W1, D, H), jnp.int16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((D, H), jnp.int32),
            pltpu.VMEM((2, KB, D, H), jnp.int16),
            pltpu.VMEM((2, KB, D, H), jnp.int16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    jf = jax.jit(lambda x: f(x))

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.integers(0, 3000, (W1, D, H)), jnp.int16)

    def chain(x):
        return jf(x)

    t0 = time.perf_counter()
    x = chain(x0)
    _ = np.asarray(x.astype(jnp.float32).sum())
    comp = time.perf_counter() - t0
    iters = 16
    t0 = time.perf_counter()
    for _ in range(iters):
        x = chain(x)
    _ = np.asarray(x.astype(jnp.float32).sum())
    dt = (time.perf_counter() - t0) / iters
    print(f"{variant:<6} compile={comp:5.1f}s  run={dt*1e3:7.2f}ms  "
          f"per-step={dt/W1*1e6:6.2f}us", flush=True)


if __name__ == "__main__":
    for v in (sys.argv[1:] or ["null", "nodep", "full", "i16"]):
        run(v)
