"""Dispatch-amortized timing: K reps of a step inside ONE jit via fori_loop.

The chained-call methodology (tools/profile_chain.py) pays ~2-3ms of axon
tunnel dispatch overhead PER CALL, which drowns sub-5ms kernels (measured:
a (8,128) x+1 chains at 1.9-3.3ms/call while the same op inside fori_loop
runs at ~0.13ms). Folding K reps into one jitted fori_loop amortizes the
dispatch to nothing; a data dependency between reps (the `perturb` fold)
keeps XLA from collapsing the loop.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def loop_time(name, step, x0, K=16, outer=3, quiet=False):
    """Per-rep seconds for `step` (x -> x-like) amortized over K reps/jit."""

    def body(i, x):
        return step(x)

    f = jax.jit(lambda x: jax.lax.fori_loop(0, K, body, x))
    fin = jax.jit(lambda x: jax.tree_util.tree_reduce(
        lambda a, b: a + b,
        jax.tree_util.tree_map(lambda v: v.sum().astype(jnp.float32), x)))
    t0 = time.perf_counter()
    x = f(x0)
    _ = np.asarray(fin(x))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(outer):
        x = f(x)
    _ = np.asarray(fin(x))
    dt = (time.perf_counter() - t0 - 0.003) / (outer * K)
    if not quiet:
        print(f"{name:<34} compile={compile_s:6.1f}s  run={dt * 1e3:9.3f}ms",
              flush=True)
    return dt


def perturb(x, out):
    """Fold a parity bit of `out` into `x` — creates the rep-to-rep data
    dependency without changing values (h is always 0 or 1; x ^ h ^ h...
    stays in-distribution for the uint8/int16 inputs used here)."""
    h = jax.tree_util.tree_reduce(
        lambda a, b: a + b,
        jax.tree_util.tree_map(lambda v: v.sum().astype(jnp.int32), out))
    return x ^ (h & 1).astype(x.dtype)
