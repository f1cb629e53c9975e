"""Microbenchmark: where does the CC sweep's 3.9ms/round go?

One convergence round is ~42 doubling steps x ~8 plane-ops at 720p; the
VPU floor for that is ~0.1ms, measured is ~3.9ms. Candidates: dynamic
pltpu.roll lowering (lane vs sublane), fori_loop per-iteration overhead,
or the where/select chains. Each variant below runs the same 42-step loop
shape with one ingredient swapped.
"""
import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 720, 1280
STEPS = 42


def _time(name, fn, x0, iters=20):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    x = f(x0)
    _ = np.asarray(x.sum())
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        x = f(x)
    _ = np.asarray(x.sum())
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:<34} compile={compile_s:5.1f}s  run={dt * 1e3:8.3f}ms",
          flush=True)
    return dt


def _mk(body_fn):
    def kernel(x_ref, o_ref):
        o_ref[...] = body_fn(x_ref[...])

    def call(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
        )(x)
    return call


def body_noop(x):
    return x + 1


def body_elementwise(x):
    def step(i, m):
        return jnp.minimum(m + 1, m * 2 - i)
    return jax.lax.fori_loop(0, STEPS, step, x)


def body_elementwise_u8(x):
    def step(i, m):
        return jnp.minimum(m + 1, m * 2 - i)
    return jax.lax.fori_loop(0, STEPS, step, x, unroll=8)


def body_full_step_dyn_u4(x):
    pos = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    s0 = (x & 7) == 0

    def step(i, carry):
        m, s = carry
        d = jax.lax.shift_left(jnp.int32(1), i % 11)
        mask = pos < d
        mm = jnp.where(mask, 2**30, pltpu.roll(m, d, axis=1))
        ss = jnp.where(mask, 1, pltpu.roll(s, d, axis=1))
        m = jnp.where(s > 0, m, jnp.minimum(m, mm))
        s = jnp.maximum(s, ss)
        return m, s

    m, _ = jax.lax.fori_loop(0, STEPS, step, (x, s0.astype(jnp.int32)),
                             unroll=4)
    return m


def body_full_step_dyn_u8(x):
    pos = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    s0 = (x & 7) == 0

    def step(i, carry):
        m, s = carry
        d = jax.lax.shift_left(jnp.int32(1), i % 11)
        mask = pos < d
        mm = jnp.where(mask, 2**30, pltpu.roll(m, d, axis=1))
        ss = jnp.where(mask, 1, pltpu.roll(s, d, axis=1))
        m = jnp.where(s > 0, m, jnp.minimum(m, mm))
        s = jnp.maximum(s, ss)
        return m, s

    m, _ = jax.lax.fori_loop(0, STEPS, step, (x, s0.astype(jnp.int32)),
                             unroll=8)
    return m


def body_dynroll_lane(x):
    def step(i, m):
        d = jax.lax.shift_left(jnp.int32(1), i % 11)
        return jnp.minimum(m, pltpu.roll(m, d, axis=1) + 1)
    return jax.lax.fori_loop(0, STEPS, step, x)


def body_dynroll_sub(x):
    def step(i, m):
        d = jax.lax.shift_left(jnp.int32(1), i % 9)
        return jnp.minimum(m, pltpu.roll(m, d, axis=0) + 1)
    return jax.lax.fori_loop(0, STEPS, step, x)


def body_staticroll_lane(x):
    m = x
    for i in range(STEPS):
        m = jnp.minimum(m, pltpu.roll(m, 1 << (i % 11), axis=1) + 1)
    return m


def body_staticroll_sub(x):
    m = x
    for i in range(STEPS):
        m = jnp.minimum(m, pltpu.roll(m, 1 << (i % 9), axis=0) + 1)
    return m


def body_full_step_dyn(x):
    """The real seg-min step shape: 2 dyn rolls + mask + selects (lane)."""
    pos = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    s0 = (x & 7) == 0

    def step(i, carry):
        m, s = carry
        d = jax.lax.shift_left(jnp.int32(1), i % 11)
        mask = pos < d
        mm = jnp.where(mask, 2**30, pltpu.roll(m, d, axis=1))
        ss = jnp.where(mask, 1, pltpu.roll(s, d, axis=1))
        m = jnp.where(s > 0, m, jnp.minimum(m, mm))
        s = jnp.maximum(s, ss)
        return m, s

    m, _ = jax.lax.fori_loop(0, STEPS, step,
                             (x, s0.astype(jnp.int32)))
    return m


def main():
    which = sys.argv[1:] or ["all"]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 20, (H, W)), jnp.int32)
    variants = [
        ("noop (launch floor)", body_noop),
        ("elementwise fori x42", body_elementwise),
        ("elementwise fori x42 unroll8", body_elementwise_u8),
        ("dyn roll lane fori x42", body_dynroll_lane),
        ("dyn roll sublane fori x42", body_dynroll_sub),
        ("static roll lane unrolled x42", body_staticroll_lane),
        ("static roll sublane unrolled x42", body_staticroll_sub),
        ("full seg-min step (lane) x42", body_full_step_dyn),
        ("full seg-min (lane) x42 unroll4", body_full_step_dyn_u4),
        ("full seg-min (lane) x42 unroll8", body_full_step_dyn_u8),
    ]
    for name, body in variants:
        if which != ["all"] and not any(w in name for w in which):
            continue
        _time(name, _mk(body), x)


if __name__ == "__main__":
    main()
