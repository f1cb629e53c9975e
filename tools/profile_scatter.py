"""Measure speckle-size primitives on TPU: scatter-add histogram vs sort
vs gather read-back (chained methodology, see profile_chain.py)."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


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
    print(f"{name:<28} compile={compile_s:6.1f}s  run={dt * 1e3:9.2f}ms",
          flush=True)
    return dt


def main():
    H, W = 720, 1153
    N = H * W
    rng = np.random.default_rng(0)
    # realistic-ish labels: blocks of repeated values (components), min-index
    labels = np.repeat(rng.integers(0, N, N // 37), 37)[:N].astype(np.int32)
    labels = jnp.asarray(labels)

    def scatter_hist(lab):
        sizes = jnp.zeros(N, jnp.int32).at[lab].add(1)
        return lab ^ (sizes.sum() & 1)

    chain_time("scatter-add H*W bins", scatter_hist, labels)

    def scatter_hist16(lab):
        sizes = jnp.zeros(N, jnp.int16).at[lab].add(jnp.int16(1))
        return lab ^ (sizes.astype(jnp.int32).sum() & 1)

    chain_time("scatter-add int16 bins", scatter_hist16, labels)

    def sort_only(lab):
        s = jax.lax.sort(lab)
        return lab ^ (s[::997].sum() & 1)

    chain_time("sort keys", sort_only, labels)

    def sort_pair(lab):
        idx = jnp.arange(N, dtype=jnp.int32)
        s, si = jax.lax.sort((lab, idx), num_keys=1)
        return lab ^ ((s[::997].sum() + si[::997].sum()) & 1)

    chain_time("sort (label, idx)", sort_pair, labels)

    sizes0 = jnp.zeros(N, jnp.int32).at[labels].add(1)
    jax.block_until_ready(sizes0)

    def gather_back(lab):
        v = sizes0[lab]
        return lab ^ (v.sum() & 1)

    chain_time("gather sizes[labels]", gather_back, labels)

    # full filter_speckles on a realistic SGM-like disparity
    from rt_depth_map_tpu.ops.speckle import filter_speckles

    base = rng.integers(0, 80, (H // 8, W // 8)).astype(np.float32)
    disp = np.kron(base, np.ones((8, 8))).astype(np.int32)[:H, :W] * 16
    noise = rng.integers(0, 1000, (H, W))
    disp = np.where(noise < 30, -16, disp)  # sparse invalids
    disp = jnp.asarray(disp.astype(np.int16))

    def speckle_step(d):
        out = filter_speckles(d, -16, 100, 32 * 16)
        return d ^ (jnp.sum(out.astype(jnp.int32)) & 1).astype(jnp.int16)

    chain_time("filter_speckles blobs", speckle_step, disp)


if __name__ == "__main__":
    main()
