"""Isolate where the SGM cost-volume kernel's time goes (tools analog of
scratch_pass_floor.py, for the cost kernel).

Variants of sgm_cost_volume_pallas(_variant=...) at the flagship shape:
  null  loop + stripe DMA structure only (no compute)
  bt    + Birchfield-Tomasi pixel cost (no window sums)
  bth   + horizontal replicate-border window (VPU rolls)
  full  + vertical window = production
  mxuh  horizontal window as ONE int8 MXU banded-matrix dot instead of
        the VPU rolls (bit-exact to full; graduates to production if it
        measures faster)

Chained timing per tools/profile_chain.py methodology (the axon tunnel
lies to block_until_ready; one dependent scalar pull at the end).

Usage: python tools/cost_floor.py [variants...] [-- WxH D]
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from rt_depth_map_tpu.ops.pallas.sgm_cost import sgm_cost_volume_pallas


def run(variant, W, H, D, iters=12):
    interp = jax.default_backend() == "cpu"

    def step(l, r):
        C, _, _ = sgm_cost_volume_pallas(
            l, r, D, 5, 0, layout="hdw", dtype=jnp.int16,
            interpret=interp, _variant=variant,
        )
        # fold the volume into a 1-bit perturbation of the inputs so
        # iterations chain (device executions serialize, nothing elided)
        h = (jnp.sum(C.astype(jnp.int32)) & 1).astype(jnp.uint8)
        return l ^ h, r ^ h

    f = jax.jit(step)
    rng = np.random.default_rng(0)
    l = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))
    r = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))

    t0 = time.perf_counter()
    l1, r1 = f(l, r)
    _ = np.asarray(l1.astype(jnp.int32).sum())
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    x, y = l, r
    for _ in range(iters):
        x, y = f(x, y)
    _ = np.asarray(x.astype(jnp.int32).sum())  # completion barrier
    dt = (time.perf_counter() - t0) / iters
    print(f"{variant:<5} compile={comp:6.1f}s  run={dt * 1e3:7.2f}ms",
          flush=True)
    return dt


def check_mxuh_exact(W=576, H=64, D=64):
    """Interpret-mode bit-exactness of the mxuh variant vs production."""
    rng = np.random.default_rng(1)
    l = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))
    r = jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8))
    a, _, _ = sgm_cost_volume_pallas(l, r, D, 5, 0, layout="hdw",
                                     dtype=jnp.int16, interpret=True)
    b, _, _ = sgm_cost_volume_pallas(l, r, D, 5, 0, layout="hdw",
                                     dtype=jnp.int16, interpret=True,
                                     _variant="mxuh")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    print("mxuh bit-exact vs full (interpret mode) ok", flush=True)


def main():
    _plat = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if _plat:  # sitecustomize may have config-forced a PJRT plugin
        jax.config.update("jax_platforms", _plat)
    args = sys.argv[1:]
    W, H = 1280, 720
    D = 128
    if "--" in args:
        i = args.index("--")
        tail = args[i + 1:]
        args = args[:i]
        if tail:
            W, H = (int(v) for v in tail[0].split("x"))
        if len(tail) > 1:
            D = int(tail[1])
    variants = args or ["null", "bt", "bth", "full", "mxuh"]
    if "check" in variants:
        check_mxuh_exact()
        variants.remove("check")
    for v in variants:
        run(v, W, H, D)


if __name__ == "__main__":
    main()
