"""Per-stage device timing of the BATCHED (multi-stream) pipeline.

Dissects the lane-stacked batch flow of ops/sgbm.py stereo_sgbm_batch plus
the engine's batched pre/post stages, with the chained-execution + single
final pull methodology of tools/profile_chain.py (the only timing that
survives the axon tunnel).

Usage: python tools/profile_batch_stages.py [B] [WxH] [D] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def chain_time(name, step, x0, iters=12):
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
    print(f"{name:<34} compile={compile_s:6.1f}s  run={dt * 1e3:9.2f}ms",
          flush=True)
    return dt


def main():
    import os

    _plat = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if _plat:
        jax.config.update("jax_platforms", _plat)
    # persistent compilation cache, same policy as bench.py: the batched
    # flagship modules cost minutes of XLA+Mosaic each; re-profiles reuse
    _cache = os.environ.get(
        "RTDM_COMPILE_CACHE",
        os.path.expanduser("~/.cache/rt_depth_map_tpu/jax"),
    )
    if _cache and _cache != "0":
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    size = sys.argv[2] if len(sys.argv) > 2 else "1280x720"
    W, H = (int(v) for v in size.split("x"))
    D = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 12

    from rt_depth_map_tpu.config import MatcherConfig
    from rt_depth_map_tpu.ops.pallas.sgm_bidir import (
        sgm_horiz_bidir_dh, sgm_vert_bidir_wta_hdw,
    )
    from rt_depth_map_tpu.ops.pallas.sgm_cost import sgm_cost_volume_pallas
    from rt_depth_map_tpu.ops.sgbm import stereo_sgbm_batch

    rng = np.random.default_rng(0)
    Ls = jnp.asarray(rng.integers(0, 256, (B, H, W), dtype=np.uint8))
    Rs = jnp.asarray(rng.integers(0, 256, (B, H, W), dtype=np.uint8))
    W1 = W - D
    Hp = -(-H // 128) * 128
    p1, p2 = 600, 2400

    cfg = MatcherConfig(kind="sgm", num_disparities=D, block_size=5,
                        num_paths=8, pre_filter_cap=0, backend="pallas")

    def perturb(img, scalar):
        return img ^ (scalar & 1).astype(jnp.uint8)

    # full batched matcher
    chain_time(
        f"sgm8 batch{B} full (/frame: /{B})",
        lambda l: perturb(
            Ls, jnp.sum(stereo_sgbm_batch(l, Rs, cfg).astype(jnp.int32))
        ),
        Ls, iters)

    # batched cost volume
    def cost_step(l):
        C, _, _ = sgm_cost_volume_pallas(
            l, Rs, D, 5, 0, layout="hdw", dtype=jnp.int16, out_h=Hp)
        return perturb(l, jnp.sum(C.astype(jnp.int32)))

    chain_time(f"cost batch{B} (one launch)", cost_step, Ls, iters)

    C0, _, _ = sgm_cost_volume_pallas(
        Ls, Rs, D, 5, 0, layout="hdw", dtype=jnp.int16, out_h=Hp)
    C0 = jax.block_until_ready(C0)

    # transpose to x-major (4-D view) and back
    def tA(C):
        Ct = jnp.transpose(C.reshape(Hp, D, B, W1), (3, 1, 2, 0))
        return Ct.reshape(W1, D, B * Hp)

    def tB(Ct):
        Sh = jnp.transpose(Ct.reshape(W1, D, B, Hp), (3, 1, 2, 0))
        return Sh.reshape(Hp, D, B * W1)

    chain_time(f"transpose A batch{B}",
               lambda C: tB(tA(C))[:, :, ::1], C0, iters)

    Ct0 = jax.block_until_ready(tA(C0))

    chain_time(f"hbidir batch{B} (H-lane stacked)",
               lambda Ct: sgm_horiz_bidir_dh(Ct, p1, p2), Ct0, iters)

    Sh0 = jax.block_until_ready(tB(sgm_horiz_bidir_dh(Ct0, p1, p2)))

    # NOTE: big planes must be ARGS of the chained step, never closure
    # captures -- a jit-captured 900MB constant is serialized into the
    # compile payload and kills the tunnel compile helper (broken pipe).
    def vert_step(state):
        C, Sh = state
        best, minS, dval, uniq = sgm_vert_bidir_wta_hdw(
            C, Sh, p1, p2, 10, true_h=H, seg=W1)
        return (C + ((jnp.sum(best) + jnp.sum(dval)) & 1).astype(C.dtype),
                Sh)

    import os as _os

    def vert_step_nomask(state):
        # PERF CONTROL ONLY (wrong across frame borders): the stacked
        # launch without the seg border masks -- isolates the mask cost
        C, Sh = state
        best, minS, dval, uniq = sgm_vert_bidir_wta_hdw(
            C, Sh, p1, p2, 10, true_h=H)
        return (C + ((jnp.sum(best) + jnp.sum(dval)) & 1).astype(C.dtype),
                Sh)

    for kb in (None, "1", "2"):
        if kb is None:
            _os.environ.pop("RTDM_VBIDIR_KB", None)
            tag = "auto"
        else:
            _os.environ["RTDM_VBIDIR_KB"] = kb
            tag = f"KB={kb}"
        chain_time(f"vert+wta batch{B} stacked {tag}", vert_step, (C0, Sh0),
                   iters)
    chain_time(f"vert+wta batch{B} NOMASK (perf ctl)", vert_step_nomask,
               (C0, Sh0), iters)
    _os.environ.pop("RTDM_VBIDIR_KB", None)

    # single-frame vert for comparison
    C1 = jax.block_until_ready(C0[:, :, :W1])
    Sh1 = jax.block_until_ready(Sh0[:, :, :W1])

    def vert1(state):
        C, Sh = state
        best, minS, dval, uniq = sgm_vert_bidir_wta_hdw(
            C, Sh, p1, p2, 10, true_h=H)
        return (C + ((jnp.sum(best) + jnp.sum(dval)) & 1).astype(C.dtype),
                Sh)

    chain_time("vert+wta single frame", vert1, (C1, Sh1), iters)

    # batched LR + per-frame speckle (the remaining post stages)
    from rt_depth_map_tpu.ops.sgbm import _lr_check_sgbm
    from rt_depth_map_tpu.ops.speckle import filter_speckles

    best0, minS0, dval0, uniq0 = sgm_vert_bidir_wta_hdw(
        C0, Sh0, p1, p2, 10, true_h=H, seg=W1)
    dispb = jnp.full((B, H, W), -16, jnp.int16)
    disp1 = (dval0.reshape(H, B, W1).transpose(1, 0, 2)).astype(jnp.int16)
    dispb = jax.lax.dynamic_update_slice(dispb, disp1, (0, 0, D))
    bestb = best0.reshape(H, B, W1).transpose(1, 0, 2)
    minSb = minS0.reshape(H, B, W1).transpose(1, 0, 2)
    dispb, bestb, minSb = jax.block_until_ready((dispb, bestb, minSb))

    def lr_step(state):
        d, be, mi = state
        out = _lr_check_sgbm(
            d.reshape(B * H, W), be.reshape(B * H, W1),
            mi.reshape(B * H, W1), D, W1, 0, D, 1, use_pallas=True,
        ).reshape(B, H, W)
        return (d ^ (jnp.sum(out.astype(jnp.int32)) & 1).astype(jnp.int16),
                be, mi)

    chain_time(f"LR batch{B} (row-stacked)", lr_step, (dispb, bestb, minSb),
               iters)

    def speckle_step(d):
        outs = jnp.stack([
            filter_speckles(d[i], -16, 100, 32 * 16) for i in range(B)
        ])
        return d ^ (jnp.sum(outs.astype(jnp.int32)) & 1).astype(jnp.int16)

    chain_time(f"speckle x{B} (per-frame)", speckle_step, dispb, iters)


if __name__ == "__main__":
    main()
