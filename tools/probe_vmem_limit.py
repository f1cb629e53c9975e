"""Probe: what scoped-VMEM scratch actually compiles on this rig?

Round-3 evidence conflicts: the hbidir kernel compiled with ~53MB of
scratch at the stacked batch-4 720p shape (vmem_limit_bytes=100M), while
the cost kernel died at 17.66MB "limit 16.00M" at the 1080p/D=256 stretch
point (vmem_limit_bytes=37M). This measures which kernel/limit
combinations the AOT helper accepts, so the block-size budgets in the
kernel wrappers can be set to facts instead of folklore.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp


def try_compile(name, fn, *args):
    try:
        jax.jit(fn).lower(*args).compile()
        print(f"PROBE {name}: COMPILE OK", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " | ")[:240]
        print(f"PROBE {name}: FAIL {type(e).__name__}: {msg}", flush=True)
        return False


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "cost20"):
        # stretch-point cost kernel, R=20 -> 17.66MB scratch (round-3 OOM)
        import os

        os.environ["RTDM_COST_R"] = "20"
        from rt_depth_map_tpu.ops.pallas.sgm_cost import sgm_cost_volume_pallas

        L = jnp.zeros((1080, 1920), jnp.uint8)
        try_compile(
            "cost stretch R=20 (17.7M scratch)",
            lambda l, r: sgm_cost_volume_pallas(l, r, 256, 5, 31,
                                                layout="hdw",
                                                dtype=jnp.int16)[0],
            L, L,
        )
        del os.environ["RTDM_COST_R"]

    if which in ("all", "cost8"):
        import os

        os.environ["RTDM_COST_R"] = "8"
        from rt_depth_map_tpu.ops.pallas.sgm_cost import sgm_cost_volume_pallas

        L = jnp.zeros((1080, 1920), jnp.uint8)
        try_compile(
            "cost stretch R=8 (7.8M scratch)",
            lambda l, r: sgm_cost_volume_pallas(l, r, 256, 5, 31,
                                                layout="hdw",
                                                dtype=jnp.int16)[0],
            L, L,
        )
        del os.environ["RTDM_COST_R"]

    if which in ("all", "hbidir4"):
        # the b4-stacked horizontal bidir shape: KB=8 -> ~53M scratch
        import os

        os.environ["RTDM_HBIDIR_KB"] = "8"
        from rt_depth_map_tpu.ops.pallas.sgm_bidir import sgm_horiz_bidir_dh

        Ct = jnp.zeros((1152, 128, 4 * 768), jnp.int16)
        try_compile(
            "hbidir b4-stacked KB=8 (53M scratch)",
            lambda c: sgm_horiz_bidir_dh(c, 600, 2400),
            Ct,
        )
        del os.environ["RTDM_HBIDIR_KB"]

    if which in ("all", "hdh8"):
        # stretch-point non-bidir horizontal pass, KB=8 -> 28.3M scratch,
        # NO vmem_limit_bytes set in the wrapper
        from rt_depth_map_tpu.ops.pallas.sgm_hdw import sgm_horiz_pass_dh

        Ct = jnp.zeros((1664, 256, 1080), jnp.int16)
        try_compile(
            "horiz_dh stretch KB=8 (28M scratch, no limit set)",
            lambda c: sgm_horiz_pass_dh(c, 600, 2400),
            Ct,
        )


if __name__ == "__main__":
    main()
