"""Bit-exactness of the lane-stacked multi-stream SGM batch path.

stereo_sgbm_batch (one batched cost launch, lane-stacked horizontal and
vertical recurrences with seg border masking, row-stacked LR) must be
bit-identical per frame to stereo_sgbm -- the contract that makes the
multi-stream mode (BASELINE.md row 4) a pure throughput optimization.

Runs the Pallas kernels in interpret mode on CPU (tests/conftest.py pins
JAX_PLATFORMS=cpu)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rt_depth_map_tpu.config import MatcherConfig
from rt_depth_map_tpu.ops.sgbm import stereo_sgbm, stereo_sgbm_batch


def _pairs(B, H, W, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (B, H, W + 24), dtype=np.uint8)
    lefts = base[:, :, 12 : 12 + W]
    # shifted + noisy right eyes: realistic disparities, per-frame distinct
    rights = np.stack(
        [np.roll(base[i, :, : W + 24], 3 + i, axis=1)[:, 12 : 12 + W]
         for i in range(B)]
    )
    return jnp.asarray(lefts), jnp.asarray(rights)


@pytest.mark.parametrize("B", [2, 3])
def test_batch_bit_identical_to_per_frame(B):
    H, D, W1 = 16, 16, 128
    W = W1 + D
    lefts, rights = _pairs(B, H, W)
    cfg = MatcherConfig(
        kind="sgm", num_disparities=D, block_size=5, num_paths=8,
        backend="pallas",
    )
    out_b = np.asarray(stereo_sgbm_batch(lefts, rights, cfg))
    for i in range(B):
        ref = np.asarray(stereo_sgbm(lefts[i], rights[i], cfg))
        np.testing.assert_array_equal(out_b[i], ref, err_msg=f"frame {i}")


def test_batched_cost_volume_lane_stacked():
    from rt_depth_map_tpu.ops.pallas.sgm_cost import sgm_cost_volume_pallas

    B, H, D, W1 = 2, 16, 16, 128
    W = W1 + D
    lefts, rights = _pairs(B, H, W, seed=1)
    Hp = -(-H // 128) * 128
    C, minX1, w1 = sgm_cost_volume_pallas(
        lefts, rights, D, 5, 0, layout="hdw", dtype=jnp.int16,
        interpret=True, out_h=Hp,
    )
    assert C.shape == (Hp, D, B * W1) and w1 == W1 and minX1 == D
    for i in range(B):
        Ci, _, _ = sgm_cost_volume_pallas(
            lefts[i], rights[i], D, 5, 0, layout="hdw", dtype=jnp.int16,
            interpret=True, out_h=Hp,
        )
        np.testing.assert_array_equal(
            np.asarray(C[:H, :, i * W1 : (i + 1) * W1]),
            np.asarray(Ci[:H]), err_msg=f"frame {i}",
        )


def test_vert_bidir_seg_masking_matches_per_frame():
    from rt_depth_map_tpu.ops.pallas.sgm_bidir import sgm_vert_bidir_wta_hdw

    rng = np.random.default_rng(2)
    B, H, D, W1 = 2, 16, 16, 128
    C = jnp.asarray(rng.integers(0, 3000, (B, H, D, W1)), jnp.int16)
    Sh = jnp.asarray(rng.integers(0, 6000, (B, H, D, W1)), jnp.int16)
    # lane-stack: (H, D, B*W1)
    Cs = jnp.concatenate([C[i] for i in range(B)], axis=2)
    Shs = jnp.concatenate([Sh[i] for i in range(B)], axis=2)
    outs = sgm_vert_bidir_wta_hdw(Cs, Shs, 600, 2400, 10, interpret=True,
                                  seg=W1)
    for i in range(B):
        ref = sgm_vert_bidir_wta_hdw(C[i], Sh[i], 600, 2400, 10,
                                     interpret=True)
        for o, r, name in zip(outs, ref, ("best", "minS", "dval", "uniq")):
            np.testing.assert_array_equal(
                np.asarray(o[:, i * W1 : (i + 1) * W1]), np.asarray(r),
                err_msg=f"frame {i} field {name}",
            )
