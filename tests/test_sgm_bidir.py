"""Fused bidirectional SGM kernels vs the chained single-direction passes.

The fused kernels must be BIT-exact: they run the same recurrence steps
(sgm_hdw._sgm_step_hdw / _three_dirs) in a different launch structure."""

import numpy as np
import jax.numpy as jnp
import pytest

from rt_depth_map_tpu.ops.pallas.sgm_hdw import (
    sgm_down_pass_hdw,
    sgm_final_wta_hdw,
    sgm_horiz_pass_dh,
)
from rt_depth_map_tpu.ops.pallas.sgm_bidir import (
    sgm_horiz_bidir_dh,
    sgm_vert_bidir_wta_hdw,
)

P1, P2 = 200, 801


def _cost(rng, H, D, W1, dtype):
    return jnp.asarray(rng.integers(0, 2300, (H, D, W1)), dtype)


@pytest.mark.parametrize("dtype", [jnp.int16, jnp.int32])
def test_horiz_bidir_matches_two_passes(rng, dtype):
    H, D, W1 = 32, 16, 128
    Ct = jnp.transpose(_cost(rng, H, D, W1, dtype), (2, 1, 0))
    hf = sgm_horiz_pass_dh(Ct, P1, P2, reverse=False, interpret=True)
    ref = sgm_horiz_pass_dh(Ct, P1, P2, reverse=True, partial=hf,
                            interpret=True)
    got = sgm_horiz_bidir_dh(Ct, P1, P2, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("dtype", [jnp.int16, jnp.int32])
def test_vert_bidir_wta_matches_down_plus_final(rng, dtype):
    H, D, W1 = 32, 16, 128
    C = _cost(rng, H, D, W1, dtype)
    Sh = _cost(rng, H, D, W1, dtype)  # stand-in horizontal partial
    Sa = sgm_down_pass_hdw(C, P1, P2, partial=Sh, interpret=True)
    ref = sgm_final_wta_hdw(C, Sa, P1, P2, 10, reverse=True, interpret=True)
    got = sgm_vert_bidir_wta_hdw(C, Sh, P1, P2, 10, interpret=True)
    for g, r, name in zip(got, ref, ("best", "minS", "dval", "uniq")):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r),
                                      err_msg=name)


@pytest.mark.parametrize("hkb,vkb", [(1, 1), (2, 4), (4, 2), (8, 8)])
def test_bidir_kb_knobs_bit_exact(rng, hkb, vkb, monkeypatch):
    """Every RTDM_HBIDIR_KB / RTDM_VBIDIR_KB value the TPU sweep
    (tools/tune_kb.py) can select must be bit-exact -- the knobs only
    change the DMA block sizes, never the recurrence."""
    monkeypatch.setenv("RTDM_HBIDIR_KB", str(hkb))
    monkeypatch.setenv("RTDM_VBIDIR_KB", str(vkb))
    H, D, W1 = 32, 16, 128
    C = _cost(rng, H, D, W1, jnp.int16)
    Ct = jnp.transpose(C, (2, 1, 0))
    hf = sgm_horiz_pass_dh(Ct, P1, P2, reverse=False, interpret=True)
    ref_h = sgm_horiz_pass_dh(Ct, P1, P2, reverse=True, partial=hf,
                              interpret=True)
    got_h = sgm_horiz_bidir_dh(Ct, P1, P2, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_h), np.asarray(ref_h))

    Sh = jnp.transpose(ref_h, (2, 1, 0))
    Sa = sgm_down_pass_hdw(C, P1, P2, partial=Sh, interpret=True)
    ref = sgm_final_wta_hdw(C, Sa, P1, P2, 10, reverse=True, interpret=True)
    got = sgm_vert_bidir_wta_hdw(C, Sh, P1, P2, 10, interpret=True)
    for g, r, name in zip(got, ref, ("best", "minS", "dval", "uniq")):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r),
                                      err_msg=name)


def test_stereo_sgbm_batch_fused_bit_exact(rng):
    """stereo_sgbm_batch's stacked-lane horizontal launch (backend=pallas)
    must be bit-identical per frame to single-frame stereo_sgbm."""
    from rt_depth_map_tpu.config import MatcherConfig
    from rt_depth_map_tpu.ops.sgbm import stereo_sgbm, stereo_sgbm_batch

    B, H, W = 3, 16, 256
    base = rng.integers(0, 256, (B, H, W + 16)).astype(np.uint8)
    lefts = jnp.asarray(base[:, :, :W])
    rights = jnp.asarray(base[:, :, 9 : 9 + W])
    cfg = MatcherConfig(
        backend="pallas", kind="sgm", num_disparities=128, block_size=5,
        pre_filter_cap=63, p1=600, p2=2400, num_paths=8,
        uniqueness_ratio=10, speckle_window_size=50, speckle_range=32,
        disp12_max_diff=1,
    )
    got = np.asarray(stereo_sgbm_batch(lefts, rights, cfg))
    for b in range(B):
        ref = np.asarray(stereo_sgbm(lefts[b], rights[b], cfg))
        np.testing.assert_array_equal(got[b], ref, err_msg=f"frame {b}")


def test_full_bidir_composition_taller(rng):
    """Taller-than-wide shape exercises multiple 8-row WTA blocks per
    sweep and KB-block wrap in both kernels."""
    H, D, W1 = 64, 8, 256
    C = _cost(rng, H, D, W1, jnp.int16)
    Ct = jnp.transpose(C, (2, 1, 0))
    hf = sgm_horiz_pass_dh(Ct, P1, P2, reverse=False, interpret=True)
    Sh_t = sgm_horiz_pass_dh(Ct, P1, P2, reverse=True, partial=hf,
                             interpret=True)
    got_h = sgm_horiz_bidir_dh(Ct, P1, P2, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_h), np.asarray(Sh_t))

    Sh = jnp.transpose(Sh_t, (2, 1, 0))
    Sa = sgm_down_pass_hdw(C, P1, P2, partial=Sh, interpret=True)
    ref = sgm_final_wta_hdw(C, Sa, P1, P2, 10, reverse=True, interpret=True)
    got = sgm_vert_bidir_wta_hdw(C, Sh, P1, P2, 10, interpret=True)
    for g, r, name in zip(got, ref, ("best", "minS", "dval", "uniq")):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r),
                                      err_msg=name)
