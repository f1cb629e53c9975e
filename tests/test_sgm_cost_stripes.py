"""Cost-volume kernel stripe-height selection parity.

The pre-sliced overlapping-stripe input lets the kernel pick stripe
heights R whose window extent Rh = R + bs - 1 lands exactly on a sublane
multiple (R=20 for int16, R=12 for int32 at bs=5). Every R must be
bit-identical to the XLA cost volume."""

import numpy as np
import jax.numpy as jnp
import pytest

from rt_depth_map_tpu.ops.sgbm import sgbm_cost_volume
from rt_depth_map_tpu.ops.pallas.sgm_cost import sgm_cost_volume_pallas


def pair(seed, H, W):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=(H, W + 16), dtype=np.uint8)
    return base[:, :W], base[:, 7 : 7 + W]


@pytest.mark.parametrize("H,dtype", [
    (40, jnp.int16),   # R=20 (Rh=24, pad-free)
    (16, jnp.int16),   # R=16 (Rh=20 -> 24)
    (24, jnp.int32),   # R=12 (Rh=16, pad-free)
    (16, jnp.int32),   # R=8 fallback
])
def test_cost_volume_stripe_heights(H, dtype):
    W, D, bs = 192, 64, 5
    left, right = pair(3, H, W)
    ref, minX1, W1 = sgbm_cost_volume(
        jnp.asarray(left), jnp.asarray(right), D, bs, 0, 63
    )
    got, minX1p, W1p = sgm_cost_volume_pallas(
        jnp.asarray(left), jnp.asarray(right), D, bs,
        pre_filter_cap=63, layout="hwd", dtype=dtype, interpret=True,
    )
    assert (minX1, W1) == (minX1p, W1p)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("R,H", [(8, 48), (12, 48), (16, 48), (24, 48),
                                 (20, 40), (20, 80)])
def test_cost_volume_env_stripe_override(R, H, monkeypatch):
    """Every RTDM_COST_R value the TPU sweep (tools/tune_kb.py) can select
    must be bit-exact -- the knob only changes the stripe blocking. H is
    paired so each R actually divides H (the kernel silently degrades to
    the default stripe otherwise); (20, 40/80) covers the value TUNED.env
    ships as the machine default."""
    monkeypatch.setenv("RTDM_COST_R", str(R))
    W, D, bs = 192, 64, 5
    left, right = pair(5, H, W)
    ref, _, _ = sgbm_cost_volume(
        jnp.asarray(left), jnp.asarray(right), D, bs, 0, 63
    )
    got, _, _ = sgm_cost_volume_pallas(
        jnp.asarray(left), jnp.asarray(right), D, bs,
        pre_filter_cap=63, layout="hwd", dtype=jnp.int16, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
