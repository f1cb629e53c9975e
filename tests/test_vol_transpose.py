"""Tiled Pallas volume transpose vs jnp.transpose."""

import numpy as np
import jax.numpy as jnp
import pytest

from rt_depth_map_tpu.ops.pallas.vol_transpose import vol_transpose


@pytest.mark.parametrize("shape,dtype", [
    ((128, 4, 256), jnp.int16),
    ((256, 3, 128), jnp.int32),
    ((384, 2, 384), jnp.int16),
])
def test_vol_transpose_matches_xla(rng, shape, dtype):
    x = jnp.asarray(rng.integers(-3000, 3000, shape), dtype)
    got = vol_transpose(x, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(jnp.transpose(x, (2, 1, 0)))
    )


def test_vol_transpose_unaligned_falls_back(rng):
    x = jnp.asarray(rng.integers(0, 100, (24, 2, 128)), jnp.int16)
    got = vol_transpose(x, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(jnp.transpose(x, (2, 1, 0)))
    )
