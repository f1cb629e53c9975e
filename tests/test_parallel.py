"""Multi-device sharding tests on the virtual 8-CPU-device mesh.

Numerics invariant (SURVEY.md section 4 item 4): the N-way tiled matcher must
be bit-identical to the single-device path (integer cost arithmetic).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rt_depth_map_tpu.config import MatcherConfig
from rt_depth_map_tpu.ops.bm import stereo_bm
from rt_depth_map_tpu.parallel import make_mesh, tiled_stereo_bm


def stereo_pair(seed, H, W, shift):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=(H, W + 64), dtype=np.uint8).astype(np.float32)
    k = np.ones(5) / 5.0
    base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, base)
    base = base.astype(np.uint8)
    return base[:, :W].copy(), base[:, shift : shift + W].copy()


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("n_space", [2, 4])
def test_tiled_bm_bit_exact(n_space):
    left, right, = stereo_pair(0, 64, 256, 7)
    cfg = MatcherConfig(num_disparities=32, block_size=9)
    ref = np.asarray(stereo_bm(jnp.asarray(left), jnp.asarray(right), cfg))
    mesh = make_mesh((1, n_space), devices=jax.devices()[: n_space])
    out = np.asarray(
        tiled_stereo_bm(jnp.asarray(left), jnp.asarray(right), cfg, mesh)
    )
    np.testing.assert_array_equal(out, ref)


def test_tiled_bm_halo_guard():
    left, right = stereo_pair(1, 32, 128, 5)
    cfg = MatcherConfig(num_disparities=64, block_size=9)
    mesh = make_mesh((1, 8))
    with pytest.raises(ValueError, match="halo"):
        tiled_stereo_bm(jnp.asarray(left), jnp.asarray(right), cfg, mesh)


def test_data_parallel_batch_sharding():
    """DP: a batch of frames sharded over the data axis, vmapped matcher."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = MatcherConfig(num_disparities=16, block_size=5, speckle_window_size=0)
    lefts, rights = [], []
    for s in range(4):
        l, r = stereo_pair(s, 32, 96, 4)
        lefts.append(l)
        rights.append(r)
    L = jnp.asarray(np.stack(lefts))
    R = jnp.asarray(np.stack(rights))
    mesh = make_mesh((4, 2))
    shard = NamedSharding(mesh, P("data", None, None))
    Ls = jax.device_put(L, shard)
    Rs = jax.device_put(R, shard)

    fn = jax.jit(jax.vmap(lambda a, b: stereo_bm(a, b, cfg)))
    out = fn(Ls, Rs)
    ref = fn(L, R)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
