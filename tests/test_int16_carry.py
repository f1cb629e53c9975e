"""RTDM_INT16_CARRY must be a harmless no-op (retired round 5).

int16 aggregation carries measured neutral at best in round 4 and, as
of the current Mosaic, elementwise int16 `minsi` inside the fused
kernels fails to legalize ON HARDWARE (interpret mode accepts it --
HARVEST_R5 section 14), so _carry_dtype always returns int32. These
tests pin that arming the retired knob still produces bit-identical
results (i.e. it cannot re-enable a path that would break on-device)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rt_depth_map_tpu.ops.pallas.sgm_bidir import (
    sgm_horiz_bidir_dh,
    sgm_vert_bidir_wta_hdw,
)


@pytest.fixture
def toggle(monkeypatch):
    def run(fn, on):
        monkeypatch.setenv("RTDM_INT16_CARRY", "1" if on else "0")
        return fn()

    return run


def test_vert_bidir_int16_matches_int32(toggle):
    rng = np.random.default_rng(5)
    H, D, W1 = 16, 16, 128
    # io int16 with values in the certified range (5 * C_max <= 32767)
    C = jnp.asarray(rng.integers(0, 4725, (H, D, W1)), jnp.int16)
    Sh = jnp.asarray(rng.integers(0, 9450, (H, D, W1)), jnp.int16)

    def go():
        return sgm_vert_bidir_wta_hdw(C, Sh, 600, 2400, 10, interpret=True)

    ref = toggle(go, on=False)
    got = toggle(go, on=True)
    for r, g, name in zip(ref, got, ("best", "minS", "dval", "uniq")):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r),
                                      err_msg=name)


def test_horiz_bidir_int16_matches_int32(toggle):
    rng = np.random.default_rng(6)
    W1, D, H = 32, 16, 128
    Ct = jnp.asarray(rng.integers(0, 4725, (W1, D, H)), jnp.int16)

    def go():
        return sgm_horiz_bidir_dh(Ct, 600, 2400, interpret=True)

    ref = np.asarray(toggle(go, on=False))
    got = np.asarray(toggle(go, on=True))
    np.testing.assert_array_equal(got, ref)


def test_carry_dtype_gate(monkeypatch):
    """The retired knob must NEVER yield int16 carries (they no longer
    compile on hardware -- module docstring)."""
    from rt_depth_map_tpu.ops.pallas.sgm_bidir import _carry_dtype

    for armed in ("1", "0"):
        monkeypatch.setenv("RTDM_INT16_CARRY", armed)
        assert _carry_dtype(jnp.int32, 600, 2400) == jnp.int32
        assert _carry_dtype(jnp.int16, 600, 2400) == jnp.int32
        assert _carry_dtype(jnp.int16, 9000, 9000) == jnp.int32
