"""3D reprojection and per-object depth statistics.

Re-creates the depth end of the reference pipeline (estimator.cpp:75-77):
`left_disp /= 16.` -> `reprojectImageTo3D(left_disp, xyz, Q, true, CV_32F)`
-> `calc_depth(...)` (estimator.cpp:206-263), as jittable static-shape JAX.

cv2.reprojectImageTo3D semantics: per pixel [X,Y,Z,W]^T = Q @ [x,y,d,1]^T and
xyz = (X/W, Y/W, Z/W); with handleMissingValues=true, pixels whose disparity
equals minDisparity-1 (the invalid marker after the /16) get Z = 10000, which
calc_depth then rejects via |Z - 1e4| < eps or |Z| > 1e4 (estimator.cpp:235).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

DISP_SHIFT = 4
DISP_SCALE = 1 << DISP_SHIFT
MISSING_Z = 10000.0


def disparity_fixed_to_float(disp16: jnp.ndarray) -> jnp.ndarray:
    """The reference's `left_disp /= 16.` on a CV_16S map (estimator.cpp:75):
    OpenCV divides with round-half-to-even saturation, so the result stays an
    integer-valued int16 map where invalid becomes exactly minDisparity-1."""
    return jnp.round(disp16.astype(jnp.float32) / DISP_SCALE).astype(jnp.int16)


def reproject_to_3d(
    disp: jnp.ndarray,
    Q: jnp.ndarray,
    min_disparity: int = 0,
    handle_missing: bool = True,
) -> jnp.ndarray:
    """(H, W) integer disparity -> (H, W, 3) float32 XYZ (cv2 parity).

    disp: integer-valued disparity (already /16, invalid == min_disparity-1).
    """
    H, W = disp.shape
    d = disp.astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    Q = jnp.asarray(Q, jnp.float32)
    X = Q[0, 0] * xs + Q[0, 1] * ys + Q[0, 2] * d + Q[0, 3]
    Y = Q[1, 0] * xs + Q[1, 1] * ys + Q[1, 2] * d + Q[1, 3]
    Z = Q[2, 0] * xs + Q[2, 1] * ys + Q[2, 2] * d + Q[2, 3]
    Wh = Q[3, 0] * xs + Q[3, 1] * ys + Q[3, 2] * d + Q[3, 3]
    inv = jnp.where(Wh != 0, 1.0 / Wh, 0.0)
    xyz = jnp.stack([X * inv, Y * inv, Z * inv], axis=-1)
    if handle_missing:
        missing = disp == (min_disparity - 1)
        xyz = xyz.at[..., 2].set(
            jnp.where(missing, MISSING_Z, xyz[..., 2])
        )
    return xyz


def calc_depth(
    xyz: jnp.ndarray,
    mask: jnp.ndarray,
    boxes: jnp.ndarray,
    calibration_unit: float,
    extra: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, ...]:
    """Masked mean Z per bounding box (estimator.cpp:206-263 `calc_depth`).

    xyz: (H, W, 3) float32; mask: (H, W) uint8/bool object mask (filter_out);
    boxes: (K, 5) int32 [x, y, w, h, valid].

    Returns (depth_cm, mean_z, count[, mean_extra]) each (K,): depth_cm is
    the label value `mean_z * calibrationUnit / 10.0` (estimator.cpp:252),
    NaN where a box is invalid or has no valid pixel (reference prints no
    label when cnt == 0). `extra` (H, W): an additional plane averaged over
    the SAME accepted pixels -- the SHOW_DISPARITY_VALUE disp_mean
    accumulator of estimator.cpp:206-263 shares the depth loop's condition.
    """
    H, W = mask.shape
    Z = xyz[..., 2]
    ok = (
        (jnp.abs(Z - MISSING_Z) >= jnp.float32(1.1920929e-07))  # FLT_EPSILON
        & (jnp.abs(Z) <= jnp.float32(1.0e4))
        & (mask != 0)
    )
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)

    def per_box(box):
        x, y, w, h, valid = box[0], box[1], box[2], box[3], box[4]
        inside = (xs >= x) & (xs < x + w) & (ys >= y) & (ys < y + h)
        m = ok & inside & (valid > 0)
        cnt = jnp.sum(m.astype(jnp.int32))
        s = jnp.sum(jnp.where(m, Z, 0.0), dtype=jnp.float32)
        mean = jnp.where(cnt > 0, s / jnp.maximum(cnt, 1), jnp.nan)
        if extra is None:
            return mean, cnt
        es = jnp.sum(jnp.where(m, extra.astype(jnp.float32), 0.0),
                     dtype=jnp.float32)
        emean = jnp.where(cnt > 0, es / jnp.maximum(cnt, 1), jnp.nan)
        return mean, cnt, emean

    res = jax.vmap(per_box)(boxes)
    mean_z, count = res[0], res[1]
    depth_cm = mean_z * (calibration_unit / 10.0)
    if extra is None:
        return depth_cm, mean_z, count
    return depth_cm, mean_z, count, res[2]
