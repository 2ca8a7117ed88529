"""Per-point motion undistortion (de-skewing).

Vectorized equivalent of the reference's per-point slerp loop
(reference: unionPoseEstimation.cpp:402-421 `RemoveLidarDistortion`):

    s       = per-point relative time in [0, 1]
    q_s     = slerp(I, dq_lc, s)           (rotation up to this point's time)
    start_p = q_s * p + s * dt_lc          (point in the scan-start frame)
    p'      = dR_lc^T (start_p - dt_lc)    (re-expressed in scan-end frame)

where (dq_lc, dt_lc) is the lidar-frame delta pose over the scan interval.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import lie


def undistort(points, rel_time, dq_lc, dt_lc):
    """De-skew `points (N,3)` with per-point `rel_time (N,)` in [0,1].

    `dq_lc (4,)` and `dt_lc (3,)` are the lidar delta rotation/translation
    over the scan. Returns de-skewed points in the scan-end lidar frame.
    """
    q_s = lie.slerp_identity(dq_lc[None, :], rel_time)      # (N,4)
    start_p = lie.quat_rotate(q_s, points) + rel_time[:, None] * dt_lc[None, :]
    q_inv = lie.quat_conj(dq_lc)
    return lie.quat_rotate(q_inv[None, :], start_p - dt_lc[None, :])
