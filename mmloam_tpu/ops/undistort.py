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


def undistort_inverse(points, rel_time, dq_lc, dt_lc):
    """Exact inverse of `undistort`: de-skewed scan-end points back to the
    raw per-point measurement frames (for re-undistortion with a better
    delta once the scan's pose has been SOLVED — see reundistort)."""
    start_p = lie.quat_rotate(dq_lc[None, :], points) + dt_lc[None, :]
    q_s = lie.slerp_identity(dq_lc[None, :], rel_time)
    return lie.quat_rotate(lie.quat_conj(q_s),
                           start_p - rel_time[:, None] * dt_lc[None, :])


def reundistort(points, rel_time, dq_old, dt_old, dq_new, dt_new):
    """Re-deskew points that were undistorted with (dq_old, dt_old) using
    the refined delta (dq_new, dt_new).

    The first scans of a sequence have no motion estimate (the reference
    predicts with the PREVIOUS scan's delta, unionPoseEstimation.cpp:846),
    so their prediction-based undistortion leaves the full per-scan skew
    (|v| * scan period) in the points — and those points enter the map at
    their solved poses, permanently warping it near the start (measured:
    the entire corridor-scene 0.17 m ATE plateau was this smear; a
    zero-skew oracle run scored 0.033).  After each scan's solve the true
    delta IS known; this routine rebuilds the de-skew exactly.  For stack
    points that are voxel centroids, pass the voxel-MEAN rel time: the
    translation part of the correction is linear in rel_time, so the mean
    is exact; the rotation part is a small-angle approximation at centroid
    scale."""
    raw = undistort_inverse(points, rel_time, dq_old, dt_old)
    return undistort(raw, rel_time, dq_new, dt_new)
