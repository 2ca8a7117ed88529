"""The LIO pipeline: one pure `step(state, scan) -> (state, output)`.

TPU-native re-architecture of the reference's mm_PoseEstimation node
(`unionPoseEstimation.cpp:630-1390 process()` + callbacks): the reference's
3-process / callback / mutex pipeline becomes a single jitted function over
a pre-decoded scan tensor, per SURVEY.md §7.  The per-scan flow:

  1. feature labels on the raw (skewed) rings — the reference computes
     features in the mm_scanRegistration process *before* undistortion
     (unionFeatureExtract.cpp:266-321), so we do too;
  2. pose prediction — gyro-only before IMU init, full preintegration after
     (:777-830), with the reference's exact prediction form
     P+ = P + Q dP (gravity/velocity terms omitted there, :811-814);
  3. per-point undistortion by the predicted lidar delta (:402-421, :862);
  4. masked voxel downsample of corner/surf stacks (Estimator.cpp:1012-1026);
  5. window push + `Estimate` (full or short regime, estimate.py);
  6. acceptance gates + degeneracy fallback (Estimator.cpp:1041-1067);
  7. move-gated map insertion of the front frame (:1070-1136);
  8. IMU-init keyframe accumulation every 3rd scan + TryMAPInitialization
     (:934-985, initializer.py).

State is a pytree; `jax.lax.scan(step, state, scans)` replays a sequence,
`jax.vmap`/`shard_map` over the leading batch axis replays many sequences
per chip / across a mesh.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import lie
from .estimator import estimate as est
from .estimator import initializer, reduced, solver
from .ops import (downsample, features, linalg3, preintegration, undistort,
                  voxelmap)

N_KF = 3          # init keyframes (pre-init WINDOWSIZE, unionPoseEstimation.cpp:1481)
KF_EVERY = 3      # keyframe cadence (veloPushCount, :947-960)


class ScanInput(NamedTuple):
    """One decoded scan (ring-organized, padded) + its IMU interval.

    The optional hori_* block carries the time-aligned Livox Horizon sweep
    for the same interval (already expressed in the Velodyne lidar frame by
    the aligner's extrinsic, unionFeatureExtract.cpp:312); leave the fields
    as None for velodyne-only datasets — None pytree leaves vanish, so the
    traced program contains no Horizon compute at all.
    """

    pts: jnp.ndarray        # (L, N, 3) lidar frame, skewed
    intensity: jnp.ndarray  # (L, N)
    n_valid: jnp.ndarray    # (L,) valid prefix length per ring
    rel_time: jnp.ndarray   # (L, N) in [0, 1] over the scan interval
    t: jnp.ndarray          # () scan timestamp (s)
    imu_acc: jnp.ndarray    # (M, 3) specific force, g units
    imu_gyr: jnp.ndarray    # (M, 3) rad/s
    imu_dt: jnp.ndarray     # (M,) delta since previous sample
    imu_mask: jnp.ndarray   # (M,)
    hori_pts: jnp.ndarray = None        # (Lh, Nh, 3)
    hori_intensity: jnp.ndarray = None  # (Lh, Nh)
    hori_n_valid: jnp.ndarray = None    # (Lh,)
    hori_rel_time: jnp.ndarray = None   # (Lh, Nh)


class StepOutput(NamedTuple):
    pose_q: jnp.ndarray     # (4,) published lidar pose T_wl (front frame)
    pose_p: jnp.ndarray     # (3,)
    t: jnp.ndarray          # () timestamp of the published pose
    fail: jnp.ndarray       # () failure detected
    degenerate: jnp.ndarray
    sv_min: jnp.ndarray
    inited: jnp.ndarray
    n_corner: jnp.ndarray
    n_surf: jnp.ndarray
    fast_rotation: jnp.ndarray  # () suppress cloud publishing (:905-917)
    hori_merged: jnp.ndarray    # () Horizon fused into this frame
    # association telemetry (valid line/plane factors after gates), the
    # engine's analogue of the reference's feature-count running averages
    # (unionPoseEstimation.cpp:691-705)
    n_assoc_line: jnp.ndarray   # () int32
    n_assoc_plane: jnp.ndarray  # () int32


class LIOState(NamedTuple):
    # sliding window, slot W-1 newest; trailing `frame_valid` slots live
    x: jnp.ndarray          # (W, 15) body states [P phi V bg ba]
    t: jnp.ndarray          # (W,)
    frame_valid: jnp.ndarray
    stacks: est.Stacks
    preint: dict            # pair (j-1, j) at slot j; keys dq dp dv jac sqrt_info dt bg ba
    pair_valid: jnp.ndarray
    prior: solver.Prior
    vm_corner: voxelmap.VoxelMap
    vm_surf: voxelmap.VoxelMap
    vm_non: voxelmap.VoxelMap
    # fine-leaf recent-history maps (reference local map, MapIncrementLocal)
    vm_local_corner: voxelmap.VoxelMap
    vm_local_surf: voxelmap.VoxelMap
    # cached per-frame reduced point factors (slot j = window frame j)
    cached_rfs: "reduced.ReducedFactor"
    inited: jnp.ndarray     # () bool — LidarIMUInited
    gravity: jnp.ndarray    # (3,)
    last_map_pos: jnp.ndarray   # (3,) position of last map insertion
    map_has_data: jnp.ndarray   # () bool
    # pre-init constant-motion deltas (body frame), :846-860
    dqb: jnp.ndarray        # (4,)
    dtb: jnp.ndarray        # (3,)
    # init keyframe accumulation (lidar poses + raw IMU buffers)
    kf_x: jnp.ndarray       # (N_KF, 7) [q, p] lidar pose
    kf_t: jnp.ndarray       # (N_KF,)
    kf_stacks: "est.Stacks"  # (N_KF, ...) keyframe feature stacks
    # each keyframe's pre-init ReducedFactor (built by its own scan's
    # short-window estimate against the same persistent map): seeds the
    # post-init window's cached factors so the FIRST full solve has point
    # factors on every frame — with cleared factors only
    # refresh_old_frames slots get associated per scan, and the
    # factorless keyframes slid on the fresh (noisy) init velocity via
    # the IMU factors alone (measured +0.2 m front-pose jump at init in
    # the corridor scene).  Keyframe poses are kept at init (:616-619),
    # so the snapshots remain exactly consistent.
    kf_rfs: "reduced.ReducedFactor"  # (N_KF,)
    kf_imu: jnp.ndarray     # (N_KF, Mi, 7) [acc, gyr, dt]
    kf_imu_mask: jnp.ndarray   # (N_KF, Mi)
    kf_imu_n: jnp.ndarray   # (N_KF,) fill level
    kf_count: jnp.ndarray   # () keyframes accumulated
    kf_phase: jnp.ndarray   # () veloPushCount
    avg_acc: jnp.ndarray    # (3,) negated mean specific force of first interval
    # extrinsics (body-from-lidar), from Extrinsic_Tlb (launch :49-52)
    Rbl: jnp.ndarray        # (3, 3)
    tbl: jnp.ndarray        # (3,)
    step_idx: jnp.ndarray


def _empty_preint(W, dtype):
    return dict(
        dq=jnp.tile(jnp.array([1.0, 0, 0, 0], dtype), (W, 1)),
        dp=jnp.zeros((W, 3), dtype), dv=jnp.zeros((W, 3), dtype),
        jac=jnp.tile(jnp.eye(15, dtype=dtype), (W, 1, 1)),
        sqrt_info=jnp.zeros((W, 15, 15), dtype),
        dt=jnp.zeros((W,), dtype), bg=jnp.zeros((W, 3), dtype),
        ba=jnp.zeros((W, 3), dtype))


def init_state(cfg, Rbl=None, tbl=None, dtype=jnp.float32, kf_imu_cap=256):
    W = cfg.solver.window
    sc = cfg.scan
    def make_stacks(n):
        extra = {}
        if cfg.use_nonfeature:
            extra = dict(non=jnp.zeros((n, sc.max_nonfeature, 3), dtype),
                         non_mask=jnp.zeros((n, sc.max_nonfeature), bool),
                         non_rel=jnp.zeros((n, sc.max_nonfeature), dtype))
        return est.Stacks(
            corner=jnp.zeros((n, sc.max_corner, 3), dtype),
            corner_mask=jnp.zeros((n, sc.max_corner), bool),
            surf=jnp.zeros((n, sc.max_surf, 3), dtype),
            surf_mask=jnp.zeros((n, sc.max_surf), bool),
            corner_rel=jnp.zeros((n, sc.max_corner), dtype),
            surf_rel=jnp.zeros((n, sc.max_surf), dtype), **extra)

    return LIOState(
        x=jnp.zeros((W, 15), dtype),
        t=jnp.zeros((W,), dtype),
        frame_valid=jnp.zeros((W,), bool),
        stacks=make_stacks(W),
        preint=_empty_preint(W, dtype),
        pair_valid=jnp.zeros((W,), bool),
        prior=solver.empty_prior(dtype),
        vm_corner=voxelmap.empty_map(cfg.map),
        vm_surf=voxelmap.empty_map(cfg.map),
        # the non-feature map is only touched when cfg.use_nonfeature; a
        # 1-row placeholder keeps the pytree shape stable without carrying
        # a dead full-size map (64 MB/sequence at flagship dims) through
        # every replay step
        vm_non=(voxelmap.empty_map(cfg.map) if cfg.use_nonfeature
                else voxelmap.VoxelMap(
                    cells=jnp.zeros((1, voxelmap._cpr(cfg.map) * 4),
                                    jnp.float32))),
        vm_local_corner=(voxelmap.empty_map(cfg.local_map)
                         if cfg.use_local_map else voxelmap.VoxelMap(
                             cells=jnp.zeros(
                                 (1, voxelmap._cpr(cfg.local_map) * 4),
                                 jnp.float32))),
        vm_local_surf=(voxelmap.empty_map(cfg.local_map)
                       if cfg.use_local_map else voxelmap.VoxelMap(
                           cells=jnp.zeros(
                               (1, voxelmap._cpr(cfg.local_map) * 4),
                               jnp.float32))),
        cached_rfs=jax.tree.map(
            lambda a: jnp.broadcast_to(a, (W,) + a.shape).copy(),
            reduced.empty_reduced(dtype)),
        inited=jnp.asarray(False),
        gravity=jnp.array([0.0, 0.0, -cfg.imu.gnorm], dtype),
        last_map_pos=jnp.zeros((3,), dtype),
        map_has_data=jnp.asarray(False),
        dqb=jnp.array([1.0, 0, 0, 0], dtype),
        dtb=jnp.zeros((3,), dtype),
        kf_x=jnp.tile(jnp.array([1.0, 0, 0, 0, 0, 0, 0], dtype), (N_KF, 1)),
        kf_t=jnp.zeros((N_KF,), dtype),
        kf_stacks=make_stacks(N_KF),
        kf_rfs=jax.tree.map(
            lambda a: jnp.broadcast_to(a, (N_KF,) + a.shape).copy(),
            reduced.empty_reduced(dtype)),
        kf_imu=jnp.zeros((N_KF, kf_imu_cap, 7), dtype),
        kf_imu_mask=jnp.zeros((N_KF, kf_imu_cap), bool),
        kf_imu_n=jnp.zeros((N_KF,), jnp.int32),
        kf_count=jnp.int32(0),
        kf_phase=jnp.int32(0),
        avg_acc=jnp.zeros((3,), dtype),
        Rbl=jnp.eye(3, dtype=dtype) if Rbl is None else jnp.asarray(Rbl, dtype),
        tbl=jnp.zeros((3,), dtype) if tbl is None else jnp.asarray(tbl, dtype),
        step_idx=jnp.int32(0))


def _clamp_norm(v, max_norm):
    n = jnp.linalg.norm(v)
    return v * jnp.minimum(1.0, max_norm / jnp.maximum(n, 1e-12))


def _body_pose(x15):
    return lie.exp_quat(x15[3:6]), x15[0:3]


def _lidar_pose(x15, Rbl, tbl):
    q_wb, p_wb = _body_pose(x15)
    q_bl = lie.matrix_to_quat(Rbl)
    q_wl = lie.quat_mul(q_wb, q_bl)
    p_wl = lie.quat_rotate(q_wb, tbl) + p_wb
    return q_wl, p_wl


def _shift_window(state: LIOState, new_x, new_t, new_stacks_frame, new_preint,
                  new_pair_valid):
    """Push a frame at slot W-1, dropping slot 0 (list pop_front)."""
    roll1 = lambda a: jnp.roll(a, -1, axis=0)
    x = roll1(state.x).at[-1].set(new_x)
    t = roll1(state.t).at[-1].set(new_t)
    fv = roll1(state.frame_valid).at[-1].set(True)
    stacks = jax.tree.map(lambda a, new: roll1(a).at[-1].set(new),
                          state.stacks, est.Stacks(*new_stacks_frame))
    preint = {k: roll1(v).at[-1].set(new_preint[k]) for k, v in state.preint.items()}
    pv = roll1(state.pair_valid).at[-1].set(new_pair_valid)
    return x, t, fv, stacks, preint, pv


class FrameStack(NamedTuple):
    # field order mirrors est.Stacks (tuple-spread construction sites)
    corner: jnp.ndarray
    corner_mask: jnp.ndarray
    surf: jnp.ndarray
    surf_mask: jnp.ndarray
    non: jnp.ndarray = None
    non_mask: jnp.ndarray = None
    corner_rel: jnp.ndarray = None
    surf_rel: jnp.ndarray = None
    non_rel: jnp.ndarray = None


def _build_stacks(flat_pts, flat_rel, flat_labels, flat_valid, cfg, dtype):
    """Label split + voxel downsample into one frame's fixed stacks.

    All classes share ONE sorted sweep (the label masks are disjoint) —
    see ops/downsample.voxel_downsample_multi.  Each stack point carries
    its voxel-mean relative measurement time (for post-solve re-deskew).
    """
    sc = cfg.scan
    masks = [flat_valid & (flat_labels == 1), flat_valid & (flat_labels == 2)]
    leaves = [sc.filter_corner, sc.filter_surf]
    caps = [sc.max_corner, sc.max_surf]
    if cfg.use_nonfeature:
        # residual unclassified points (the reference's intended
        # non-feature class; its extractor leaves these unlabeled)
        masks.append(flat_valid & (flat_labels == 0))
        leaves.append(sc.filter_nonfeature)
        caps.append(sc.max_nonfeature)
    outs = downsample.voxel_downsample_multi(flat_pts, masks, leaves, caps,
                                             extra=flat_rel)
    (corner, cmask, _, crel), (surf, smask, _, srel) = outs[0], outs[1]
    extra = {}
    if cfg.use_nonfeature:
        non, nmask, _, nrel = outs[2]
        extra = dict(non=non.astype(dtype), non_mask=nmask,
                     non_rel=nrel.astype(dtype))
    return FrameStack(corner=corner.astype(dtype), corner_mask=cmask,
                      surf=surf.astype(dtype), surf_mask=smask,
                      corner_rel=crel.astype(dtype),
                      surf_rel=srel.astype(dtype), **extra)


class PreparedFrame(NamedTuple):
    """Stages 1-5 of `step`: window contents ready for the estimator."""

    x_w: jnp.ndarray
    t_w: jnp.ndarray
    fv_w: jnp.ndarray
    stacks_w: "est.Stacks"
    preint_w: dict
    pv_w: jnp.ndarray
    prior_w: solver.Prior
    rfs_w: "reduced.ReducedFactor"   # cached factors, shifted with the window
    q_wl_pred: jnp.ndarray   # predicted lidar pose (for fallbacks)
    p_wl_pred: jnp.ndarray
    dq_l: jnp.ndarray        # predicted lidar scan delta (undistortion)
    dt_l: jnp.ndarray
    q_prev: jnp.ndarray      # previous newest body pose
    p_prev: jnp.ndarray
    have_prev: jnp.ndarray
    fstack: "FrameStack"     # this scan's downsampled stacks
    fast_rotation: jnp.ndarray  # () |yaw rate| > velo_rotate_th (:766)
    hori_merged: jnp.ndarray    # () Horizon points merged this scan (:751)


def prepare_frame(state: LIOState, scan: ScanInput, cfg) -> PreparedFrame:
    """Features, prediction, undistortion, stacks, window push."""
    dtype = state.x.dtype

    # ---- 1. features on the raw rings --------------------------------
    labels = features.extract_scan_features(scan.pts, scan.intensity,
                                            scan.n_valid, cfg)
    ring_valid = jnp.arange(scan.pts.shape[1])[None, :] < scan.n_valid[:, None]

    use_hori = (scan.hori_pts is not None) and not cfg.velo_only_mode
    if use_hori:
        hlabels = features.extract_scan_features(
            scan.hori_pts, scan.hori_intensity, scan.hori_n_valid, cfg)
        h_valid = (jnp.arange(scan.hori_pts.shape[1])[None, :]
                   < scan.hori_n_valid[:, None])
        # Horizon near/far crop (getHoriFeature's removeNearFarPoints,
        # unionFeatureExtract.cpp:916, lidars_extrinsic_cali.h:451-477):
        # applied AFTER feature extraction (matching the reference's order)
        # so ring context is intact, gating which points reach the stacks
        h_dist2 = jnp.sum(scan.hori_pts * scan.hori_pts, axis=-1)
        h_valid = h_valid & (h_dist2 >= cfg.feature.near_points_threshold ** 2) \
            & (h_dist2 <= cfg.feature.far_points_threshold ** 2)

    # rotation gates from the interval's first/last gyro sample (:746-766)
    gz = scan.imu_gyr[:, 2]
    n_imu = jnp.sum(scan.imu_mask.astype(jnp.int32))
    gz0 = gz[0]
    gzN = gz[jnp.maximum(n_imu - 1, 0)]
    have_imu = n_imu > 0
    slow_rotation = have_imu & (
        (jnp.abs(gz0) < cfg.failsafe.hori_rotate_th)
        | (jnp.abs(gzN) < cfg.failsafe.hori_rotate_th))
    fast_rotation = have_imu & (
        (jnp.abs(gz0) > cfg.failsafe.velo_rotate_th)
        | (jnp.abs(gzN) > cfg.failsafe.velo_rotate_th))

    # ---- 2. prediction ----------------------------------------------
    x_prev = state.x[-1]
    q_prev, p_prev = _body_pose(x_prev)
    have_prev = state.frame_valid[-1]

    pre = preintegration.preintegrate(
        scan.imu_acc, scan.imu_gyr, scan.imu_dt, scan.imu_mask,
        x_prev[9:12], x_prev[12:15], cfg.imu)
    dq_gyro = preintegration.gyro_integrate(scan.imu_gyr, scan.imu_dt,
                                            scan.imu_mask)

    # post-init: preintegration prediction (:806-817, gravity terms omitted
    # exactly like the reference unless cfg.predict_full_kinematics);
    # pre-init: gyro rotation + delta replay
    q_pred_full = lie.quat_normalize(lie.quat_mul(q_prev, pre.dq))
    if cfg.predict_full_kinematics:
        dt_scan = pre.dtime.astype(dtype)
        p_pred_full = (p_prev + x_prev[6:9] * dt_scan
                       + 0.5 * state.gravity * dt_scan * dt_scan
                       + lie.quat_rotate(q_prev, pre.dp))
        v_pred_full = (x_prev[6:9] + state.gravity * dt_scan
                       + lie.quat_rotate(q_prev, pre.dv))
    else:
        p_pred_full = p_prev + lie.quat_rotate(q_prev, pre.dp)
        v_pred_full = x_prev[6:9] + lie.quat_rotate(q_prev, pre.dv)

    # IMU_Mode semantics (unionPoseEstimation.cpp:1411-1415, :713, :838-857):
    # mode 0 runs without IMU — prediction replays the PREVIOUS body deltas
    # for rotation and translation (velo_delta_Rb/velo_delta_tb persist
    # across frames in the reference's no-IMU else-branch :842-846); modes
    # >= 1 integrate the gyro for the pre-init rotation prediction
    # (:777-779).  Modes 0/1 never initialize (init requires IMU_Mode > 1,
    # :939), so this pre-init path IS their steady state: single-frame
    # scan-matching windows with no preintegration factors.
    if cfg.imu_mode == 0:
        q_pred_pre = lie.quat_normalize(lie.quat_mul(q_prev, state.dqb))
    else:
        q_pred_pre = lie.quat_normalize(lie.quat_mul(q_prev, dq_gyro))
    p_pred_pre = p_prev + lie.quat_rotate(q_prev, state.dtb)

    q_pred = jnp.where(state.inited, q_pred_full, q_pred_pre)
    p_pred = jnp.where(state.inited, p_pred_full, p_pred_pre)
    v_pred = jnp.where(state.inited, v_pred_full, x_prev[6:9])
    q_pred = jnp.where(have_prev, q_pred, jnp.array([1.0, 0, 0, 0], dtype))
    p_pred = jnp.where(have_prev, p_pred, jnp.zeros(3, dtype))

    x_new = jnp.zeros((15,), dtype)
    x_new = x_new.at[0:3].set(p_pred)
    x_new = x_new.at[3:6].set(lie.log_quat(q_pred))
    x_new = x_new.at[6:9].set(v_pred)
    x_new = x_new.at[9:15].set(x_prev[9:15])

    # ---- 3. undistortion by the predicted lidar delta (:402-421) -----
    q_bl = lie.matrix_to_quat(state.Rbl)
    q_wl_prev = lie.quat_mul(q_prev, q_bl)
    p_wl_prev = lie.quat_rotate(q_prev, state.tbl) + p_prev
    q_wl_pred = lie.quat_mul(q_pred, q_bl)
    p_wl_pred = lie.quat_rotate(q_pred, state.tbl) + p_pred
    dq_l = lie.quat_mul(lie.quat_conj(q_wl_prev), q_wl_pred)
    dt_l = lie.quat_rotate(lie.quat_conj(q_wl_prev), p_wl_pred - p_wl_prev)
    dq_l = jnp.where(have_prev, dq_l, jnp.array([1.0, 0, 0, 0], dtype))
    dt_l = jnp.where(have_prev, dt_l, jnp.zeros(3, dtype))

    flat_pts = scan.pts.reshape(-1, 3).astype(dtype)
    flat_rel = scan.rel_time.reshape(-1).astype(dtype)
    flat_lab = labels.reshape(-1)
    flat_ok = ring_valid.reshape(-1)
    hori_merged = jnp.asarray(False)
    if use_hori:
        # Horizon merge: slow rotation + enough livox corners
        # (`*laserCloudFullVeloRes += *laserCloudFullHoriRes`, :746-757)
        h_corner_cnt = jnp.sum((hlabels == 1) & h_valid)
        hori_merged = slow_rotation & (
            h_corner_cnt > cfg.solver.corner_cnt_gate_hori)
        flat_pts = jnp.concatenate(
            [flat_pts, scan.hori_pts.reshape(-1, 3).astype(dtype)])
        flat_rel = jnp.concatenate(
            [flat_rel, scan.hori_rel_time.reshape(-1).astype(dtype)])
        flat_lab = jnp.concatenate([flat_lab, hlabels.reshape(-1)])
        flat_ok = jnp.concatenate([flat_ok,
                                   h_valid.reshape(-1) & hori_merged])

    pts_ds = undistort.undistort(flat_pts, flat_rel, dq_l, dt_l)

    # ---- 4. stacks ----------------------------------------------------
    fstack = _build_stacks(pts_ds, flat_rel, flat_lab, flat_ok, cfg, dtype)

    # ---- 5. window push ----------------------------------------------
    new_preint = dict(dq=pre.dq.astype(dtype), dp=pre.dp.astype(dtype),
                      dv=pre.dv.astype(dtype),
                      jac=pre.jac.astype(dtype),
                      sqrt_info=(cfg.imu.lidar_m *
                                 preintegration.sqrt_info_from_cov(pre.cov)
                                 ).astype(dtype),
                      dt=pre.dtime.astype(dtype),
                      bg=x_prev[9:12], ba=x_prev[12:15])
    pair_ok = state.inited & have_prev & jnp.any(scan.imu_mask)

    # post-init: slide the window.  pre-init: a fresh single-frame list
    # (velo_list.reset + push_back, :846-860)
    xs, ts, fvs, stacks_s, preint_s, pvs = _shift_window(
        state, x_new, scan.t, fstack, new_preint, pair_ok)

    single = lambda a, new: jnp.zeros_like(a).at[-1].set(new)
    x_w = jnp.where(state.inited, xs, single(state.x, x_new))
    t_w = jnp.where(state.inited, ts, single(state.t, scan.t))
    fv_w = jnp.where(state.inited, fvs,
                     jnp.zeros_like(state.frame_valid).at[-1].set(True))
    stacks_w = jax.tree.map(
        lambda rolled, old, new: jnp.where(
            state.inited, rolled, single(old, new)),
        stacks_s, state.stacks, est.Stacks(*fstack))
    preint_w = {k: jnp.where(state.inited, preint_s[k],
                             jnp.zeros_like(state.preint[k]).at[-1].set(new_preint[k]))
                for k in preint_s}
    pv_w = jnp.where(state.inited, pvs, jnp.zeros_like(state.pair_valid))
    prior_w = jax.tree.map(
        lambda p: jnp.where(state.inited, p, jnp.zeros_like(p)), state.prior)
    # cached point factors shift with the window (slot W-1 is rebuilt by
    # the estimator); pre-init windows hold a single fresh frame, so the
    # old factors are cleared
    rfs_rolled = jax.tree.map(lambda a: jnp.roll(a, -1, axis=0),
                              state.cached_rfs)
    rfs_w = jax.tree.map(
        lambda r: jnp.where(state.inited, r, jnp.zeros_like(r)), rfs_rolled)

    return PreparedFrame(x_w=x_w, t_w=t_w, fv_w=fv_w,
                         stacks_w=est.Stacks(*stacks_w), preint_w=preint_w,
                         pv_w=pv_w, prior_w=prior_w, rfs_w=rfs_w,
                         q_wl_pred=q_wl_pred, p_wl_pred=p_wl_pred,
                         dq_l=dq_l, dt_l=dt_l,
                         q_prev=q_prev, p_prev=p_prev, have_prev=have_prev,
                         fstack=fstack, fast_rotation=fast_rotation,
                         hori_merged=hori_merged)


class PendingInsert(NamedTuple):
    """Stage-8 map updates, deferred so batched replay drivers can apply
    them OUTSIDE the per-sequence vmap (the Pallas insert kernel owns the
    batch axis; a vmapped XLA scatter serializes per batch element with
    full-map copies — see ops/pallas_insert.py)."""

    corner: jnp.ndarray        # (Kc, 3) lidar-frame front stack
    corner_mask: jnp.ndarray
    surf: jnp.ndarray
    surf_mask: jnp.ndarray
    Rwl: jnp.ndarray           # (3, 3) insertion pose
    p: jnp.ndarray             # (3,)
    do_map: jnp.ndarray        # () global-map gate (non-degenerate scan)
    do_map_local: jnp.ndarray = None   # () local-map gate (+ move gating)
    non: jnp.ndarray = None
    non_mask: jnp.ndarray = None


def apply_inserts(state: LIOState, pend: PendingInsert, cfg):
    """XLA-path map insertion (single-sequence / CPU)."""
    def ins(vm, pts, mask, mcfg, gate):
        wpts = pts @ pend.Rwl.T + pend.p[None, :]
        ok = mask & gate & voxelmap.insert_guard(wpts, pend.p, mcfg)
        return voxelmap.insert(vm, wpts, ok, mcfg)

    upd = dict(
        vm_corner=ins(state.vm_corner, pend.corner, pend.corner_mask,
                      cfg.map, pend.do_map),
        vm_surf=ins(state.vm_surf, pend.surf, pend.surf_mask, cfg.map,
                    pend.do_map))
    if cfg.use_nonfeature:
        upd["vm_non"] = ins(state.vm_non, pend.non, pend.non_mask, cfg.map,
                            pend.do_map)
    if cfg.use_local_map:
        upd["vm_local_corner"] = ins(state.vm_local_corner, pend.corner,
                                     pend.corner_mask, cfg.local_map,
                                     pend.do_map_local)
        upd["vm_local_surf"] = ins(state.vm_local_surf, pend.surf,
                                   pend.surf_mask, cfg.local_map,
                                   pend.do_map_local)
    return state._replace(**upd)


def apply_inserts_batched(state: LIOState, pend: PendingInsert, cfg):
    """Pallas-path map insertion over a leading batch axis (TPU).

    state/pend carry a leading batch dim; each map's rows are RMW'd by
    ops/pallas_insert.insert_batched.  Semantics == vmap(apply_inserts).
    """
    from .ops import pallas_insert

    def prep(pts, mask, mcfg, gate):
        wpts = jnp.einsum("bki,bji->bkj", pts, pend.Rwl) + pend.p[:, None, :]
        ok = (mask & gate[:, None]
              & jax.vmap(lambda w, c: voxelmap.insert_guard(w, c, mcfg))(
                  wpts, pend.p))
        return wpts, ok

    def ins(vm, pts, mask, mcfg, gate):
        wpts, ok = prep(pts, mask, mcfg, gate)
        return voxelmap.VoxelMap(
            cells=pallas_insert.insert_batched(vm.cells, wpts, ok, mcfg))

    upd = dict(
        vm_corner=ins(state.vm_corner, pend.corner, pend.corner_mask,
                      cfg.map, pend.do_map),
        vm_surf=ins(state.vm_surf, pend.surf, pend.surf_mask, cfg.map,
                    pend.do_map))
    if cfg.use_nonfeature:
        upd["vm_non"] = ins(state.vm_non, pend.non, pend.non_mask, cfg.map,
                            pend.do_map)
    if cfg.use_local_map:
        upd["vm_local_corner"] = ins(state.vm_local_corner, pend.corner,
                                     pend.corner_mask, cfg.local_map,
                                     pend.do_map_local)
        upd["vm_local_surf"] = ins(state.vm_local_surf, pend.surf,
                                   pend.surf_mask, cfg.local_map,
                                   pend.do_map_local)
    return state._replace(**upd)


def project_degenerate_update(x_opt, x_w, NtN, fail, degenerate_sv):
    """Direction-selective degenerate update (stage 7a).

    When the localizability check FAILS (sv_min < degenerate_sv — the
    solver can slide freely along the plane normals' null direction, e.g.
    the along-axis translation in a corridor), project each frame's
    translation/velocity DELTA (optimized `x_opt` minus the pre-solve
    window `x_w`: prediction for the newest frame, previous optimized
    states for the others) onto the OBSERVABLE subspace of the
    plane-normal Gram matrix NtN = Σ ω ωᵀ — directions whose singular
    value clears the gate keep the optimized update, unobservable
    directions hold the pre-solve value.  This is the principled version
    of the reference's keep-optimized-x/y-hold-predicted-z fallback
    (Estimator.cpp:1050-1066), replacing the r3 all-or-nothing revert
    that discarded the observable components too.  Rotation and biases
    keep the optimized values (plane normals observe rotation even in a
    corridor).  Too-few-normals failures have NtN ~ 0, so the projection
    degenerates to the old full revert.  When `fail` is False, `x_opt`
    passes through untouched.  (Scene-matrix note: the corridor SCENE's
    ATE was dominated by warmup skew + init seeding — fixed by stage 7b
    and kf_rfs, 0.23 -> 0.10 m — not by this path; this path guards
    genuinely degenerate stretches, where localizability actually fails:
    test_degenerate/test_stress.)

    Args: x_opt/x_w (W, 15) window states, NtN (3, 3) symmetric PSD,
    fail scalar bool, degenerate_sv the reference's localizability gate
    (checkLocalizability, Estimator.cpp:536-565).  Returns (W, 15).
    """
    x_opt, x_w, NtN = map(jnp.asarray, (x_opt, x_w, NtN))
    dtype = x_opt.dtype
    evN = linalg3.eigvalsh3(NtN)                   # ascending (3,)
    v_lo = linalg3.smallest_eigvec3(NtN, evN)
    v_hi = linalg3.principal_eigvec3(NtN, evN)
    v_mid = jnp.cross(v_hi, v_lo)                  # symmetric => orthogonal
    VN = jnp.stack([v_lo, v_mid, v_hi], axis=1)    # columns, ascending
    sv_dir = jnp.sqrt(jnp.maximum(evN, 0.0))
    obs = (sv_dir >= degenerate_sv).astype(dtype)
    P_obs = (VN * obs[None, :]) @ VN.T             # observable projector
    dP = (x_opt[:, 0:3] - x_w[:, 0:3]) @ P_obs.T
    dV = (x_opt[:, 6:9] - x_w[:, 6:9]) @ P_obs.T
    x_sel = x_opt.at[:, 0:3].set(x_w[:, 0:3] + dP)
    x_sel = x_sel.at[:, 6:9].set(x_w[:, 6:9] + dV)
    return jnp.where(fail, x_sel, x_opt)


def step(state: LIOState, scan: ScanInput, cfg):
    """One scan through the full LIO stack.  Pure; jit/vmap/scan-able."""
    state, out, pend = step_core(state, scan, cfg)
    return apply_inserts(state, pend, cfg), out


def step_core(state: LIOState, scan: ScanInput, cfg):
    """`step` minus the map writes — returns (state, out, PendingInsert).

    Batched replay drivers vmap THIS and apply the inserts with the
    batch-native Pallas kernel (replay.replay_batch)."""
    dtype = state.x.dtype
    W = cfg.solver.window

    pf = prepare_frame(state, scan, cfg)
    x_w, t_w, fv_w = pf.x_w, pf.t_w, pf.fv_w
    stacks_w, preint_w, pv_w, prior_w = (pf.stacks_w, pf.preint_w, pf.pv_w,
                                         pf.prior_w)
    q_wl_pred, p_wl_pred = pf.q_wl_pred, pf.p_wl_pred
    q_prev, p_prev, have_prev = pf.q_prev, pf.p_prev, pf.have_prev

    # ---- 6. estimate --------------------------------------------------
    n_frames = jnp.sum(fv_w)
    full = state.inited & (n_frames == W)
    # the reference only runs the estimator once the map holds surf data
    # (EstimateLidarPose gate :1030-1035)
    can_estimate = state.map_has_data

    refresh_slot = state.step_idx % (W - 1)

    def est_branch(_):
        # `full` is traced data — the unified estimate handles both regimes
        return est.estimate(
            x_w, stacks_w, pf.rfs_w, state.vm_corner, state.vm_surf,
            preint_w, pv_w, prior_w, fv_w, state.gravity, state.Rbl,
            state.tbl, cfg, full_window=full, refresh_slot=refresh_slot,
            vm_local_corner=state.vm_local_corner,
            vm_local_surf=state.vm_local_surf, vm_non=state.vm_non)

    def skip_branch(_):
        return est.EstimateResult(
            x=x_w, degenerate=jnp.asarray(False), fail=jnp.asarray(False),
            sv_min=jnp.asarray(-1.0, dtype), prior=prior_w, rfs=pf.rfs_w,
            n_line=jnp.int32(0), n_plane=jnp.int32(0),
            NtN=jnp.zeros((3, 3), dtype))

    res = jax.lax.cond(can_estimate, est_branch, skip_branch, None)
    x_sel = project_degenerate_update(res.x, x_w, res.NtN, res.fail,
                                      cfg.solver.degenerate_sv)
    # solve-jump backstop (cfg.failsafe.max_solve_jump): if the SELECTED
    # state still jumped (observable-direction blow-up — garbage factors
    # rather than a flat direction), keep the whole predicted window.
    jump = jnp.linalg.norm(x_sel[-1, 0:3] - x_w[-1, 0:3])
    revert = res.fail & (jump > cfg.failsafe.max_solve_jump)
    # The prior is INVALIDATED whenever the window state was modified
    # behind the solver's back (projection or revert): prior_w binds the
    # current slot-0 frame, but the window shifts every step, so a kept
    # prior would anchor next scan's slot 0 to the pre-modification
    # (runaway-direction) pose with a stale linearization point — during a
    # multi-scan degenerate stretch it would drag the held trajectory
    # backward.  Dropping it costs one frame of marginalized history; the
    # next successful full-window solve rebuilds it.
    res = res._replace(x=jnp.where(revert, x_w, x_sel),
                       prior=res.prior._replace(
                           valid=res.prior.valid & ~res.fail))
    # marginalization gating happened inside estimate
    prior_next = res.prior

    # ---- 7. acceptance gates (EstimateLidarPose :1041-1067) -----------
    corner_cnt = jnp.sum(jnp.where(fv_w[:, None], stacks_w.corner_mask, False))
    accept = corner_cnt > cfg.solver.corner_cnt_gate_velo
    x_opt = res.x
    # fallback: optimized x/y of the front frame, predicted z (:1050-1060)
    front_idx = W - n_frames          # oldest valid slot
    x_front = x_opt[front_idx]
    q_pub, p_pub = _lidar_pose(x_front, state.Rbl, state.tbl)
    q_pred_l, p_pred_l = q_wl_pred, p_wl_pred
    p_fb = jnp.array([p_pub[0], p_pub[1], p_pred_l[2]])
    p_pub = jnp.where(accept, p_pub, p_fb)
    q_pub = jnp.where(accept, q_pub, q_pred_l)

    # the acceptance gate affects only the PUBLISHED pose (and hence the
    # map-insertion pose); the window always keeps the optimized states —
    # the reference's double2vector ran unconditionally (Estimator.cpp:1439)
    # and the gates only rewrite transformTobeMapped (:1041-1067)
    x_next = x_opt

    # ---- 7b. post-solve re-deskew of the newest frame's stacks ---------
    # The prediction-based undistortion (stage 3) has no motion estimate
    # for the first scans of a sequence (dtb replays the PREVIOUS delta),
    # so their stacks keep up to |v| * period of skew — and once inserted
    # they warp the map permanently (measured: the whole corridor-scene
    # 0.17 m ATE plateau; zero-skew oracle 0.033).  The solve just
    # recovered the true scan delta, so rebuild the de-skew with it using
    # each stack point's voxel-mean rel time (ops/undistort.reundistort).
    # Post-warmup the correction is sub-mm (prediction ~= solution); it is
    # applied unconditionally to keep the program branch-free.
    q_bl_c = lie.matrix_to_quat(state.Rbl)
    q_wl_prev_c = lie.quat_mul(q_prev, q_bl_c)
    p_wl_prev_c = lie.quat_rotate(q_prev, state.tbl) + p_prev
    q_wl_new, p_wl_new = _lidar_pose(x_next[-1], state.Rbl, state.tbl)
    dq_s = lie.quat_mul(lie.quat_conj(q_wl_prev_c), q_wl_new)
    dt_s = lie.quat_rotate(lie.quat_conj(q_wl_prev_c),
                           p_wl_new - p_wl_prev_c)
    dq_s = jnp.where(have_prev, dq_s, pf.dq_l)
    dt_s = jnp.where(have_prev, dt_s, pf.dt_l)

    def _redeskew(pts_s, rel_s, mask_s):
        fixed = undistort.reundistort(pts_s[-1], rel_s[-1], pf.dq_l,
                                      pf.dt_l, dq_s, dt_s)
        fixed = jnp.where(mask_s[-1][:, None], fixed, pts_s[-1])
        return pts_s.at[-1].set(fixed)

    stacks_w = est.Stacks(*stacks_w)._replace(
        corner=_redeskew(stacks_w.corner, stacks_w.corner_rel,
                         stacks_w.corner_mask),
        surf=_redeskew(stacks_w.surf, stacks_w.surf_rel,
                       stacks_w.surf_mask),
        **(dict(non=_redeskew(stacks_w.non, stacks_w.non_rel,
                              stacks_w.non_mask))
           if cfg.use_nonfeature else {}))

    # ---- 8. map update (front-frame insertion, :1070-1136) -------------
    # deferred to apply_inserts/apply_inserts_batched (see PendingInsert).
    # Gating mirrors the reference: the GLOBAL cube map receives every
    # non-degenerate scan's stacks (laserCloudCornerForMap is set
    # unconditionally inside !is_degenerate, Estimator.cpp:1074-1077, and
    # threadMapIncrement :92-146 pushes every batch into MAP_MANAGER).
    # The LOCAL map is move-gated at >= 0.5 m^2 only under
    # cfg.solver.local_map_move_gate (the reference's :1083,:1125 gate is
    # a CPU kd-tree-rebuild cost bound — see the config docstring); the
    # default inserts it every non-degenerate scan like the global map.
    moved = jnp.sum((p_pub - state.last_map_pos) ** 2) >= cfg.solver.map_move_dist_sq
    do_map = ~res.fail
    if cfg.solver.local_map_move_gate:
        do_map_local = (~res.fail) & (moved | ~state.map_has_data)
    else:
        do_map_local = do_map
    front_stack = jax.tree.map(lambda a: a[front_idx], est.Stacks(*stacks_w))
    Rwl = lie.quat_to_matrix(q_pub)
    pend = PendingInsert(
        corner=front_stack.corner, corner_mask=front_stack.corner_mask,
        surf=front_stack.surf, surf_mask=front_stack.surf_mask,
        Rwl=Rwl, p=p_pub, do_map=do_map, do_map_local=do_map_local,
        **(dict(non=front_stack.non, non_mask=front_stack.non_mask)
           if cfg.use_nonfeature else {}))
    last_map_pos = jnp.where(do_map_local, p_pub, state.last_map_pos)
    map_has_data = state.map_has_data | do_map

    # ---- 9. pre-init bookkeeping + TryMAPInitialization ----------------
    new_state = state._replace(
        x=x_next, t=t_w, frame_valid=fv_w, stacks=est.Stacks(*stacks_w),
        preint=preint_w, pair_valid=pv_w, prior=prior_next,
        cached_rfs=res.rfs,
        last_map_pos=last_map_pos, map_has_data=map_has_data,
        dqb=jnp.where(have_prev, lie.quat_mul(lie.quat_conj(q_prev),
                                              lie.exp_quat(x_next[-1][3:6])),
                      state.dqb),
        dtb=jnp.where(have_prev,
                      _clamp_norm(lie.quat_rotate(lie.quat_conj(q_prev),
                                                  x_next[-1][0:3] - p_prev),
                                  cfg.failsafe.max_pred_delta),
                      state.dtb),
        step_idx=state.step_idx + 1)

    # ---- 9b. periodic online gravity re-refinement --------------------
    if cfg.solver.gravity_refine_every > 0:
        do_refine = (state.inited & full & can_estimate & (~res.fail)
                     & (new_state.step_idx % cfg.solver.gravity_refine_every
                        == 0))

        def refine(s):
            g_new, v_new = initializer.refine_gravity(
                s.x, s.preint, s.pair_valid, s.gravity, cfg.imu.gnorm)
            # the marginalization prior binds slot 0's full 15-dim block and
            # was linearized at the OLD velocity/gravity; leaving it intact
            # would pull v[0] straight back toward the pre-refinement value
            # next solve, undoing the refinement.  Zeroing the prior's
            # velocity columns drops that stale constraint (the refined v
            # changed only velocities, so no linearization-point shift is
            # needed for the other columns); velocity information regrows
            # within a couple of scans from the IMU + point factors.
            prior = s.prior._replace(
                lin_J=s.prior.lin_J.at[:, 6:9].set(0.0),
                x0=s.prior.x0.at[6:9].set(v_new[0]))
            return s._replace(gravity=g_new,
                              x=s.x.at[:, 6:9].set(v_new),
                              prior=prior)

        new_state = jax.lax.cond(do_refine, refine, lambda s: s, new_state)

    new_state = jax.lax.cond(
        state.inited | (cfg.imu_mode <= 1),
        lambda s: s,
        # keyframe snapshots take the RE-DESKEWED newest stack (stage 7b),
        # not pf.fstack — these become window stacks (and map inserts) at
        # init and must carry the solved-delta correction
        lambda s: _init_bookkeeping(
            s, scan, q_pub, p_pub,
            jax.tree.map(lambda a: a[-1], stacks_w), cfg),
        new_state)

    out = StepOutput(pose_q=q_pub, pose_p=p_pub, t=t_w[front_idx],
                     fail=res.fail, degenerate=res.degenerate,
                     sv_min=res.sv_min, inited=new_state.inited,
                     n_corner=corner_cnt.astype(jnp.int32),
                     n_surf=jnp.sum(jnp.where(fv_w[:, None],
                                              stacks_w.surf_mask, False)
                                    ).astype(jnp.int32),
                     fast_rotation=pf.fast_rotation,
                     hori_merged=pf.hori_merged,
                     n_assoc_line=res.n_line, n_assoc_plane=res.n_plane)
    return new_state, out, pend


def _init_bookkeeping(state: LIOState, scan: ScanInput, q_pub, p_pub, fstack,
                      cfg):
    """Keyframe accumulation + init attempt (unionPoseEstimation :934-985)."""
    dtype = state.x.dtype
    Mi = state.kf_imu.shape[1]
    phase = state.kf_phase

    new_kf_stack = est.Stacks(*fstack)

    # phase 0: open a new keyframe slot (shift); else: update the newest
    # (the reference overwrites back().laserCloud/pose each scan, :952-958)
    # this scan's point factors (pre-init window slot W-1 is the single
    # live frame) — snapshotted so _try_init can seed the window's cached
    # factors (see LIOState.kf_rfs)
    rf_cur = jax.tree.map(lambda a: a[-1], state.cached_rfs)

    def open_slot(s):
        roll1 = lambda a: jnp.roll(a, -1, axis=0)
        return s._replace(
            kf_x=roll1(s.kf_x).at[-1].set(jnp.concatenate([q_pub, p_pub])),
            kf_t=roll1(s.kf_t).at[-1].set(scan.t),
            kf_stacks=jax.tree.map(
                lambda a, new: roll1(a).at[-1].set(new),
                s.kf_stacks, new_kf_stack),
            kf_rfs=jax.tree.map(lambda a, new: roll1(a).at[-1].set(new),
                                s.kf_rfs, rf_cur),
            kf_imu=roll1(s.kf_imu).at[-1].set(0.0),
            kf_imu_mask=roll1(s.kf_imu_mask).at[-1].set(False),
            kf_imu_n=roll1(s.kf_imu_n).at[-1].set(0),
            kf_count=jnp.minimum(s.kf_count + 1, N_KF))

    def update_slot(s):
        return s._replace(
            kf_x=s.kf_x.at[-1].set(jnp.concatenate([q_pub, p_pub])),
            kf_t=s.kf_t.at[-1].set(scan.t),
            kf_stacks=jax.tree.map(lambda a, new: a.at[-1].set(new),
                                   s.kf_stacks, new_kf_stack),
            kf_rfs=jax.tree.map(lambda a, new: a.at[-1].set(new),
                                s.kf_rfs, rf_cur))

    state = jax.lax.cond(phase == 0, open_slot, update_slot, state)

    # append this scan's IMU into the newest keyframe buffer
    n0 = state.kf_imu_n[-1]
    samples = jnp.concatenate([scan.imu_acc, scan.imu_gyr,
                               scan.imu_dt[:, None]], axis=-1).astype(dtype)
    idx = n0 + jnp.arange(samples.shape[0])
    idx = jnp.where(scan.imu_mask, idx, Mi)       # dropped when masked/overflow
    kf_imu = state.kf_imu.at[-1, idx].set(samples, mode="drop")
    kf_mask = state.kf_imu_mask.at[-1, idx].set(True, mode="drop")
    n_new = jnp.minimum(n0 + jnp.sum(scan.imu_mask.astype(jnp.int32)), Mi)
    state = state._replace(
        kf_imu=kf_imu, kf_imu_mask=kf_mask,
        # under x64 (tests) the count promotes to int64; cast back so the
        # scatter dtype matches (future JAX errors on the implicit cast)
        kf_imu_n=state.kf_imu_n.at[-1].set(
            n_new.astype(state.kf_imu_n.dtype)))

    # first-interval average specific force (negated), :428-432
    avg = -preintegration.average_acc(scan.imu_acc, scan.imu_mask, cfg.imu)
    state = state._replace(
        avg_acc=jnp.where((state.kf_count == 1) & (phase == 0),
                          avg.astype(dtype), state.avg_acc))

    phase_next = (phase + 1) % KF_EVERY
    try_init = (phase_next == 0) & (state.kf_count == N_KF)
    state = state._replace(kf_phase=phase_next)
    return jax.lax.cond(try_init, lambda s: _try_init(s, cfg), lambda s: s,
                        state)


def _try_init(state: LIOState, cfg):
    """TryMAPInitialization (:425-627) + window seeding on success."""
    dtype = state.x.dtype

    # preintegrate each keyframe interval with zero biases
    def pre_one(buf, mask):
        return preintegration.preintegrate(
            buf[:, 0:3], buf[:, 3:6], buf[:, 6], mask,
            jnp.zeros(3, dtype), jnp.zeros(3, dtype), cfg.imu)

    pr = jax.vmap(pre_one)(state.kf_imu, state.kf_imu_mask)
    preint9 = dict(dq=pr.dq, dp=pr.dp, dv=pr.dv, jac=pr.jac, cov=pr.cov,
                   dt=pr.dtime, bg=pr.bg, ba=pr.ba)

    # exRlb/exPlb: lidar-from-body inverse of (Rbl, tbl)
    Rlb = state.Rbl.T
    tlb = -state.Rbl.T @ state.tbl
    res = initializer.initialize(state.kf_x[:, 4:7], state.kf_x[:, 0:4],
                                 state.avg_acc, preint9, cfg.imu.gnorm,
                                 Rlb, tlb,
                                 gravity_prior_w=cfg.init_gravity_prior_w,
                                 bias_bound=cfg.failsafe.init_bias_bound,
                                 velocity_bound=cfg.failsafe.init_velocity_bound)

    def on_ok(s):
        W = cfg.solver.window
        # window <- the keyframes (trailing slots), including their feature
        # stacks (the reference's veloFrameList keyframes carry laserCloud);
        # newest pose converted lidar->body (:616-619), others kept as-is
        x = jnp.zeros((W, 15), dtype)
        t = jnp.zeros((W,), dtype)
        fv = jnp.zeros((W,), bool)
        stacks = jax.tree.map(
            lambda a, kf: jnp.zeros_like(a).at[W - N_KF:].set(kf),
            est.Stacks(*s.stacks), s.kf_stacks)
        for i in range(N_KF):
            slot = W - N_KF + i
            q_l = s.kf_x[i, 0:4]
            p_l = s.kf_x[i, 4:7]
            if i == N_KF - 1:
                q_b = lie.quat_mul(q_l, lie.matrix_to_quat(Rlb))
                p_b = p_l + lie.quat_rotate(q_l, tlb)
            else:
                q_b, p_b = q_l, p_l
            xi = jnp.zeros(15, dtype)
            xi = xi.at[0:3].set(p_b)
            xi = xi.at[3:6].set(lie.log_quat(q_b))
            xi = xi.at[6:9].set(res.v[i])
            xi = xi.at[9:12].set(res.bg)
            xi = xi.at[12:15].set(res.ba)
            x = x.at[slot].set(xi)
            t = t.at[slot].set(s.kf_t[i])
            fv = fv.at[slot].set(True)

        # re-preintegrate the intervals with the initialized biases (:603-609)
        def pre_b(buf, mask):
            return preintegration.preintegrate(
                buf[:, 0:3], buf[:, 3:6], buf[:, 6], mask, res.bg, res.ba,
                cfg.imu)

        pr2 = jax.vmap(pre_b)(s.kf_imu, s.kf_imu_mask)
        preint = _empty_preint(W, dtype)
        pv = jnp.zeros((W,), bool)
        for i in range(1, N_KF):
            slot = W - N_KF + i
            si = (cfg.imu.lidar_m *
                  preintegration.sqrt_info_from_cov(pr2.cov[i])).astype(dtype)
            for k, v in (("dq", pr2.dq[i]), ("dp", pr2.dp[i]),
                         ("dv", pr2.dv[i]), ("jac", pr2.jac[i].astype(dtype)),
                         ("sqrt_info", si), ("dt", pr2.dtime[i]),
                         ("bg", res.bg), ("ba", res.ba)):
                preint[k] = preint[k].at[slot].set(v.astype(dtype) if hasattr(v, "astype") else v)
            pv = pv.at[slot].set(True)

        # seed the window's cached point factors with each keyframe's own
        # pre-init ReducedFactor (see LIOState.kf_rfs): the first
        # post-init solve then has point factors on EVERY frame.  The
        # NEWEST keyframe's pose was shifted lidar->body above, so its
        # snapshot is stale — zeroed; the estimator rebuilds slot W-1
        # unconditionally anyway.
        rfs0 = jax.tree.map(jnp.zeros_like, s.cached_rfs)
        rfs0 = jax.tree.map(
            lambda a, kf: a.at[W - N_KF:W - 1].set(
                kf[:N_KF - 1].astype(a.dtype)), rfs0, s.kf_rfs)
        return s._replace(x=x, t=t, frame_valid=fv, stacks=stacks,
                          preint=preint,
                          pair_valid=pv, inited=jnp.asarray(True),
                          gravity=res.gravity.astype(dtype),
                          prior=solver.empty_prior(dtype),
                          cached_rfs=rfs0)

    return jax.lax.cond(res.ok, on_ok, lambda s: s, state)
