"""Literal numpy transcription of the reference's detectFeaturePoints.

This is a TEST ORACLE: a deliberately serial, line-by-line transcription of
`feature_extraction::detectFeaturePoints`
(/root/reference/mm-loam/src/unionFeatureExtract.cpp:341-844) kept to
quantify how closely the vectorized TPU kernel
(mmloam_tpu/ops/features.py) tracks the reference's semantics — the same
pattern as `preintegrate_sequential` for the IMU integrator.  It follows
the C++ control flow exactly, including its quirks:

* `thNumCurvSize` is a function-scoped variable mutated per point in the
  curvature loop (:414-427); the flat-neighbor marking loop (:492-517)
  then reads whatever value the LAST curvature iteration left behind.
* The flat-neighbor marks (flag 1) overwrite any previous flag
  unconditionally (:503, :516).
* The break-corner phase advances `i += count_num`, where `count_num` is 4
  after any right-flat evaluation and 1 otherwise (:603-607), so fold
  corners are only detected on the stride's landing indices.
* The depth gate in the break-point rejection's BACK-normal loop reads the
  depth of `points[i - k]` for both the front and back sides (:782 — the
  i-k read in the i+k loop is transcribed verbatim).
* The near-point crop in the final assembly compares the SQUARED distance
  against `thLidarNearestDis^2` (:820-825, `dis` there is a squared norm).

Two C++ behaviors cannot be transcribed and are normalized instead:
* `cloudAngle` is an uninitialized stack array in the C++ (read at :525
  for points whose steep-angle branch never ran); here it is
  zero-initialized.  All-finite inputs are assumed (the copy-compaction
  loop :369-388 is then the identity), which also sidesteps the C++'s
  original-index/compacted-index flag mismatch.

Options (`stride4`, `leftover_curv_size`, `back_depth_bug`) default to the
literal C++ behavior; flipping them isolates each documented deviation of
the vectorized kernel so the agreement test can attribute disagreement to
a specific, intended deviation.
"""

from __future__ import annotations

import numpy as np

# constants from unionFeatureExtract.cpp:353-359
TH_DISTANCE_FARAWAY = 50.0
TH_NUM_FLAT = 1
TH_PART_NUM = 50
TH_FLAT_THRESHOLD = 0.02
TH_LIDAR_NEAREST_DIS = 1.0
TH_BREAK_CORNER_DIS = 1.0


def detect_feature_points(pts, intensity, *, stride4=True,
                          leftover_curv_size=True, back_depth_bug=True):
    """Per-point flags + labels for one scan line.

    pts: (N,3) float array, all finite; intensity: (N,).
    Returns (flags, labels): flags are the C++ CloudFeatureFlag values
    (0/1/2/3/100/101/150/300); labels use the kernel's convention
    0 none / 1 corner / 2 surf (corner = flag 100 or 150, surf = flag 2,
    both behind the near crop — :818-842).
    """
    pts = np.asarray(pts, np.float64)
    intensity = np.asarray(intensity, np.float64)
    n = pts.shape[0]
    flag = np.zeros(n, np.int64)
    curv = np.zeros(n)
    depth = np.zeros(n)
    sort_ind = np.zeros(n, np.int64)
    reflect = np.zeros(n)
    reflect_ind = np.zeros(n, np.int64)
    angle = np.zeros(n, np.int64)        # (C++: uninitialized; see docstring)

    th_num_curv_size = 2                 # :353, mutated per point below
    scan_start = 5                       # :402-403
    scan_end = n - 6

    # ---- curvature / depth / reflect (:408-451) ----
    for i in range(5, n - 5):
        dis = float(np.linalg.norm(pts[i]))
        d_last = pts[i - 1] - pts[i]
        d_next = pts[i + 1] - pts[i]
        angle_last = float(d_last @ pts[i] /
                           (np.linalg.norm(d_last) * np.linalg.norm(pts[i])))
        angle_next = float(d_next @ pts[i] /
                           (np.linalg.norm(d_next) * np.linalg.norm(pts[i])))
        steep = abs(angle_last) > 0.966 and abs(angle_next) > 0.966
        th_num_curv_size = 2 if (dis > TH_DISTANCE_FARAWAY or steep) else 3
        if steep:
            angle[i] = 1
        diff = -2 * th_num_curv_size * pts[i].copy()
        diff_r = -2 * th_num_curv_size * intensity[i]
        for j in range(1, th_num_curv_size + 1):
            diff += pts[i - j] + pts[i + j]
            diff_r += intensity[i - j] + intensity[i + j]
        depth[i] = dis
        curv[i] = float(diff @ diff)
        sort_ind[i] = i
        reflect[i] = diff_r
        reflect_ind[i] = i

    if not leftover_curv_size:
        # deviation toggle: per-point adaptive half-window for the
        # flat-neighbor marking below (what the vectorized kernel does)
        per_point_half = np.where(
            (depth > TH_DISTANCE_FARAWAY) | (angle == 1), 2, 3)

    # ---- segmented flat selection (:453-541) ----
    for j in range(TH_PART_NUM):
        sp = scan_start + (scan_end - scan_start) * j // TH_PART_NUM
        ep = scan_start + (scan_end - scan_start) * (j + 1) // TH_PART_NUM - 1
        if ep <= sp:
            continue
        # insertion sorts (:458-479) == stable ascending sort of the index
        # slices by value
        seg = sort_ind[sp:ep + 1]
        sort_ind[sp:ep + 1] = seg[np.argsort(curv[seg], kind="stable")]
        seg_r = reflect_ind[sp:ep + 1]
        reflect_ind[sp:ep + 1] = seg_r[np.argsort(reflect[seg_r],
                                                  kind="stable")]

        smallest_picked = 1
        sharpest_picked = 1
        for k in range(sp, ep + 1):
            ind = int(sort_ind[k])
            if flag[ind] != 0:
                continue
            if curv[ind] < (TH_FLAT_THRESHOLD * depth[ind]) ** 2:
                flag[ind] = 3
                half = (th_num_curv_size if leftover_curv_size
                        else int(per_point_half[ind]))
                for l in range(1, half + 1):
                    d = pts[ind + l] - pts[ind + l - 1]
                    if d @ d > 0.02 or depth[ind] > TH_DISTANCE_FARAWAY:
                        break
                    flag[ind + l] = 1
                for l in range(-1, -half - 1, -1):
                    d = pts[ind + l] - pts[ind + l + 1]
                    if d @ d > 0.02 or depth[ind] > TH_DISTANCE_FARAWAY:
                        break
                    flag[ind + l] = 1

        for k in range(sp, ep + 1):
            ind = int(sort_ind[k])
            if ((flag[ind] == 3 and smallest_picked <= TH_NUM_FLAT)
                    or (flag[ind] == 3 and depth[ind] > TH_DISTANCE_FARAWAY)
                    or angle[ind] == 1):
                smallest_picked += 1
                flag[ind] = 2
            idx = int(reflect_ind[k])
            if (curv[idx] < 0.7 * (TH_FLAT_THRESHOLD * depth[idx]) ** 2
                    and sharpest_picked <= 3 and reflect[idx] > 20.0):
                sharpest_picked += 1
                flag[idx] = 300

    # ---- break corners, flag 150 (:543-650) ----
    count_num = 1
    i = 5
    while i < n - 5:
        dep = float(np.linalg.norm(pts[i]))
        ldiff = pts[i - 4] + pts[i - 3] - 4 * pts[i - 2] + pts[i - 1] + pts[i]
        left_flat = float(ldiff @ ldiff) < TH_FLAT_THRESHOLD * dep
        rdiff = pts[i + 4] + pts[i + 3] - 4 * pts[i + 2] + pts[i + 1] + pts[i]
        right_flat = float(rdiff @ rdiff) < TH_FLAT_THRESHOLD * dep
        count_num = 4 if right_flat else 1
        if left_flat and right_flat:
            norm_left = np.zeros(3)
            norm_right = np.zeros(3)
            for k in range(1, 5):
                t = pts[i - k] - pts[i]
                norm_left += (k / 10.0) * t / np.linalg.norm(t)
                t = pts[i + k] - pts[i]
                norm_right += (k / 10.0) * t / np.linalg.norm(t)
            cc = abs(norm_left @ norm_right /
                     (np.linalg.norm(norm_left) * np.linalg.norm(norm_right)))
            last_dis = float(np.linalg.norm(pts[i - 4] - pts[i]))
            curr_dis = float(np.linalg.norm(pts[i + 4] - pts[i]))
            if cc < 0.5 and last_dis > 0.05 and curr_dis > 0.05:
                flag[i] = 150
        i += count_num if stride4 else 1

    # ---- depth-gap corners, 100 -> 101 (:651-806) ----
    for i in range(5, n - 5):
        diff_right0 = float(np.linalg.norm(pts[i + 1] - pts[i]))
        diff_left0 = float(np.linalg.norm(pts[i - 1] - pts[i]))
        depth_right = float(np.linalg.norm(pts[i + 1]))
        depth_left = float(np.linalg.norm(pts[i - 1]))
        if abs(diff_right0 - diff_left0) > TH_BREAK_CORNER_DIS:
            if diff_right0 > diff_left0:
                surf_vec = pts[i - 1] - pts[i]
                cc = abs(surf_vec @ pts[i] /
                         (np.linalg.norm(surf_vec) * np.linalg.norm(pts[i])))
                if cc < 0.95:
                    if depth_right > depth_left or depth_right == 0:
                        flag[i] = 100
            else:
                surf_vec = pts[i + 1] - pts[i]
                cc = abs(surf_vec @ pts[i] /
                         (np.linalg.norm(surf_vec) * np.linalg.norm(pts[i])))
                if cc < 0.95:
                    if depth_right < depth_left or depth_left == 0:
                        flag[i] = 100

        if flag[i] == 100:
            norm_front = np.zeros(3)
            norm_back = np.zeros(3)
            for k in range(1, 4):
                if np.linalg.norm(pts[i - k]) < 1:
                    continue
                t = pts[i - k] - pts[i]
                norm_front += (k / 6.0) * t / np.linalg.norm(t)
            for k in range(1, 4):
                # the C++ reads points[i - k]'s depth in this i+k loop
                # (unionFeatureExtract.cpp:782); back_depth_bug=False uses
                # the evident intent (i + k), which is what the vectorized
                # kernel implements
                gate = pts[i - k] if back_depth_bug else pts[i + k]
                if np.linalg.norm(gate) < 1:
                    continue
                t = pts[i + k] - pts[i]
                norm_back += (k / 6.0) * t / np.linalg.norm(t)
            nf = np.linalg.norm(norm_front)
            nb = np.linalg.norm(norm_back)
            cc = abs(norm_front @ norm_back / (nf * nb)) if nf * nb > 0 \
                else 1.0
            if cc >= 0.95:
                flag[i] = 101

    # ---- final label assembly (:818-842) ----
    labels = np.zeros(n, np.int64)
    for i in range(5, n - 5):
        dis_sq = float(pts[i] @ pts[i])
        if dis_sq < TH_LIDAR_NEAREST_DIS ** 2:
            continue
        if flag[i] == 2:
            labels[i] = 2
        elif flag[i] in (100, 150):
            labels[i] = 1
    return flag, labels
