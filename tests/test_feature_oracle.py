"""Agreement of the vectorized feature kernel vs the literal C++ oracle.

VERDICT round-1 item 4: the three documented deviations of
ops/features.py from detectFeaturePoints (unionFeatureExtract.cpp:341-844)
were argued, not measured.  feature_oracle.py is the literal transcription;
this test measures label agreement on realistic ray-cast rings and
attributes the disagreement to the intended deviations by also comparing
against the "intent" oracle (deviation toggles off).
"""

import numpy as np

from mmloam_tpu.config import tiny_config
from mmloam_tpu.data import synthetic
from mmloam_tpu.ops import features

from feature_oracle import detect_feature_points


def _rings(seed=0, n_az=720, n_poses=3):
    """Ray-cast rings from the default world at a few poses."""
    world = synthetic.default_world()
    traj = synthetic.Trajectory(speed=0.8, yaw_rate=0.3)
    rng = np.random.default_rng(seed)
    rings = []
    for i in range(n_poses):
        t = 2.0 * i
        pts, valid, _ = synthetic.simulate_scan(
            world, traj.rot(t), traj.pos(t), n_az=n_az, noise=0.002, rng=rng)
        assert valid.all()  # closed room: every ray hits
        # a few rings per pose, varied elevations
        for L in (0, 5, 8, 12):
            inten = rng.uniform(5.0, 15.0, n_az)
            rings.append((pts[L].astype(np.float64), inten))
    return rings


def _kernel_labels(pts, inten, cfg):
    import jax.numpy as jnp
    lab = features.extract_line_features(
        jnp.asarray(pts, jnp.float32), jnp.asarray(inten, jnp.float32),
        jnp.int32(pts.shape[0]), cfg)
    return np.asarray(lab)


def _stats(lab_a, lab_b, cls):
    """(recall of b vs a, precision) for label class cls."""
    a = lab_a == cls
    b = lab_b == cls
    if a.sum() == 0:
        return 1.0, 1.0
    recall = (a & b).sum() / max(a.sum(), 1)
    precision = (a & b).sum() / max(b.sum(), 1)
    return recall, precision


def test_kernel_matches_literal_oracle():
    cfg = tiny_config()
    rings = _rings()
    tot = {"surf_or": 0, "surf_kr": 0, "surf_both": 0, "surf_flatreg": 0,
           "corner_or": 0, "corner_kr": 0, "corner_int": 0,
           "corner_lit": 0, "corner_lit_hit": 0}
    for pts, inten in rings:
        flg_lit, lab_lit = detect_feature_points(pts, inten)
        _, lab_int = detect_feature_points(
            pts, inten, stride4=False, leftover_curv_size=False,
            back_depth_bug=False)
        lab_k = _kernel_labels(pts, inten, cfg)

        surf_o = lab_lit == 2
        surf_k = lab_k == 2
        tot["surf_or"] += surf_o.sum()
        tot["surf_kr"] += surf_k.sum()
        tot["surf_both"] += (surf_o & surf_k).sum()
        # flat-REGION consistency: a kernel surf pick must land where the
        # oracle saw a flat candidate/neighbor/pick (flags 1/2/3).  Exact
        # pick identity is tie-broken by curvature argmin within a segment;
        # on smooth walls curvatures are noise-scale and the f32 kernel vs
        # f64 oracle argmin legitimately flips — region membership is the
        # semantics that matters downstream (plane fits).
        tot["surf_flatreg"] += (surf_k & np.isin(flg_lit, (1, 2, 3))).sum()

        # corners: the kernel is designed as a superset of the literal
        # oracle (no i+=4 stride), and should closely match the INTENT
        # oracle (stride off)
        c_int = lab_int == 1
        c_k = lab_k == 1
        c_lit = lab_lit == 1
        tot["corner_or"] += c_int.sum()
        tot["corner_kr"] += c_k.sum()
        tot["corner_int"] += (c_int & c_k).sum()
        tot["corner_lit"] += c_lit.sum()
        tot["corner_lit_hit"] += (c_lit & c_k).sum()

    surf_recall = tot["surf_both"] / max(tot["surf_or"], 1)
    surf_prec = tot["surf_both"] / max(tot["surf_kr"], 1)
    surf_flatreg = tot["surf_flatreg"] / max(tot["surf_kr"], 1)
    corner_recall_int = tot["corner_int"] / max(tot["corner_or"], 1)
    corner_recall_lit = tot["corner_lit_hit"] / max(tot["corner_lit"], 1)
    print(f"surf: oracle {tot['surf_or']} kernel {tot['surf_kr']} "
          f"recall {surf_recall:.3f} precision {surf_prec:.3f} "
          f"flat-region {surf_flatreg:.3f}")
    print(f"corner: intent-oracle {tot['corner_or']} kernel {tot['corner_kr']}"
          f" recall(intent) {corner_recall_int:.3f}"
          f" recall(literal) {corner_recall_lit:.3f}")

    assert tot["surf_or"] > 100          # the fixture exercises the path
    assert surf_recall > 0.8             # exact pick identity (tie-broken)
    assert surf_prec > 0.8
    assert surf_flatreg > 0.97           # region semantics
    # kernel must cover the literal oracle's corners (superset claim) and
    # track the intent oracle closely
    assert corner_recall_lit > 0.9
    assert corner_recall_int > 0.9


def test_deviation_attribution():
    """Quantify each documented deviation within the oracle itself."""
    rings = _rings(seed=1)
    n_pts = 0
    d_stride = 0
    d_curv = 0
    d_depth = 0
    for pts, inten in rings:
        _, base = detect_feature_points(pts, inten)
        _, v1 = detect_feature_points(pts, inten, stride4=False)
        _, v2 = detect_feature_points(pts, inten, leftover_curv_size=False)
        _, v3 = detect_feature_points(pts, inten, back_depth_bug=False)
        n_pts += base.size
        d_stride += (base != v1).sum()
        d_curv += (base != v2).sum()
        d_depth += (base != v3).sum()
    print(f"label deltas over {n_pts} pts: stride4 {d_stride} "
          f"({100*d_stride/n_pts:.2f}%), leftover-curv {d_curv} "
          f"({100*d_curv/n_pts:.2f}%), back-depth {d_depth} "
          f"({100*d_depth/n_pts:.2f}%)")
    # each deviation affects a small fraction of points (<2%), confirming
    # the "each affects <1-2% of points" claim in ops/features.py
    assert d_stride / n_pts < 0.02
    assert d_curv / n_pts < 0.02
    assert d_depth / n_pts < 0.02
