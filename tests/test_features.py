"""Feature-extraction tests on synthetic scan lines with known geometry."""

import numpy as np
import jax.numpy as jnp

from mmloam_tpu.config import tiny_config
from mmloam_tpu.ops.features import extract_line_features, extract_scan_features
import pytest

CFG = tiny_config()
N = 256


def pad(pts, intensity=None):
    n = pts.shape[0]
    out = np.zeros((N, 3), np.float32)
    out[:n] = pts
    inten = np.zeros(N, np.float32)
    if intensity is not None:
        inten[:n] = intensity
    return (jnp.asarray(out), jnp.asarray(inten), jnp.int32(n))


def flat_wall_line(n=200, dist=5.0):
    """Horizontal sweep hitting a wall x = dist (plane normal = x)."""
    ang = np.linspace(-0.5, 0.5, n)
    x = np.full(n, dist)
    y = dist * np.tan(ang)
    z = np.zeros(n)
    return np.stack([x, y, z], axis=1).astype(np.float32)


def corner_fold_line(n=200, dist=5.0):
    """Sweep across the 90-degree inside corner of walls x=dist and y=dist."""
    ang = np.linspace(np.pi / 4 - 0.35, np.pi / 4 + 0.35, n)
    pts = []
    for a in ang:
        d = np.array([np.cos(a), np.sin(a), 0.0])
        t = dist / d[0] if a <= np.pi / 4 else dist / d[1]
        pts.append(t * d)
    return np.asarray(pts, np.float32)


def depth_gap_line(n=200):
    """Occlusion edge: near wall for the first half, far wall after."""
    ang = np.linspace(-0.4, 0.4, n)
    pts = []
    for a in ang:
        d = np.array([np.cos(a), np.sin(a), 0.0])
        dist = 4.0 if a < 0 else 9.0
        pts.append(dist / d[0] * d)
    return np.asarray(pts, np.float32)


def test_flat_wall_yields_surfs_no_corners():
    labels = np.array(extract_line_features(*pad(flat_wall_line()), CFG))
    assert (labels == 2).sum() >= CFG.feature.th_part_num // 2, "expect ~1 flat/segment"
    assert (labels == 1).sum() == 0, "no corners on a flat wall"


@pytest.mark.smoke
def test_corner_fold_detected():
    pts = corner_fold_line()
    labels = np.array(extract_line_features(*pad(pts), CFG))
    corner_idx = np.where(labels == 1)[0]
    assert len(corner_idx) >= 1
    # fold is at angle 0 => index n/2
    assert np.min(np.abs(corner_idx - 100)) <= 3, f"corner at {corner_idx}"


def test_depth_gap_corner_detected():
    pts = depth_gap_line()
    labels = np.array(extract_line_features(*pad(pts), CFG))
    corner_idx = np.where(labels == 1)[0]
    assert len(corner_idx) >= 1
    assert np.min(np.abs(corner_idx - 100)) <= 3, f"corner at {corner_idx}"


def test_near_points_cropped():
    pts = flat_wall_line(dist=0.8)  # inside the 1 m crop
    labels = np.array(extract_line_features(*pad(pts), CFG))
    assert (labels != 0).sum() == 0


def test_padding_is_inert():
    pts = flat_wall_line(n=150)
    p1, i1, n1 = pad(pts)
    # poison the padding region
    p2 = p1.at[150:].set(123.0)
    l1 = np.array(extract_line_features(p1, i1, n1, CFG))
    l2 = np.array(extract_line_features(p2, i1, n1, CFG))
    np.testing.assert_array_equal(l1, l2)
    assert (l1[150:] == 0).all()


def test_boundary_margins_unlabeled():
    labels = np.array(extract_line_features(*pad(flat_wall_line(n=200)), CFG))
    assert (labels[:5] == 0).all() and (labels[194:] == 0).all()


def test_vmap_over_lines():
    lines = np.stack([flat_wall_line(), depth_gap_line(),
                      corner_fold_line(), flat_wall_line(dist=8.0)])
    pts = np.zeros((4, N, 3), np.float32)
    pts[:, :200] = lines
    inten = np.zeros((4, N), np.float32)
    nv = np.full(4, 200, np.int32)
    labels = np.array(extract_scan_features(
        jnp.asarray(pts), jnp.asarray(inten), jnp.asarray(nv), CFG))
    assert labels.shape == (4, N)
    assert (labels[0] == 2).sum() > 10
    assert (labels[1] == 1).sum() >= 1
