"""Full ingest path: synthetic sequence -> bag file -> native decode ->
ScanInput tensors -> pipeline steps."""

import os

import numpy as np
import jax
import pytest

from mmloam_tpu import pipeline, replay
from mmloam_tpu.config import tiny_config
from mmloam_tpu.data import bagwriter, decode, synthetic

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(os.path.dirname(__file__), "..",
                                    "mmloam_tpu", "data",
                                    "libmmloam_native.so")),
    reason="native decoder not built")

CFG = tiny_config()


def sequence_to_bag(scans, path, t0=100.0):
    """Stacked ScanInput -> bag messages (inverse of decode)."""
    n = scans.t.shape[0]
    msgs = []
    seq_imu = 0
    t_prev = t0 + float(scans.t[0]) - 0.1
    for i in range(n):
        t_curr = t0 + float(scans.t[i])
        # IMU messages at absolute times reconstructed from the window dts
        dts = np.array(scans.imu_dt[i])
        mask = np.array(scans.imu_mask[i])
        # reconstruct absolute sample times; snap to the 200 Hz grid so f32
        # dt accumulation noise cannot push a sample across a window edge
        ts = np.round((t_prev + np.cumsum(dts.astype(np.float64))) * 200.0) / 200.0
        for j in np.where(mask)[0]:
            msgs.append(("/livox/imu", "sensor_msgs/Imu", float(ts[j]),
                         bagwriter.serialize_imu(
                             seq_imu, float(ts[j]),
                             np.array(scans.imu_gyr[i, j]),
                             np.array(scans.imu_acc[i, j]))))
            seq_imu += 1
        # flatten rings into one PC2 cloud with ring + time fields
        L, N = scans.pts.shape[1:3]
        xyz, inten, ring, rel = [], [], [], []
        for l in range(L):
            k = int(scans.n_valid[i, l])
            xyz.append(np.array(scans.pts[i, l, :k]))
            inten.append(np.array(scans.intensity[i, l, :k]))
            ring.append(np.full(k, l, np.int64))
            rel.append(np.array(scans.rel_time[i, l, :k]))
        xyz = np.concatenate(xyz)
        msgs.append(("/velodyne_points", "sensor_msgs/PointCloud2", t_curr,
                     bagwriter.serialize_pointcloud2(
                         i, t_curr, xyz, np.concatenate(inten),
                         np.concatenate(ring), np.concatenate(rel))))
        t_prev = t_curr
    msgs.sort(key=lambda m: m[2])
    bagwriter.write_bag(path, msgs)


@pytest.mark.slow
def test_bag_ingest_matches_direct(tmp_path):
    from mmloam_tpu.data.rosbag import BagReader

    world = synthetic.default_world()
    traj = synthetic.Trajectory(speed=0.8, z_amp=0.15)
    scans, _, _ = replay.make_sequence(world, traj, 0.0, 6, CFG, n_az=360,
                                       dtype=np.float32)
    path = tmp_path / "seq.bag"
    sequence_to_bag(scans, path)

    bag = BagReader(path)
    decoded = decode.sequence_from_bag(bag, CFG, n_lines=16, max_pts=360)
    assert decoded.pts.shape[0] == 6

    # ring contents must match the original (ring packing preserves order)
    for i in (0, 3):
        np.testing.assert_array_equal(np.array(decoded.n_valid[i]),
                                      np.array(scans.n_valid[i]))
        np.testing.assert_allclose(np.array(decoded.pts[i]),
                                   np.array(scans.pts[i]), rtol=1e-6)

    # IMU windows are integration-equivalent from scan 1 on (the decoder
    # invents the first window's start, so scan 0 may differ at the edge;
    # the decoder also prepends the boundary-interpolated sample at t0 with
    # dt=0, fetchImuMsgs :359-376)
    for i in (2, 3):
        nd = int(np.array(decoded.imu_mask[i]).sum())
        ns = int(np.array(scans.imu_mask[i]).sum())
        off = nd - ns          # 1 when a straddling sample existed, else 0
        assert off in (0, 1)
        np.testing.assert_allclose(np.array(decoded.imu_gyr[i, off:nd]),
                                   np.array(scans.imu_gyr[i, :ns]), atol=1e-6)
        np.testing.assert_allclose(float(decoded.imu_dt[i].sum()),
                                   float(scans.imu_dt[i].sum()), atol=1e-3)

    # the decoded tensors drive the pipeline
    state = pipeline.init_state(CFG)
    state, outs = replay.replay(state, decoded, CFG)
    assert bool(np.isfinite(np.array(outs.pose_p)).all())
    bag.close()


def test_bag_ingest_with_hori(tmp_path):
    from mmloam_tpu.data.rosbag import BagReader

    world = synthetic.default_world()
    traj = synthetic.Trajectory(speed=0.8, z_amp=0.15)
    scans, _, _ = replay.make_sequence(world, traj, 0.0, 4, CFG, n_az=360,
                                       dtype=np.float32)
    path = tmp_path / "dual.bag"
    # reuse the velo/imu writer, then append livox CustomMsgs covering the
    # scan intervals (timebase at interval start, offsets within)
    sequence_to_bag(scans, path)
    msgs = []
    rng = np.random.default_rng(7)
    for i in range(4):
        t_end = 100.0 + float(scans.t[i])
        t_start = t_end - 0.1
        pts = [(int(o * 1e9), *rng.uniform(-5, 5, 3), 30, 0, int(l))
               for o, l in zip(np.linspace(0.001, 0.099, 120),
                               rng.integers(0, 6, 120))]
        msgs.append(("/livox/lidar", "livox_ros_driver/CustomMsg", t_start,
                     bagwriter.serialize_livox(i, t_start, int(t_start * 1e9),
                                               pts)))
    # append to the existing bag by rewriting with the extra messages
    import struct
    existing = path.read_bytes()
    extra = b""
    conn_id = 99
    ch = bagwriter._header({"topic": b"/livox/lidar",
                            "type": b"livox_ros_driver/CustomMsg",
                            "md5sum": b"0" * 32, "message_definition": b""})
    extra += bagwriter._record({"op": b"\x07",
                                "conn": struct.pack("<I", conn_id),
                                "topic": b"/livox/lidar"}, ch)
    for topic, tname, t, payload in msgs:
        extra += bagwriter._record({"op": b"\x02",
                                    "conn": struct.pack("<I", conn_id),
                                    "time": bagwriter._time(t)}, payload)
    chunk = bagwriter._record({"op": b"\x05", "compression": b"none",
                               "size": struct.pack("<I", len(extra))}, extra)
    path.write_bytes(existing + chunk)

    bag = BagReader(path)
    decoded = decode.sequence_from_bag(bag, CFG, n_lines=16, max_pts=360,
                                       hori_topic="/livox/lidar")
    assert decoded.hori_pts is not None
    assert decoded.hori_pts.shape == (4, CFG.scan.hori_n_lines,
                                      CFG.scan.hori_max_pts_per_line, 3)
    # each interval received its 120 stream points (minus boundary rounding)
    totals = np.array(decoded.hori_n_valid).sum(axis=1)
    assert (totals >= 100).all(), totals
    bag.close()
