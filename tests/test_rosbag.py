"""Round-trip: Python bag writer -> native C++ decoder."""

import os

import numpy as np
import pytest

from mmloam_tpu.data import bagwriter

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(os.path.dirname(__file__), "..",
                                    "mmloam_tpu", "data",
                                    "libmmloam_native.so")),
    reason="native decoder not built")


def make_bag(path):
    rng = np.random.default_rng(0)
    msgs = []
    # 20 IMU samples at 200 Hz
    imu_t = 100.0 + np.arange(20) / 200.0
    gyrs = rng.normal(0, 0.1, (20, 3))
    accs = rng.normal(0, 0.02, (20, 3)) + [0, 0, 1.0]
    for i, t in enumerate(imu_t):
        msgs.append(("/livox/imu", "sensor_msgs/Imu", t,
                     bagwriter.serialize_imu(i, t, gyrs[i], accs[i])))
    # 2 velodyne clouds
    clouds = []
    for k in range(2):
        n = 50 + 10 * k
        xyz = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
        inten = rng.uniform(0, 100, n).astype(np.float32)
        ring = rng.integers(0, 16, n)
        rel = np.linspace(0, 0.1, n).astype(np.float32)
        t = 100.0 + 0.1 * k
        clouds.append((t, xyz, inten, ring, rel))
        msgs.append(("/velodyne_points", "sensor_msgs/PointCloud2", t,
                     bagwriter.serialize_pointcloud2(k, t, xyz, inten, ring,
                                                     rel)))
    # 1 livox CustomMsg
    lp = [(int(i * 1e4), float(i) * 0.1, -float(i) * 0.05, 1.0, 37, 0, i % 6)
          for i in range(30)]
    msgs.append(("/livox/lidar", "livox_ros_driver/CustomMsg", 100.05,
                 bagwriter.serialize_livox(0, 100.05, int(100.05e9), lp)))
    bagwriter.write_bag(path, msgs)
    return imu_t, gyrs, accs, clouds, lp


def test_roundtrip(tmp_path):
    from mmloam_tpu.data.rosbag import BagReader

    path = tmp_path / "test.bag"
    imu_t, gyrs, accs, clouds, lp = make_bag(path)
    bag = BagReader(path)

    topics = bag.topics()
    assert topics["/livox/imu"] == ("sensor_msgs/Imu", 20)
    assert topics["/velodyne_points"] == ("sensor_msgs/PointCloud2", 2)
    assert topics["/livox/lidar"] == ("livox_ros_driver/CustomMsg", 1)

    t, gyr, acc = bag.read_imu("/livox/imu")
    np.testing.assert_allclose(t, imu_t, atol=1e-9)
    np.testing.assert_allclose(gyr, gyrs, rtol=1e-12)
    np.testing.assert_allclose(acc, accs, rtol=1e-12)

    for k, (ts, xyz, inten, ring, rel) in enumerate(clouds):
        pc = bag.read_pointcloud2("/velodyne_points", k)
        assert abs(pc["stamp"] - ts) < 1e-6
        np.testing.assert_allclose(pc["xyz"], xyz, rtol=1e-6)
        np.testing.assert_allclose(pc["intensity"], inten, rtol=1e-6)
        np.testing.assert_array_equal(pc["ring"], ring)
        np.testing.assert_allclose(pc["time_rel"], rel, rtol=1e-6)
        assert abs(bag.message_stamp("/velodyne_points", k) - ts) < 1e-6

    lv = bag.read_livox("/livox/lidar", 0)
    assert abs(lv["timebase"] - 100.05) < 1e-6
    want = np.asarray([(x, y, z) for _, x, y, z, _, _, _ in lp], np.float32)
    np.testing.assert_allclose(lv["xyz"], want, rtol=1e-6)
    np.testing.assert_array_equal(lv["line"], [i % 6 for i in range(30)])
    np.testing.assert_allclose(lv["offset_s"],
                               [i * 1e4 * 1e-9 for i in range(30)],
                               rtol=1e-5)
    bag.close()


@pytest.mark.smoke
def test_vendor_layouts_roundtrip(tmp_path):
    """Ouster (u32 ns `t`, u8 ring) and Hesai (f64 ABSOLUTE `timestamp`)
    layouts decode with correct ring + per-point relative time; the Hesai
    epoch-scale f64 stamps must survive (a naive f32 cast quantizes
    1.7e9 s to ~256 s steps and destroys the intra-scan ordering).
    Reference layouts: preprocess.h ouster_ros/hesai_ros Point structs.
    """
    import numpy as np

    from mmloam_tpu.data import bagwriter, rosbag

    n = 64
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    inten = np.linspace(0, 63, n).astype(np.float32)
    ring = (np.arange(n) % 4).astype(np.int64)
    rel_s = np.linspace(0.0, 0.1, n)                # true intra-scan times

    t_wall = 1.7e9
    msgs = [
        ("/ouster", "sensor_msgs/PointCloud2", t_wall,
         bagwriter.serialize_pointcloud2_ouster(
             0, t_wall, xyz, inten, ring, (rel_s * 1e9).astype(np.uint64))),
        ("/hesai", "sensor_msgs/PointCloud2", t_wall,
         bagwriter.serialize_pointcloud2_hesai(
             0, t_wall, xyz, inten, ring, t_wall + rel_s)),
    ]
    path = str(tmp_path / "vendors.bag")
    bagwriter.write_bag(path, msgs)
    bag = rosbag.BagReader(path)

    for topic, scale in (("/ouster", 1e9), ("/hesai", 1.0)):
        pc = bag.read_pointcloud2(topic, 0)
        np.testing.assert_allclose(pc["xyz"], xyz, rtol=1e-6)
        np.testing.assert_array_equal(pc["ring"], ring)
        rel = pc["time_rel"] / scale
        # relative times reproduce the true intra-scan ordering to <1 ms
        np.testing.assert_allclose(rel - rel[0], rel_s, atol=1e-3,
                                   err_msg=topic)
