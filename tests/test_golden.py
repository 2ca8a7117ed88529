"""Golden-trajectory regression (SURVEY.md §4): the full pipeline's output
on a fixed synthetic sequence must stay stable across refactors.

Regenerate deliberately (after an intentional semantic change) with the
snippet in tests/golden/README; a silent drift here means an accidental
behavior change somewhere in features/solver/pipeline.
"""

import os

import numpy as np

import jax

from mmloam_tpu import pipeline, replay
from mmloam_tpu.config import tiny_config
from mmloam_tpu.data import synthetic
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "hall_25.npz")


@pytest.mark.slow
def test_golden_hall_trajectory():
    CFG = tiny_config()
    world = synthetic.default_world()
    traj = synthetic.Trajectory(speed=0.8, z_amp=0.15)
    scans, _, _ = replay.make_sequence(world, traj, 0.0, 25, CFG, n_az=360,
                                       dtype=np.float32)
    state = pipeline.init_state(CFG)
    state, outs = replay.replay(state, scans, CFG)
    g = np.load(GOLDEN)
    np.testing.assert_array_equal(np.array(outs.inited), g["inited"])
    np.testing.assert_array_equal(np.array(outs.fail), g["fail"])
    # The CI suite is pinned to CPU (conftest), where the golden was
    # produced — assert tight (~f32 ulp noise over 25 chained solves) so a
    # silent mm-scale behavior drift cannot pass.  Keep the loose bound
    # only for an explicit TPU-backend run (reduction order differs).
    atol = 5e-3 if jax.default_backend() != "cpu" else 1e-5
    np.testing.assert_allclose(np.array(outs.pose_p), g["pose_p"], atol=atol)
    np.testing.assert_allclose(np.array(outs.n_corner), g["n_corner"],
                               atol=0, rtol=0)
