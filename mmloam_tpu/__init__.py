"""mmloam_tpu — a TPU-native multi-modal LiDAR-inertial odometry & mapping engine.

A ground-up JAX/XLA/Pallas re-design of the capabilities of TIERS/multi-modal-loam
(reference: /root/reference, a ROS1/PCL/Ceres C++ stack).  Instead of three OS
processes communicating over TCPROS with mutex-guarded queues, kd-trees and a
CPU nonlinear solver, this engine is a single pure function

    step(state, frame) -> (state, outputs)

driven by a pre-decoded sensor tensor store:

* feature extraction   — fixed-shape curvature/classification kernels, vmapped
                         over scan lines (reference: unionFeatureExtract.cpp:341)
* IMU preintegration   — jax.lax.scan 15x15 propagation
                         (reference: lio/IMUIntegrator.cpp:108)
* map + KNN            — dense torus voxel grid with centroid cells and
                         stencil-gather k-NN (reference: lio/Map_Manager.cpp,
                         pcl::KdTreeFLANN 5-NN)
* sliding-window MAP   — batched residual/Jacobian evaluation and an on-device
                         dogleg trust-region solver over dense normal equations
                         (reference: lio/Estimator.cpp:1143, Ceres DENSE_SCHUR)
* marginalization      — 30-dim Schur complement with eigen thresholding
                         (reference: utils/ceresfunc.h:149)

Multi-sequence scale-out is plain data parallelism: `vmap(step)` over
sequences on one chip and `shard_map` over a `jax.sharding.Mesh` across chips.
"""

__version__ = "0.1.0"

import jax as _jax

# The default TPU matmul precision multiplies f32 operands through bf16
# passes, which measurably degrades trajectory accuracy (2.6x worse ATE on
# the synthetic hall benchmark).  The engine's matmuls are tiny (normal
# equations, 3x3/15x15 blocks), so full f32 precision costs nothing here.
_jax.config.update("jax_default_matmul_precision", "highest")

# The step graph is large (estimator branches + solver loops); cache
# compiled executables across processes.
import os as _os

_cache_dir = _os.environ.get("MMLOAM_JAX_CACHE",
                             _os.path.expanduser("~/.cache/mmloam_jax"))
# CPU runs (tests) must NOT use the persistent cache: XLA:CPU serializes
# AOT executables pinned to the build machine's CPU features, and loading
# or re-writing them on a different host segfaults inside
# compilation_cache.put_executable_and_time (observed in this container).
# TPU executables are device-targeted and safe to cache.
if _cache_dir and _os.environ.get("JAX_PLATFORMS", "") != "cpu":
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # pragma: no cover — cache is best-effort
        pass
