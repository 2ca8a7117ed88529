"""Test harness config.

Tests run on a virtual 8-device CPU mesh so that multi-chip sharding paths
(`jax.sharding.Mesh` + `shard_map`) are exercised without TPU hardware, per
SURVEY.md §4.  Must run before any `import jax`.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The env var alone is not enough on machines where an experimental TPU
# plugin registers itself; the config update reliably pins the CPU backend.
jax.config.update("jax_platforms", "cpu")

# x64 for math-substrate tests against scipy ground truth; engine code paths
# construct f32 arrays explicitly so f32 behavior is still exercised.
jax.config.update("jax_enable_x64", True)

