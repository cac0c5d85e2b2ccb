"""Test configuration: force CPU with a virtual 8-device mesh.

Multi-chip sharding logic is validated on a host-platform device mesh
(``xla_force_host_platform_device_count=8``), the substitute for real
multi-chip TPU hardware in CI (see SURVEY.md section 4).

The axon TPU plugin registers itself via sitecustomize and overrides
``JAX_PLATFORMS``, so CPU must be forced through ``jax.config`` after the
import (env vars alone are not honored).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the CLI E2E tests dominate suite wall-clock
# with XLA recompiles of identical computations across processes/runs.
# The dir is keyed by the host CPU's feature set: this environment
# live-migrates across heterogeneous machines, and XLA:CPU AOT results
# compiled on one machine type can SIGILL on another.
import hashlib  # noqa: E402


def _cpu_fingerprint() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    return "unknown"


jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..",
                 f".jax_cache_cpu_{_cpu_fingerprint()}"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
