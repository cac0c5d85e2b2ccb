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
