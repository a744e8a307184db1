"""Test configuration: force an 8-device virtual CPU mesh in f64.

Tests must run identically with and without TPU hardware; multi-chip sharding
is validated on a virtual CPU mesh (xla_force_host_platform_device_count=8),
mirroring how the driver dry-runs the multi-chip path.

Note: the ambient environment pins JAX_PLATFORMS to the TPU plugin and a
sitecustomize hook imports jax at interpreter startup, so env vars set here
are too late — we go through jax.config.update instead (valid until the first
backend initialization, which pytest has not triggered yet at conftest time).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
