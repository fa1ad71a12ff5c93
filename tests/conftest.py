"""Test configuration: run on CPU with 8 virtual devices for mesh tests.

Mirrors SURVEY.md section 4's test plan: multi-chip paths are validated via
jax's host-platform device-count emulation.
"""

import os

# NOTE: the JAX_PLATFORMS env var is not honored by this machine's 'axon'
# TPU plugin; jax.config.update('jax_platforms', ...) is, so use that.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
