"""Test harness configuration.

Unit tests run on CPU with a virtual 8-device mesh so sharding logic is
exercised without TPU hardware (multi-chip dry-run strategy per the repo
contract).  Must run before jax is imported anywhere.
"""

import os

# Force CPU regardless of ambient configuration (the dev box routes the
# default platform to a tunneled TPU; unit tests must not depend on it).
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin force-selects itself regardless of JAX_PLATFORMS, so
# pin the platform through jax.config (which wins over plugin registration).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
