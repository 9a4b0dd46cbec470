"""Test configuration: force CPU with 8 virtual devices so sharding tests run
deterministically without TPU hardware.

Note: this environment's sitecustomize registers an `axon` TPU platform and
forces `jax_platforms="axon,cpu"`, ignoring the JAX_PLATFORMS env var — so we
must override via `jax.config.update` after import.
"""
import os

# tests run on forced-CPU: disable the package's persistent compile cache
# (XLA:CPU AOT entries embed machine-feature lists that vary across flag
# configurations and reload with SIGILL-risk warnings)
os.environ.setdefault("LLDSLAM_NO_COMPILE_CACHE", "1")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
