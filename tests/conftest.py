import os

# CPU backend with a virtual 8-device mesh for sharding tests; float64 for
# numerical cross-validation against scipy.
#
# NOTE: this environment's sitecustomize registers a TPU plugin and forces
# platform selection, so the JAX_PLATFORMS env var alone is not enough — the
# jax.config update below is what actually pins the tests to CPU.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags +
                               " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
