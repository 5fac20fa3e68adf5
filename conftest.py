# Root conftest: make the repo root importable and force a virtual 8-device
# CPU platform for tests BEFORE the jax backend initializes.
#
# NOTE: this machine's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon (the real-TPU tunnel), so the env var is already captured
# by jax.config when pytest starts; we must override via jax.config directly.
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_platform = os.environ.get("FIUDE_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)
