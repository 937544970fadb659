"""Test configuration: force a virtual 8-device CPU mesh.

The container's sitecustomize registers a remote-TPU (axon) PJRT backend in every
python process before conftest runs, which would make unit tests compile remotely.
Tests must run on the CPU backend with 8 virtual devices (SURVEY.md §4's
multi-device test strategy), so we force the platform to cpu and clear any
already-initialised backends.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax._src.xla_bridge._clear_backends()
except Exception:  # pragma: no cover - private API fallback
    pass
assert jax.devices()[0].platform == "cpu"

jax.config.update("jax_default_matmul_precision", "highest")
