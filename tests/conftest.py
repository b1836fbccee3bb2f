"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are tested on fake CPU devices
(``--xla_force_host_platform_device_count``), the standard JAX approach for
testing pjit/shard_map code without hardware. The axon TPU plugin registers
itself through sitecustomize, so we both set the env vars and explicitly point
jax at the CPU platform before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    devices = jax.devices()
    assert devices[0].platform == "cpu", f"tests must run on CPU, got {devices}"
    assert len(devices) == 8, f"expected 8 virtual devices, got {len(devices)}"
    yield
