"""Test environment: fake 8-device CPU mesh (SURVEY.md section 4).

Must run before the first ``import jax`` anywhere in the test process: tests
validate multi-chip sharding on 8 virtual CPU devices, the TPU-world
equivalent of a fake backend.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_cpu_devices():
    import jax

    devices = jax.devices()
    assert len(devices) == 8, f"expected 8 fake CPU devices, got {devices}"
    return devices
