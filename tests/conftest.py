"""Test env: force an 8-device virtual CPU mesh (no TPU needed).

Must run before jax is imported anywhere — pytest imports conftest first.
"""

import os

# Force override: the environment pre-sets JAX_PLATFORMS to a TPU tunnel
# platform; tests must run on local virtual CPU devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from visiondk_tpu.parallel import build_mesh

    return build_mesh()  # 8 devices, data=8, model=1


@pytest.fixture(scope="session")
def mesh4x2():
    from visiondk_tpu.parallel import build_mesh

    return build_mesh(model=2)  # data=4, model=2
