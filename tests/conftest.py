"""Test env: force an 8-device virtual CPU mesh (no TPU needed).

The container's sitecustomize imports jax at interpreter startup (with
JAX_PLATFORMS=axon pointing at a single tunneled TPU), so env-var overrides
alone are too late — ``jax.config.update`` switches the platform before the
backend is initialized, and XLA_FLAGS is still read at CPU-client creation.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"  # effective if jax not yet imported

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # effective even if already imported
assert len(jax.devices()) == 8, jax.devices()

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_current_mesh():
    """CenterProcessor publishes its mesh process-globally (set_current_mesh)
    and tests that construct one would otherwise leak it into later tests'
    fused-kernel gates."""
    yield
    from visiondk_tpu.parallel.mesh import set_current_mesh

    set_current_mesh(None)


@pytest.fixture(scope="session")
def mesh8():
    from visiondk_tpu.parallel import build_mesh

    return build_mesh()  # 8 devices, data=8, model=1


@pytest.fixture(scope="session")
def mesh4x2():
    from visiondk_tpu.parallel import build_mesh

    return build_mesh(model=2)  # data=4, model=2
