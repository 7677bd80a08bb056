"""Test config: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize pre-imports jax and pins JAX_PLATFORMS=axon (the
tunneled TPU). Tests must run on local CPU with 8 virtual devices, so we flip
the platform via jax.config BEFORE any backend initializes (conftest imports
before any test touches jax arrays) and inject the host-device-count XLA flag.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from mtgvision_tpu.parallel.mesh import make_mesh

    return make_mesh(8)


@pytest.fixture()
def rng():
    return np.random.default_rng(42)


@pytest.fixture()
def key():
    return jax.random.PRNGKey(42)
