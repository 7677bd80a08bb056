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

# Compile-heavy modules (detector/pipeline/train-step jits): auto-marked
# ``slow`` so CI and quick local runs can deselect them —
#   pytest -q -m "not slow"     fast tier (< ~2 min on the 8-dev CPU mesh)
#   pytest -q                   everything (documented in README)
SLOW_FILES = {
    "test_pipeline.py",
    "test_od_train.py",
    "test_train_step.py",
    "test_yolo.py",
    "test_obb.py",
    "test_refine_head.py",
    "test_orient_head.py",
    "test_refine_crop.py",
    "test_serve_eval.py",
    "test_datagen.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.path.name in SLOW_FILES:
            item.add_marker(pytest.mark.slow)


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
