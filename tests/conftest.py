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
    "test_models.py",
}

# individually compile-heavy tests in otherwise-fast modules (measured with
# --durations; the rest of each module stays in the fast tier)
SLOW_NODES = (
    "test_checkpoint.py::test_train_loop_smoke",
    "test_checkpoint.py::test_restore_into_train_state",
    "test_system.py::test_load_detector_roundtrip",
    "test_scene_gen.py::test_scene_sample",
    "test_scene_gen.py::test_scene_obb_labels",
    "test_scene_gen.py::test_yolo_dataset_writer",
    "test_scene_gen.py::test_scene_random_return_cards",
    "test_orient.py::test_refine_corners_beats_coarse",
    "test_ops_warp.py::TestDewarpPallas",
    "test_ops_warp.py::TestDewarpTwoPass::test_matches_gather_warp",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        tail = item.nodeid.split("/")[-1]
        if item.path.name in SLOW_FILES or tail.startswith(SLOW_NODES):
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
