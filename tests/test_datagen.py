"""Catalog + encoder pair-generation tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtgvision_tpu.data.catalog import ProceduralBackgrounds, ProceduralCatalog
from mtgvision_tpu.data.encoder_gen import (
    EncoderDataset,
    make_cropped,
    make_masked,
    make_pair_batch,
    make_virtual,
)

CARD_HW = (112, 80)  # small for test speed; divisible geometry not required here


@pytest.fixture(scope="module")
def catalog():
    return ProceduralCatalog(n_cards=32, n_names=16, n_sets=4, card_hw=CARD_HW)


@pytest.fixture(scope="module")
def bgs():
    return ProceduralBackgrounds(bg_hw=(128, 128))


def test_catalog_determinism(catalog):
    c = catalog.get_card_by_id("proc-000003")
    a = catalog.get_image(c)
    b = catalog.get_image(c)
    assert a.shape == (*CARD_HW, 3) and a.dtype == np.float32
    assert np.allclose(a, b)
    assert 0.0 <= a.min() and a.max() <= 1.0


def test_catalog_labels(catalog):
    c = catalog.get_card_by_id("proc-000005")
    card_i, name_i, set_i = catalog.card_get_labels(c)
    assert card_i == 5
    assert 0 <= name_i < catalog.num_names
    assert 0 <= set_i < catalog.num_sets


def test_similar_card_same_name_diff_id(catalog):
    rng = np.random.default_rng(0)
    c = catalog.get_card_by_id("proc-000003")
    sim = catalog.get_similar_card(c, rng)
    assert sim.name == c.name
    assert sim.id != c.id  # 32 cards / 16 names → every name has 2 printings
    # same-name printings share art but differ in frame
    a, b = catalog.get_image(c), catalog.get_image(sim)
    assert not np.allclose(a, b)


def test_make_cropped_masked(catalog):
    img = jnp.asarray(catalog.get_image(catalog.card_by_index(0)))
    y = make_cropped(img, (96, 64))
    assert y.shape == (96, 64, 3)
    m = make_masked(img)
    assert m.shape == (*CARD_HW, 4)
    assert float(m[0, 0, 3]) == 0.0  # rounded corner
    assert float(m[CARD_HW[0] // 2, CARD_HW[1] // 2, 3]) == 1.0


def test_make_virtual(catalog, bgs, key):
    card = jnp.asarray(catalog.get_image(catalog.card_by_index(1)))
    bg = jnp.asarray(bgs.ran_image(np.random.default_rng(0)))
    v = make_virtual(key, card, bg, (96, 64))
    assert v.shape == (96, 64, 3)
    assert np.isfinite(np.asarray(v)).all()
    v2 = make_virtual(jax.random.PRNGKey(9), card, bg, (96, 64))
    assert not np.allclose(v, v2)  # different key → different augs


def test_dataset_batch(catalog, bgs):
    ds = EncoderDataset(
        catalog, bgs, default_batch_size=4, x_size_hw=(96, 64), y_size_hw=(96, 64)
    )
    batch = ds.random_batch()
    assert set(batch) == {"y", "x", "x_labels", "x2", "x2_labels"}
    assert batch["x"].shape == (4, 96, 64, 3)
    assert batch["y"].shape == (4, 96, 64, 3)
    assert batch["x_labels"].shape == (4, 3)
    assert batch["x_labels"].dtype == np.int32
    # x is augmented — differs from clean y
    assert not np.allclose(batch["x"], batch["y"])


def test_dataset_similar_neg_prob(catalog, bgs):
    ds = EncoderDataset(
        catalog, bgs, default_batch_size=16, x_size_hw=(96, 64),
        similar_neg_prob=1.0, seed=1,
    )
    b = ds.random_batch()
    # all pairs forced to similar negatives: same name label, different card id
    assert (b["x_labels"][:, 1] == b["x2_labels"][:, 1]).all()
    assert (b["x_labels"][:, 0] != b["x2_labels"][:, 0]).all()


def test_dataset_target_is_input(catalog, bgs):
    ds = EncoderDataset(
        catalog, bgs, default_batch_size=4, x_size_hw=(96, 64), y_size_hw=(96, 64),
        target_is_input_prob=1.0,
    )
    b = ds.random_batch()
    assert np.allclose(b["x"], b["y"])  # every x swapped for the clean crop


def test_image_batch_by_ids(catalog, bgs):
    ds = EncoderDataset(catalog, bgs, x_size_hw=(96, 64), y_size_hw=(96, 64))
    b = ds.image_batch_by_ids(["proc-000001", "proc-000002"])
    assert b["x"].shape[0] == 2
    assert list(b["x_labels"][:, 0]) == [1, 2]


def test_make_virtual_occluder(catalog, bgs, key):
    """p_occlude=1 composites the occluder card over the target: the virtual
    image must differ from the unoccluded one with the same key, and the
    occluder must not repaint the whole canvas."""
    card = jnp.asarray(catalog.get_image(catalog.card_by_index(1)))
    occ = jnp.asarray(catalog.get_image(catalog.card_by_index(2)))
    bg = jnp.asarray(bgs.ran_image(np.random.default_rng(0)))
    base = make_virtual(key, card, bg, (96, 64), occ_img=occ, p_occlude=0.0)
    v = make_virtual(key, card, bg, (96, 64), occ_img=occ, p_occlude=1.0)
    assert v.shape == (96, 64, 3)
    assert np.isfinite(np.asarray(v)).all()
    diff = np.abs(np.asarray(v) - np.asarray(base)).mean(-1) > 0.05
    frac = diff.mean()
    assert 0.02 < frac < 0.95, f"occluder changed {frac:.2%} of the canvas"


def test_sampled_batch_occlusion_gate():
    """p_occlude=0 and p_occlude>0 both run through the fully device-side
    sampler (the production path), shapes intact."""
    from mtgvision_tpu.data.encoder_gen import (
        DeviceBgPool,
        DeviceCardPool,
        make_pair_batch_sampled,
    )

    cat = ProceduralCatalog(n_cards=16, n_names=8, n_sets=2, card_hw=CARD_HW)
    rng = np.random.default_rng(0)
    pool = DeviceCardPool(cat, 16, rng)
    bgp = DeviceBgPool(ProceduralBackgrounds(bg_hw=(128, 128)), 4, rng)
    for p in (0.0, 0.5):
        out = make_pair_batch_sampled(
            jax.random.PRNGKey(3), pool.images, bgp.images,
            pool.slot_labels_dev, pool.similar_table,
            batch_size=4, x_size_hw=(96, 64), y_size_hw=(96, 64), p_occlude=p,
        )
        assert out["x"].shape == (4, 96, 64, 3)
        assert np.isfinite(np.asarray(out["x"])).all()


def test_dataset_p_occlude_reaches_pooled_paths(catalog, bgs):
    """EncoderDataset(p_occlude=…) must flow into BOTH pooled batch paths
    (device_sampling and host-index make_pair_batch_pooled) — the scan
    trainer reads config.p_occlude directly, so a dataset that dropped it
    would silently train the non-scan path without occlusion."""
    for device_sampling in (True, False):
        ds = EncoderDataset(
            catalog, bgs, default_batch_size=4,
            x_size_hw=(96, 64), y_size_hw=(96, 64),
            device_sampling=device_sampling, p_occlude=1.0, seed=7,
        )
        ds0 = EncoderDataset(
            catalog, bgs, default_batch_size=4,
            x_size_hw=(96, 64), y_size_hw=(96, 64),
            device_sampling=device_sampling, p_occlude=0.0, seed=7,
        )
        b, b0 = ds.random_batch(), ds0.random_batch()
        assert b["x"].shape == b0["x"].shape
        # same seed, only the occluder differs: p=1 must change the pixels
        assert not np.allclose(np.asarray(b["x"]), np.asarray(b0["x"]))


def test_procedural_confusable_printings():
    """Confusable mode: same-name printings differ ONLY in the small
    set-symbol glyph (~1-2% of pixels); legacy mode differs broadly."""
    from mtgvision_tpu.data.catalog import ProceduralCatalog

    for confusable, lo, hi in ((True, 0.0, 0.03), (False, 0.10, 1.0)):
        cat = ProceduralCatalog(n_cards=8, n_names=4, card_hw=(112, 80),
                                confusable=confusable)
        by_name = {}
        for c in cat:
            by_name.setdefault(c.name, []).append(c)
        pair = next(v for v in by_name.values() if len(v) == 2)
        a, b = (cat.get_image(c) for c in pair)
        diff_frac = float((np.abs(a - b).max(-1) > 0.05).mean())
        assert lo <= diff_frac <= hi, (confusable, diff_frac)
        if confusable:
            assert diff_frac > 0.0  # printings must still be distinguishable
