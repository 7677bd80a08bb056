"""Vector index tests: Qdrant-parity API + correctness vs numpy brute force."""

import numpy as np
import pytest

from mtgvision_tpu.index import VectorPoint, VectorStore
from mtgvision_tpu.ops.topk import cosine_topk, topk_scores

import jax
import jax.numpy as jnp


def _mk_store(n=100, d=32, seed=0, mesh=None):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    store = VectorStore(dim=d, capacity=8, mesh=mesh)
    store.save_points(
        [VectorPoint(id=f"card-{i}", vector=v, payload={"i": i}) for i, v in enumerate(vecs)]
    )
    return store, vecs


def _np_topk(q, vecs, k):
    qn = q / np.linalg.norm(q)
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    s = vn @ qn
    return np.argsort(-s)[:k], np.sort(s)[::-1][:k]


def test_save_retrieve_update():
    store, vecs = _mk_store()
    assert len(store) == 100
    [p] = store.retrieve(["card-7"])
    assert p.payload == {"i": 7}
    assert np.allclose(p.vector, vecs[7] / np.linalg.norm(vecs[7]), atol=1e-6)
    store.update_payload("card-7", {"name": "Island"})
    [p] = store.retrieve(["card-7"])
    assert p.payload == {"i": 7, "name": "Island"}
    # unknown ids silently skipped (qdrant parity)
    assert store.retrieve(["nope", "card-3"])[0].id == "card-3"


def test_upsert_overwrites():
    store, vecs = _mk_store(n=10, d=8)
    store.save_points([VectorPoint(id="card-3", vector=np.ones(8, np.float32))])
    assert len(store) == 10
    [p] = store.retrieve(["card-3"])
    assert np.allclose(p.vector, np.ones(8) / np.sqrt(8), atol=1e-6)


def test_query_matches_numpy():
    store, vecs = _mk_store(n=257, d=32)
    q = np.random.default_rng(1).standard_normal(32).astype(np.float32)
    res = store.query_nearby(q, k=5)
    ids_np, scores_np = _np_topk(q, vecs, 5)
    assert [r.id for r in res] == [f"card-{i}" for i in ids_np]
    assert np.allclose([r.score for r in res], scores_np, atol=2e-2)  # bf16 matmul
    assert res[0].payload == {"i": int(ids_np[0])}


def test_query_threshold():
    store, vecs = _mk_store(n=50, d=16)
    q = vecs[10]
    res = store.query_nearby(q, k=10, score_threshold=0.99)
    assert [r.id for r in res] == ["card-10"]


def test_query_batch():
    store, vecs = _mk_store(n=64, d=16)
    qs = vecs[[3, 40]]
    out = store.query_nearby_batch(qs, k=1)
    assert [o[0].id for o in out] == ["card-3", "card-40"]


def test_empty_store():
    store = VectorStore(dim=8)
    assert store.query_nearby(np.ones(8, np.float32), k=3) == []


def test_persistence_roundtrip(tmp_path):
    store, vecs = _mk_store(n=20, d=8)
    store.save_to_dir(tmp_path / "idx")
    loaded = VectorStore.load_from_dir(tmp_path / "idx")
    assert len(loaded) == 20
    q = vecs[5]
    assert loaded.query_nearby(q, k=1)[0].id == "card-5"
    assert loaded.retrieve(["card-5"])[0].payload == {"i": 5}


def test_sharded_query(mesh8):
    store, vecs = _mk_store(n=333, d=32, mesh=mesh8)
    q = np.random.default_rng(2).standard_normal(32).astype(np.float32)
    res = store.query_nearby(q, k=5)
    ids_np, _ = _np_topk(q, vecs, 5)
    assert [r.id for r in res] == [f"card-{i}" for i in ids_np]


def test_topk_scores_matches_sort(rng):
    s = jnp.asarray(rng.standard_normal((4, 10_000)).astype(np.float32))
    v, i = topk_scores(s, 7, chunk=512)
    ref = np.sort(np.asarray(s), axis=1)[:, ::-1][:, :7]
    assert np.allclose(v, ref)


def test_cosine_topk(rng):
    db = rng.standard_normal((500, 64)).astype(np.float32)
    q = db[[17, 256]] * 3.0  # scale-invariant under cosine
    v, i = cosine_topk(jnp.asarray(q), jnp.asarray(db), k=1, normalized=False)
    assert list(np.asarray(i)[:, 0]) == [17, 256]
    assert np.allclose(v, 1.0, atol=1e-2)


def test_cosine_topk_pallas_interpret(rng):
    """Pallas streaming kernel ≡ XLA path (interpret mode on CPU)."""
    from mtgvision_tpu.ops.topk import cosine_topk_pallas

    db = rng.standard_normal((3000, 64)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = rng.standard_normal((4, 64)).astype(np.float32)
    v1, i1 = cosine_topk(jnp.asarray(q), jnp.asarray(db), k=5)
    v2, i2 = cosine_topk_pallas(jnp.asarray(q), jnp.asarray(db), k=5, tile_n=512, interpret=True)
    assert (np.asarray(i1) == np.asarray(i2)).all()
    assert np.allclose(v1, v2, atol=2e-2)


def test_cosine_topk_sharded(mesh8, rng):
    """shard_map path: per-shard topk + ICI candidate merge ≡ single-device."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mtgvision_tpu.ops.topk import cosine_topk_sharded

    db = rng.standard_normal((800, 64)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = rng.standard_normal((4, 64)).astype(np.float32)
    db_sh = jax.device_put(jnp.asarray(db), NamedSharding(mesh8, P("data")))
    v1, i1 = cosine_topk(jnp.asarray(q), jnp.asarray(db), k=5)
    v2, i2 = cosine_topk_sharded(jnp.asarray(q), db_sh, k=5, mesh=mesh8)
    assert (np.asarray(i1) == np.asarray(i2)).all()
    assert np.allclose(v1, v2, atol=2e-2)


def test_store_flip_aware_roundtrip(tmp_path, rng):
    """Flip-aware store: both orientation halves queryable, host query
    canonicalizes + dedupes, save/load preserves the flip half."""
    from mtgvision_tpu.index.store import VectorPoint, VectorStore

    d = 32
    up = rng.standard_normal((5, d)).astype(np.float32)
    fl = rng.standard_normal((5, d)).astype(np.float32)
    st = VectorStore(dim=d, capacity=8, flip_aware=True)
    st.save_points([
        VectorPoint(id=f"c{i}", vector=up[i], flip_vector=fl[i],
                    payload={"name": f"n{i}"})
        for i in range(5)
    ])
    # query with a FLIPPED embedding: the canonical id must come back
    [hits] = st.query_nearby_batch(fl[3][None], k=3)
    assert hits[0].id == "c3" and abs(hits[0].score - 1.0) < 1e-2
    # no duplicate ids even though both halves contain c3-adjacent rows
    ids = [h.id for h in hits]
    assert len(ids) == len(set(ids))
    # device query reports the flipped-half row for flipped queries
    scores, idx = st.query_device(jnp.asarray(fl[3][None]), k=1)
    assert int(idx[0, 0]) == st.half_rows() + 3
    # save/load keeps flip awareness
    st.save_to_dir(tmp_path / "fa")
    st2 = VectorStore.load_from_dir(tmp_path / "fa")
    assert st2.flip_aware
    [hits2] = st2.query_nearby_batch(fl[3][None], k=1)
    assert hits2[0].id == "c3"


def test_pipeline_flip_aware_select(rng):
    """_match_select over a flip-aware matrix: per-detection flip decision,
    canonical indices, unique top-k ids, corners rolled on flip."""
    from mtgvision_tpu.index.store import VectorPoint, VectorStore
    from mtgvision_tpu.infer.pipeline import FramePipeline
    from mtgvision_tpu.models.convnextv2ae import ConvNeXtV2Encoder
    from mtgvision_tpu.models.yolo import YoloSeg

    d = 32
    up = rng.standard_normal((6, d)).astype(np.float32)
    fl = rng.standard_normal((6, d)).astype(np.float32)
    st = VectorStore(dim=d, capacity=8, flip_aware=True)
    st.save_points([
        VectorPoint(id=f"c{i}", vector=up[i], flip_vector=fl[i])
        for i in range(6)
    ])
    pipe = FramePipeline(
        YoloSeg(num_classes=1, size="n"), None,
        ConvNeXtV2Encoder(image_hw=(32, 32), z_size=d, depths=(1, 1, 1, 1),
                          dims=(8, 8, 8, 8)), None,
        store=st, max_det=2, top_k=3,
    )
    assert pipe.both_orientations is False  # flip-aware forces one pass
    # detection 0 embeds like upright c1; detection 1 like FLIPPED c4
    z = jnp.asarray(np.stack([up[1], fl[4]])[None][None])  # (1,1,2,D)
    corners = jnp.asarray(rng.random((1, 2, 4, 2)), jnp.float32)
    rv, half = pipe._index_mask(st._matrix())
    ms, mi, out_corners, flipped, _ = pipe._match_select_stage(
        z, corners, st._matrix(), rv, half
    )
    assert int(mi[0, 0, 0]) == 1 and not bool(flipped[0, 0])
    assert int(mi[0, 1, 0]) == 4 and bool(flipped[0, 1])
    # flipped detection's corners are rolled 180°
    assert np.allclose(
        np.asarray(out_corners[0, 1]), np.roll(np.asarray(corners[0, 1]), 2, 0)
    )
    assert np.allclose(np.asarray(out_corners[0, 0]), np.asarray(corners[0, 0]))
    # top-k ids unique per detection
    for det in range(2):
        cand = [int(v) for v in np.asarray(mi[0, det]) if v < len(st)]
        assert len(cand) == len(set(cand))


def test_flip_vote_m_select(rng):
    """flip_vote_m>1: the orientation comes from a score-weighted vote over
    the top-m candidates' halves, not rank-0 alone (VERDICT r4 task 8). A
    rank-0 outlier in the flipped half is outvoted by two upright
    candidates with comparable scores."""
    import jax.numpy as jnp

    from mtgvision_tpu.index.store import VectorPoint, VectorStore
    from mtgvision_tpu.infer.pipeline import FramePipeline
    from mtgvision_tpu.models.convnextv2ae import ConvNeXtV2Encoder
    from mtgvision_tpu.models.yolo import YoloSeg

    d = 32
    # hand-built ORTHOGONAL embeddings (basis vectors) so candidate scores
    # are exact: upright card i = e_i, flipped card i = e_{i+8}
    up = np.eye(d, dtype=np.float32)[:6]
    fl = np.eye(d, dtype=np.float32)[8:14]
    # query: strongest single hit is FLIPPED c0 (0.5), but upright c1+c2
    # (0.45 + 0.44) outvote it
    q = (0.5 * fl[0] + 0.45 * up[1] + 0.44 * up[2]).astype(np.float32)
    st = VectorStore(dim=d, capacity=8, flip_aware=True)
    st.save_points([
        VectorPoint(id=f"c{i}", vector=up[i], flip_vector=fl[i])
        for i in range(6)
    ])

    def select(vote_m):
        pipe = FramePipeline(
            YoloSeg(num_classes=1, size="n"), None,
            ConvNeXtV2Encoder(image_hw=(32, 32), z_size=d, depths=(1, 1, 1, 1),
                              dims=(8, 8, 8, 8)), None,
            store=st, max_det=1, top_k=3, flip_vote_m=vote_m,
        )
        z = jnp.asarray(q[None][None][None])  # (1,1,1,D)
        corners = jnp.asarray(rng.random((1, 1, 4, 2)), jnp.float32)
        rv, half = pipe._index_mask(st._matrix())
        ms, mi, _, flipped, _ = pipe._match_select_stage(
            z, corners, st._matrix(), rv, half
        )
        return bool(flipped[0, 0])

    # rank-0 decision: the lone flipped hit wins; vote: upright majority wins
    assert select(1) is True
    assert select(3) is False
