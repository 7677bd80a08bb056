"""HBM-resident cosine vector index — the Qdrant replacement.

API parity with the reference client (mtgvision/qdrant.py:17-109):
``save_points`` (:60), ``retrieve`` (:38), ``query_nearby`` (:76),
``update_payload`` (:97), plus a ``VectorPoint`` record mirroring
``QdrantPoint`` (:10-14). Differences by design:

- vectors live as one pre-L2-normalized (capacity, D) device matrix in HBM;
  queries are a single fused normalize→matmul→top-k XLA/Pallas program
  (ops/topk.py) instead of an HTTP round-trip to a Rust ANN server,
- payloads (arbitrary JSON-able dicts) stay in host memory keyed by id,
- the matrix grows by doubling; deleted/unset rows are masked with -inf scores
  via a validity row mask,
- multi-chip: rows are sharded over a 1-D mesh axis; each shard computes a
  local top-k and the (tiny) candidates are merged on host of the gathered
  result — collectives ride ICI via the sharded matmul.

Exact (not approximate) search: for N ≤ ~1M × 768-d the brute-force MXU matmul
beats an HNSW walk on TPU and is exactly-correct, so no graph index is needed.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Any, Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mtgvision_tpu.ops.topk import l2_normalize, topk_scores


@dataclasses.dataclass
class VectorPoint:
    """Mirrors QdrantPoint (qdrant.py:10-14).

    ``flip_vector``: embedding of the card's 180°-rotated image, stored by
    flip-aware stores (see VectorStore flip_aware) so serving can decide
    crop orientation from ONE encoder pass."""

    id: str
    vector: np.ndarray | None = None
    payload: dict | None = None
    score: float | None = None
    flip_vector: np.ndarray | None = None


class VectorStore:
    """In-process TPU vector index with Qdrant-client-compatible surface."""

    def __init__(
        self,
        dim: int = 768,
        capacity: int = 1024,
        mesh=None,
        dtype=jnp.float32,
        flip_aware: bool = False,
    ):
        self.dim = dim
        self.dtype = dtype
        self.mesh = mesh
        # flip-aware orientation matching: the matrix carries each card's
        # upright AND 180°-rotated embeddings as separate row halves, so the
        # serving pipeline embeds ONE crop orientation and reads the flip
        # decision off which half the top match lands in (row >= half ⇒ the
        # crop is upside down). This replaces the 2× dual-orientation
        # encoder pass with a 2× MXU matmul — the matmul is ~30× cheaper on
        # TPU — and is statistically the same discrimination (both compare a
        # flipped view against an upright view of the card).
        self.flip_aware = flip_aware
        self._ids: list[str] = []
        self._row_of: dict[str, int] = {}
        self._payloads: dict[str, dict] = {}
        # host mirror (normalized) + device matrix; device copy rebuilt lazily
        self._host = np.zeros((capacity, dim), np.float32)
        self._flip_host = np.zeros((capacity, dim), np.float32) if flip_aware else None
        self._n = 0
        self._device_matrix = None  # (capacity, D) on device, normalized
        self._half_rows = 0  # rows per half at last _matrix() build
        self._mask_cache = None  # device row-validity mask, rebuilt with matrix
        self._dirty = True

    # -- helpers ------------------------------------------------------------

    def __len__(self) -> int:
        return self._n

    def _ensure_capacity(self, extra: int):
        need = self._n + extra
        cap = self._host.shape[0]
        if need <= cap:
            return
        while cap < need:
            cap *= 2
        grown = np.zeros((cap, self.dim), np.float32)
        grown[: self._n] = self._host[: self._n]
        self._host = grown
        if self._flip_host is not None:
            fgrown = np.zeros((cap, self.dim), np.float32)
            fgrown[: self._n] = self._flip_host[: self._n]
            self._flip_host = fgrown
        self._dirty = True

    def _matrix(self):
        """Device matrix padded to capacity; invalid rows are zero (score 0 <
        any real cosine hit after thresholding; masked in query)."""
        if self._dirty or self._device_matrix is None:
            host = self._host
            if self.flip_aware:
                # [upright; flipped] halves — row semantics decoded by
                # half_rows(); each half keeps the same capacity padding
                host = np.concatenate([self._host, self._flip_host])
            mat = jnp.asarray(host)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                # pad rows to a multiple of the mesh size for even sharding
                n_dev = self.mesh.devices.size
                pad = (-mat.shape[0]) % n_dev
                if pad:
                    mat = jnp.pad(mat, ((0, pad), (0, 0)))
                mat = jax.device_put(
                    mat, NamedSharding(self.mesh, P(self.mesh.axis_names[0]))
                )
            self._device_matrix = mat
            self._half_rows = self._host.shape[0]
            self._mask_cache = None
            self._dirty = False
        return self._device_matrix

    def half_rows(self) -> int:
        """Rows per orientation half of the LAST-built matrix (flip-aware
        stores only): row r < half ⇒ upright, r >= half ⇒ flipped, canonical
        row = r - half. 0 for plain stores."""
        return self._half_rows if self.flip_aware else 0

    def row_valid_mask(self):
        """(rows,) bool DEVICE array: which rows of _matrix() hold real
        vectors (capacity and mesh padding excluded; both halves of a
        flip-aware store). Cached alongside the device matrix so serving
        doesn't re-upload it every frame batch; sharded like the matrix
        rows when a mesh is attached."""
        if self._mask_cache is None:
            mat = self._matrix()
            m = np.zeros(mat.shape[0], bool)
            m[: self._n] = True
            if self.flip_aware:
                half = self._half_rows
                m[half : half + self._n] = True
            dm = jnp.asarray(m)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                dm = jax.device_put(
                    dm, NamedSharding(self.mesh, P(self.mesh.axis_names[0]))
                )
            self._mask_cache = dm
        return self._mask_cache

    # -- Qdrant-parity API --------------------------------------------------

    def save_points(self, points: Iterable[VectorPoint], batch_size: int = 64):
        """Upsert points (qdrant.py:60-74). Accepts any iterable; batch_size is
        kept for signature parity (irrelevant in-process)."""
        for p in points:
            vec = np.asarray(p.vector, np.float32).reshape(self.dim)
            norm = float(np.linalg.norm(vec))
            vec = vec / max(norm, 1e-12)
            if p.id in self._row_of:
                row = self._row_of[p.id]
                self._host[row] = vec
            else:
                self._ensure_capacity(1)
                row = self._n
                self._host[row] = vec
                self._row_of[p.id] = row
                self._ids.append(p.id)
                self._n += 1
            if self.flip_aware and p.flip_vector is not None:
                fv = np.asarray(p.flip_vector, np.float32).reshape(self.dim)
                self._flip_host[row] = fv / max(float(np.linalg.norm(fv)), 1e-12)
            if p.payload is not None:
                self._payloads[p.id] = dict(p.payload)
        self._dirty = True

    def retrieve(self, ids: Sequence[str], with_payload: bool = True) -> list[VectorPoint]:
        """Fetch points by id, silently skipping unknown ids (qdrant.py:38-57)."""
        out = []
        for i in ids:
            row = self._row_of.get(i)
            if row is None:
                continue
            out.append(
                VectorPoint(
                    id=i,
                    vector=self._host[row].copy(),
                    payload=self._payloads.get(i) if with_payload else None,
                )
            )
        return out

    def update_payload(self, id_: str, payload: dict):
        """Merge payload fields for a point (qdrant.py:97-109)."""
        self._payloads.setdefault(id_, {}).update(payload)

    def query_nearby(
        self,
        vector: np.ndarray,
        k: int = 3,
        with_payload: bool = True,
        score_threshold: float | None = None,
    ) -> list[VectorPoint]:
        """Top-k cosine neighbors of one query vector (qdrant.py:76-95)."""
        [res] = self.query_nearby_batch(np.asarray(vector)[None], k, with_payload, score_threshold)
        return res

    def query_nearby_batch(
        self,
        vectors: np.ndarray,
        k: int = 3,
        with_payload: bool = True,
        score_threshold: float | None = None,
    ) -> list[list[VectorPoint]]:
        """Batched top-k — the serving hot path. One fused device program."""
        if self._n == 0:
            return [[] for _ in range(len(vectors))]
        # flip-aware: query 2k candidates over both orientation halves, then
        # canonicalize rows and keep the first (best) hit per card id
        kq = 2 * k if self.flip_aware else k
        scores, idx = self.query_device(jnp.asarray(vectors, jnp.float32), kq)
        scores = np.asarray(scores)
        idx = np.asarray(idx)
        if self.flip_aware:
            idx = np.where(idx >= self._half_rows, idx - self._half_rows, idx)
        out: list[list[VectorPoint]] = []
        for b in range(len(vectors)):
            row_out = []
            seen: set[int] = set()
            for s, i in zip(scores[b], idx[b]):
                if len(row_out) >= k:
                    break
                if i >= self._n or not np.isfinite(s):
                    continue
                if self.flip_aware:
                    if int(i) in seen:
                        continue
                    seen.add(int(i))
                if score_threshold is not None and s < score_threshold:
                    continue
                pid = self._ids[int(i)]
                row_out.append(
                    VectorPoint(
                        id=pid,
                        score=float(s),
                        payload=self._payloads.get(pid) if with_payload else None,
                    )
                )
            out.append(row_out)
        return out

    # -- device-side query (jit; composable into the e2e frame program) -----

    def query_device(self, queries: jnp.ndarray, k: int):
        """(B, D) queries → ((B,k) scores, (B,k) row indices), on device.

        Rows ≥ len(self) are zero vectors → score 0; callers receiving
        index ≥ n treat the slot as empty. With a mesh, the matmul is sharded
        over rows and XLA all-gathers the per-shard partials.
        """
        mat = self._matrix()
        # flip-aware stores span 2·n valid rows (both orientation halves), so
        # a 2k-candidate query over a small store must not truncate to n —
        # after per-card dedup that could return < k unique cards even when k
        # distinct cards exist (ADVICE r4)
        n_valid = 2 * self._n if self.flip_aware else self._n
        kk = min(k, max(1, n_valid))
        valid = self.row_valid_mask()
        return _query_jit(queries, mat, valid, kk)

    def save_to_dir(self, path: str | pathlib.Path):
        """Persist vectors + payloads (export format: npz + jsonl)."""
        path = pathlib.Path(path)
        path.mkdir(parents=True, exist_ok=True)
        arrs = {"vectors": self._host[: self._n]}
        if self.flip_aware:
            arrs["flip_vectors"] = self._flip_host[: self._n]
        np.savez_compressed(path / "vectors.npz", **arrs)
        (path / "ids.json").write_text(json.dumps(self._ids))
        with open(path / "payloads.jsonl", "w") as f:
            for i in self._ids:
                f.write(json.dumps({"id": i, "payload": self._payloads.get(i)}) + "\n")

    @classmethod
    def load_from_dir(cls, path: str | pathlib.Path, mesh=None) -> "VectorStore":
        path = pathlib.Path(path)
        data = np.load(path / "vectors.npz")
        vecs = data["vectors"]
        flips = data["flip_vectors"] if "flip_vectors" in data.files else None
        ids = json.loads((path / "ids.json").read_text())
        store = cls(
            dim=vecs.shape[1] if len(vecs) else 768, mesh=mesh,
            flip_aware=flips is not None,
        )
        pts = [
            VectorPoint(id=i, vector=v,
                        flip_vector=flips[j] if flips is not None else None)
            for j, (i, v) in enumerate(zip(ids, vecs))
        ]
        store.save_points(pts)
        with open(path / "payloads.jsonl") as f:
            for line in f:
                rec = json.loads(line)
                if rec["payload"]:
                    store._payloads[rec["id"]] = rec["payload"]
        return store


@jax.jit
def _score_all(queries, mat, valid):
    q = l2_normalize(queries.astype(jnp.float32))
    scores = jnp.dot(
        q.astype(jnp.bfloat16),
        mat.astype(jnp.bfloat16).T,
        preferred_element_type=jnp.float32,
    )
    return jnp.where(valid[None, :], scores, -jnp.inf)


def _query_jit(queries, mat, valid, k: int):
    scores = _score_all(queries, mat, valid)
    v, i = topk_scores(scores, k)
    # bf16 rounding of unit vectors can push a perfect match ~0.3% above 1.0;
    # clamp so cosine-score semantics (≤ 1.0, thresholds) stay exact
    return jnp.clip(v, -1.0, 1.0), i
