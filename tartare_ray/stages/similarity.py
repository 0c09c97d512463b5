"""Similarity search over an embedding column (list<float>):
brute-force cosine top-k (exact baseline) and a random-hyperplane
LSH-bucketed variant (the scale path), plus embedding-cosine
near-duplicate pairs.

No reference analogue (tartare has no vector ops `[UNVERIFIED — empty
checkout, SURVEY.md §0]`); these are the training-data-pipeline
operators the build brief requires as first-class components.

Pattern: the query matrix / comparison matrix is broadcast ONCE via
``ray.put`` and resolved per actor in ``__init__`` (never re-shipped
per batch); each ``__call__`` is one numpy matmul over a zero-copy
batch.  At 100 TB the broadcast side must stay small (queries,
centroids, or one bucket) — all-pairs near-dup switches from
"broadcast the full matrix" to LSH bucketing + within-bucket matmul,
which is exactly ``HyperplaneBucketStage`` + a groupby.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def embedding_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    """(n, d) float64 matrix from a list<float> column, zero-ish-copy:
    flat values reshaped (fixed dim assumed, asserted)."""
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    offsets = arr.offsets.to_numpy(zero_copy_only=False)
    d = int(offsets[1] - offsets[0]) if n else 0
    lo, hi = int(offsets[0]), int(offsets[-1])
    m = flat[lo:hi].reshape(n, d)
    return m


def l2_normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(norms, 1e-12)


class BruteForceTopKStage:
    """Per-batch partial top-k: emits (q_id, vec_id, cos) candidate
    rows — ≤ k per query per batch — for a final per-query reduce
    (``groupby(q_id).map_groups(topk_group)``).  Exact, streaming, and
    the per-query candidate volume is k × n_batches regardless of N."""

    def __init__(self, queries_ref, k: int):
        self.q_ids, q = ray.get(queries_ref)  # (m,), (m, d) L2-normalized
        self.q = q
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = l2_normalize(embedding_matrix(batch))
        vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        sims = self.q @ x.T  # (m, n)
        # exclude self-matches (query set ⊆ corpus)
        sims[self.q_ids[:, None] == vec_ids[None, :]] = -np.inf
        k = min(self.k, sims.shape[1])
        part = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
        m = len(self.q_ids)
        rows_q = np.repeat(self.q_ids, k)
        rows_v = vec_ids[part.reshape(-1)]
        rows_c = sims[np.repeat(np.arange(m), k), part.reshape(-1)]
        keep = np.isfinite(rows_c)
        return pa.table(
            {
                "q_id": pa.array(rows_q[keep]),
                "vec_id": pa.array(rows_v[keep]),
                "cos": pa.array(rows_c[keep]),
            }
        )


def topk_group(group: pa.Table, k: int) -> pa.Table:
    """Final reduce for one query: keep top-k by (cos desc, vec_id asc)
    with a deterministic rank column."""
    t = group.sort_by([("cos", "descending"), ("vec_id", "ascending")]).slice(0, k)
    return t.append_column("rank", pa.array(np.arange(1, len(t) + 1, dtype=np.int64)))


class CosinePairsStage:
    """All-pairs near-dup (cos ≥ threshold): each batch matmuls against
    the broadcast full corpus; (a < b) dedupes pair direction.  Exact;
    O(N·batch) per batch — the brute-force baseline.  Scale path:
    ``HyperplaneBucketStage`` below."""

    def __init__(self, corpus_ref, threshold: float):
        self.ids, self.m = ray.get(corpus_ref)  # (N,), (N, d) normalized
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = l2_normalize(embedding_matrix(batch))
        vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        sims = x @ self.m.T  # (b, N)
        mask = (sims >= self.threshold) & (vec_ids[:, None] < self.ids[None, :])
        bi, ci = np.nonzero(mask)
        return pa.table(
            {
                "id_a": pa.array(vec_ids[bi]),
                "id_b": pa.array(self.ids[ci]),
                "cos": pa.array(np.round(sims[bi, ci], 6)),
            }
        )


class HyperplaneBucketStage:
    """Random-hyperplane LSH bucketing: sign-bit sketch of each
    embedding → ``n_tables`` bucket keys per vector.  Vectors are then
    co-grouped by (table, bucket) and compared within buckets only —
    the all-to-all matmul becomes a bucket-local one.  Approximate:
    recall is tested against the brute-force baseline."""

    def __init__(self, dim: int, bits: int = 12, n_tables: int = 4, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_tables, bits, dim))
        self.n_tables = n_tables

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = l2_normalize(embedding_matrix(batch))
        vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        n = len(vec_ids)
        keys = np.empty((self.n_tables, n), dtype=np.int64)
        weights = np.int64(1) << np.arange(self.planes.shape[1], dtype=np.int64)
        for t in range(self.n_tables):
            bits = (x @ self.planes[t].T) > 0  # (n, bits)
            keys[t] = bits @ weights
        return pa.table(
            {
                "table": pa.array(np.repeat(np.arange(self.n_tables, dtype=np.int32), n)),
                "bucket": pa.array(keys.reshape(-1)),
                "vec_id": pa.array(np.tile(vec_ids, self.n_tables)),
            }
        )


class BucketPairsVerifyStage:
    """(table, bucket) groups → exact-cosine pairs within the bucket,
    using broadcast embeddings for the final similarity (bucket members
    only — bounded)."""

    def __init__(self, corpus_ref, threshold: float, max_bucket: int = 1024):
        ids, m = ray.get(corpus_ref)
        self.index = {int(v): i for i, v in enumerate(ids)}
        self.m = m
        self.threshold = threshold
        self.max_bucket = max_bucket

    def __call__(self, group: pa.Table) -> pa.Table:
        ids = np.unique(group["vec_id"].to_numpy(zero_copy_only=False))
        empty = pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "cos": pa.array([], pa.float64()),
            }
        )
        if len(ids) < 2 or len(ids) > self.max_bucket:
            return empty
        rows = np.fromiter((self.index[int(v)] for v in ids), dtype=np.int64, count=len(ids))
        sub = self.m[rows]
        sims = sub @ sub.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= self.threshold
        return pa.table(
            {
                "id_a": pa.array(ids[ia[keep]]),
                "id_b": pa.array(ids[ib[keep]]),
                "cos": pa.array(np.round(sims[ia[keep], ib[keep]], 6)),
            }
        )


# -- IVF (inverted-file) ANN — the coarse-quantizer scale path ------------

def spherical_kmeans(train: np.ndarray, k: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Driver-side Lloyd iterations on a SAMPLE (train is already
    l2-normalized; assignment by max dot = min cosine distance).
    Deterministic; k × dim floats broadcast to every task."""
    rng = np.random.default_rng(seed)
    c = train[rng.choice(len(train), size=min(k, len(train)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(train @ c.T, axis=1)
        for j in range(len(c)):
            sel = train[assign == j]
            if len(sel):
                c[j] = sel.sum(axis=0)
        c = l2_normalize(c)
    return c


class IVFProbeStage:
    """One pass over the corpus: assign each vector to its nearest
    centroid, keep only vectors in a cluster some query probes, and
    emit partial top-k rows (q_id, vec_id, cos) against exactly the
    queries probing that cluster.  At scale this is the standard IVF
    read pattern: nprobe/k of the corpus is scanned per query instead
    of all of it — the assignment can also be precomputed and stored
    partitioned by cluster, making the scan a partition-pruned read."""

    def __init__(self, centroids_ref, queries_ref, probe_map, k: int):
        self.centroids = ray.get(centroids_ref)
        self.q_ids, self.q = ray.get(queries_ref)
        self.probe_map = probe_map  # cluster -> np.ndarray of query row indices
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = l2_normalize(embedding_matrix(batch))
        assign = np.argmax(m @ self.centroids.T, axis=1)
        out_q, out_v, out_c = [], [], []
        for cl in np.unique(assign):
            q_rows = self.probe_map.get(int(cl))
            if q_rows is None or not len(q_rows):
                continue
            sel = assign == cl
            sims = self.q[q_rows] @ m[sel].T  # (nq, ncl)
            vids = ids[sel]
            for qi, row in zip(q_rows, sims):
                nk = min(self.k + 1, len(row))
                top = np.argpartition(-row, nk - 1)[:nk]
                for t in top:
                    if vids[t] != self.q_ids[qi]:
                        out_q.append(self.q_ids[qi])
                        out_v.append(vids[t])
                        out_c.append(row[t])
        return pa.table(
            {
                "q_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos": pa.array(out_c, pa.float64()),
            }
        )


# -- text → embedding "model inference" stage -----------------------------

class TextEmbedStage:
    """Batched model inference shape: a deterministic hashed-ngram +
    random-projection text encoder.  The "model" (a seeded projection
    matrix) is built ONCE per actor in ``__init__`` — the canonical
    place for a real checkpoint load — and ``__call__`` is one matmul
    per batch.  Deterministic across processes (fixed seed + fixed
    hash), so outputs are reproducible and testable."""

    def __init__(self, dim: int = 64, vocab_hash: int = 4096, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.proj = rng.standard_normal((vocab_hash, dim)).astype(np.float64)
        self.vocab_hash = vocab_hash
        self.dim = dim

    def _bow(self, texts) -> np.ndarray:
        """Hashed bag-of-words counts, vectorized over the flat char
        buffer via token hashing (pandas hash of the split words)."""
        import pandas as pd

        out = np.zeros((len(texts), self.vocab_hash), dtype=np.float64)
        for i, t in enumerate(texts):
            words = t.split()
            if not words:
                continue
            h = pd.util.hash_array(
                np.asarray(words, dtype=object),
                hash_key="tartare_ray.emb0",
                categorize=False,
            )
            idx, cnt = np.unique((h % np.uint64(self.vocab_hash)).astype(np.int64),
                                 return_counts=True)
            out[i, idx] = cnt
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        emb = self._bow(texts) @ self.proj
        emb = l2_normalize(emb + 1e-12)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "embedding": pa.array(emb.tolist(), pa.list_(pa.float64())),
            }
        )
