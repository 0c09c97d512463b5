"""Round-4 third-session operators: distributed Lloyd k-means,
nearest-centroid assignment, packing-conservation verdict, hashed
linear quality scoring, and the SQL-reproducible Horner fingerprint.

Each has a full DuckDB value oracle in the driver registry; these
tests pin the SEMANTICS independently (exact recompute in
numpy/python) so an oracle bug can't mask an operator bug.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _embeddings() -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq

    t = pq.read_table(SF + "/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = np.asarray(t["embedding"].combine_chunks().to_pylist(), dtype=np.float64)
    return ids, m


def test_kmeans_assign_matches_exact_argmin(ray_session):
    from tartare_ray.pipelines.queries import kmeans_assign

    ids, m = _embeddings()
    c = m[np.argsort(ids)][:8]  # seeds: vec_id < 8 in id order
    expect = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    got = {
        int(r["vec_id"]): int(r["cluster"])
        for r in kmeans_assign(SF).take_all()
    }
    assert len(got) == len(ids)
    for i, vid in enumerate(ids):
        assert got[int(vid)] == int(expect[i])


def test_embedding_kmeans_matches_driver_lloyd(ray_session):
    """The distributed combiner fold reproduces a single-process Lloyd
    run exactly (same quantization, same empty-cluster carryover)."""
    from tartare_ray.pipelines.queries import embedding_kmeans

    ids, m = _embeddings()
    c = m[np.argsort(ids)][:8].copy()
    for _ in range(2):
        a = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
        for j in range(8):
            sel = m[a == j]
            if len(sel):
                c[j] = sel.mean(axis=0)
        c = np.round(c, 6)
    a = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    expect_n = np.bincount(a, minlength=8)
    out = embedding_kmeans(SF)
    n = dict(zip(out["cluster"].to_pylist(), out["n"].to_pylist()))
    cs = dict(zip(out["cluster"].to_pylist(), out["centroid_sum"].to_pylist()))
    for j in range(8):
        assert n[j] == int(expect_n[j])
        assert cs[j] == pytest.approx(round(float(c[j].sum()), 4), abs=1e-9)
    assert sum(n.values()) == len(ids)


def test_kmeans_lloyd_block_invariant(ray_session):
    """Combiner partials fold to the same centroids regardless of how
    the corpus is blocked — the distributed-correctness property."""
    import ray

    from tartare_ray.stages.similarity import kmeans_lloyd

    rng = np.random.default_rng(7)
    m = rng.normal(size=(200, 16))
    seeds = m[:4].copy()
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(200, dtype=np.int64)),
            "embedding": pa.array(m.tolist(), pa.list_(pa.float64())),
        }
    )
    c1 = kmeans_lloyd(lambda: ray.data.from_arrow(t), seeds, iters=3)
    c2 = kmeans_lloyd(
        lambda: ray.data.from_arrow(t).repartition(13), seeds, iters=3
    )
    assert np.array_equal(c1, c2)


def test_pack_check_conservation(ray_session):
    from tartare_ray.pipelines.queries import cdc_pack_check

    out = cdc_pack_check(SF)
    r = out.to_pylist()[0]
    assert r["conserved"] is True
    assert r["rows_lower_bound_ok"] is True
    assert r["total_tokens_out"] == r["total_tokens_in"] + r["n_docs"]


def test_quality_score_exact_recompute(ray_session):
    """Integer-weight scoring matches a per-doc pure-python recompute
    (hash → bucket → weight → sum) bit-for-bit."""
    import pyarrow.parquet as pq

    from tartare_ray.pipelines.queries import quality_classifier
    from tartare_ray.stages.text import QUALITY_BUCKETS, quality_weights

    w = quality_weights()
    t = pq.read_table(SF + "/documents.parquet", columns=["doc_id", "text"])
    got = {
        int(r["doc_id"]): (int(r["score"]), int(r["n_words"]), bool(r["keep"]))
        for r in quality_classifier(SF).take_all()
    }
    for doc_id, text in zip(
        t["doc_id"].to_pylist()[:50], t["text"].to_pylist()[:50]
    ):
        words = text.strip().split()
        if not words:
            words = [""]
        score = 0
        for word in words:
            h = 0
            for ch in word:
                h = (h * 31 + ord(ch)) % 50257
            score += int(w[h % QUALITY_BUCKETS])
        assert got[doc_id] == (score, len(words), score > 0)


def test_fingerprint_poly_horner_semantics(ray_session):
    """Horner fold: order-sensitive (a permuted doc fingerprints
    differently) and exact vs pure-python recompute."""
    from tartare_ray.functions.text import rolling_poly_hash
    from tartare_ray.stages.text import fingerprint_poly_batch

    b = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["the quick brown fox", "fox brown quick the"]),
        }
    )
    out = fingerprint_poly_batch(b)
    f1, f2 = out["fingerprint"].to_pylist()
    assert f1 != f2  # order matters

    def polyh(word: str) -> int:
        h = 0
        for ch in word:
            h = (h * 31 + ord(ch)) % 50257
        return h

    expect = 0
    for word in "the quick brown fox".split():
        expect = (expect * 31 + polyh(word)) % 1_000_000_007
    assert f1 == expect

    # vectorized Horner == scalar Horner on ragged segments
    flat = np.array([5, 7, 11, 13, 17], dtype=np.int64)
    offsets = np.array([0, 2, 2, 5], dtype=np.int64)
    got = rolling_poly_hash(flat, offsets)
    assert got[0] == (5 * 31 + 7) % 1_000_000_007
    assert got[1] == 0  # empty segment
    assert got[2] == ((11 * 31 + 13) % 1_000_000_007 * 31 + 17) % 1_000_000_007
