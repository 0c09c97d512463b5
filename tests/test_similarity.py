"""Similarity search: brute-force exactness vs numpy, LSH recall vs the
exact baseline."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus():
    tbl = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = tbl["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = np.stack([np.asarray(v, dtype=np.float64) for v in tbl["embedding"].to_pylist()])
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return ids, m


def test_ann_topk_matches_numpy_bruteforce(corpus, ray_session):
    from tartare_ray.pipelines.queries import ann_topk

    ids, m = corpus
    df = ann_topk(SF, n_queries=5, k=4).to_pandas()
    sims = m[:5] @ m.T
    for q in range(5):
        s = sims[q].copy()
        s[ids == q] = -np.inf
        # expected top-4 with (cos desc, vec_id asc) tie-break
        order = np.lexsort((ids, -s))[:4]
        expected = [int(ids[i]) for i in order]
        got = df[df.q_id == q].sort_values("rank")["vec_id"].tolist()
        assert got == expected, (q, got, expected)


def test_ann_lsh_recall_vs_exact(corpus, ray_session):
    from tartare_ray.pipelines.queries import ann_lsh_pairs, embedding_dedup

    exact = embedding_dedup(SF, threshold=0.3).to_pandas()
    exact_pairs = {(int(a), int(b)) for a, b in zip(exact["id_a"], exact["id_b"])}
    approx = ann_lsh_pairs(SF, threshold=0.3).to_pandas()
    approx_pairs = {(int(a), int(b)) for a, b in zip(approx["id_a"], approx["id_b"])}
    assert approx_pairs <= exact_pairs  # no false positives (exact verify step)
    recall = len(approx_pairs & exact_pairs) / max(len(exact_pairs), 1)
    assert recall >= 0.4, recall  # LSH is approximate; the exact path is embedding_dedup


def test_multimodal_decode_stub_contract(ray_session):
    import pyarrow as pa

    from tartare_ray.stages.multimodal import DecodeStage, attach_payload_batch

    with pytest.raises(NotImplementedError):
        DecodeStage(real=True)
    tbl = pa.table({"doc_id": pa.array([1], pa.int64()), "text": pa.array(["abcd"])})
    out = DecodeStage(real=False)(attach_payload_batch(tbl))
    assert out["byte_len"].to_pylist() == [4]
    assert out["width"].to_pylist() == [5]
    assert out["height"].to_pylist() == [29]


def test_ann_ivf_recall_vs_exact(ray_session):
    """IVF probe (nprobe/k of the corpus scanned) keeps high recall vs
    the exact brute force; exact duplicates of the probe set are found."""
    from tartare_ray.pipelines.queries import ann_ivf_topk, ann_topk

    exact = ann_topk(SF).to_pandas()
    approx = ann_ivf_topk(SF, n_clusters=16, nprobe=6).to_pandas()
    recalls = []
    for q in exact["q_id"].unique():
        e = set(exact.loc[exact["q_id"] == q, "vec_id"])
        a = set(approx.loc[approx["q_id"] == q, "vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6, recalls
