"""Product quantization (stages/similarity.py PQ kernels +
ann_pq_topk): encode/ADC arithmetic, compression contract, and recall
vs the exact brute force."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.01"


def _collect(ds):
    return pa.concat_tables(ds.iter_batches(batch_format="pyarrow")).to_pandas()


def test_pq_roundtrip_self_similarity():
    """A vector's ADC score against its own code is close to 1 (its
    exact self-cosine); random other vectors score visibly lower."""
    from tartare_ray.stages.similarity import l2_normalize, pq_adc_tables, pq_encode, train_pq

    rng = np.random.default_rng(5)
    x = l2_normalize(rng.normal(size=(512, 64)))
    books = train_pq(x, m=8, k_codes=64)
    codes = pq_encode(x, books)
    tables = pq_adc_tables(x[:16], books)
    cols = np.arange(8)
    self_scores = np.array(
        [tables[i][cols, codes[i]].sum() for i in range(16)]
    )
    cross_scores = np.array(
        [tables[i][cols, codes[(i + 100) % 512]].sum() for i in range(16)]
    )
    assert (self_scores > 0.5).all(), self_scores  # ≈1 minus quantization loss
    assert self_scores.mean() > cross_scores.mean() + 0.3


def test_pq_codes_are_bytes():
    from tartare_ray.stages.similarity import l2_normalize, pq_encode, train_pq

    rng = np.random.default_rng(6)
    x = l2_normalize(rng.normal(size=(256, 64)))
    books = train_pq(x, m=8, k_codes=64)
    codes = pq_encode(x, books)
    assert codes.dtype == np.uint8 and codes.shape == (256, 8)  # 8 B/vector


def test_ann_pq_recall_vs_exact(ray_session):
    """PQ top-k keeps decent recall vs the exact brute force — the
    compression trade documented in the operator docstring."""
    from tartare_ray.pipelines.queries import ann_pq_topk, ann_topk

    exact = _collect(ann_topk(SF, n_queries=8, k=5))
    approx = _collect(ann_pq_topk(SF, n_queries=8, k=5))
    recalls = []
    for q in exact["q_id"].unique():
        e = set(exact[exact.q_id == q]["vec_id"])
        a = set(approx[approx.q_id == q]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6, recalls  # measured 0.8 at sf0.01


def test_ann_pq_deterministic(ray_session):
    from tartare_ray.pipelines.queries import ann_pq_topk

    a = _collect(ann_pq_topk(SF, n_queries=4, k=3)).sort_values(
        ["q_id", "rank"], ignore_index=True
    )
    b = _collect(ann_pq_topk(SF, n_queries=4, k=3)).sort_values(
        ["q_id", "rank"], ignore_index=True
    )
    assert a.equals(b)
