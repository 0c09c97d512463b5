"""Dedup + text-analysis semantics on planted fixtures: near-dup pairs
are found, unrelated docs are not; language-ID and fingerprints behave."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """A documents.parquet with planted duplicate groups:

    - docs 0/1: identical long text (exact + near dup)
    - docs 2/3: near-dup (one word changed out of 40)
    - docs 4..23: unrelated random word-soup
    """
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(2000)]
    base = " ".join(rng.choice(vocab, 40))
    near = base.split()
    near[20] = "CHANGED"
    near = " ".join(near)
    texts = [base, base, base + " tail", near] + [
        " ".join(rng.choice(vocab, 40)) for _ in range(20)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["fixture"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    d = tmp_path_factory.mktemp("planted")
    pq.write_table(tbl, os.path.join(str(d), "documents.parquet"))
    return str(d)


def _pairs(df):
    if hasattr(df, "to_pandas"):
        df = df.to_pandas()
    return {(int(a), int(b)) for a, b in zip(df["doc_a"], df["doc_b"])}


def test_minhash_finds_planted_pairs(planted_dir, ray_session):
    from tartare_ray.pipelines.queries import minhash_lsh_dedup

    pairs = _pairs(minhash_lsh_dedup(planted_dir, threshold=0.5))
    assert (0, 1) in pairs  # identical
    assert (2, 3) in pairs or (0, 3) in pairs or (1, 3) in pairs  # near-dup family
    for a, b in pairs:  # no unrelated doc appears
        assert a <= 3 and b <= 3, (a, b)


def test_ngram_jaccard_exact_values(planted_dir, ray_session):
    from tartare_ray.pipelines.queries import ngram_jaccard_pairs

    df = ngram_jaccard_pairs(planted_dir, threshold=0.3).to_pandas()
    j = {(int(a), int(b)): v for a, b, v in zip(df["doc_a"], df["doc_b"], df["jaccard"])}
    assert j[(0, 1)] == 1.0  # identical docs: exact jaccard 1
    assert all(a <= 3 and b <= 3 for a, b in j)


def test_simhash_finds_identical(planted_dir, ray_session):
    from tartare_ray.pipelines.queries import simhash_dedup

    df = simhash_dedup(planted_dir, max_hamming=3).to_pandas()
    pairs = {(int(a), int(b)): int(h) for a, b, h in zip(df["doc_a"], df["doc_b"], df["hamming"])}
    assert pairs.get((0, 1)) == 0  # identical text -> identical simhash
    assert all(a <= 3 and b <= 3 for a, b in pairs)


def test_exact_dedup_groups(planted_dir, ray_session):
    from tartare_ray.pipelines.queries import exact_dedup

    df = exact_dedup(planted_dir).to_pandas().set_index("doc_id")
    assert int(df.loc[0, "n_copies"]) == 2  # docs 0,1 collapse; survivor min id
    assert 1 not in df.index
    assert len(df) == 23  # 24 docs - 1 collapsed


def test_fingerprint_order_sensitive(ray_session):
    import pyarrow as pa

    from tartare_ray.stages.text import fingerprint_batch

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["a b c", "a b c", "c b a", "a b c d"]),
        }
    )
    fp = fingerprint_batch(tbl)["fingerprint"].to_pylist()
    assert fp[0] == fp[1]  # identical text, identical fingerprint
    assert fp[0] != fp[2]  # order-sensitive
    assert fp[0] != fp[3]  # length-sensitive


def test_lang_id_on_real_sentences(ray_session):
    import pyarrow as pa

    from tartare_ray.stages.text import lang_id_batch

    tbl = pa.table(
        {
            "doc_id": pa.array(range(5), pa.int64()),
            "text": pa.array(
                [
                    "the cat is on the mat and it is warm in the sun",
                    "le chat est sur le tapis et il est dans la maison",
                    "der hund ist nicht in dem haus und ich bin mit ihm",
                    "el gato es en la casa y no es como los otros",
                    "的一是不了人我在有他",
                ]
            ),
        }
    )
    out = lang_id_batch(tbl)
    assert out["pred_lang"].to_pylist() == ["en", "fr", "de", "es", "zh"]


def test_text_stats_vectorized_counts(ray_session):
    import pyarrow as pa

    from tartare_ray.stages.text import text_stats_batch

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["the a the xyz", "  solo  "]),
        }
    )
    out = text_stats_batch(tbl)
    assert out["n_words"].to_pylist() == [4, 1]
    assert out["n_stopwords"].to_pylist() == [3, 0]
    assert out["n_chars"].to_pylist() == [13, 8]


def test_attach_sigs_broadcast_and_join_paths_agree(ray_session, monkeypatch):
    """The size-gated broadcast fast path and the hash-partitioned
    join (100 TB) path must emit identical verified pairs."""
    import pandas as pd

    import tartare_ray.pipelines.queries as Q

    SF = "/root/testdata/sf0.001"

    def run():
        df = Q.QUERIES["minhash_lsh_dedup"](SF).to_pandas()
        return df.sort_values(["doc_a", "doc_b"], ignore_index=True)

    fast = run()  # small corpus -> broadcast path
    monkeypatch.setattr(Q, "_BROADCAST_SIG_BYTES", 0)  # force the join path
    slow = run()
    pd.testing.assert_frame_equal(fast, slow)
    assert len(fast) > 0


def test_repetition_stats_exact(ray_session):
    import pyarrow as pa

    from tartare_ray.stages.text import repetition_stats_batch

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    # 9 words -> 7 3-gram shingles, 3 distinct -> 1-3/7
                    "a b c a b c a b c",
                    # 5 distinct words -> 3 distinct shingles -> 0
                    "v w x y z",
                    # short doc (<3 words): word-level dup rule -> 1-1/2
                    "x x",
                    # empty: one empty token (the house/DuckDB split
                    # convention, same as token_count) -> 1 shingle, 0
                    "",
                ]
            ),
        }
    )
    out = repetition_stats_batch(tbl)
    assert out["n_shingles"].to_pylist() == [7, 3, 2, 1]
    got = out["repetition_ratio"].to_pylist()
    assert got[0] == round(1 - 3 / 7, 6)
    assert got[1] == 0.0
    assert got[2] == 0.5
    assert got[3] == 0.0


def test_doc_repetition_query_runs(ray_session):
    from tartare_ray.pipelines.queries import QUERIES

    df = QUERIES["doc_repetition"]("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 500
    assert set(df.columns) == {"doc_id", "n_shingles", "repetition_ratio"}
    assert ((df.repetition_ratio >= 0) & (df.repetition_ratio < 1)).all()


def test_contamination_batch_exact(ray_session):
    import numpy as np
    import pyarrow as pa

    from tartare_ray.stages.dedup import contamination_batch, eval_shingles

    eval_texts = pa.array(["the quick brown fox jumps over the lazy dog"])
    sh = eval_shingles(eval_texts, k=4)
    corpus = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    # contains the 4-gram "quick brown fox jumps" (+1 more)
                    "he saw the quick brown fox jumps over a fence",
                    "completely unrelated words about tokens and arrays",
                    "dog lazy the over jumps fox brown quick",  # reversed: no 4-gram hit
                ]
            ),
        }
    )
    out = contamination_batch(corpus, sh, k=4)
    assert out["doc_id"].to_pylist() == [1]
    assert out["n_overlap"].to_pylist()[0] >= 1
    # empty eval set -> nothing flagged
    empty = contamination_batch(corpus, np.empty(0, np.uint64), k=4)
    assert len(empty) == 0


def test_decontaminate_query(ray_session):
    from tartare_ray.pipelines.queries import QUERIES

    df = QUERIES["decontaminate"]("/root/testdata/sf0.001").to_pandas()
    # eval docs themselves are excluded from the report
    assert not (df.doc_id % 25 == 0).any()
    assert (df.n_overlap >= 1).all()


def test_minhash_cluster_collapses_planted_family(planted_dir, ray_session):
    """Cluster step: verified pairs → connected components → one
    survivor per family; matches union-find over the same pairs."""
    from tartare_ray.pipelines.queries import minhash_cluster_dedup, minhash_lsh_dedup

    pairs = _pairs(minhash_lsh_dedup(planted_dir, threshold=0.5))
    df = minhash_cluster_dedup(planted_dir, threshold=0.5).to_pandas()
    got = dict(zip(df["doc_id"].astype(int), df["cluster_id"].astype(int)))

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    comps = {}
    for x in list(parent):
        comps.setdefault(find(x), []).append(x)
    expected = {x: min(m) for m in comps.values() for x in m}
    assert got == expected
    # the planted family is connected: 0/1 identical, 2=0+tail, 3 near —
    # all must share survivor 0
    assert got.get(1) == 0 and got.get(2) == 0


def test_paragraph_dedup_keep_first_and_digest(planted_dir, ray_session):
    """Paragraph (8-word-chunk) dedup vs a brute-force keep-first
    emulation: survivors, counts, and the SQL-convention digest must
    all match; docs 0/1 are identical so doc 1 keeps nothing."""
    from tartare_ray.pipelines.queries import paragraph_dedup

    df = paragraph_dedup(planted_dir).to_pandas()
    got = {
        int(r.doc_id): (int(r.n_kept), int(r.kept_digest)) for r in df.itertuples()
    }

    tbl = pq.read_table(os.path.join(planted_dir, "documents.parquet"))
    M = 1000000007

    def ph(s):
        h = 0
        for c in s:
            h = (h * 31 + ord(c)) % M
        return h

    occ: dict[str, tuple[int, int]] = {}
    chunks_by_doc = {}
    for did, tx in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()):
        ws = tx.strip().split()
        cs = [" ".join(ws[8 * j : 8 * j + 8]) for j in range((len(ws) + 7) // 8)]
        chunks_by_doc[did] = cs
        for j, c in enumerate(cs):
            if c not in occ or (did, j) < occ[c]:
                occ[c] = (did, j)
    exp = {}
    for did, cs in chunks_by_doc.items():
        kept = [c for j, c in enumerate(cs) if occ[c] == (did, j)]
        if not kept:
            continue
        d = 0
        for c in kept:
            d = (d * 31 + ph(c)) % M
        exp[did] = (len(kept), d)

    assert got == exp
    assert 1 not in got  # doc 1 is an exact copy of doc 0 — fully deduped
    assert got[0] == (5, exp[0][1])  # 40 words → 5 chunks, all first


def test_bucket_pairs_partition_matches_per_bucket_fold():
    """The vectorized partition fold must emit EXACTLY the per-bucket
    pairs (same multiset: one row per bucket a pair collides in), for
    int64 and string doc ids, with duplicate (bucket, doc) rows
    collapsed and oversized buckets dropped."""
    from collections import Counter, defaultdict

    from tartare_ray.stages.dedup import bucket_pairs_group, bucket_pairs_partition

    rng = np.random.default_rng(7)
    n = 5000
    band = rng.integers(0, 4, n).astype(np.int32)
    bkey = rng.integers(0, 400, n)
    doc = rng.integers(0, 1200, n)
    band[:200], bkey[:200], doc[:200] = 9, 777, np.arange(200)  # oversized bucket
    t = pa.table({"band": pa.array(band), "band_key": pa.array(bkey), "doc_id": pa.array(doc)})

    got = bucket_pairs_partition(t, ["band", "band_key"], max_bucket=64)
    gotc = Counter(zip(got["doc_a"].to_pylist(), got["doc_b"].to_pylist()))

    buckets = defaultdict(list)
    for i in range(n):
        buckets[(band[i], bkey[i])].append(doc[i])
    refc = Counter()
    for ids in buckets.values():
        g = bucket_pairs_group(
            pa.table({"doc_id": pa.array(np.array(ids, np.int64))}), max_bucket=64
        )
        refc.update(zip(g["doc_a"].to_pylist(), g["doc_b"].to_pylist()))
    assert gotc == refc and sum(refc.values()) > 0

    t2 = t.set_column(2, "doc_id", pa.array([f"d{int(x):05d}" for x in doc], pa.string()))
    got2 = bucket_pairs_partition(t2, ["band", "band_key"], max_bucket=64)
    got2c = Counter(zip(got2["doc_a"].to_pylist(), got2["doc_b"].to_pylist()))
    assert got2c == Counter({(f"d{a:05d}", f"d{b:05d}"): c for (a, b), c in refc.items()})

    single = bucket_pairs_partition(t.slice(0, 1), ["band", "band_key"])
    assert single.num_rows == 0 and single.schema.field("doc_a").type == pa.int64()
