"""Real byte-level BPE (functions/bpe.py) + token-sequence dedup:
merge semantics, lossless round-trip, stage determinism, fingerprint
exactness."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from tartare_ray.functions.bpe import BpeEncoder, load_merges, save_merges, train_bpe

SF = "/root/testdata/sf0.001"


def test_train_bpe_greedy_and_deterministic():
    # 'ab' appears 5x (3 in "abab" x? count pairs): corpus = {"abab": 3, "abc": 2}
    # pair counts: (a,b): 3*2 + 2*1 = 8, (b,a): 3, (b,c): 2 → first merge (a,b)
    wc = {"abab": 3, "abc": 2}
    merges = train_bpe(wc, n_merges=2)
    a, b, c = ord("a"), ord("b"), ord("c")
    assert merges[0] == (a, b)
    # after merge0: "abab"→[256,256] (3x), "abc"→[256,c] (2x);
    # pairs: (256,256):3, (256,c):2 → second merge (256,256)
    assert merges[1] == (256, 256)
    assert train_bpe(wc, n_merges=2) == merges  # deterministic


def test_encoder_lowest_rank_first_and_roundtrip(tmp_path):
    wc = {"abab": 3, "abc": 2}
    merges = train_bpe(wc, n_merges=2)
    p = str(tmp_path / "merges.json")
    save_merges(p, merges)
    enc = BpeEncoder(load_merges(p))
    assert enc.encode_word("abab") == [257]
    assert enc.encode_word("abc") == [256, ord("c")]
    assert enc.encode_word("xyz") == [ord("x"), ord("y"), ord("z")]  # no merges apply
    # whole-text: GPT-2 space convention, decode is the exact inverse
    text = "abab abc xyz abab"
    ids = enc.encode(text)
    assert enc.decode(ids) == text
    # unicode survives the byte round-trip
    uni = "héllo wörld 中文 🎉"
    enc2 = BpeEncoder(train_bpe({"héllo": 2, " wörld": 1}, 5))
    assert enc2.decode(enc2.encode(uni)) == uni


def test_encoder_cache_consistency():
    enc = BpeEncoder(train_bpe({"aaaa": 10}, 3))
    first = enc.encode_word("aaaa")
    assert enc.encode_word("aaaa") == first  # cached path identical


def test_bpe_encode_query_compresses_and_is_deterministic(ray_session):
    from tartare_ray.pipelines.queries import bpe_encode

    a = bpe_encode(SF).to_pandas().sort_values("doc_id", ignore_index=True)
    b = bpe_encode(SF).to_pandas().sort_values("doc_id", ignore_index=True)
    assert a.equals(b)  # deterministic across runs/actor pools
    assert len(a) == 500
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    docs = docs.sort_values("doc_id", ignore_index=True)
    # ≤ byte count of the space-normalized text; merges strictly compress
    norm = docs["text"].str.split().str.join(" ").str.encode("utf-8").str.len()
    assert (a["n_bpe_tokens"] <= norm).all()
    assert a["n_bpe_tokens"].sum() < norm.sum() * 0.9  # real merging happened
    # spot-check one document against the pure-python reference
    from collections import Counter

    from tartare_ray.functions.bpe import train_bpe as tb

    counts = Counter()
    for t in docs["text"]:
        ws = t.split()
        for i, w in enumerate(ws):
            counts[w if i == 0 else " " + w] += 1
    enc = BpeEncoder(tb(counts, 200))
    row = docs.iloc[7]
    assert int(a.loc[a.doc_id == row.doc_id, "n_bpe_tokens"].iloc[0]) == len(
        enc.encode(row.text)
    )


def test_token_fingerprints_order_and_length_sensitive(ray_session):
    from tartare_ray.stages.text import token_fingerprints_batch

    tbl = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c", "d", "e"], pa.string()),
            "tokens": pa.array(
                [[1, 2, 3], [1, 2, 3], [3, 2, 1], [1, 2], []],
                pa.list_(pa.int32()),
            ),
        }
    )
    out = token_fingerprints_batch(tbl)
    fp = out["fp"].to_pylist()
    assert fp[0] == fp[1]  # identical sequences collide (that's the point)
    assert fp[0] != fp[2]  # order matters
    assert fp[0] != fp[3]  # length matters
    assert out["n_tok"].to_pylist() == [3, 3, 3, 2, 0]
    # chunked input takes the same path
    chunked = pa.Table.from_batches(tbl.to_batches(max_chunksize=2))
    assert token_fingerprints_batch(chunked)["fp"].to_pylist() == fp


def test_cdc_token_dedup_accounts_for_every_row(ray_session):
    from tartare_ray.pipelines.flagship import run_flagship
    from tartare_ray.pipelines.queries import cdc_token_dedup

    df = cdc_token_dedup(SF).to_pandas()
    eng = run_flagship(SF)
    total = len(eng.snapshot_table())
    assert df["n_copies"].sum() == total  # every committed row in exactly one group
    assert df["survivor"].is_unique
    assert (df["n_copies"] >= 1).all()


def test_token_rarity_broadcasts_head_not_tail():
    """On a Zipf corpus (the real-world shape; the synthetic testdata
    has a closed 31-word vocabulary) the frequent set — the side
    token_rarity BROADCASTS — is a small fraction of the vocabulary;
    the rare tail it never ships is the bulk."""
    rng = np.random.default_rng(42)
    words = rng.zipf(1.3, size=200_000)
    words = words[words < 10_000_000]
    uniq, counts = np.unique(words, return_counts=True)
    frequent = int((counts > 2).sum())
    assert frequent < 0.2 * len(uniq), (frequent, len(uniq))


def test_token_rarity_nonzero_rare_branch(ray_session, tmp_path):
    """The testdata's closed vocabulary makes every word frequent
    (n_rare == 0 everywhere), so the rare branch needs its own corpus:
    planted hapaxes must be counted per occurrence, per document."""
    import duckdb
    import pyarrow.parquet as pq

    from tartare_ray.pipelines.queries import token_rarity

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "common common common rareone",
                    "common rareone-again raretwo common common",
                    "common",
                ]
            ),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    got = (
        token_rarity(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert got["n_words"].tolist() == [4, 5, 1]
    # 'common' appears 6x (>2, frequent); each rare* word once
    assert got["n_rare"].tolist() == [1, 2, 0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    from tartare_ray.pipelines.queries import ORACLE_SQL

    exp = con.execute(ORACLE_SQL["token_rarity"]).df().sort_values("doc_id", ignore_index=True)
    assert (got.values == exp[got.columns].values).all()
