"""Incrementally-maintained inverted index (pipelines/inverted_index.py):
feed-driven updates, delete/update semantics, search tie-breaks, and
equality with a direct fold over the snapshot."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from tartare_ray.pipelines.cdc import CdcEngine, EngineConfig
from tartare_ray.pipelines.inverted_index import InvertedIndex, doc_term_counts
from tartare_ray.schema import CHANGE_SCHEMA


def _write_events(path: str, rows: list[tuple]) -> None:
    """rows: (lsn, op, doc_id, tokens) — I/U carry tokens, D carries None."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tbl = pa.table(
        {
            "lsn": pa.array([r[0] for r in rows], pa.int64()),
            "op": pa.array([r[1] for r in rows], pa.string()),
            "doc_id": pa.array([r[2] for r in rows], pa.string()),
            "tokens": pa.array([r[3] for r in rows], pa.list_(pa.int32())),
            "n_tok": pa.array(
                [len(r[3]) if r[3] is not None else None for r in rows], pa.int32()
            ),
            "source": pa.array(
                ["s" if r[3] is not None else None for r in rows], pa.string()
            ),
            "schema_version": pa.array([1] * len(rows), pa.int32()),
        },
        schema=CHANGE_SCHEMA,
    )
    pq.write_table(tbl, path)


def _stats(idx) -> dict:
    t = pa.concat_tables(idx.term_stats().iter_batches(batch_format="pyarrow"))
    return t.sort_by("term").to_pydict()


def test_doc_term_counts_vectorized():
    b = pa.table(
        {
            "doc_id": pa.array(["x", "y", "z"]),
            "tokens": pa.array([[3, 1, 3, 3, 2], [7], []], pa.list_(pa.int32())),
        }
    )
    t = doc_term_counts(b)
    assert t["terms"].to_pylist() == [[1, 2, 3], [7], []]
    assert t["tfs"].to_pylist() == [[1, 3, 1], [1], []] or t["tfs"].to_pylist() == [
        [1, 1, 3],
        [1],
        [],
    ]
    # tf aligns with its term: token 3 occurs 3×
    terms, tfs = t["terms"].to_pylist()[0], t["tfs"].to_pylist()[0]
    assert dict(zip(terms, tfs)) == {1: 1, 2: 1, 3: 3}


def test_index_tracks_postings_incrementally(ray_session, tmp_path):
    log = str(tmp_path / "log")
    _write_events(
        f"{log}/events-000000.parquet",
        [(1, "I", "a", [1, 2, 2, 3]), (2, "I", "b", [2, 3, 3]), (3, "I", "c", [9])],
    )
    eng = CdcEngine(
        log, str(tmp_path / "tbl"), EngineConfig(num_partitions=2, epoch_max_files=1)
    )
    eng.replay()
    idx = InvertedIndex(eng)
    assert idx.update() == [1]
    assert _stats(idx) == {
        "term": [1, 2, 3, 9],
        "df": [1, 2, 2, 1],
        "tf_total": [1, 3, 3, 1],
    }
    # search: a scores 2(tf of 2)+1(tf of 3)=3, b scores 1+2=3 — tie
    # breaks by ascending doc_id
    res = idx.search([2, 3], k=2)
    assert res["doc_id"].to_pylist() == ["a", "b"]
    assert res["score"].to_pylist() == [3, 3]
    # k larger than matches returns only matching docs (c has no 2/3)
    assert len(idx.search([2, 3], k=10)) == 2

    # epoch 2: delete b, move a onto [9, 9]
    _write_events(
        f"{log}/events-000001.parquet", [(4, "D", "b", None), (5, "U", "a", [9, 9])]
    )
    eng.replay()
    assert idx.update() == [2]
    assert _stats(idx) == {"term": [9], "df": [2], "tf_total": [3]}
    # idempotent: nothing new to consume, stats unchanged
    assert idx.update() == []
    assert _stats(idx) == {"term": [9], "df": [2], "tf_total": [3]}


def test_index_matches_direct_snapshot_fold(ray_session, tmp_path):
    """term_stats from the incremental index == a brute-force count
    over the final live docs."""
    rng = np.random.default_rng(7)
    log = str(tmp_path / "log")
    docs = {f"d{i}": rng.integers(0, 12, rng.integers(1, 30)).tolist() for i in range(40)}
    rows = [(i + 1, "I", d, t) for i, (d, t) in enumerate(docs.items())]
    _write_events(f"{log}/events-000000.parquet", rows)
    # second epoch rewrites some docs and deletes others
    upd = {f"d{i}": rng.integers(0, 12, rng.integers(1, 30)).tolist() for i in range(0, 10)}
    rows2 = [(100 + j, "U", d, t) for j, (d, t) in enumerate(upd.items())]
    rows2 += [(200 + j, "D", f"d{30 + j}", None) for j in range(5)]
    _write_events(f"{log}/events-000001.parquet", rows2)
    eng = CdcEngine(
        log, str(tmp_path / "tbl"), EngineConfig(num_partitions=2, epoch_max_files=1)
    )
    eng.replay()
    idx = InvertedIndex(eng)
    idx.update()

    live = dict(docs)
    live.update(upd)
    for j in range(5):
        live.pop(f"d{30 + j}")
    from collections import Counter

    df, tf = Counter(), Counter()
    for toks in live.values():
        c = Counter(toks)
        for t_, n in c.items():
            df[t_] += 1
            tf[t_] += n
    got = _stats(idx)
    want_terms = sorted(df)
    assert got["term"] == want_terms
    assert got["df"] == [df[t_] for t_ in want_terms]
    assert got["tf_total"] == [tf[t_] for t_ in want_terms]

    # search agrees with a brute-force score
    q = [3, 7]
    scores = {
        d: sum(t.count(qt) for qt in q)
        for d, t in live.items()
        if any(qt in t for qt in q)
    }
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    res = idx.search(q, k=5)
    assert list(zip(res["doc_id"].to_pylist(), res["score"].to_pylist())) == want
