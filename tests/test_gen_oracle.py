"""M0: generator determinism + oracle applier semantics (no Ray)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from tartare_ray.gen import GenConfig, generate_log
from tartare_ray.oracle import replay_oracle
from tartare_ray.schema import (
    BASE_SCHEMA,
    CHANGE_SCHEMA,
    conform,
    payload_schema,
    unify_with_widening,
)


def test_generator_deterministic(tmp_path):
    cfg = GenConfig(n_events=2_000, n_docs=100, events_per_file=500)
    r1 = generate_log(str(tmp_path / "a"), cfg)
    r2 = generate_log(str(tmp_path / "b"), cfg)
    assert len(r1.files) == len(r2.files) == 4
    for f1, f2 in zip(r1.files, r2.files):
        t1, t2 = pq.read_table(f1), pq.read_table(f2)
        assert t1.equals(t2)


def test_generator_reuses_complete_log(tmp_path):
    cfg = GenConfig(n_events=1_000, n_docs=50, events_per_file=500)
    d = str(tmp_path / "log")
    r1 = generate_log(d, cfg)
    import os

    mtimes = {f: os.path.getmtime(f) for f in r1.files}
    r2 = generate_log(d, cfg)
    assert r2.files == r1.files
    assert all(os.path.getmtime(f) == m for f, m in mtimes.items())


def test_generator_lsn_and_schema_evolution(tmp_log):
    res, cfg, _ = tmp_log
    prev_hi = -1
    saw_wide = saw_quality = False
    for f in res.files:
        t = pq.read_table(f)
        lsns = t["lsn"].to_numpy()
        assert lsns.min() == prev_hi + 1 and (lsns[1:] > lsns[:-1]).all()
        prev_hi = int(lsns.max())
        if t.schema.field("tokens").type == pa.list_(pa.int64()):
            saw_wide = True
        if "quality" in t.schema.names:
            saw_quality = True
    assert saw_wide and saw_quality
    assert res.max_lsn == cfg.n_events - 1


def test_generator_delete_rows_have_null_payload(tmp_log):
    res, _, _ = tmp_log
    t = pq.read_table(res.files[0])
    import pyarrow.compute as pc

    d = t.filter(pc.equal(t["op"], "D"))
    assert len(d) > 0
    assert d["tokens"].null_count == len(d)
    assert d["n_tok"].null_count == len(d)
    assert d["source"].null_count == len(d)
    i = t.filter(pc.not_equal(t["op"], "D"))
    assert i["tokens"].null_count == 0
    # n_tok invariant on live rows
    assert pc.all(
        pc.equal(pc.list_value_length(i["tokens"]), i["n_tok"])
    ).as_py()


def test_unify_with_widening():
    s1 = pa.schema([("a", pa.int32()), ("t", pa.list_(pa.int32()))])
    s2 = pa.schema([("t", pa.list_(pa.int64())), ("q", pa.float64())])
    u = unify_with_widening([s1, s2])
    assert u.names == ["a", "t", "q"]
    assert u.field("t").type == pa.list_(pa.int64())


def test_conform_backfills_and_widens():
    t = pa.table({"doc_id": ["a"], "tokens": pa.array([[1, 2]], pa.list_(pa.int32()))})
    target = pa.schema(
        [("doc_id", pa.string()), ("tokens", pa.list_(pa.int64())), ("q", pa.float64())]
    )
    out = conform(t, target)
    assert out.schema.equals(target)
    assert out["q"].null_count == 1
    assert out["tokens"].to_pylist() == [[1, 2]]


def test_payload_schema_drops_envelope():
    assert payload_schema(CHANGE_SCHEMA).names == BASE_SCHEMA.names


def test_oracle_manual_fold(tmp_path):
    """Hand-built 6-event log: the oracle must produce the exact fold."""
    t = pa.table(
        {
            "lsn": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
            "op": ["I", "I", "U", "D", "U", "D"],
            "doc_id": ["a", "b", "a", "b", "c", "zz"],
            "tokens": pa.array([[1], [2], [3, 4], None, [5], None], pa.list_(pa.int32())),
            "n_tok": pa.array([1, 1, 2, None, 1, None], pa.int32()),
            "source": ["s", "s", "s", None, "s", None],
            "schema_version": pa.array([1] * 6, pa.int32()),
        }
    )
    f = str(tmp_path / "events-000000.parquet")
    pq.write_table(t, f)
    out = replay_oracle([f])
    assert out["doc_id"].to_pylist() == ["a", "c"]  # b deleted, zz no-op delete
    assert out["tokens"].to_pylist() == [[3, 4], [5]]  # a updated (latest LSN wins)
    assert out.schema.names == ["doc_id", "tokens", "n_tok", "source"]


def test_oracle_evolved_schema(tmp_log):
    res, _, _ = tmp_log
    out = replay_oracle(res.files)
    assert out.schema.field("tokens").type == pa.list_(pa.int64())
    assert "quality" in out.schema.names
    assert len(out) > 0
    # sorted by doc_id, unique keys
    ids = out["doc_id"].to_pylist()
    assert ids == sorted(ids) and len(ids) == len(set(ids))


def test_oracle_folds_global_lsn_order_across_files():
    """Multi-source logs interleave LSN ranges across files; the
    oracle must fold by GLOBAL LSN, not file order."""
    import os
    import tempfile

    def ev(lsn, n_tok):
        return pa.table(
            {
                "lsn": pa.array([lsn], pa.int64()),
                "op": ["U"],
                "doc_id": ["doc-x"],
                "tokens": pa.array([[1] * n_tok], pa.list_(pa.int32())),
                "n_tok": pa.array([n_tok], pa.int32()),
                "source": ["s"],
                "schema_version": pa.array([1], pa.int32()),
            }
        )

    with tempfile.TemporaryDirectory() as d:
        # a.parquet sorts FIRST by path but holds the NEWER event
        pq.write_table(ev(10, 2), os.path.join(d, "a.parquet"))
        pq.write_table(ev(5, 1), os.path.join(d, "b.parquet"))
        out = replay_oracle([os.path.join(d, "a.parquet"), os.path.join(d, "b.parquet")])
        assert out["n_tok"].to_pylist() == [2]  # lsn 10 wins
