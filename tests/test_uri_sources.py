"""Remote-URI change sources (§2A S1/S2): the log directory may be a
filesystem URI (``file://`` locally; ``s3://`` etc. in production via
the same ``pyarrow.fs`` dispatch).  Tail listing, footer stats, the
full engine replay, and log GC all run against URIs; the dead-letter
requeue (a producer-side append) refuses them loudly."""

from __future__ import annotations

import os

import pytest

from tartare_ray.gen import GenConfig, generate_log
from tartare_ray.oracle import replay_oracle
from tartare_ray.pipelines.cdc import CdcEngine, EngineConfig
from tartare_ray.sources.tail import list_log_files, read_log_schema


@pytest.fixture()
def uri_log(tmp_path):
    d = str(tmp_path / "log")
    res = generate_log(d, GenConfig(n_events=4000, n_docs=300, events_per_file=1000))
    return res, d, "file://" + d


def test_uri_listing_matches_local(uri_log):
    res, local, uri = uri_log
    a = list_log_files(local)
    b = list_log_files(uri)
    assert len(a) == len(b) == 4
    for x, y in zip(a, b):
        assert y.path == "file://" + x.path
        assert (x.min_lsn, x.max_lsn, x.num_rows) == (y.min_lsn, y.max_lsn, y.num_rows)
    assert read_log_schema(b[0].path).names == read_log_schema(a[0].path).names


def test_engine_replays_from_uri_log(uri_log, ray_session, tmp_path):
    res, local, uri = uri_log
    eng = CdcEngine(uri, str(tmp_path / "tbl"), EngineConfig(num_partitions=4))
    m = eng.replay()
    assert m is not None
    exp = replay_oracle(res.files)
    got = eng.snapshot_table()
    assert got["doc_id"].to_pylist() == exp["doc_id"].to_pylist()
    assert got["tokens"].to_pylist() == exp["tokens"].to_pylist()
    with pytest.raises(ValueError, match="POSIX log dir"):
        eng.requeue_quarantine(m.epoch, fix=lambda t: t)


def test_log_gc_removes_uri_files(uri_log, ray_session, tmp_path):
    from tartare_ray.state.manifest import gc_epochs, gc_log

    res, local, uri = uri_log
    root = str(tmp_path / "tbl")
    # one epoch per file so early epochs (and their log ranges) can age out
    eng = CdcEngine(uri, root, EngineConfig(num_partitions=2, epoch_max_files=1))
    eng.replay()
    gc_epochs(root, keep_last=1)
    before = len(os.listdir(local))
    removed = gc_log(root, uri)
    assert removed > 0
    assert len(os.listdir(local)) == before - removed


def test_jsonl_source_roundtrip_and_replay(tmp_path, ray_session):
    """JSONL change log (tokens as real JSON arrays): normalize to the
    Parquet log layout, replay through the engine, and confirm the
    committed state — including a tombstone and a widened int64
    token value the narrow cast must NOT truncate."""
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tartare_ray.sources.jsonsrc import jsonl_log_to_parquet, read_change_jsonl

    jdir = str(tmp_path / "jsonl")
    os.makedirs(jdir)
    lines = [
        {"lsn": 1, "op": "I", "doc_id": "a", "tokens": [1, 2, 3], "n_tok": 3,
         "source": "s", "schema_version": 1},
        {"lsn": 2, "op": "I", "doc_id": "b", "tokens": [7], "n_tok": 1,
         "source": "s", "schema_version": 1},
        {"lsn": 3, "op": "D", "doc_id": "b", "tokens": None, "n_tok": None,
         "source": None, "schema_version": 1},
    ]
    with open(os.path.join(jdir, "chunk0.jsonl"), "w") as f:
        for d in lines:
            f.write(_json.dumps(d) + "\n")
    # widened producer: one value beyond int32 in a second file
    with open(os.path.join(jdir, "chunk1.jsonl"), "w") as f:
        f.write(_json.dumps({"lsn": 4, "op": "U", "doc_id": "a",
                             "tokens": [2**32 + 5], "n_tok": 1,
                             "source": "s", "schema_version": 2}) + "\n")

    ds = read_change_jsonl(os.path.join(jdir, "chunk0.jsonl"))
    t = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    assert t["tokens"].type == pa.list_(pa.int32())
    assert t["tokens"].to_pylist() == [[1, 2, 3], [7], None]

    plog = str(tmp_path / "plog")
    out = jsonl_log_to_parquet(jdir, plog)
    assert [os.path.basename(p) for p in out] == [
        "events-000000.parquet", "events-000001.parquet",
    ]
    assert pq.read_table(out[1])["tokens"].type == pa.list_(pa.int64())

    eng = CdcEngine(plog, str(tmp_path / "tbl"), EngineConfig(num_partitions=2))
    eng.replay()
    snap = pa.concat_tables(
        eng.snapshot_dataset(columns=["doc_id", "tokens"]).iter_batches(
            batch_format="pyarrow"
        )
    ).sort_by("doc_id")
    assert snap["doc_id"].to_pylist() == ["a"]  # b deleted
    assert snap["tokens"].to_pylist() == [[2**32 + 5]]  # widened value exact
