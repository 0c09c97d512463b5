"""Training-shard export sink (pipelines/export.py): one resumable
shard per partition, token conservation, two-phase manifest."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tartare_ray.gen import GenConfig, generate_log
from tartare_ray.pipelines.cdc import CdcEngine, EngineConfig
from tartare_ray.pipelines.export import export_training_shards

SEQ = 64


@pytest.fixture()
def committed(ray_session, tmp_path):
    log = str(tmp_path / "log")
    generate_log(log, GenConfig(n_events=5000, n_docs=400, events_per_file=2500))
    eng = CdcEngine(log, str(tmp_path / "tbl"), EngineConfig(num_partitions=4))
    eng.replay()
    return eng, str(tmp_path / "out")


def test_export_shards_conserve_tokens(committed):
    eng, out = committed
    man = export_training_shards(eng, out, seq_len=SEQ, eos=0)
    assert len(man["shards"]) == 4 and man["resumed_shards"] == 0
    assert os.path.exists(os.path.join(out, "_export.json"))
    # per-partition expected: floor((tokens + one eos per doc) / SEQ),
    # recomputed from the engine's own partition chains
    import pyarrow.compute as pc

    from tartare_ray.stages.kernels import hash_partition_ids

    snap = eng.snapshot_table()
    parts = hash_partition_ids(snap["doc_id"], 4)
    for s in man["shards"]:
        sub = snap.filter(pa.array(parts == s["p"]))
        total = int(pc.sum(pc.list_value_length(sub["tokens"])).as_py() or 0) + len(sub)
        assert s["n_seqs"] == total // SEQ, s
        t = pq.read_table(os.path.join(out, s["file"]))
        assert len(t) == s["n_seqs"]
        assert t["seq"].type.list_size == SEQ
        assert t["n_tok"].to_pylist() == [SEQ] * len(t)
    assert man["n_seqs"] == sum(s["n_seqs"] for s in man["shards"])


def test_export_resumes_and_skips_finished_shards(committed):
    eng, out = committed
    first = export_training_shards(eng, out, seq_len=SEQ, eos=0)
    # kill one shard; a re-run rewrites ONLY that one
    victim = first["shards"][2]["file"]
    os.remove(os.path.join(out, victim))
    second = export_training_shards(eng, out, seq_len=SEQ, eos=0)
    assert second["resumed_shards"] == 3
    assert second["shards"] == first["shards"]  # identical content lineage
    # byte-identical rewrite of the victim (deterministic packing)
    t = pq.read_table(os.path.join(out, victim))
    assert len(t) == first["shards"][2]["n_seqs"]


def test_export_manifest_commits_last(committed):
    """An interrupted export leaves shards but NO _export.json; the
    re-run adopts them (resume) and only then commits the manifest."""
    eng, out = committed
    export_training_shards(eng, out, seq_len=SEQ, eos=0)
    os.remove(os.path.join(out, "_export.json"))  # simulate pre-commit crash
    man = export_training_shards(eng, out, seq_len=SEQ, eos=0)
    assert man["resumed_shards"] == 4
    with open(os.path.join(out, "_export.json")) as f:
        assert json.load(f)["n_seqs"] == man["n_seqs"]


def test_export_incremental_reuse(committed):
    """After a new epoch that touches ONE partition, re-export reuses
    (hardlinks) the other shards and repacks only the touched one —
    and the result is byte-equal to a from-scratch export."""
    eng, out = committed
    first = export_training_shards(eng, out, seq_len=SEQ, eos=0)
    assert first["packed_shards"] == 4 and first["reused_shards"] == 0
    # touch exactly one doc -> exactly one partition's chain changes
    from tartare_ray.state.manifest import load_current

    snap = eng.snapshot_table()
    doc = snap["doc_id"][0].as_py()
    wm = load_current(eng.table_root).watermark_lsn
    upd = pa.table(
        {
            "lsn": pa.array([wm + 1], pa.int64()),
            "op": pa.array(["U"], pa.string()),
            "doc_id": pa.array([doc], pa.string()),
            "tokens": pa.array([[1, 2, 3]], pa.list_(pa.int32())),
            "n_tok": pa.array([3], pa.int32()),
            "source": pa.array(["src0"], pa.string()),
            "schema_version": pa.array([1], pa.int32()),
        }
    )
    pq.write_table(upd, os.path.join(eng.log_dir, "events-000099.parquet"))
    eng.replay()
    second = export_training_shards(eng, out, seq_len=SEQ, eos=0)
    assert second["reused_shards"] == 3 and second["packed_shards"] == 1
    assert second["resumed_shards"] == 0
    # shard-for-shard byte equality with a from-scratch export
    fresh = export_training_shards(eng, out + "-fresh", seq_len=SEQ, eos=0)
    assert fresh["packed_shards"] == 4
    for a, b in zip(second["shards"], fresh["shards"]):
        ta = pq.read_table(os.path.join(out, a["file"]))
        tb = pq.read_table(os.path.join(out + "-fresh", b["file"]))
        assert ta.equals(tb), (a, b)
    # a third export of the SAME epoch resumes everything (no relink)
    third = export_training_shards(eng, out, seq_len=SEQ, eos=0)
    assert third["resumed_shards"] == 4


def test_export_drop_duplicates(committed):
    """dedup-aware export: a planted exact token-sequence duplicate
    (new doc, lexicographically larger id) is dropped; token totals
    equal a manual pack of the deduped snapshot; toggling dedup on the
    same epoch can never resume the other mode's shards."""
    import numpy as np
    import pyarrow.compute as pc

    from tartare_ray.stages.kernels import hash_partition_ids
    from tartare_ray.state.manifest import load_current

    eng, out = committed
    snap = eng.snapshot_table()
    dup_of = snap["doc_id"][0].as_py()
    toks = snap["tokens"][0].as_py()
    wm = load_current(eng.table_root).watermark_lsn
    upd = pa.table(
        {
            "lsn": pa.array([wm + 1], pa.int64()),
            "op": pa.array(["I"], pa.string()),
            "doc_id": pa.array(["zzz-dup"], pa.string()),
            "tokens": pa.array([toks], pa.list_(pa.int32())),
            "n_tok": pa.array([len(toks)], pa.int32()),
            "source": pa.array(["src0"], pa.string()),
            "schema_version": pa.array([1], pa.int32()),
        }
    )
    pq.write_table(upd, os.path.join(eng.log_dir, "events-000099.parquet"))
    eng.replay()
    plain = export_training_shards(eng, out, seq_len=SEQ, eos=0)
    man = export_training_shards(eng, out, seq_len=SEQ, eos=0, drop_duplicates=True)
    assert man["drop_fp"] and man["resumed_shards"] == 0  # distinct namespace
    # expected: the deduped snapshot packed per partition
    snap2 = eng.snapshot_table()
    keep = pa.array(
        np.asarray(snap2["doc_id"].to_numpy(zero_copy_only=False), dtype=object)
        != "zzz-dup"
    )
    deduped = snap2.filter(keep)
    assert len(deduped) == len(snap2) - 1  # the loser existed and is dropped
    parts = hash_partition_ids(deduped["doc_id"], 4)
    for s in man["shards"]:
        sub = deduped.filter(pa.array(parts == s["p"]))
        total = int(pc.sum(pc.list_value_length(sub["tokens"])).as_py() or 0) + len(sub)
        assert s["n_seqs"] == total // SEQ, s
    assert sum(s["n_seqs"] for s in man["shards"]) <= sum(
        s["n_seqs"] for s in plain["shards"]
    )


def test_export_query_contract(ray_session):
    """Round-4 form: the query emits the token-conservation summary
    (hash-oracled vs DuckDB by the driver) and the per-partition
    packing verdict must be TRUE."""
    from tartare_ray.pipelines.queries import cdc_export_shards

    t = cdc_export_shards("/root/testdata/sf0.001")
    assert t.column_names == ["n_docs", "total_tokens", "tokens_with_eos", "conservation_ok"]
    assert t["conservation_ok"].to_pylist() == [True]
    assert t["n_docs"][0].as_py() > 0
    assert (
        t["tokens_with_eos"][0].as_py()
        == t["total_tokens"][0].as_py() + t["n_docs"][0].as_py()
    )
    # deterministic across runs (second run resumes)
    t2 = cdc_export_shards("/root/testdata/sf0.001")
    assert t.equals(t2)
