"""Incrementally-maintained token-dedup index (pipelines/dedup_index.py):
feed-driven updates, exactly-once redelivery, duplicate-group semantics,
and equality with the direct snapshot fold."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tartare_ray.gen import GenConfig, generate_log
from tartare_ray.pipelines.cdc import CdcEngine, EngineConfig
from tartare_ray.pipelines.dedup_index import TokenDedupIndex
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


def _collect(ds):
    tables = list(ds.iter_batches(batch_format="pyarrow"))
    if not tables:
        import pandas as pd

        return pd.DataFrame()
    return pa.concat_tables(tables).to_pandas()


def test_index_tracks_dups_incrementally(ray_session, tmp_path):
    log = str(tmp_path / "log")
    seq_a, seq_b = [1, 2, 3], [9, 8]
    # epoch 1: a1/a2/a3 share seq_a, b1 unique
    _write_events(
        f"{log}/events-000000.parquet",
        [
            (1, "I", "a1", seq_a),
            (2, "I", "a2", seq_a),
            (3, "I", "a3", seq_a),
            (4, "I", "b1", seq_b),
        ],
    )
    eng = CdcEngine(log, str(tmp_path / "tbl"), EngineConfig(num_partitions=2, epoch_max_files=1))
    eng.replay()
    idx = TokenDedupIndex(eng)
    assert idx.update() == [1]
    live = _collect(idx.live_fingerprints()).sort_values("doc_id", ignore_index=True)
    assert live["doc_id"].tolist() == ["a1", "a2", "a3", "b1"]
    dups = _collect(idx.duplicate_groups())
    assert dups["survivor"].tolist() == ["a1"] and dups["n_copies"].tolist() == [3]
    # epoch 2: delete the survivor, move a3 onto b1's sequence
    _write_events(
        f"{log}/events-000001.parquet",
        [(5, "D", "a1", None), (6, "U", "a3", seq_b)],
    )
    eng.replay()
    assert idx.update() == [2]
    live = _collect(idx.live_fingerprints()).sort_values("doc_id", ignore_index=True)
    assert live["doc_id"].tolist() == ["a2", "a3", "b1"]
    dups = _collect(idx.duplicate_groups()).sort_values("survivor", ignore_index=True)
    # a3 now collides with b1; a2 is the lone remaining seq_a holder
    assert dups["survivor"].tolist() == ["a3"] and dups["n_copies"].tolist() == [2]
    # idempotent: nothing pending, state unchanged
    assert idx.update() == []
    again = _collect(idx.live_fingerprints()).sort_values("doc_id", ignore_index=True)
    assert again.equals(live)


def test_index_equals_snapshot_fold(ray_session, tmp_path):
    """Index-served live fingerprints == direct fold of the committed
    snapshot's token lists (the non-incremental reference)."""
    from tartare_ray.stages.text import token_fingerprints_batch

    log = str(tmp_path / "log")
    generate_log(log, GenConfig(n_events=6000, n_docs=400, events_per_file=1500))
    eng = CdcEngine(log, str(tmp_path / "tbl"), EngineConfig(num_partitions=4, epoch_max_files=2))
    eng.replay()
    idx = TokenDedupIndex(eng)
    idx.update()
    via_index = _collect(idx.live_fingerprints()).sort_values("doc_id", ignore_index=True)
    direct = token_fingerprints_batch(
        eng.snapshot_table().select(["doc_id", "tokens"])
    ).to_pandas()[["doc_id", "fp"]].sort_values("doc_id", ignore_index=True)
    assert via_index.equals(direct)


def test_index_redelivery_is_exactly_once(ray_session, tmp_path):
    """A crash between delta write and ack re-delivers the epoch; the
    deterministic directory rename makes the rewrite a no-op."""
    log = str(tmp_path / "log")
    _write_events(
        f"{log}/events-000000.parquet",
        [(1, "I", "x", [1]), (2, "I", "y", [1])],
    )
    eng = CdcEngine(log, str(tmp_path / "tbl"), EngineConfig(num_partitions=2))
    eng.replay()
    idx = TokenDedupIndex(eng)
    # simulate the crash: persist the delta but never ack
    eng.subscribe(idx.consumer)
    for e, ds in eng.consume(idx.consumer):
        idx._write_epoch(e, ds)
        break  # no ack
    assert eng.consumers()[idx.consumer] == 0  # cursor did not move
    assert idx.update() == [1]  # redelivery completes and acks
    assert eng.consumers()[idx.consumer] == 1
    dups = _collect(idx.duplicate_groups())
    assert dups["n_copies"].tolist() == [2]


def test_index_rollback_hygiene(ray_session, tmp_path):
    """After a source rollback + divergent re-replay, stale epoch
    deltas are dropped and the redelivered epochs rebuild them."""
    log = str(tmp_path / "log")
    _write_events(f"{log}/events-000000.parquet", [(1, "I", "x", [1, 2])])
    _write_events(f"{log}/events-000001.parquet", [(2, "I", "y", [1, 2])])
    eng = CdcEngine(log, str(tmp_path / "tbl"), EngineConfig(num_partitions=2, epoch_max_files=1))
    eng.replay()
    idx = TokenDedupIndex(eng)
    assert idx.update() == [1, 2]
    # incident: epoch 2 was bad — fix the log value and roll back
    eng.rollback(1)
    _write_events(f"{log}/events-000001.parquet", [(2, "I", "y", [7, 7])])
    eng.replay()
    assert idx.update() == [2]  # redelivered epoch rebuilt (cursor clamped)
    live = _collect(idx.live_fingerprints()).sort_values("doc_id", ignore_index=True)
    assert live["doc_id"].tolist() == ["x", "y"]
    # y's fingerprint reflects the FIXED tokens: no duplicate group now
    assert len(_collect(idx.duplicate_groups())) == 0
