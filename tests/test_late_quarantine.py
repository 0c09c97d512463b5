"""Out-of-order tail hardening (pipelines/cdc.py::_quarantine_late):
a producer file whose LSNs fall entirely at/below the committed
watermark — and that no retained epoch consumed — must be
dead-lettered to ``_quarantine/late/`` with metrics, never silently
skipped and never allowed to regress the watermark."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from tartare_ray.pipelines.cdc import CdcEngine, EngineConfig
from tartare_ray.schema import CHANGE_SCHEMA


def _write_events(path: str, rows: list[tuple]) -> None:
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


def _state(eng) -> dict[str, int]:
    t = pa.concat_tables(
        eng.snapshot_dataset(columns=["doc_id", "n_tok"]).iter_batches(
            batch_format="pyarrow"
        )
    )
    d = t.to_pydict()
    return dict(zip(d["doc_id"], d["n_tok"]))


def _engine(tmp_path):
    log = str(tmp_path / "log")
    _write_events(
        f"{log}/events-000000.parquet", [(10, "I", "a", [1]), (11, "I", "b", [2, 2])]
    )
    _write_events(f"{log}/events-000001.parquet", [(20, "U", "a", [3, 3, 3])])
    eng = CdcEngine(
        log, str(tmp_path / "tbl"), EngineConfig(num_partitions=2, epoch_max_files=1)
    )
    eng.replay()
    return log, eng


def test_wholly_late_file_is_quarantined(ray_session, tmp_path):
    log, eng = _engine(tmp_path)
    wm = eng.history()[0]["watermark_lsn"]
    assert wm == 20
    before = _state(eng)
    # violating producer: new file entirely at/below the watermark
    _write_events(f"{log}/events-000002.parquet", [(5, "I", "z", [9]), (15, "U", "a", [9])])
    eng.replay()
    # watermark monotone, state unchanged, file dead-lettered + counted
    assert eng.history()[0]["watermark_lsn"] == wm
    assert _state(eng) == before
    assert not os.path.exists(f"{log}/events-000002.parquet")
    qp = os.path.join(eng.table_root, "_quarantine", "late", "events-000002.parquet")
    assert os.path.exists(qp)
    assert eng.late_quarantine_stats() == {"files": 1, "rows": 2}
    meta = [
        json.loads(line)
        for line in open(
            os.path.join(eng.table_root, "_quarantine", "late", "_late.jsonl")
        )
    ]
    assert meta[0]["max_lsn"] == 15 and meta[0]["watermark"] == 20


def test_straddling_file_applies_only_above_watermark(ray_session, tmp_path):
    log, eng = _engine(tmp_path)
    before = _state(eng)
    # straddler: one row below the watermark (row-dropped by the
    # validate stage — redelivery semantics), one above (applied)
    _write_events(
        f"{log}/events-000002.parquet", [(15, "U", "a", [9]), (30, "I", "c", [4])]
    )
    eng.replay()
    assert eng.history()[0]["watermark_lsn"] == 30
    got = _state(eng)
    assert got == dict(before, c=1)  # the lsn-15 update never lands
    assert eng.late_quarantine_stats()["files"] == 0
    assert os.path.exists(f"{log}/events-000002.parquet")  # not quarantined


def test_consumed_files_are_never_quarantined(ray_session, tmp_path):
    log, eng = _engine(tmp_path)
    before = _state(eng)
    eng.replay()  # no-op re-run: all files ≤ watermark but all consumed
    assert eng.late_quarantine_stats()["files"] == 0
    assert sorted(os.listdir(log)) == [
        "events-000000.parquet",
        "events-000001.parquet",
    ]
    assert _state(eng) == before


def test_legacy_manifests_disable_detection(ray_session, tmp_path):
    """A retained manifest without source_files (older table) keeps the
    legacy skip-silently behavior — no false quarantine."""
    log, eng = _engine(tmp_path)
    mp = os.path.join(eng.table_root, "_manifests", "e000001.json")
    d = json.load(open(mp))
    d.pop("source_files", None)
    with open(mp, "w") as f:
        json.dump(d, f)
    eng._consumed_cache = None
    _write_events(f"{log}/events-000002.parquet", [(5, "I", "z", [9])])
    eng.replay()
    assert eng.late_quarantine_stats()["files"] == 0
    assert os.path.exists(f"{log}/events-000002.parquet")
