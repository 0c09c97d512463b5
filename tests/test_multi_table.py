"""Multi-table CDC (pipelines/multi_table.py): demux of one
interleaved log into per-table engines, the single atomic cross-table
global manifest, and the mid-commit crash guarantee — no table is
observable at a watermark the other hasn't reached."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tartare_ray.pipelines.cdc import EngineConfig
from tartare_ray.pipelines.multi_table import GlobalCommitError, MultiTableCdc
from tartare_ray.schema import CHANGE_SCHEMA


def _write_mixed(path: str, rows: list[tuple]) -> None:
    """rows: (lsn, table, op, doc_id, tokens)"""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    base = pa.table(
        {
            "lsn": pa.array([r[0] for r in rows], pa.int64()),
            "op": pa.array([r[2] for r in rows], pa.string()),
            "doc_id": pa.array([r[3] for r in rows], pa.string()),
            "tokens": pa.array([r[4] for r in rows], pa.list_(pa.int32())),
            "n_tok": pa.array(
                [len(r[4]) if r[4] is not None else None for r in rows], pa.int32()
            ),
            "source": pa.array(
                ["s" if r[4] is not None else None for r in rows], pa.string()
            ),
            "schema_version": pa.array([1] * len(rows), pa.int32()),
        },
        schema=CHANGE_SCHEMA,
    )
    tbl = base.append_column("table", pa.array([r[1] for r in rows], pa.string()))
    pq.write_table(tbl, path)


def _state(mt: MultiTableCdc, table: str, g: int | None = None) -> dict[str, int]:
    t = pa.concat_tables(
        mt.snapshot(table, g)
        .select_columns(["doc_id", "n_tok"])
        .iter_batches(batch_format="pyarrow")
    )
    d = t.to_pydict()
    return dict(zip(d["doc_id"], d["n_tok"]))


def _mt(tmp_path) -> tuple[str, MultiTableCdc]:
    log = str(tmp_path / "log")
    _write_mixed(
        f"{log}/events-000000.parquet",
        [
            (1, "alpha", "I", "a", [1, 2]),
            (2, "beta", "I", "a", [9]),
            (3, "alpha", "I", "b", [3]),
            (4, "beta", "I", "b", [8, 8]),
        ],
    )
    mt = MultiTableCdc(
        log, str(tmp_path / "mt"), EngineConfig(num_partitions=2, epoch_max_files=1)
    )
    return log, mt


def test_demux_replay_and_consistent_read(ray_session, tmp_path):
    log, mt = _mt(tmp_path)
    assert mt.replay() == 1
    assert mt.tables() == ["alpha", "beta"]
    assert _state(mt, "alpha") == {"a": 2, "b": 1}
    assert _state(mt, "beta") == {"a": 1, "b": 2}
    # idempotent: nothing moved, same global epoch, demux no-op
    assert mt.replay() == 1
    assert mt.demux() == {}
    # second wave: update in alpha, delete in beta
    _write_mixed(
        f"{log}/events-000001.parquet",
        [(5, "alpha", "U", "a", [7, 7, 7]), (6, "beta", "D", "b", None)],
    )
    assert mt.replay() == 2
    assert _state(mt, "alpha") == {"a": 3, "b": 1}
    assert _state(mt, "beta") == {"a": 1}
    # time travel to global epoch 1 still serves the old cut of BOTH
    assert _state(mt, "alpha", 1) == {"a": 2, "b": 1}
    assert _state(mt, "beta", 1) == {"a": 1, "b": 2}


def test_mid_commit_crash_is_not_observable(ray_session, tmp_path):
    """Crash after one table's engine committed but before the global
    manifest: the consistent-read surface still serves the previous
    global epoch for BOTH tables; re-running replay() completes."""
    log, mt = _mt(tmp_path)
    assert mt.replay() == 1
    _write_mixed(
        f"{log}/events-000001.parquet",
        [(5, "alpha", "U", "a", [7, 7, 7]), (6, "beta", "U", "a", [4, 4])],
    )
    with pytest.raises(RuntimeError, match="injected crash"):
        mt.replay(_crash_after_table="alpha")
    # alpha's ENGINE is ahead...
    assert mt.engine("alpha").history()[0]["epoch"] == 2
    # ...but the global view is not: both tables read at global epoch 1
    assert mt.global_epoch() == 1
    assert _state(mt, "alpha") == {"a": 2, "b": 1}
    assert _state(mt, "beta") == {"a": 1, "b": 2}
    # recovery: plain re-run finishes beta and commits global epoch 2
    assert mt.replay() == 2
    assert _state(mt, "alpha") == {"a": 3, "b": 1}
    assert _state(mt, "beta") == {"a": 2, "b": 2}


def test_crash_before_first_global_commit_serves_nothing(ray_session, tmp_path):
    log, mt = _mt(tmp_path)
    with pytest.raises(RuntimeError, match="injected crash"):
        mt.replay(_crash_after_table="alpha")
    assert mt.global_epoch() == 0
    with pytest.raises(LookupError):
        mt.snapshot("alpha")
    assert mt.replay() == 1
    assert _state(mt, "beta") == {"a": 1, "b": 2}


def test_global_commit_parent_guard(ray_session, tmp_path):
    """CAS: another coordinator commits between this one's parent read
    and its commit — the swap is refused (lost-update guard)."""
    log, mt = _mt(tmp_path)
    assert mt.replay() == 1
    entries = mt.watermarks(1)
    # simulate a concurrent coordinator landing epoch 2 after we read
    # parent=1 but before we commit
    with open(os.path.join(mt.global_dir, "e000002.json"), "w") as f:
        json.dump({"global_epoch": 2, "tables": dict(entries)}, f)
    stale = {t: dict(e, watermark_lsn=e["watermark_lsn"] + 1) for t, e in entries.items()}
    with pytest.raises(GlobalCommitError, match="lost update"):
        mt._commit_global(stale, expect_parent=1)


def test_demux_crash_redelivery_is_idempotent(ray_session, tmp_path):
    """A demuxed slice without its _done marker (crash between rename
    and marker) is redelivered: identical bytes, same names, replay
    applies once."""
    log, mt = _mt(tmp_path)
    mt.demux()
    os.remove(os.path.join(mt.demux_dir, "_done", "events-000000.parquet.json"))
    mt.demux()  # rewrites the same files
    assert mt.replay() == 1
    assert _state(mt, "alpha") == {"a": 2, "b": 1}
    assert _state(mt, "beta") == {"a": 1, "b": 2}


@pytest.mark.slow
def test_cli_mt_replay_and_status(tmp_path):
    """CLI surface: mt-replay demuxes + replays + globally commits;
    mt-status reads the newest global manifest."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""),
        RAY_ADDRESS="local",
    )

    def cli(*args):
        r = subprocess.run(
            [sys.executable, "-m", "tartare_ray", *args],
            capture_output=True, text=True, timeout=300, env=env, cwd=repo,
        )
        assert r.returncode == 0, r.stderr[-1500:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    log = str(tmp_path / "log")
    _write_mixed(
        f"{log}/events-000000.parquet",
        [(1, "alpha", "I", "a", [1, 2]), (2, "beta", "I", "a", [9])],
    )
    root = str(tmp_path / "mt")
    out = cli("mt-replay", "--log-dir", log, "--root", root, "--num-partitions", "2")
    assert out["global_epoch"] == 1 and set(out["tables"]) == {"alpha", "beta"}
    st = cli("mt-status", "--root", root)
    assert st == out
