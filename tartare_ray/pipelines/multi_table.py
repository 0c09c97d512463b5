"""Multi-table CDC: demux ONE interleaved binlog/WAL-style change log
(events carry a ``table`` column, LSNs globally ordered) into N
per-table ``CdcEngine``s, and commit their epochs under a SINGLE
cross-table global manifest — so a consistent reader can never observe
table A at a watermark table B has not reached.

Real binlogs interleave many tables; the single-table engine
(pipelines/cdc.py) is the per-table building block and this module is
the coordination layer a production CDC user needs first (r4 verdict
item #3).

Shape, Ray-Data-first:

- **Demux** is a distributed ``map_batches`` over the PENDING source
  files (one task per file — the log file is the natural parallel
  unit of a binlog tail): each task reads its file once, splits rows
  by ``table`` (vectorized filter per distinct value, the column is
  dropped on write), and writes ``<root>/demux/<table>/<srcfile>``
  via write-to-tmp + rename.  File names are PRESERVED, so per-table
  logs inherit the source's name-ordered LSN-cut invariant; empty
  slices are skipped (a table absent from a file simply has no file
  of that name).  A crashed/retried task rewrites identical bytes to
  the same names (deterministic), and the per-file ``_done`` marker is
  written only after every slice's rename — redelivery is idempotent.
- **Apply** replays each table's demuxed log through its own
  ``CdcEngine`` (all engine semantics — exactly-once, schema
  evolution, LSM/compaction, lineage — are inherited per table).
  Re-runs are per-table watermark no-ops.
- **Global commit**: after every table's replay, ONE atomic global
  manifest ``<root>/_global/e{N}.json`` records each table's
  (epoch, watermark_lsn) — written tmp+rename under an exclusive
  flock with a parent guard (generalizing the single-table
  ``commit_manifest(guard_parent=True)`` CAS).  A crash after some
  tables committed but before the global manifest leaves the global
  view at the previous epoch: those tables' new epochs exist but are
  not OBSERVABLE through the consistent-read API until a re-run
  completes the remaining tables and commits the next global
  manifest.  Re-running ``replay()`` is the crash recovery.
- **Consistent read**: ``snapshot(table)`` time-travels each engine
  to the epoch recorded in the chosen global manifest — cross-table
  consistency via per-table time travel, no locks on the read path.

Reference analogue `[UNVERIFIED — empty checkout, SURVEY.md §0]`:
tartare coordinates N contributor exports into one coverage export
whose publication is all-or-nothing; here the coverage-level atomicity
is the global manifest over per-table epochs.
"""

from __future__ import annotations

import fcntl
import json
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from .cdc import CdcEngine, EngineConfig


class GlobalCommitError(RuntimeError):
    pass


class MultiTableCdc:
    def __init__(self, log_dir: str, root: str, cfg: EngineConfig | None = None):
        self.log_dir = log_dir
        self.root = root
        self.cfg = cfg or EngineConfig()
        self.demux_dir = os.path.join(root, "demux")
        self.tables_dir = os.path.join(root, "tables")
        self.global_dir = os.path.join(root, "_global")

    # -- demux ---------------------------------------------------------------
    def _source_files(self) -> list[str]:
        if not os.path.isdir(self.log_dir):
            return []
        return sorted(
            n
            for n in os.listdir(self.log_dir)
            if n.startswith("events-") and n.endswith(".parquet")
        )

    def _pending_files(self) -> list[str]:
        done = os.path.join(self.demux_dir, "_done")
        return [
            n
            for n in self._source_files()
            if not os.path.exists(os.path.join(done, n + ".json"))
        ]

    def demux(self) -> dict[str, int]:
        """Split pending source files by table (distributed, one task
        per file).  Returns {table: rows written this call}."""
        pending = self._pending_files()
        os.makedirs(os.path.join(self.demux_dir, "_done"), exist_ok=True)
        if not pending:
            return {}
        demux_dir, log_dir = self.demux_dir, self.log_dir

        def split_one(b: pa.Table) -> pa.Table:
            # b: one row per source file (the file is the task unit)
            out_t, out_n = [], []
            for name in b["name"].to_pylist():
                t = pq.read_table(os.path.join(log_dir, name))
                tables = pc.unique(t["table"]).to_pylist()
                col = t.schema.get_field_index("table")
                for tbl in sorted(tables):
                    part = t.filter(pc.equal(t["table"], tbl)).remove_column(col)
                    d = os.path.join(demux_dir, tbl)
                    os.makedirs(d, exist_ok=True)
                    tmp = os.path.join(d, name + ".tmp")
                    pq.write_table(part, tmp, compression="zstd")
                    os.replace(tmp, os.path.join(d, name))
                    out_t.append(tbl)
                    out_n.append(len(part))
                # marker after ALL slices of this file are renamed
                mtmp = os.path.join(demux_dir, "_done", name + ".json.tmp")
                with open(mtmp, "w") as f:
                    json.dump({"file": name, "tables": sorted(tables)}, f)
                os.replace(mtmp, mtmp[: -len(".tmp")])
            return pa.table(
                {"table": pa.array(out_t, pa.string()), "rows": pa.array(out_n, pa.int64())}
            )

        res = (
            ray.data.from_arrow(pa.table({"name": pa.array(pending, pa.string())}))
            .map_batches(split_one, batch_format="pyarrow", batch_size=1)
            .take_all()
        )  # O(files × tables) tiny lineage rows
        out: dict[str, int] = {}
        for r in res:
            out[r["table"]] = out.get(r["table"], 0) + int(r["rows"])
        return out

    # -- per-table engines ---------------------------------------------------
    def tables(self) -> list[str]:
        if not os.path.isdir(self.demux_dir):
            return []
        return sorted(
            n
            for n in os.listdir(self.demux_dir)
            if not n.startswith("_") and os.path.isdir(os.path.join(self.demux_dir, n))
        )

    def engine(self, table: str) -> CdcEngine:
        return CdcEngine(
            os.path.join(self.demux_dir, table),
            os.path.join(self.tables_dir, table),
            self.cfg,
        )

    # -- global manifest -----------------------------------------------------
    def global_epoch(self) -> int:
        """Newest committed global epoch (0 = none)."""
        if not os.path.isdir(self.global_dir):
            return 0
        eps = [
            int(n[1:7])
            for n in os.listdir(self.global_dir)
            if n.startswith("e") and n.endswith(".json")
        ]
        return max(eps) if eps else 0

    def watermarks(self, global_epoch: int | None = None) -> dict[str, dict]:
        """{table: {"epoch": e, "watermark_lsn": w}} recorded by the
        chosen (default: newest) global manifest; {} when none."""
        g = self.global_epoch() if global_epoch is None else global_epoch
        if g <= 0:
            return {}
        p = os.path.join(self.global_dir, f"e{g:06d}.json")
        with open(p) as f:
            return json.load(f)["tables"]

    def _commit_global(self, entries: dict[str, dict]) -> int:
        """Atomic cross-table commit: parent-guarded CAS under an
        exclusive flock (two coordinators racing the same root cannot
        both commit epoch N+1 from parent N)."""
        os.makedirs(self.global_dir, exist_ok=True)
        fd = os.open(os.path.join(self.global_dir, "LOCK"), os.O_CREAT | os.O_RDWR)
        try:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            except BlockingIOError:
                raise GlobalCommitError(
                    f"another coordinator is committing {self.root}"
                ) from None
            cur = self.global_epoch()
            if cur > 0 and self.watermarks(cur) == entries:
                return cur  # no table moved: idempotent no-op
            nxt = cur + 1
            final = os.path.join(self.global_dir, f"e{nxt:06d}.json")
            if os.path.exists(final):  # parent guard
                raise GlobalCommitError(f"global epoch {nxt} already committed")
            tmp = final + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"global_epoch": nxt, "tables": entries}, f, indent=1)
            os.replace(tmp, final)
            return nxt
        finally:
            os.close(fd)

    # -- the coordinated replay ---------------------------------------------
    def replay(self, _crash_after_table: str | None = None) -> int:
        """Demux pending files, replay every table's engine, commit ONE
        global manifest.  Idempotent: a crash anywhere re-runs to the
        same state (demux rewrites identical bytes, per-table replay is
        a watermark no-op past its own commit, the global commit is a
        no-op when no watermark moved).  Returns the current global
        epoch.  ``_crash_after_table`` is the fault-injection hook the
        mid-commit crash test uses (raises after that table's replay,
        BEFORE the global commit)."""
        self.demux()
        entries: dict[str, dict] = {}
        for t in self.tables():
            eng = self.engine(t)
            eng.replay()
            hist = eng.history()
            entries[t] = {
                "epoch": int(hist[0]["epoch"]),
                "watermark_lsn": int(hist[0]["watermark_lsn"]),
            }
            if _crash_after_table == t:
                raise RuntimeError(f"injected crash after table {t!r}")
        if not entries:
            return self.global_epoch()
        return self._commit_global(entries)

    # -- consistent reads ----------------------------------------------------
    def snapshot(self, table: str, global_epoch: int | None = None) -> ray.data.Dataset:
        """The table's snapshot AT the chosen global manifest's
        recorded epoch (time travel) — never a watermark the other
        tables haven't reached, even if this table's engine has
        already committed further."""
        wm = self.watermarks(global_epoch)
        if table not in wm:
            raise LookupError(f"table {table!r} not in global epoch")
        return self.engine(table).snapshot_dataset(epoch=int(wm[table]["epoch"]))

    def cleanup(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)
