"""MergeApplier — the per-partition LSM-style upsert (engine centerpiece).

Target analogue of tartare's export merge + GridFS publish step
(`tartare/processes/fusio.py`, `tartare/core/gridfs_handler.py`
`[UNVERIFIED — empty checkout, SURVEY.md §0]`), re-expressed as a
hash-partitioned merge-apply (SURVEY.md §2A J2/ST2):

- runs as a callable class under
  ``ds.groupby("part").map_groups(MergeApplier, concurrency=…)`` —
  an actor pool; constructor state (schemas, root paths, parent
  chains) is built once per actor, each ``__call__`` receives ONE
  partition's pre-reduced events as a single Arrow table;
- two write modes:
  * ``cow`` (default): load the parent partition file, merge winners,
    rewrite the whole partition — simplest reads, O(table) write
    amplification per epoch;
  * ``delta`` (LSM): write only the epoch's winners (tombstones
    included) as ``delta-{p}-e{E}.parquet``; a partition's state is
    the base + ordered delta chain, folded at read by
    ``stages/compact.py::merge_chain`` and COMPACTED back into a
    fresh base when the chain exceeds ``compact_chain_len`` —
    O(epoch winners) write amplification, the 10^10-events path;
- schema evolution happens lazily per touched partition: parent files
  are conformed to the epoch's unified schema at load;
- all writes are deterministic tmp-name + ``os.replace`` so a retried
  task overwrites itself with identical bytes (exactly-once);
- returns one lineage row per output file (p, file, kind, rows, lsn
  range, events_applied, bytes) consumed by the manifest commit.

The base snapshot carries no per-row LSN: every event in epoch E+1 has
lsn > watermark(E) >= every LSN reflected in the base, so base rows
lose all conflicts by construction; across deltas the chain order
(epoch) is the priority.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..schema import conform
from .compact import DELTA_ENVELOPE, ROW_GROUP_SIZE, merge_chain
from .kernels import key_hash, latest_per_key


def part_file_name(p: int, epoch: int) -> str:
    return f"part-{p:05d}-e{epoch:06d}.parquet"


def delta_file_name(p: int, epoch: int) -> str:
    return f"delta-{p:05d}-e{epoch:06d}.parquet"


class MergeApplier:
    def __init__(
        self,
        table_root: str,
        epoch: int,
        snapshot_schema: pa.Schema,
        parent_chain: dict[int, list[dict]],  # p -> [{"file","kind"}…] epoch order
        compression: str = "zstd",
        mode: str = "cow",
        compact_chain_len: int = 8,
    ):
        assert mode in ("cow", "delta")
        self.table_root = table_root
        self.epoch = epoch
        self.snapshot_schema = snapshot_schema
        self.parent_chain = parent_chain
        self.compression = compression
        self.mode = mode
        self.compact_chain_len = compact_chain_len
        os.makedirs(os.path.join(table_root, "data"), exist_ok=True)

    # -- file IO -------------------------------------------------------------
    def _read_chain_tables(self, p: int) -> list[pa.Table]:
        return [
            pq.read_table(os.path.join(self.table_root, e["file"]))
            for e in self.parent_chain.get(p, [])
        ]

    def _write(self, fname: str, tbl: pa.Table) -> str:
        path = os.path.join(self.table_root, "data", fname)
        tmp = path + ".inprogress"
        pq.write_table(
            tbl, tmp, compression=self.compression, row_group_size=ROW_GROUP_SIZE
        )
        os.replace(tmp, path)
        return path

    def _lineage(self, p, fname, kind, rows, lsn_lo, lsn_hi, applied, path) -> pa.Table:
        return _lineage_table(
            [
                {
                    "p": p,
                    "file": os.path.join("data", fname),
                    "kind": kind,
                    "rows": rows,
                    "lsn_lo": lsn_lo,
                    "lsn_hi": lsn_hi,
                    "events_applied": applied,
                    "bytes": os.path.getsize(path),
                }
            ]
        )

    # -- modes ---------------------------------------------------------------
    def _apply_cow(self, p, group, winners, lsn_lo, lsn_hi) -> pa.Table:
        live = winners.filter(pc.not_equal(winners["op"], "D"))
        live_hash = live["doc_hash"].combine_chunks()
        new_rows = conform(live, self.snapshot_schema).append_column("doc_hash", live_hash)

        chain = self._read_chain_tables(p)
        if len(chain) > 1:
            base = merge_chain(chain, self.snapshot_schema, keep_hash=True)
        elif chain:
            # reuse the stored cluster hash when the file carries it
            # (post-round-2 format); conform drops it, so lift it first
            raw = chain[0]
            h = (
                raw["doc_hash"].combine_chunks()
                if "doc_hash" in raw.schema.names
                else pa.array(key_hash(raw["doc_id"]).view(np.int64))
            )
            base = conform(raw, self.snapshot_schema).append_column("doc_hash", h)
        else:
            base = None
        if base is not None and len(base):
            keep = pc.invert(
                pc.is_in(base["doc_id"], value_set=winners["doc_id"].combine_chunks())
            )
            base_keep = base.filter(keep)
            final = pa.concat_tables([base_keep, new_rows])
        else:
            final = new_rows
        # Deterministic output order (exactly-once under task retry):
        # (doc_hash, doc_id) — int-dominant sort, strings only on ties.
        # The hash column STAYS in the file: hash-sorted row groups
        # give tight min/max stats for point-read pushdown (compact.py
        # lookup_keys_in_chain); snapshot readers conform() it away.
        final = final.sort_by([("doc_hash", "ascending"), ("doc_id", "ascending")])
        fname = part_file_name(p, self.epoch)
        path = self._write(fname, final)
        return self._lineage(p, fname, "base", len(final), lsn_lo, lsn_hi, None, path)

    def _apply_delta(self, p, group, winners, lsn_lo, lsn_hi) -> pa.Table:
        chain = self.parent_chain.get(p, [])
        # delta payload: snapshot columns + (op, lsn) envelope, ordered
        envelope = pa.schema(
            [pa.field(n, winners.schema.field(n).type) for n in DELTA_ENVELOPE]
        )
        body = conform(winners, self.snapshot_schema)
        for name in reversed(DELTA_ENVELOPE):
            body = body.add_column(0, envelope.field(name), winners[name])
        body = body.append_column("doc_hash", winners["doc_hash"].combine_chunks())
        body = body.sort_by([("doc_hash", "ascending"), ("doc_id", "ascending")])

        if len(chain) + 1 >= self.compact_chain_len:
            # COMPACT: fold base + deltas + this epoch's winners into a
            # fresh base (tombstones physically dropped here).
            tables = self._read_chain_tables(p) + [body]
            final = merge_chain(tables, self.snapshot_schema, keep_hash=True)
            fname = part_file_name(p, self.epoch)
            path = self._write(fname, final)
            return self._lineage(p, fname, "base", len(final), lsn_lo, lsn_hi, None, path)
        fname = delta_file_name(p, self.epoch)
        path = self._write(fname, body)
        return self._lineage(p, fname, "delta", len(body), lsn_lo, lsn_hi, None, path)

    # -- entry ---------------------------------------------------------------
    def __call__(self, group: pa.Table) -> pa.Table:
        import time

        t0 = time.perf_counter()
        if len(group) == 0:
            return _lineage_table([])
        p = group["part"][0].as_py()
        winners = latest_per_key(group, key="doc_id", order_col="lsn", hash_col="doc_hash")
        lsn_lo = pc.min(group["lsn"]).as_py()
        lsn_hi = pc.max(group["lsn"]).as_py()
        if self.mode == "delta":
            out = self._apply_delta(p, group, winners, lsn_lo, lsn_hi)
        else:
            out = self._apply_cow(p, group, winners, lsn_lo, lsn_hi)
        out = out.set_column(
            out.schema.get_field_index("events_applied"),
            "events_applied",
            pa.array([len(group)], pa.int64()),
        )
        return out.set_column(
            out.schema.get_field_index("apply_ms"),
            "apply_ms",
            pa.array([(time.perf_counter() - t0) * 1000.0], pa.float64()),
        )


class SplitApplier:
    """Split-tolerant delta applier (the sort-free hash-exchange path,
    SURVEY.md §8.1).  Consumes the hash-repartitioned change stream as
    plain map_batches TASKS (never an actor pool — Ray 2.49's
    hash-shuffle aggregator actors deadlock against a downstream actor
    pool under a tight CPU budget, BASELINE.md): one call receives one
    exchange partition's rows, which may hold SEVERAL parts, and — when
    Ray splits large partitions into multiple blocks — only PART of a
    part.  Correctness does not depend on one-writer-per-partition:

    - each call writes its batch's per-part winners as an independent
      delta file ``delta-{p}-e{E}-s{sid}.parquet`` where ``sid`` is a
      content hash of the part's LSN set — a retried task rewrites the
      same name with the same bytes (exactly-once), while distinct
      splits of one part cannot collide;
    - two splits of one part may both carry a winner for the same
      doc_id (disjoint LSN subsets); the read-side fold resolves by
      LSN (``merge_chain``), which the watermark invariant makes total;
    - no inline compaction (two splits deciding to compact would race);
      the engine triggers ``compact()`` after commit when a chain
      exceeds the limit.

    Unlike MergeApplier this stage never reads parent chains — it is a
    pure pre-reduce + write, so apply wall is O(epoch winners) with no
    read amplification.
    """

    def __init__(
        self,
        table_root: str,
        epoch: int,
        snapshot_schema: pa.Schema,
        compression: str = "zstd",
    ):
        self.table_root = table_root
        self.epoch = epoch
        self.snapshot_schema = snapshot_schema
        self.compression = compression
        os.makedirs(os.path.join(table_root, "data"), exist_ok=True)

    def _write(self, fname: str, tbl: pa.Table) -> str:
        path = os.path.join(self.table_root, "data", fname)
        tmp = path + ".inprogress"
        pq.write_table(
            tbl, tmp, compression=self.compression, row_group_size=ROW_GROUP_SIZE
        )
        os.replace(tmp, path)
        return path

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib
        import time

        t0 = time.perf_counter()
        if len(batch) == 0:
            return _lineage_table([])
        raw_parts, raw_counts = np.unique(
            batch["part"].combine_chunks().to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        applied = dict(zip(raw_parts.tolist(), raw_counts.tolist()))
        winners = latest_per_key(batch, key="doc_id", order_col="lsn", hash_col="doc_hash")
        envelope = pa.schema(
            [pa.field(n, winners.schema.field(n).type) for n in DELTA_ENVELOPE]
        )
        body = conform(winners, self.snapshot_schema)
        for name in reversed(DELTA_ENVELOPE):
            body = body.add_column(0, envelope.field(name), winners[name])
        body = body.append_column("doc_hash", winners["doc_hash"].combine_chunks())
        body = body.append_column("part", winners["part"].combine_chunks())
        # one vectorized sort: cluster parts, deterministic row order
        body = body.sort_by(
            [("part", "ascending"), ("doc_hash", "ascending"), ("doc_id", "ascending")]
        )
        parts = body["part"].combine_chunks().to_numpy(zero_copy_only=False)
        lsns = body["lsn"].combine_chunks().to_numpy(zero_copy_only=False)
        bounds = np.flatnonzero(np.diff(parts)) + 1
        starts = np.concatenate([[0], bounds])
        stops = np.concatenate([bounds, [len(parts)]])
        rows = []
        # doc_hash stays in the delta file (hash-clustered row groups
        # for point-read pushdown); only the routing column is dropped
        payload = body.drop_columns(["part"])
        for s, e in zip(starts, stops):
            p = int(parts[s])
            span = np.sort(lsns[s:e].copy())
            sid = hashlib.blake2b(span.tobytes(), digest_size=8).hexdigest()
            fname = f"delta-{p:05d}-e{self.epoch:06d}-s{sid}.parquet"
            tbl = payload.slice(s, e - s)
            path = self._write(fname, tbl)
            rows.append(
                {
                    "p": p,
                    "file": os.path.join("data", fname),
                    "kind": "delta",
                    "rows": e - s,
                    "lsn_lo": int(span[0]),
                    "lsn_hi": int(span[-1]),
                    "events_applied": applied[p],
                    "bytes": os.path.getsize(path),
                }
            )
        # Straggler metric (SURVEY.md §8.6): this writer TASK's wall,
        # recorded on its first lineage row only (0 on the rest) so
        # per-task walls can be aggregated without double counting.
        rows[0]["apply_ms"] = (time.perf_counter() - t0) * 1000.0
        return _lineage_table(rows)


LINEAGE_SCHEMA = pa.schema(
    [
        ("p", pa.int32()),
        ("file", pa.string()),
        ("kind", pa.string()),
        ("rows", pa.int64()),
        ("lsn_lo", pa.int64()),
        ("lsn_hi", pa.int64()),
        ("events_applied", pa.int64()),
        ("bytes", pa.int64()),
        # wall of the writer task that produced this file, ms; on a
        # multi-row lineage (SplitApplier) only the first row carries
        # it — aggregate per-task, not per-file (metrics.py)
        ("apply_ms", pa.float64()),
    ]
)


def _lineage_table(rows: list[dict]) -> pa.Table:
    if not rows:
        return LINEAGE_SCHEMA.empty_table()
    for r in rows:
        r.setdefault("events_applied", 0)
        r.setdefault("apply_ms", 0.0)
    return pa.Table.from_pylist(rows, schema=LINEAGE_SCHEMA)
