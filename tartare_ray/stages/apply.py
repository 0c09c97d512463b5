"""MergeApplier — the per-partition LSM-style upsert (engine centerpiece).

Target analogue of tartare's export merge + GridFS publish step
(`tartare/processes/fusio.py`, `tartare/core/gridfs_handler.py`
`[UNVERIFIED — empty checkout, SURVEY.md §0]`), re-expressed as a
hash-partitioned merge-apply (SURVEY.md §2A J2/ST2):

- runs as a callable class under
  ``ds.groupby("part").map_groups(MergeApplier, concurrency=…)`` —
  an actor pool; constructor state (schemas, root paths) is built once
  per actor, each ``__call__`` receives ONE partition's pre-reduced
  events as a single Arrow table;
- loads the parent-epoch partition file (copy-on-write base), conforms
  it to the epoch's unified schema (schema evolution happens lazily,
  per touched partition — untouched partitions carry forward and are
  conformed at read, like metadata-only evolution in lakehouse formats);
- final latest-LSN-wins reduce over the group (cross-batch partials),
  tombstone-drop (op="D" removes the key), concat surviving base rows,
  sort by doc_id (deterministic output — required for exactly-once
  under task retry);
- writes ``data/part-{p:05d}-e{epoch:06d}.parquet`` via deterministic
  tmp name + ``os.replace`` so a retried task overwrites itself with
  identical bytes;
- returns a one-row lineage table (p, file, rows, lsn range,
  events_applied, bytes) consumed by the manifest commit.

The base snapshot carries no per-row LSN: every event in epoch E+1 has
lsn > watermark(E) >= every LSN reflected in the base, so base rows
lose all conflicts by construction.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import numpy as np

from ..schema import conform
from .kernels import key_hash, latest_per_key


def part_file_name(p: int, epoch: int) -> str:
    return f"part-{p:05d}-e{epoch:06d}.parquet"


class MergeApplier:
    def __init__(
        self,
        table_root: str,
        epoch: int,
        snapshot_schema: pa.Schema,
        parent_files: dict[int, str],  # partition -> path relative to table_root
        compression: str = "zstd",
    ):
        self.table_root = table_root
        self.epoch = epoch
        self.snapshot_schema = snapshot_schema
        self.parent_files = parent_files
        self.compression = compression
        os.makedirs(os.path.join(table_root, "data"), exist_ok=True)

    def _load_base(self, p: int) -> pa.Table | None:
        rel = self.parent_files.get(p)
        if rel is None:
            return None
        base = pq.read_table(os.path.join(self.table_root, rel))
        return conform(base, self.snapshot_schema)

    def __call__(self, group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return _lineage_table([])
        p = group["part"][0].as_py()
        winners = latest_per_key(group, key="doc_id", order_col="lsn", hash_col="doc_hash")
        lsn_lo = pc.min(group["lsn"]).as_py()
        lsn_hi = pc.max(group["lsn"]).as_py()

        live = winners.filter(pc.not_equal(winners["op"], "D"))
        # keep the int64 hash as the fast deterministic sort surrogate
        live_hash = live["doc_hash"].combine_chunks()
        new_rows = conform(live, self.snapshot_schema).append_column("doc_hash", live_hash)

        base = self._load_base(p)
        if base is not None and len(base):
            keep = pc.invert(
                pc.is_in(base["doc_id"], value_set=winners["doc_id"].combine_chunks())
            )
            base_keep = base.filter(keep)
            base_keep = base_keep.append_column(
                "doc_hash", pa.array(key_hash(base_keep["doc_id"]).view(np.int64))
            )
            final = pa.concat_tables([base_keep, new_rows])
        else:
            final = new_rows
        # Deterministic output order (exactly-once under task retry):
        # (doc_hash, doc_id) — int-dominant sort, strings only on ties.
        final = final.sort_by(
            [("doc_hash", "ascending"), ("doc_id", "ascending")]
        ).drop_columns(["doc_hash"])

        fname = part_file_name(p, self.epoch)
        path = os.path.join(self.table_root, "data", fname)
        tmp = path + ".inprogress"
        pq.write_table(final, tmp, compression=self.compression)
        os.replace(tmp, path)

        return _lineage_table(
            [
                {
                    "p": p,
                    "file": os.path.join("data", fname),
                    "rows": len(final),
                    "lsn_lo": lsn_lo,
                    "lsn_hi": lsn_hi,
                    "events_applied": len(group),
                    "bytes": os.path.getsize(path),
                }
            ]
        )


LINEAGE_SCHEMA = pa.schema(
    [
        ("p", pa.int32()),
        ("file", pa.string()),
        ("rows", pa.int64()),
        ("lsn_lo", pa.int64()),
        ("lsn_hi", pa.int64()),
        ("events_applied", pa.int64()),
        ("bytes", pa.int64()),
    ]
)


def _lineage_table(rows: list[dict]) -> pa.Table:
    if not rows:
        return LINEAGE_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=LINEAGE_SCHEMA)
