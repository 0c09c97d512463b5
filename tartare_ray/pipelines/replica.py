"""Incremental downstream replica: a second table kept in sync from a
source table's per-epoch change feed — the consumer-group API driving
the engine's own ingest machinery.

The trick is that a change feed IS a change log: each source epoch's
feed (latest-per-key winners + tombstones with the ``(op, lsn)``
envelope, original source LSNs) is persisted as one log directory
``dest/log/feed-e{E}/`` and the replica is a plain ``CdcEngine`` over
those directories.  Everything the engine already guarantees —
watermark idempotence, schema evolution, exactly-once manifest
commits — applies to the replica unchanged.

Exactly-once end-to-end, by composition:
- feed persistence is write-to-tmp + directory rename keyed by source
  epoch: a crashed/retried sync rewrites the same directory;
- the consumer cursor (``ack_changes``) advances only after the
  rename, so a crash before it re-delivers the epoch (idempotent);
- the replica replay is watermark-guarded like any engine replay.

Feed LSNs are sparse inside an epoch's range and a multi-file feed
directory may hold overlapping per-file LSN ranges; both are safe:
``plan_epoch``'s completeness chase pulls overlapping files into one
epoch and the validate stage's row-level ``lsn > watermark`` filter
makes duplicate delivery harmless (sources/tail.py module docs).

Reference analogue `[UNVERIFIED — empty checkout, SURVEY.md §0]`:
tartare publishes each export to subscribed platforms; this is that
publication loop as an incremental table-to-table sync instead of a
whole-file copy.
"""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq

from .cdc import CdcEngine, EngineConfig


def _feed_dirs(log_root: str) -> list[str]:
    if not os.path.isdir(log_root):
        return []
    return sorted(
        os.path.join(log_root, n)
        for n in os.listdir(log_root)
        if n.startswith("feed-e") and not n.endswith(".inprogress")
    )


def sync_replica(
    src: CdcEngine,
    dest_work: str,
    consumer_id: str = "replica-sync",
    cfg: EngineConfig | None = None,
) -> CdcEngine | None:
    """Pull the source's unacked change-feed epochs into
    ``dest_work/log`` and replay the replica table at
    ``dest_work/table``.  Call repeatedly (or from a poll loop) — each
    call is incremental and idempotent.  Returns the replica engine,
    or None when no feed has ever been synced."""
    log_root = os.path.join(dest_work, "log")
    os.makedirs(log_root, exist_ok=True)
    src.subscribe(consumer_id)
    for e, feed in src.consume(consumer_id):
        final = os.path.join(log_root, f"feed-e{e:06d}")
        if not os.path.isdir(final):
            tmp = final + ".inprogress"
            shutil.rmtree(tmp, ignore_errors=True)
            feed.write_parquet(tmp)
            # empty feeds (compaction-only epochs) and zero-row files
            # would break footer-range listing — drop them
            for n in list(os.listdir(tmp)):
                p = os.path.join(tmp, n)
                if not n.endswith(".parquet") or pq.ParquetFile(p).metadata.num_rows == 0:
                    os.remove(p)
            os.rename(tmp, final)
        src.ack_changes(consumer_id, e)
    dirs = _feed_dirs(log_root)
    if not dirs:
        return None
    dest = CdcEngine(
        dirs,
        os.path.join(dest_work, "table"),
        cfg
        or EngineConfig(
            num_partitions=src.cfg.num_partitions, write_mode="delta"
        ),
    )
    dest.replay()
    return dest
