"""Incrementally-maintained token-sequence dedup index over a CDC
table — dedup as a first-class *incremental* component instead of a
periodic full-corpus rescan.

Per committed epoch, the table's change feed (latest-per-key winners +
tombstones) folds to tiny fingerprint deltas — ``(doc_id, fp, op,
lsn)``, one order/length-sensitive uint64 per row
(``stages/text.py::token_fingerprints_batch``) — persisted as one
directory per source epoch under ``table_root/_indexes/<name>/``.
Duplicate-group queries then fold the deltas (latest LSN per doc wins,
deletes drop) without ever rescanning the snapshot's token lists: the
index I/O is O(Σ epoch winners × ~40 bytes), the dedup query I/O is
O(index), and the 100 TB corpus is touched exactly once per row's
lifetime.

Exactly-once by the same composition as ``pipelines/replica.py``:
- delta persistence is write-to-tmp + directory rename keyed by the
  source epoch (a crashed/retried update rewrites the same directory);
- the consumer cursor (``ack_changes``) advances only after the
  rename, so a crash before it re-delivers the epoch (idempotent);
- each directory carries a ``_source.json`` marker with the source
  manifest's lineage identity + rollback GENERATION: after a source
  rollback the redelivered epochs' stale deltas are detected and
  rewritten (``rollback_to`` already clamps the cursor).

Reference analogue `[UNVERIFIED — empty checkout, SURVEY.md §0]`:
tartare's checksum-dedup of re-fetched feeds, upgraded from
whole-archive md5 polling to incremental per-record content indexing.
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from ..state.manifest import list_committed_epochs, load_epoch, load_generation
from ..stages.text import token_fingerprints_batch
from .replica import _epoch_identity


class EpochDeltaIndex:
    """Epoch-delta persistence shared by the incremental indexes
    (token fingerprints here; MinHash signatures in
    ``pipelines/minhash_index.py``): consumer-cursor feed consumption,
    tmp+rename exactly-once delta directories keyed by source epoch,
    lineage/generation markers for rollback hygiene.  Subclasses set
    ``_delta_rows`` (a staticmethod: feed batch → delta rows, columns
    (doc_id, <payload…>, op, lsn)) and add their query methods."""

    def __init__(self, engine, name: str):
        self.engine = engine
        self.name = name
        self.dir = os.path.join(engine.table_root, "_indexes", name)
        self.consumer = f"dedup-index-{name}"

    # -- persistence --------------------------------------------------------
    def _epoch_dir(self, epoch: int) -> str:
        return os.path.join(self.dir, f"fp-e{epoch:06d}")

    def _marker_ok(self, epoch: int) -> bool:
        p = os.path.join(self._epoch_dir(epoch), "_source.json")
        if not os.path.exists(p):
            return False
        with open(p) as f:
            d = json.load(f)
        m = load_epoch(self.engine.table_root, epoch)
        return d.get("identity") == _epoch_identity(m) and d.get(
            "generation"
        ) == load_generation(self.engine.table_root)

    @staticmethod
    def _delta_rows(b: pa.Table) -> pa.Table:
        raise NotImplementedError

    def _write_epoch(self, epoch: int, ds: ray.data.Dataset) -> None:
        """Distributed delta write: each feed block folds to delta rows
        and writes its own content-hash-named file into the epoch's
        tmp dir — the DRIVER never materializes the feed (it only
        renames the directory).  A retried/crashed attempt starts from
        a cleared tmp dir and rewrites the same bytes."""
        final = self._epoch_dir(epoch)
        tmp = final + ".inprogress"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        rows_fn = type(self)._delta_rows

        def write_block(b: pa.Table) -> pa.Table:
            import hashlib

            rows = rows_fn(b)
            if len(rows):
                sig = hashlib.blake2b(
                    rows["lsn"].to_numpy(zero_copy_only=False).tobytes(),
                    digest_size=8,
                ).hexdigest()
                pq.write_table(
                    rows, os.path.join(tmp, f"delta-{sig}.parquet"), compression="zstd"
                )
            return pa.table({"rows": pa.array([len(rows)], pa.int64())})

        n = sum(
            r["rows"]
            for r in ds.map_batches(
                write_block, batch_format="pyarrow", zero_copy_batch=True
            ).take_all()
        )  # O(blocks) lineage rows
        m = load_epoch(self.engine.table_root, epoch)
        with open(os.path.join(tmp, "_source.json"), "w") as f:
            json.dump(
                {
                    "epoch": epoch,
                    "identity": _epoch_identity(m),
                    "generation": load_generation(self.engine.table_root),
                    "rows": int(n),
                },
                f,
            )
        shutil.rmtree(final, ignore_errors=True)
        os.replace(tmp, final)

    # -- maintenance ---------------------------------------------------------
    def update(self) -> list[int]:
        """Consume every unacked epoch's feed into delta rows.
        Incremental + idempotent; returns the epochs ingested."""
        os.makedirs(self.dir, exist_ok=True)
        cursor = self.engine.subscribe(self.consumer)
        # rollback hygiene: a delta is stale iff its epoch is no longer
        # committed OR sits ABOVE the acked cursor (``rollback_to``
        # clamps cursors to the rollback target, so everything above
        # gets redelivered — possibly with identical lineage but
        # different values; everything at or below was never rolled
        # back and its old-generation delta remains valid)
        committed = set(list_committed_epochs(self.engine.table_root))
        for n in os.listdir(self.dir):
            if not n.startswith("fp-e"):
                continue
            if n.endswith(".inprogress"):
                shutil.rmtree(os.path.join(self.dir, n), ignore_errors=True)
                continue
            e = int(n[4:10])
            if e not in committed or e > cursor:
                shutil.rmtree(os.path.join(self.dir, n), ignore_errors=True)
        done = []
        for e, ds in self.engine.consume(self.consumer):
            if not os.path.isdir(self._epoch_dir(e)) or not self._marker_ok(e):
                self._write_epoch(e, ds)
            self.engine.ack_changes(self.consumer, e)
            done.append(e)
        return done

    def _delta_files(self) -> list[str]:
        committed = set(list_committed_epochs(self.engine.table_root))
        out = []
        if not os.path.isdir(self.dir):
            return out
        for n in sorted(os.listdir(self.dir)):
            if n.startswith("fp-e") and not n.endswith(".inprogress"):
                e = int(n[4:10])
                if e in committed:
                    d = os.path.join(self.dir, n)
                    out.extend(
                        os.path.join(d, f)
                        for f in sorted(os.listdir(d))
                        if f.startswith("delta-") and f.endswith(".parquet")
                    )
        return out

    #: (column name, arrow type) of the per-doc payload each subclass
    #: stores next to (doc_id, op, lsn)
    _payload = ("fp", pa.int64())
    #: subclasses with MULTIPLE payload columns set this instead — a
    #: tuple of (name, type) pairs (``_payload`` is then ignored)
    _payload_cols: tuple = ()

    def _live_rows(self) -> "ray.data.Dataset":
        """(doc_id, <payload>) of the CURRENT live state: latest-LSN
        record per doc_id across all deltas, deletes dropped — the same
        argmax reduce as the engine's apply.  Vectorized at scale: a
        per-block ``latest_per_key`` pre-reduce, ONE hash-partition
        tag, and a per-PARTITION vectorized fold — P Python calls
        total, never one per doc."""
        import numpy as np

        import ray

        from ..stages.kernels import hash_partition_ids, latest_per_key

        cols = self._payload_cols or (self._payload,)
        names = [n for n, _ in cols]
        files = self._delta_files()
        if not files:
            empty = {"doc_id": pa.array([], pa.string())}
            empty.update({n: pa.array([], t) for n, t in cols})
            return ray.data.from_arrow(pa.table(empty))
        P = max(4, int(ray.cluster_resources().get("CPU", 4)))

        def pre(b: pa.Table) -> pa.Table:
            t = latest_per_key(b, "doc_id", "lsn")
            return t.append_column(
                "part",
                pa.array(hash_partition_ids(t["doc_id"], P).astype(np.int64)),
            )

        def fold(g: pa.Table, names=names) -> pa.Table:
            t = latest_per_key(g, "doc_id", "lsn")
            keep = pc.invert(pc.fill_null(pc.equal(t["op"], "D"), False))
            return t.filter(keep).select(["doc_id", *names])

        return (
            ray.data.read_parquet(files)
            .map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("part")
            .map_groups(fold, batch_format="pyarrow")
        )


class TokenDedupIndex(EpochDeltaIndex):
    """See module docstring.  One instance per (table, name)."""

    def __init__(self, engine, name: str = "tokfp"):
        super().__init__(engine, name)

    @staticmethod
    def _delta_rows(b: pa.Table) -> pa.Table:
        """Feed batch → (doc_id, fp, op, lsn) delta rows.  Tombstones
        carry a null fp (their tokens are null by construction)."""

        def fp_rows(b: pa.Table) -> pa.Table:
            is_del = pc.fill_null(pc.equal(b["op"], "D"), False)
            live = b.filter(pc.invert(is_del))
            dels = b.filter(is_del)
            parts = []
            if len(live):
                f = token_fingerprints_batch(live)
                parts.append(
                    pa.table(
                        {
                            "doc_id": f["doc_id"],
                            "fp": f["fp"],
                            "op": live["op"],
                            "lsn": live["lsn"],
                        }
                    )
                )
            if len(dels):
                parts.append(
                    pa.table(
                        {
                            "doc_id": dels["doc_id"],
                            "fp": pa.nulls(len(dels), pa.int64()),
                            "op": dels["op"],
                            "lsn": dels["lsn"],
                        }
                    )
                )
            if not parts:
                return pa.table(
                    {
                        "doc_id": pa.array([], pa.string()),
                        "fp": pa.array([], pa.int64()),
                        "op": pa.array([], pa.string()),
                        "lsn": pa.array([], pa.int64()),
                    }
                )
            return pa.concat_tables(parts).combine_chunks()

        return fp_rows(b)

    # -- queries --------------------------------------------------------------
    def live_fingerprints(self) -> ray.data.Dataset:
        """(doc_id, fp) of the CURRENT live state — see ``_live_rows``."""
        return self._live_rows()

    def _fp_partitioned(self) -> ray.data.Dataset:
        """Live rows tagged by hash(fp) partition so all docs of a
        fingerprint co-locate — the dup-group shuffle moves 16-byte
        rows and the per-partition folds below stay VECTORIZED (one
        sort + run masks per partition, not Python per fingerprint)."""
        import numpy as np

        from ..functions.hashing import mix64

        P = max(4, int(ray.cluster_resources().get("CPU", 4)))

        def tag(b: pa.Table) -> pa.Table:
            fp = b["fp"].to_numpy(zero_copy_only=False)
            part = (mix64(fp.view(np.uint64)) % np.uint64(P)).astype(np.int64)
            return b.append_column("part", pa.array(part))

        return self.live_fingerprints().map_batches(
            tag, batch_format="pyarrow", zero_copy_batch=True
        )

    def duplicate_losers(self) -> ray.data.Dataset:
        """doc_ids that exact token-sequence dedup would DROP — every
        live doc of a duplicated fingerprint except the min-doc_id
        survivor.  The filter side of dedup-aware shard export
        (pipelines/export.py): O(duplicate docs), served from the
        index, never rescanning the snapshot."""
        import numpy as np

        def losers(g: pa.Table) -> pa.Table:
            t = g.sort_by([("fp", "ascending"), ("doc_id", "ascending")])
            fp = t["fp"].to_numpy(zero_copy_only=False)
            keep = np.zeros(len(fp), bool)
            if len(fp):
                keep[1:] = fp[1:] == fp[:-1]  # every non-first of its run
            return t.filter(pa.array(keep)).select(["doc_id"])

        return self._fp_partitioned().groupby("part").map_groups(
            losers, batch_format="pyarrow"
        )

    def duplicate_groups(self, min_copies: int = 2) -> ray.data.Dataset:
        """(fp, survivor, n_copies) for every fingerprint with
        ≥``min_copies`` live docs — min-doc_id survivor, same contract
        as cdc_token_dedup but served FROM THE INDEX (no snapshot
        scan).  ``min_copies=1`` returns every group (the full live
        group census the driver oracle checks)."""
        import numpy as np

        def groups(g: pa.Table) -> pa.Table:
            t = g.sort_by([("fp", "ascending"), ("doc_id", "ascending")])
            fp = t["fp"].to_numpy(zero_copy_only=False)
            n = len(fp)
            if n == 0:
                return pa.table(
                    {
                        "fp": pa.array([], pa.int64()),
                        "survivor": pa.array([], pa.string()),
                        "n_copies": pa.array([], pa.int64()),
                    }
                )
            first = np.r_[True, fp[1:] != fp[:-1]]
            starts = np.flatnonzero(first)
            counts = np.diff(np.append(starts, n))
            dup = counts >= min_copies
            idx = starts[dup]
            return pa.table(
                {
                    "fp": pa.array(fp[idx]),
                    "survivor": t["doc_id"].take(pa.array(idx)),
                    "n_copies": pa.array(counts[dup].astype(np.int64)),
                }
            )

        return self._fp_partitioned().groupby("part").map_groups(
            groups, batch_format="pyarrow"
        )
