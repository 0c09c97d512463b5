"""Vectorized Arrow kernels shared by the CDC stages and the
driver-oracle query pipelines.  No per-row Python anywhere here —
these run inside ``map_batches`` on the hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# Fixed key => deterministic across processes/runs (required: a retried
# task must route every doc_id to the same partition).
_HASH_KEY = "tartare_ray.p.v1"  # exactly 16 bytes (pandas hash_array requirement)


def key_hash(keys: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Deterministic uint64 hash of a string key column."""
    arr = keys.to_numpy(zero_copy_only=False)
    return pd.util.hash_array(
        np.asarray(arr, dtype=object), hash_key=_HASH_KEY, categorize=False
    )


def hash_partition_ids(keys: pa.ChunkedArray | pa.Array, num_partitions: int) -> np.ndarray:
    """Deterministic uint64 hash of a string column -> partition id."""
    return (key_hash(keys) % np.uint64(num_partitions)).astype(np.int32)


def add_hash_partition_column(
    tbl: pa.Table,
    key: str,
    num_partitions: int,
    col_name: str = "part",
    hash_col: str | None = None,
) -> pa.Table:
    """Append the partition-id column and (optionally) the raw 64-bit
    key hash as ``hash_col`` — the hash doubles as an integer sort
    surrogate for the key downstream (sorting 64-bit ints is several
    times faster than sorting the doc_id strings, and the hot sorts
    dominate applier CPU)."""
    h = key_hash(tbl[key])
    tbl = tbl.append_column(
        col_name, pa.array((h % np.uint64(num_partitions)).astype(np.int32))
    )
    if hash_col is not None:
        tbl = tbl.append_column(hash_col, pa.array(h.view(np.int64)))
    return tbl


def sort_by_key_then(tbl: pa.Table, key: str, hash_col: str, order_cols: list[tuple[str, str]]) -> pa.Table:
    """Deterministic sort clustering equal keys adjacently using the
    int64 ``hash_col`` as the primary (fast) sort key; the string key
    itself breaks hash ties so ordering stays total and deterministic."""
    return tbl.sort_by([(hash_col, "ascending"), (key, "ascending"), *order_cols])


def _first_occurrence_mask(arr: pa.Array) -> pa.BooleanArray:
    """True at the first row of each run of equal values (arr must be
    sorted so equal values are adjacent)."""
    n = len(arr)
    if n <= 1:
        return pa.array([True] * n, type=pa.bool_())
    neq = pc.not_equal(arr.slice(1), arr.slice(0, n - 1))
    # not_equal yields null when either side is null; keys are non-null
    return pa.concat_arrays([pa.array([True]), neq.combine_chunks() if isinstance(neq, pa.ChunkedArray) else neq])


def argmax_per_key(
    tbl: pa.Table, key: str, order_cols: list[str]
) -> pa.Table:
    """Keep, per key, the row maximizing ``order_cols`` lexicographically
    (later columns break ties).  Same associative-reduce shape as
    ``latest_per_key`` — safe as a per-batch partial followed by a
    per-group final."""
    if len(tbl) == 0:
        return tbl
    sort_keys = [(key, "ascending")] + [(c, "descending") for c in order_cols]
    t = tbl.sort_by(sort_keys).combine_chunks()
    mask = _first_occurrence_mask(t[key].combine_chunks())
    return t.filter(mask)


def latest_per_key(
    tbl: pa.Table, key: str = "doc_id", order_col: str = "lsn", hash_col: str | None = None
) -> pa.Table:
    """argmax(order_col) per key — the core CDC reduce (latest-LSN-wins,
    SURVEY.md §2A A2).  Associative: applying this per batch, then again
    over the concatenation of the partial results, equals applying it
    once globally — which is what makes per-batch pre-reduction (and
    salted/sharded pre-reduction generally) correct.  Deletes survive as
    rows (op="D" is data, not dropped), satisfying the "deletes must
    carry through the partial reduce" rule.
    """
    if len(tbl) == 0:
        return tbl
    if hash_col is not None and hash_col in tbl.schema.names:
        sort_keys = [(hash_col, "ascending"), (key, "ascending"), (order_col, "descending")]
    else:
        sort_keys = [(key, "ascending"), (order_col, "descending")]
    t = tbl.sort_by(sort_keys).combine_chunks()
    mask = _first_occurrence_mask(t[key].combine_chunks())
    return t.filter(mask)
