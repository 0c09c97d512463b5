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


def hash_partition_ids(keys: pa.ChunkedArray | pa.Array, num_partitions: int) -> np.ndarray:
    """Deterministic uint64 hash of a string column -> partition id."""
    arr = keys.to_numpy(zero_copy_only=False)
    h = pd.util.hash_array(np.asarray(arr, dtype=object), hash_key=_HASH_KEY, categorize=False)
    return (h % np.uint64(num_partitions)).astype(np.int32)


def add_hash_partition_column(
    tbl: pa.Table, key: str, num_partitions: int, col_name: str = "part"
) -> pa.Table:
    return tbl.append_column(col_name, pa.array(hash_partition_ids(tbl[key], num_partitions)))


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
    tbl: pa.Table, key: str = "doc_id", order_col: str = "lsn"
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
    t = tbl.sort_by([(key, "ascending"), (order_col, "descending")]).combine_chunks()
    mask = _first_occurrence_mask(t[key].combine_chunks())
    return t.filter(mask)
