"""Streaming sketches — HyperLogLog approximate distinct counting.

``count_distinct`` (pipelines/queries.py) is the exact two-level
groupby; at 10^10 events its pair shuffle is the dominant cost.  The
HLL sketch answers the same question in ONE streaming pass with no
shuffle at all: each block emits a (group, registers) partial, partials
merge by element-wise max (associative + commutative, so Ray can
combine them in any order), and the estimator runs on the driver over
groups × 2^p bytes of state.

Standard HLL (Flajolet et al. 2007) with the usual small-range linear
counting correction; p=14 → 16384 registers → ~0.8% relative error.
All register math is vectorized numpy — the per-batch cost is one
64-bit hash + a few integer ops per row.

No tartare analogue (`[UNVERIFIED — empty checkout, SURVEY.md §0]`);
training-data-pipeline operator (corpus cardinality statistics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_HASH_KEY = "tartare_ray.hll0"  # exactly 16 bytes, fixed => deterministic


def _hash64(values: np.ndarray) -> np.ndarray:
    return pd.util.hash_array(
        np.asarray(values, dtype=object), hash_key=_HASH_KEY, categorize=False
    )


def _registers(values: np.ndarray, p: int) -> np.ndarray:
    """HLL register array (uint8, 2^p) for one group's values."""
    m = 1 << p
    h = _hash64(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    low = (h & np.uint64((1 << (64 - p)) - 1)).astype(np.float64)
    # rank = leading-zero count of the low (64-p) bits + 1; low < 2^50
    # is exactly representable in float64, so frexp's exponent is exact
    _, exp = np.frexp(low)  # low = frac * 2^exp, exp = floor(log2)+1
    rank = np.where(low > 0, (64 - p) - exp + 1, (64 - p) + 1).astype(np.uint8)
    reg = np.zeros(m, dtype=np.uint8)
    np.maximum.at(reg, idx, rank)
    return reg


def _estimate(reg: np.ndarray) -> float:
    m = float(len(reg))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros:
        return m * np.log(m / zeros)  # linear counting
    return float(est)


def grouped_approx_distinct(
    ds: ray.data.Dataset, key: str, col: str, p: int = 14
) -> pa.Table:
    """Approximate COUNT(DISTINCT col) per key: one pass, per-block
    register partials, driver-side max-merge (groups × 2^p bytes)."""

    def partial(b: pa.Table) -> pa.Table:
        keys = b[key].to_numpy(zero_copy_only=False)
        vals = b[col].to_numpy(zero_copy_only=False)
        ks, regs = [], []
        for k in np.unique(keys):
            ks.append(k)
            regs.append(_registers(vals[keys == k], p).tolist())
        return pa.table({"k": pa.array(ks), "reg": pa.array(regs)})

    merged: dict = {}
    for r in ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).take_all():
        reg = np.asarray(r["reg"], dtype=np.uint8)
        merged[r["k"]] = np.maximum(merged[r["k"]], reg) if r["k"] in merged else reg
    return pa.Table.from_pylist(
        [
            {key: k, "approx_n_distinct": int(round(_estimate(reg)))}
            for k, reg in sorted(merged.items())
        ]
    )


# -- DDSketch-style mergeable quantile sketch ------------------------------
#
# Relative-error quantile sketch over positive values: bucket(x) =
# ceil(log_gamma(x)) with gamma = (1+alpha)/(1-alpha), so any returned
# quantile q' satisfies |q' - q| <= alpha * q.  Buckets are a sparse
# (group, bucket) -> count map — trivially mergeable by summation, so
# the distributed shape is: vectorized per-block bucket counts → one
# Sum groupby over O(groups × log-range/alpha) tiny rows → per-group
# quantile extraction from cumulative counts.  One corpus pass, no
# sort, no per-row shuffle — the scale complement to the EXACT 3-pass
# histogram-refinement quantiles (stages/quantile.py).

def dd_bucket(values: np.ndarray, alpha: float) -> np.ndarray:
    gamma = (1.0 + alpha) / (1.0 - alpha)
    return np.ceil(np.log(values) / np.log(gamma)).astype(np.int64)


def dd_value(buckets: np.ndarray, alpha: float) -> np.ndarray:
    """Bucket index -> representative value (midpoint of the bucket's
    value range in the multiplicative sense)."""
    gamma = (1.0 + alpha) / (1.0 - alpha)
    return 2.0 * np.power(gamma, buckets.astype(np.float64)) / (gamma + 1.0)


def grouped_quantile_sketch(
    ds: ray.data.Dataset,
    key: str,
    col: str,
    quantiles: tuple = (0.5, 0.9, 0.99),
    alpha: float = 0.01,
) -> ray.data.Dataset:
    """Approximate per-group quantiles with guaranteed relative error
    ``alpha``, positive values only (the caller filters).  Returns one
    row per group: (key, q50, q90, ... per ``quantiles``)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        keys = b[key].to_numpy(zero_copy_only=False)
        vals = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = vals > 0
        keys, vals = keys[ok], vals[ok]
        if len(vals) == 0:
            return pa.table(
                {
                    key: pa.array([], pa.string()),
                    "bucket": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        bk = dd_bucket(vals, alpha)
        order = np.lexsort((bk, keys))
        k, b2 = keys[order], bk[order]
        new = np.ones(len(k), bool)
        new[1:] = (k[1:] != k[:-1]) | (b2[1:] != b2[:-1])
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(k)))
        return pa.table(
            {
                key: pa.array(k[starts]),
                "bucket": pa.array(b2[starts]),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key, "bucket"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def finalize(g: pa.Table, quantiles=quantiles, alpha=alpha) -> pa.Table:
        t = g.sort_by([("bucket", "ascending")])
        bk = t["bucket"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        cum = np.cumsum(n)
        total = cum[-1]
        out = {key: t[key].slice(0, 1)}
        for q in quantiles:
            rank = max(1, int(np.ceil(q * total)))
            i = int(np.searchsorted(cum, rank))
            out[f"q{int(q * 100)}"] = pa.array(
                [float(dd_value(bk[i : i + 1], alpha)[0])], pa.float64()
            )
        return pa.table(out)

    return agg.groupby(key).map_groups(finalize, batch_format="pyarrow")


# -- Count-Min sketch (Cormode & Muthukrishnan 2005) ------------------------
#
# Point-frequency sketch: a depth × width int64 grid; every occurrence
# increments one counter per row (row-seeded 64-bit hash mod width),
# and a point query reads the MIN across rows — always ≥ the true
# count, and within ~N/width of it w.h.p.  The grid is LINEAR (merge =
# element-wise sum), so the distributed shape is the HLL one: each
# block folds its values into a partial grid, partials sum in any
# order, and the driver holds depth × width × 8 bytes per merge — at
# 10^10 rows the shuffle-free pass is the entire cost.

CMS_DEPTH = 4
CMS_WIDTH = 8192


def cms_partial(
    vals: np.ndarray, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> np.ndarray:
    """Fold int64/uint64 values (one per OCCURRENCE) into a fresh
    (depth, width) int64 grid — vectorized: one mix64 + one scatter-add
    per row of the grid."""
    from ..functions.hashing import mix64

    grid = np.zeros((depth, width), dtype=np.int64)
    if len(vals) == 0:
        return grid
    v = np.asarray(vals).astype(np.uint64)
    for r in range(depth):
        seed = np.uint64((0x9E3779B97F4A7C15 * (r + 1)) & 0xFFFFFFFFFFFFFFFF)
        idx = mix64(v ^ seed) % np.uint64(width)
        np.add.at(grid[r], idx.astype(np.int64), 1)
    return grid


def cms_query(
    grid: np.ndarray, vals: np.ndarray, width: int = CMS_WIDTH
) -> np.ndarray:
    """Point estimates (min across rows) for each queried value."""
    from ..functions.hashing import mix64

    v = np.asarray(vals).astype(np.uint64)
    est = np.full(len(v), np.iinfo(np.int64).max, dtype=np.int64)
    for r in range(grid.shape[0]):
        seed = np.uint64((0x9E3779B97F4A7C15 * (r + 1)) & 0xFFFFFFFFFFFFFFFF)
        idx = mix64(v ^ seed) % np.uint64(width)
        est = np.minimum(est, grid[r][idx.astype(np.int64)])
    return est
