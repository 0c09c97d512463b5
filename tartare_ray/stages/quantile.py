"""Exact distributed grouped quantiles — multi-pass histogram
refinement.

A global sort per group is the textbook way to take an exact quantile
and the wrong way at 100 TB (all-to-all shuffle of every value).  This
stage computes EXACT disc quantiles (the answer is an actual element,
rank = ceil(q*n) - 1 ascending, matching DuckDB ``quantile_disc``) in
three streaming passes over the value column, each a ``map_batches``
with tiny partial outputs and NO shuffle of the data:

  A. per-group (count, min, max)            — O(groups × blocks) rows
  B. per-group fixed-bin histogram           — O(groups × blocks) rows
     of ``bins`` int64 counts; partials sum (associative)
  C. candidate pull: only rows whose bin falls inside some target
     (group, q) window are collected — expected n/bins values per
     group — and an in-memory sort of that sliver resolves the element.

Exactness argument: bin assignment is ``searchsorted`` against ONE
edges array computed on the driver and used identically in passes B
and C, so it is a fixed monotone function of the value — every value
in a bin below the window is <= every candidate, hence
``r-th smallest overall = sorted(candidates)[r - hist_prefix]`` with
no float-boundary hazard.

Assumption: the grouping column has modest cardinality (the driver
holds groups × bins counters).  For high-cardinality keys the same
passes run behind a ``groupby`` with unchanged math.  Heavily
duplicated values can make a candidate bin large; the standard fix is
to re-bin recursively on the window — not needed for the testdata and
left documented rather than speculatively coded.

No tartare analogue (the reference has no numeric aggregation beyond
counts `[UNVERIFIED — empty checkout, SURVEY.md §0]`); this belongs to
the training-data-pipeline operator set (corpus statistics).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray.data


def _stats_pass(ds: ray.data.Dataset, key: str, col: str) -> dict[str, tuple[int, float, float]]:
    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(key).aggregate([(col, "count"), (col, "min"), (col, "max")])
        return pa.table(
            {
                "k": g[key],
                "n": g[f"{col}_count"].cast(pa.int64()),
                "lo": g[f"{col}_min"].cast(pa.float64()),
                "hi": g[f"{col}_max"].cast(pa.float64()),
            }
        )

    out: dict[str, tuple[int, float, float]] = {}
    for r in ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).take_all():
        k = r["k"]
        if k in out:
            n, lo, hi = out[k]
            out[k] = (n + r["n"], min(lo, r["lo"]), max(hi, r["hi"]))
        else:
            out[k] = (r["n"], r["lo"], r["hi"])
    return out


def _bin_of(vals: np.ndarray, edges: np.ndarray) -> np.ndarray:
    """Monotone bin assignment shared by passes B and C (exactness)."""
    return np.clip(np.searchsorted(edges, vals, side="right") - 1, 0, len(edges) - 2)


def _hist_pass(
    ds: ray.data.Dataset, key: str, col: str, edges: dict[str, np.ndarray], bins: int
) -> dict[str, np.ndarray]:
    def partial(b: pa.Table) -> pa.Table:
        keys = b[key].to_numpy(zero_copy_only=False)
        vals = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
        rows_k, rows_h = [], []
        for k in np.unique(keys):
            sel = keys == k
            binno = _bin_of(vals[sel], edges[k])
            rows_k.append(k)
            rows_h.append(np.bincount(binno, minlength=bins).astype(np.int64).tolist())
        return pa.table({"k": pa.array(rows_k), "hist": pa.array(rows_h)})

    out: dict[str, np.ndarray] = {}
    for r in ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).take_all():
        h = np.asarray(r["hist"], dtype=np.int64)
        out[r["k"]] = out[r["k"]] + h if r["k"] in out else h
    return out


def _candidate_pass(
    ds: ray.data.Dataset,
    key: str,
    col: str,
    edges: dict[str, np.ndarray],
    target_bins: dict[str, np.ndarray],  # sorted unique target bin ids per group
) -> dict[str, np.ndarray]:
    """Pull only values landing in a TARGET bin of their group (a bin
    set, not a range — p50 and p99 windows don't drag the mass between
    them along)."""

    def partial(b: pa.Table) -> pa.Table:
        keys = b[key].to_numpy(zero_copy_only=False)
        vals = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
        out_k, out_v = [], []
        for k in np.unique(keys):
            sel = keys == k
            v = vals[sel]
            binno = _bin_of(v, edges[k])
            m = np.isin(binno, target_bins[k])
            out_k.append(np.repeat(k, int(m.sum())))
            out_v.append(v[m])
        return pa.table(
            {"k": pa.array(np.concatenate(out_k)), "v": pa.array(np.concatenate(out_v))}
        )

    acc: dict[str, list] = {}
    for r in ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).take_all():
        acc.setdefault(r["k"], []).append(r["v"])
    return {k: np.asarray(v, dtype=np.float64) for k, v in acc.items()}


def grouped_quantile_exact(
    make_ds,
    key: str,
    col: str,
    qs: list[float],
    bins: int = 1024,
) -> pa.Table:
    """Exact disc quantiles of ``col`` per ``key``.  ``make_ds`` is a
    zero-arg callable returning a fresh Dataset over (key, col); each
    pass re-streams the input lazily (3 scans, O(groups × bins) driver
    memory — independent of data size)."""
    stats = _stats_pass(make_ds(), key, col)
    edges = {
        k: np.linspace(lo, hi if hi > lo else lo + 1.0, bins + 1)
        for k, (n, lo, hi) in stats.items()
    }
    hists = _hist_pass(make_ds(), key, col, edges, bins)

    ranks = {k: [max(0, math.ceil(q * stats[k][0]) - 1) for q in qs] for k in stats}
    cums = {k: np.concatenate([[0], np.cumsum(h)]) for k, h in hists.items()}
    q_bin = {  # cum[b] <= r < cum[b+1] — the bin holding rank r
        k: [int(np.searchsorted(cums[k], r, side="right") - 1) for r in ranks[k]]
        for k in stats
    }
    targets = {k: np.unique(np.asarray(q_bin[k], dtype=np.int64)) for k in stats}
    cands = _candidate_pass(make_ds(), key, col, edges, targets)

    out_rows = []
    for k in sorted(stats):
        vals = cands[k]
        bin_of_vals = _bin_of(vals, edges[k])
        row = {key: k}
        for i, (q, r) in enumerate(zip(qs, ranks[k])):
            b = q_bin[k][i]
            in_bin = np.sort(vals[bin_of_vals == b])
            row[f"p{round(q * 100):02d}"] = float(in_bin[r - int(cums[k][b])])
        out_rows.append(row)
    return pa.Table.from_pylist(out_rows)
