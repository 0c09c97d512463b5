"""Exact distributed grouped quantiles — multi-pass histogram
refinement.

A global sort per group is the textbook way to take an exact quantile
and the wrong way at 100 TB (all-to-all shuffle of every value).  This
stage computes EXACT disc quantiles (the answer is an actual element,
rank = ceil(q*n) - 1 ascending, matching DuckDB ``quantile_disc``) in
streaming passes over the value column, each a ``map_batches`` with
tiny partial outputs and NO shuffle of the data:

  A. per-group (count, min, max)            — O(groups × blocks) rows
  B. per-group fixed-bin histogram           — O(groups × blocks) rows
     of ``bins`` int64 counts; partials sum (associative)
  C. REFINEMENT (duplicate-heavy bins): any target window still
     holding > ``max_candidates`` values is re-binned recursively —
     another histogram pass restricted to the window, shrinking it by
     ~``bins``× per iteration.  A point-mass window (whi is the next
     representable double after wlo — every value in it IS wlo)
     resolves with no pull at all, so a 90%-duplicated column cannot
     drag an unbounded candidate sliver to the driver.
  D. candidate pull: only rows inside a (now bounded) final window are
     collected — ≤ max_candidates per (group, q) plus the documented
     no-progress escape hatch — and an in-memory sort of that sliver
     resolves the element.

Exactness argument: every window is a half-open interval [wlo, whi)
(closed at the group max) derived from ``linspace`` edge arrays
computed on the driver and used identically by the histogram and pull
passes, so membership is a fixed monotone function of the value —
``count(values < wlo)`` is known exactly from histogram prefix sums,
hence ``r-th smallest overall = sorted(window values)[r - prefix]``
with no float-boundary hazard.

Assumption: the grouping column has modest cardinality (the driver
holds groups × bins counters).  For high-cardinality keys the same
passes run behind a ``groupby`` with unchanged math.

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
    """Monotone bin assignment shared by every pass (exactness)."""
    return np.clip(np.searchsorted(edges, vals, side="right") - 1, 0, len(edges) - 2)


class _Window:
    """Per-(group, q) refinement state: the quantile element lies in
    [wlo, whi) — closed at whi when ``incl`` (window touches the group
    max) — at local rank ``r_rem`` among the window's ``n`` values."""

    __slots__ = ("wlo", "whi", "incl", "n", "r_rem", "value")

    def __init__(self, wlo: float, whi: float, incl: bool, n: int, r_rem: int):
        self.wlo, self.whi, self.incl = wlo, whi, incl
        self.n, self.r_rem = n, r_rem
        self.value: float | None = None  # set when resolved without a pull

    def mask(self, vals: np.ndarray) -> np.ndarray:
        m = (vals >= self.wlo) & (vals < self.whi)
        if self.incl:
            m |= vals == self.whi
        return m

    def degenerate(self) -> bool:
        """No representable double strictly inside [wlo, whi) other
        than wlo itself → every value in the window equals wlo."""
        return (not self.incl) and self.whi <= np.nextafter(self.wlo, np.inf)


def _window_hist_pass(
    ds: ray.data.Dataset,
    key: str,
    col: str,
    refine: dict[str, list[tuple[int, "_Window", np.ndarray]]],
    bins: int,
) -> dict[tuple[str, int], np.ndarray]:
    """One data pass: per refining (group, window) a ``bins``-bin
    histogram over that window's sub-edges.  Partials sum."""

    def partial(b: pa.Table) -> pa.Table:
        keys = b[key].to_numpy(zero_copy_only=False)
        vals = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
        out_k, out_t, out_h = [], [], []
        for k in np.unique(keys):
            targets = refine.get(k)
            if not targets:
                continue
            v = vals[keys == k]
            for tid, w, sub_edges in targets:
                inw = v[w.mask(v)]
                h = np.bincount(_bin_of(inw, sub_edges), minlength=bins) if len(inw) else np.zeros(bins, dtype=np.int64)
                out_k.append(k)
                out_t.append(tid)
                out_h.append(h.astype(np.int64).tolist())
        return pa.table(
            {"k": pa.array(out_k), "tid": pa.array(out_t, pa.int64()), "hist": pa.array(out_h)}
        )

    out: dict[tuple[str, int], np.ndarray] = {}
    for r in ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).take_all():
        h = np.asarray(r["hist"], dtype=np.int64)
        kk = (r["k"], r["tid"])
        out[kk] = out[kk] + h if kk in out else h
    return out


def _window_pull_pass(
    ds: ray.data.Dataset,
    key: str,
    col: str,
    pulls: dict[str, list[tuple[int, "_Window"]]],
) -> dict[tuple[str, int], np.ndarray]:
    """Collect each unresolved window's values (bounded by refinement)."""

    def partial(b: pa.Table) -> pa.Table:
        keys = b[key].to_numpy(zero_copy_only=False)
        vals = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
        out_k, out_t, out_v = [], [], []
        for k in np.unique(keys):
            targets = pulls.get(k)
            if not targets:
                continue
            v = vals[keys == k]
            for tid, w in targets:
                inw = v[w.mask(v)]
                out_k.append(np.repeat(k, len(inw)))
                out_t.append(np.full(len(inw), tid, dtype=np.int64))
                out_v.append(inw)
        if not out_k:
            return pa.table(
                {
                    "k": pa.array([], pa.string()),
                    "tid": pa.array([], pa.int64()),
                    "v": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "k": pa.array(np.concatenate(out_k)),
                "tid": pa.array(np.concatenate(out_t)),
                "v": pa.array(np.concatenate(out_v)),
            }
        )

    acc: dict[tuple[str, int], list] = {}
    for r in ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).take_all():
        acc.setdefault((r["k"], r["tid"]), []).append(r["v"])
    return {kk: np.asarray(v, dtype=np.float64) for kk, v in acc.items()}


def grouped_quantile_exact(
    make_ds,
    key: str,
    col: str,
    qs: list[float],
    bins: int = 1024,
    max_candidates: int = 65536,
    max_refine: int = 16,
    diag: dict | None = None,
) -> pa.Table:
    """Exact disc quantiles of ``col`` per ``key``.  ``make_ds`` is a
    zero-arg callable returning a fresh Dataset over (key, col); each
    pass re-streams the input lazily (3 scans + one extra per
    refinement round, O(groups × qs × bins) driver memory —
    independent of data size).  ``max_candidates`` bounds the driver
    pull per (group, q); windows above it re-bin recursively (and a
    point-mass window resolves with no pull).  Pass ``diag={}`` to
    receive {"refine_rounds": int, "pulled": {(k, i): count}}."""
    stats = _stats_pass(make_ds(), key, col)
    edges = {
        k: np.linspace(lo, hi if hi > lo else lo + 1.0, bins + 1)
        for k, (n, lo, hi) in stats.items()
    }
    # initial histogram: reuse the generic window pass with the whole
    # range as a single window per group (one pass, identical math)
    whole = {
        k: [(0, _Window(stats[k][1], edges[k][-1], True, stats[k][0], 0), edges[k])]
        for k in stats
    }
    hists = {k: h for (k, _t), h in _window_hist_pass(make_ds(), key, col, whole, bins).items()}

    # per-(group, q) window state from the top-level histogram
    windows: dict[tuple[str, int], _Window] = {}
    for k in stats:
        n_k = stats[k][0]
        cum = np.concatenate([[0], np.cumsum(hists[k])])
        for i, q in enumerate(qs):
            r = max(0, math.ceil(q * n_k) - 1)
            b = int(np.searchsorted(cum, r, side="right") - 1)
            windows[(k, i)] = _Window(
                float(edges[k][b]),
                float(edges[k][b + 1]),
                b == bins - 1,
                int(hists[k][b] if b < bins else 0),
                r - int(cum[b]),
            )

    rounds = 0
    while rounds < max_refine:
        refine: dict[str, list[tuple[int, _Window, np.ndarray]]] = {}
        for (k, i), w in windows.items():
            if w.value is not None or w.n <= max_candidates:
                continue
            if w.degenerate():
                w.value = w.wlo
                continue
            refine.setdefault(k, []).append((i, w, np.linspace(w.wlo, w.whi, bins + 1)))
        if not refine:
            break
        rounds += 1
        sub = _window_hist_pass(make_ds(), key, col, refine, bins)
        for k, targets in refine.items():
            for i, w, sub_edges in targets:
                h = sub.get((k, i))
                if h is None:  # no rows seen (shouldn't happen; escape to pull)
                    continue
                cum = np.concatenate([[0], np.cumsum(h)])
                b = int(np.searchsorted(cum, w.r_rem, side="right") - 1)
                nlo, nhi = float(sub_edges[b]), float(sub_edges[b + 1])
                if nlo == w.wlo and nhi == w.whi:
                    continue  # no shrink possible — escape hatch: pull as-is
                w.wlo, w.whi = nlo, nhi
                w.incl = w.incl and b == bins - 1
                w.n = int(h[b])
                w.r_rem -= int(cum[b])

    pulls: dict[str, list[tuple[int, _Window]]] = {}
    for (k, i), w in windows.items():
        if w.value is None:
            pulls.setdefault(k, []).append((i, w))
    pulled = _window_pull_pass(make_ds(), key, col, pulls) if pulls else {}

    if diag is not None:
        diag["refine_rounds"] = rounds
        diag["pulled"] = {kk: len(v) for kk, v in pulled.items()}

    out_rows = []
    for k in sorted(stats):
        row = {key: k}
        for i, q in enumerate(qs):
            w = windows[(k, i)]
            if w.value is not None:
                row[f"p{round(q * 100):02d}"] = float(w.value)
            else:
                vals = np.sort(pulled[(k, i)])
                row[f"p{round(q * 100):02d}"] = float(vals[w.r_rem])
        out_rows.append(row)
    return pa.Table.from_pylist(out_rows)
