"""Incrementally-maintained aggregate views over the committed table.

A consumer that wants ``SELECT group, count(*), sum(x)`` of a 100 TB
snapshot cannot rescan it per epoch.  Count/sum are invertible, so the
view updates from the per-epoch change feed alone:

    delta(group) = + contribution of each winner's NEW row
                   - contribution of the doc's PREVIOUS state

New contributions come straight from ``changes_dataset(epoch)``.
Previous state is pulled partition-locally AND delta-directly: feed
keys are tagged with their hash partition, and one task per TOUCHED
partition resolves them against that partition's parent chain via
``lookup_keys_in_chain`` — a newest-first suffix scan reading only
(doc_id, group, sum) + envelope columns that stops once every key is
resolved, so hot keys resolve in the newest delta file and the fat
base is often never opened.  I/O is proportional to touched
partitions' chain SUFFIXES, never the table.  The delta rows (group,
dcount, dsum) are tiny and fold into the view on the driver.

Reference analogue `[UNVERIFIED — empty checkout, SURVEY.md §0]`:
tartare recomputes coverage-level artifacts per export; the view is
the incremental replacement for that recompute-the-world step.

View state persists as JSON per epoch under ``_views/<name>/`` with
the same atomic-write discipline as manifests — ``update_to`` resumes
from the last persisted epoch (crash-safe: re-deriving an epoch's
delta is deterministic).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

import ray.data

from ..state.manifest import load_current, load_epoch
from ..stages.kernels import hash_partition_ids


def _agg_contrib(groups: np.ndarray, sums: np.ndarray, sign: int) -> dict[str, list[float]]:
    # null group values aggregate under their own key (np.unique on an
    # object array mixing None and str raises on comparison)
    groups = np.array(
        ["\x00null" if g is None else g for g in groups], dtype=object
    )
    out: dict[str, list[float]] = {}
    for g in np.unique(groups):
        m = groups == g
        out[str(g)] = [sign * int(m.sum()), sign * float(np.nansum(sums[m]))]
    return out


class IncrementalAggView:
    """count(*) + sum(sum_col) per group_col, maintained per epoch."""

    def __init__(self, engine, name: str, group_col: str, sum_col: str):
        self.engine = engine
        self.name = name
        self.group_col = group_col
        self.sum_col = sum_col
        self._dir = os.path.join(engine.table_root, "_views", name)

    # -- persistence -------------------------------------------------------
    def _path(self, epoch: int) -> str:
        return os.path.join(self._dir, f"e{epoch:06d}.json")

    def _load_latest(self, up_to: int) -> tuple[int, dict[str, list[float]]]:
        for e in range(up_to, 0, -1):
            if os.path.exists(self._path(e)):
                with open(self._path(e)) as f:
                    return e, json.load(f)
        return 0, {}

    def _persist(self, epoch: int, state: dict) -> None:
        os.makedirs(self._dir, exist_ok=True)
        tmp = self._path(epoch) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._path(epoch))

    # -- one epoch's delta -------------------------------------------------
    def _epoch_delta(self, epoch: int) -> dict[str, list[float]]:
        eng = self.engine
        m = load_epoch(eng.table_root, epoch)
        parent_m = (
            load_epoch(eng.table_root, m.parent_epoch)
            if m.parent_epoch is not None
            else m
        )
        parent_chains = eng._chains(parent_m) if m.parent_epoch is not None else {}
        parent_schema = parent_m.schema
        # the key→part mapping the PARENT chains were written with —
        # from the manifest, never the reader's config (an engine may
        # have repartitioned the table since this reader was built)
        P = parent_m.num_partitions or eng.cfg.num_partitions
        group_col, sum_col = self.group_col, self.sum_col
        table_root = eng.table_root

        def tag(b: pa.Table) -> pa.Table:
            return b.append_column(
                "part", pa.array(hash_partition_ids(b["doc_id"], P))
            )

        def per_part(g: pa.Table) -> pa.Table:
            from ..stages.compact import lookup_keys_in_chain

            p = int(g["part"][0].as_py())
            deltas: dict[str, list[float]] = {}
            # retract previous state of the touched keys — delta-direct:
            # scan this partition's chain suffix newest-first, reading
            # ONLY (doc_id, group, sum) + envelope, stopping as soon as
            # every touched key is resolved (hot keys resolve in the
            # newest delta; the base file is often never opened)
            chain = parent_chains.get(p)
            if chain:
                hit = lookup_keys_in_chain(
                    table_root,
                    chain,
                    parent_schema,
                    g["doc_id"].combine_chunks(),
                    ["doc_id", group_col, sum_col],
                )
                if len(hit):
                    old = _agg_contrib(
                        hit[group_col].to_numpy(zero_copy_only=False),
                        hit[sum_col].to_numpy(zero_copy_only=False).astype(np.float64),
                        -1,
                    )
                    for k, (dc, ds) in old.items():
                        acc = deltas.setdefault(k, [0, 0.0])
                        acc[0] += dc
                        acc[1] += ds
            live = g.filter(
                pa.compute.fill_null(pa.compute.not_equal(g["op"], "D"), True)
            )
            if len(live):
                new = _agg_contrib(
                    live[group_col].to_numpy(zero_copy_only=False),
                    live[sum_col].to_numpy(zero_copy_only=False).astype(np.float64),
                    +1,
                )
                for k, (dc, ds) in new.items():
                    acc = deltas.setdefault(k, [0, 0.0])
                    acc[0] += dc
                    acc[1] += ds
            return pa.table(
                {
                    "g": pa.array(list(deltas), pa.string()),
                    "dcount": pa.array([v[0] for v in deltas.values()], pa.int64()),
                    "dsum": pa.array([v[1] for v in deltas.values()], pa.float64()),
                }
            )

        feed = eng.changes_dataset(epoch).map_batches(
            tag, batch_format="pyarrow", zero_copy_batch=True
        )
        rows = feed.groupby("part").map_groups(per_part, batch_format="pyarrow").take_all()
        out: dict[str, list[float]] = {}
        for r in rows:
            acc = out.setdefault(r["g"], [0, 0.0])
            acc[0] += int(r["dcount"])
            acc[1] += float(r["dsum"])
        return out

    # -- public ------------------------------------------------------------
    def update_to(self, epoch: int | None = None) -> dict[str, list[float]]:
        """Fold epoch deltas into the persisted view up to ``epoch``
        (default: CURRENT); returns the view state
        ``{group: [count, sum]}``."""
        cur = load_current(self.engine.table_root)
        if cur is None and epoch is None:
            return {}  # nothing committed yet: the empty view
        target = cur.epoch if epoch is None else epoch
        have, state = self._load_latest(target)
        for e in range(have + 1, target + 1):
            delta = self._epoch_delta(e)
            for k, (dc, ds) in delta.items():
                acc = state.setdefault(k, [0, 0.0])
                acc[0] += dc
                acc[1] += ds
            state = {k: v for k, v in state.items() if v[0] != 0}
            self._persist(e, state)
        return state

    def as_table(self, epoch: int | None = None) -> pa.Table:
        state = self.update_to(epoch)
        ks = sorted(state)
        return pa.table(
            {
                self.group_col: pa.array(ks, pa.string()),
                "n_docs": pa.array([int(state[k][0]) for k in ks], pa.int64()),
                f"sum_{self.sum_col}": pa.array([state[k][1] for k in ks], pa.float64()),
            }
        )


class IncrementalMinMaxView:
    """min(val_col) (or max) per group_col, maintained per epoch.

    MIN/MAX are NOT invertible — retracting the current minimum cannot
    be repaired from the delta alone.  Standard incremental design:
    per group, a BUFFER of the ``buffer_n`` smallest live (value,
    doc_id) entries plus (a) a ``complete`` flag — buffer holds the
    whole live group — and (b) a ``bound``: the smallest value ever
    discarded or ignored since the group was last complete.  The
    buffered minimum is provably correct while ``buf[0] <= bound``
    (anything untracked is >= bound); when retractions break that — or
    empty an incomplete buffer — the group joins the RARE rescan path:
    one two-column pruned snapshot pass at that epoch rebuilds every
    exhausted group's buffer in a single batch.  Otherwise per-epoch
    cost matches the count/sum view: touched keys' previous state via
    partition-local delta-direct chain-suffix lookups, O(epoch
    winners) doc-level delta rows to the driver, crash-safe JSON state
    per epoch (same ``_views/`` layout ⇒ same GC retention pin).

    ``mode="max"`` negates values internally (max = -min(-x))."""

    def __init__(self, engine, name, group_col, val_col, mode="min", buffer_n=8):
        assert mode in ("min", "max")
        self.engine = engine
        self.name = name
        self.group_col = group_col
        self.val_col = val_col
        self.mode = mode
        self.buffer_n = buffer_n
        self._dir = os.path.join(engine.table_root, "_views", name)

    _path = IncrementalAggView._path
    _load_latest = IncrementalAggView._load_latest
    _persist = IncrementalAggView._persist

    def _sign(self) -> float:
        return 1.0 if self.mode == "min" else -1.0

    # -- one epoch's doc-level delta rows ------------------------------------
    def _epoch_rows(self, epoch: int) -> list[dict]:
        eng = self.engine
        m = load_epoch(eng.table_root, epoch)
        parent_m = (
            load_epoch(eng.table_root, m.parent_epoch)
            if m.parent_epoch is not None
            else m
        )
        parent_chains = eng._chains(parent_m) if m.parent_epoch is not None else {}
        parent_schema = parent_m.schema
        P = parent_m.num_partitions or eng.cfg.num_partitions
        group_col, val_col = self.group_col, self.val_col
        table_root = eng.table_root

        def tag(b: pa.Table) -> pa.Table:
            return b.append_column(
                "part", pa.array(hash_partition_ids(b["doc_id"], P))
            )

        def per_part(g: pa.Table) -> pa.Table:
            from ..stages.compact import lookup_keys_in_chain

            p = int(g["part"][0].as_py())
            ids = g["doc_id"].combine_chunks()
            og = pa.nulls(len(g), pa.string())
            ov = pa.nulls(len(g), pa.float64())
            chain = parent_chains.get(p)
            if chain:
                hit = lookup_keys_in_chain(
                    table_root, chain, parent_schema, ids,
                    ["doc_id", group_col, val_col],
                )
                if len(hit):
                    pos = {d: i for i, d in enumerate(hit["doc_id"].to_pylist())}
                    hg = hit[group_col].to_pylist()
                    hv = hit[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
                    og = pa.array(
                        [hg[pos[d]] if d in pos else None for d in ids.to_pylist()],
                        pa.string(),
                    )
                    ov = pa.array(
                        [float(hv[pos[d]]) if d in pos else None for d in ids.to_pylist()],
                        pa.float64(),
                    )
            live = pa.compute.fill_null(pa.compute.not_equal(g["op"], "D"), True)
            return pa.table(
                {
                    "doc_id": ids,
                    "had_old": pa.array(
                        pa.compute.is_valid(og).to_numpy(zero_copy_only=False)
                    ),
                    "old_g": og,
                    "old_v": ov,
                    "is_live": pa.array(live.to_numpy(zero_copy_only=False)),
                    "new_g": g[group_col],
                    "new_v": pa.compute.cast(g[val_col], pa.float64()),
                }
            )

        feed = eng.changes_dataset(epoch).map_batches(
            tag, batch_format="pyarrow", zero_copy_batch=True
        )
        return (
            feed.groupby("part").map_groups(per_part, batch_format="pyarrow").take_all()
        )

    # -- buffer algebra -------------------------------------------------------
    @staticmethod
    def _gkey(g) -> str:
        return "\x00null" if g is None else str(g)

    def _retract(self, state: dict, g, doc: str) -> None:
        ent = state.get(self._gkey(g))
        if ent:
            ent["buf"] = [e for e in ent["buf"] if e[1] != doc]

    def _insert(self, state: dict, g, doc: str, v: float) -> None:
        k = self._gkey(g)
        ent = state.setdefault(k, {"buf": [], "complete": True, "bound": None})
        buf = [e for e in ent["buf"] if e[1] != doc]
        buf.append([v, doc])
        buf.sort(key=lambda e: (e[0], e[1]))
        if len(buf) > self.buffer_n:
            dropped = buf[self.buffer_n :]
            buf = buf[: self.buffer_n]
            ent["complete"] = False
            lo = min(e[0] for e in dropped)
            ent["bound"] = lo if ent["bound"] is None else min(ent["bound"], lo)
        ent["buf"] = buf

    def _needs_rescan(self, ent: dict) -> bool:
        if ent["complete"]:
            return False
        if not ent["buf"]:
            return True
        return ent["bound"] is not None and ent["buf"][0][0] > ent["bound"]

    # -- the rare path ---------------------------------------------------------
    def _rescan(self, state: dict, groups: list[str], epoch: int) -> None:
        """Rebuild exhausted groups' buffers from one two-column pruned
        snapshot pass at ``epoch`` — batched over all of them."""
        sign = self._sign()
        want = np.array(sorted(set(groups)), dtype=object)
        group_col, val_col, N = self.group_col, self.val_col, self.buffer_n

        def local_topn(b: pa.Table) -> pa.Table:
            gs = b[group_col].to_pylist()
            keys = np.array(
                ["\x00null" if g is None else str(g) for g in gs], dtype=object
            )
            m = np.isin(keys, want)
            empty = pa.table(
                {
                    "g": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.string()),
                    "v": pa.array([], pa.float64()),
                }
            )
            if not m.any():
                return empty
            sub = b.filter(pa.array(m))
            kk = keys[m]
            vv = sign * sub[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
            dd = np.asarray(sub["doc_id"].to_pylist(), dtype=object)
            order = np.lexsort((dd, vv, kk))
            kk, vv, dd = kk[order], vv[order], dd[order]
            new = np.r_[True, kk[1:] != kk[:-1]]
            run_start = np.maximum.accumulate(np.where(new, np.arange(len(kk)), 0))
            keep = (np.arange(len(kk)) - run_start) <= N  # N+1 rows ⇒ completeness known
            return pa.table(
                {
                    "g": pa.array(kk[keep], pa.string()),
                    "doc_id": pa.array(dd[keep], pa.string()),
                    "v": pa.array(vv[keep], pa.float64()),
                }
            )

        rows = (
            self.engine.snapshot_dataset(
                epoch=epoch, columns=["doc_id", group_col, val_col]
            )
            .map_batches(local_topn, batch_format="pyarrow", zero_copy_batch=True)
            .take_all()
        )
        per_g: dict[str, list] = {g: [] for g in want}
        for r in rows:
            per_g[r["g"]].append([float(r["v"]), r["doc_id"]])
        for g in want:
            ent = sorted(per_g[g], key=lambda e: (e[0], e[1]))
            if not ent:
                state.pop(g, None)  # no live docs left
            else:
                state[g] = {
                    "buf": ent[: self.buffer_n],
                    "complete": len(ent) <= self.buffer_n,
                    "bound": None,
                }

    # -- public -----------------------------------------------------------------
    def update_to(self, epoch: int | None = None) -> dict:
        """Fold epoch deltas into the persisted view up to ``epoch``
        (default: CURRENT); returns ``{group: entry}`` state."""
        cur = load_current(self.engine.table_root)
        if cur is None and epoch is None:
            return {}
        target = cur.epoch if epoch is None else epoch
        have, state = self._load_latest(target)
        sign = self._sign()
        for e in range(have + 1, target + 1):
            rows = self._epoch_rows(e)
            for r in rows:  # retract every touched doc's previous state
                if r["had_old"]:
                    self._retract(state, r["old_g"], r["doc_id"])
            for r in rows:  # fold the live winners back in
                if r["is_live"] and r["new_v"] is not None:
                    self._insert(state, r["new_g"], r["doc_id"], sign * float(r["new_v"]))
            # groups whose buffered minimum is no longer provably
            # correct (emptied, or min above the discard bound), plus
            # complete-and-empty groups that simply vanish
            state = {
                k: ent for k, ent in state.items() if ent["buf"] or not ent["complete"]
            }
            stale = [k for k, ent in state.items() if self._needs_rescan(ent)]
            if stale:
                self._rescan(state, stale, e)
            self._persist(e, state)
        return state

    def as_table(self, epoch: int | None = None) -> pa.Table:
        state = self.update_to(epoch)
        sign = self._sign()
        ks = sorted(state)
        return pa.table(
            {
                self.group_col: pa.array(ks, pa.string()),
                f"{self.mode}_{self.val_col}": pa.array(
                    [sign * state[k]["buf"][0][0] for k in ks], pa.float64()
                ),
            }
        )


class IncrementalQuantileView:
    """Approximate per-group quantiles (DDSketch, 1% relative error)
    maintained incrementally from the change feed — unlike MIN/MAX,
    the sketch IS invertible: state is (group, bucket) → count, and a
    doc's retraction simply decrements its old bucket.  Per-epoch cost
    is identical to the count/sum view (touched keys' previous state
    via delta-direct chain-suffix lookups, O(touched groups × buckets)
    delta rows), with NO rescan path at all.  State JSON per epoch in
    ``_views/`` (same crash-safety + GC pin)."""

    def __init__(self, engine, name, group_col, val_col, alpha: float = 0.01):
        self.engine = engine
        self.name = name
        self.group_col = group_col
        self.val_col = val_col
        self.alpha = alpha
        self._dir = os.path.join(engine.table_root, "_views", name)

    _path = IncrementalAggView._path
    _load_latest = IncrementalAggView._load_latest
    _persist = IncrementalAggView._persist

    def _bucket_contrib(self, groups, vals, sign: int) -> dict:
        from ..stages.sketch import dd_bucket

        groups = np.array(
            ["\x00null" if g is None else str(g) for g in groups], dtype=object
        )
        vals = np.asarray(vals, dtype=np.float64)
        ok = vals > 0  # DDSketch domain: positive values
        groups, vals = groups[ok], vals[ok]
        out: dict = {}
        if len(vals) == 0:
            return out
        bk = dd_bucket(vals, self.alpha)
        order = np.lexsort((bk, groups))
        g, b = groups[order], bk[order]
        new = np.r_[True, (g[1:] != g[:-1]) | (b[1:] != b[:-1])]
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(g)))
        for s, c in zip(starts, counts):
            out.setdefault(str(g[s]), {})[str(int(b[s]))] = sign * int(c)
        return out

    def _epoch_delta(self, epoch: int) -> dict:
        eng = self.engine
        m = load_epoch(eng.table_root, epoch)
        parent_m = (
            load_epoch(eng.table_root, m.parent_epoch)
            if m.parent_epoch is not None
            else m
        )
        parent_chains = eng._chains(parent_m) if m.parent_epoch is not None else {}
        parent_schema = parent_m.schema
        P = parent_m.num_partitions or eng.cfg.num_partitions
        group_col, val_col = self.group_col, self.val_col
        table_root = eng.table_root
        contrib = self._bucket_contrib

        def tag(b: pa.Table) -> pa.Table:
            return b.append_column(
                "part", pa.array(hash_partition_ids(b["doc_id"], P))
            )

        def per_part(g: pa.Table) -> pa.Table:
            from ..stages.compact import lookup_keys_in_chain

            p = int(g["part"][0].as_py())
            deltas: dict = {}

            def fold(d: dict) -> None:
                for k, bks in d.items():
                    acc = deltas.setdefault(k, {})
                    for bk, c in bks.items():
                        acc[bk] = acc.get(bk, 0) + c

            chain = parent_chains.get(p)
            if chain:
                hit = lookup_keys_in_chain(
                    table_root, chain, parent_schema,
                    g["doc_id"].combine_chunks(),
                    ["doc_id", group_col, val_col],
                )
                if len(hit):
                    fold(
                        contrib(
                            hit[group_col].to_pylist(),
                            hit[val_col].to_numpy(zero_copy_only=False),
                            -1,
                        )
                    )
            live = g.filter(
                pa.compute.fill_null(pa.compute.not_equal(g["op"], "D"), True)
            )
            if len(live):
                fold(
                    contrib(
                        live[group_col].to_pylist(),
                        live[val_col].to_numpy(zero_copy_only=False),
                        +1,
                    )
                )
            gs, bs, cs = [], [], []
            for k, bks in deltas.items():
                for bk, c in bks.items():
                    if c:
                        gs.append(k)
                        bs.append(int(bk))
                        cs.append(c)
            return pa.table(
                {
                    "g": pa.array(gs, pa.string()),
                    "bucket": pa.array(bs, pa.int64()),
                    "dn": pa.array(cs, pa.int64()),
                }
            )

        feed = eng.changes_dataset(epoch).map_batches(
            tag, batch_format="pyarrow", zero_copy_batch=True
        )
        rows = feed.groupby("part").map_groups(per_part, batch_format="pyarrow").take_all()
        out: dict = {}
        for r in rows:
            acc = out.setdefault(r["g"], {})
            bk = str(int(r["bucket"]))
            acc[bk] = acc.get(bk, 0) + int(r["dn"])
        return out

    def update_to(self, epoch: int | None = None) -> dict:
        cur = load_current(self.engine.table_root)
        if cur is None and epoch is None:
            return {}
        target = cur.epoch if epoch is None else epoch
        have, state = self._load_latest(target)
        for e in range(have + 1, target + 1):
            for k, bks in self._epoch_delta(e).items():
                acc = state.setdefault(k, {})
                for bk, c in bks.items():
                    n = acc.get(bk, 0) + c
                    if n:
                        acc[bk] = n
                    else:
                        acc.pop(bk, None)
                if not acc:
                    del state[k]
            self._persist(e, state)
        return state

    def as_table(
        self, epoch: int | None = None, quantiles: tuple = (0.5, 0.9, 0.99)
    ) -> pa.Table:
        from ..stages.sketch import dd_value

        state = self.update_to(epoch)
        ks = sorted(state)
        cols: dict = {self.group_col: pa.array(ks, pa.string())}
        per_q: dict = {q: [] for q in quantiles}
        for k in ks:
            bks = sorted((int(b), c) for b, c in state[k].items())
            buckets = np.array([b for b, _ in bks], dtype=np.int64)
            counts = np.array([c for _, c in bks], dtype=np.int64)
            cum = np.cumsum(counts)
            total = cum[-1]
            for q in quantiles:
                rank = max(1, int(np.ceil(q * total)))
                i = int(np.searchsorted(cum, rank))
                per_q[q].append(float(dd_value(buckets[i : i + 1], self.alpha)[0]))
        for q in quantiles:
            cols[f"q{int(q * 100)}"] = pa.array(per_q[q], pa.float64())
        return pa.table(cols)
