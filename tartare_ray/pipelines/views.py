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
