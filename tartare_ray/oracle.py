"""Single-process, trivially-correct CDC replay applier (build-plan M0).

This is the engine-independent "reference" the acceptance test diffs
against (SURVEY.md §0: the real reference checkout was empty, so per
BASELINE.json:6 the replayed-table-state oracle is this sequential
fold).  Deliberately simple: read every event, sort by LSN, fold into a
dict, materialize.  Used only in tests at 10^3–10^5 events.

Semantics (shared contract with the distributed engine):
- latest-LSN-wins per doc_id; ties (duplicate delivery) keep either —
  duplicate events are byte-identical by construction so it cannot
  matter.
- op I/U are both upserts (U on an absent key inserts); D removes
  (tombstone); D on an absent key is a no-op.
- schema evolution: final schema = widening union of the base schema
  and every event-file payload schema (null-retained drop policy),
  minus ``drop_columns``; old rows null-backfilled, token lists
  widened int32→int64 by cast.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .schema import ENVELOPE_COLUMNS, conform, payload_schema, unify_with_widening


def replay_oracle(
    log_files: list[str],
    base_table: pa.Table | None = None,
    drop_columns: tuple[str, ...] = (),
) -> pa.Table:
    """Fold the change log sequentially; return the final snapshot
    sorted by doc_id, in the evolved schema."""
    schemas = [] if base_table is None else [base_table.schema]
    tables = []
    for f in sorted(log_files):
        t = pq.read_table(f)
        schemas.append(payload_schema(t.schema))
        tables.append(t)
    target = unify_with_widening(schemas)
    if drop_columns:
        target = pa.schema([f for f in target if f.name not in drop_columns])

    state: dict[str, dict] = {}
    if base_table is not None:
        for row in conform(base_table, target).to_pylist():
            state[row["doc_id"]] = row

    payload_cols = [n for n in target.names]
    # GLOBAL LSN order, not per-file: multi-source logs interleave LSN
    # ranges across files, and latest-LSN-wins is only correct folded
    # over the total order (each table conformed to the union schema
    # so the concat is well-typed under evolution)
    merged = None
    if tables:
        envelope = [f for f in tables[0].schema if f.name in ENVELOPE_COLUMNS]
        uni = pa.schema(envelope + list(target))
        merged = pa.concat_tables([conform(t, uni) for t in tables])
    for t in [merged] if merged is not None else []:
        t = t.combine_chunks()
        order = pc.sort_indices(t, sort_keys=[("lsn", "ascending")])
        t = t.take(order)
        rows = t.to_pylist()
        for ev in rows:
            if ev["op"] == "D":
                state.pop(ev["doc_id"], None)
            else:
                state[ev["doc_id"]] = {c: ev.get(c) for c in payload_cols}

    if not state:
        return target.empty_table()
    out_rows = [state[k] for k in sorted(state)]
    return conform(pa.Table.from_pylist(out_rows), target)
