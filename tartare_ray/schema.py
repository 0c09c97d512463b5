"""Arrow schemas + schema-evolution rules for the CDC engine.

Authoritative shapes come from ``BASELINE.json`` ``input_hint`` (base
table) and SURVEY.md §1.3 (change log).  Evolution rules (north_star):

- added columns       -> null-backfilled on pre-evolution rows
- dropped columns     -> policy: **null-retained** (snapshot schema is
  the monotone union of every schema ever seen; a column that stops
  appearing in new events simply stays, null for rows that never had
  it).  An explicit ``drop_columns`` engine option removes columns at
  commit time for users who want the drop-means-gone policy.
- tokens int32->int64 -> lossless list-element widening via cast.

All helpers are pure functions over ``pyarrow`` objects so they are
usable both inside Ray Data ``map_batches`` stages and in the
single-process oracle.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

# --- Base (snapshot) schema: BASELINE.json:15 input_hint -------------------
BASE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)

# --- Change-event (binlog/WAL) schema: SURVEY.md §1.3 ----------------------
# lsn: strictly-increasing total order; op: I/U/D (payload null for D);
# schema_version bumps at evolution points.
CHANGE_SCHEMA = pa.schema(
    [
        ("lsn", pa.int64()),
        ("op", pa.string()),
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
        ("schema_version", pa.int32()),
    ]
)

# Columns that belong to the event envelope, not the payload row.
ENVELOPE_COLUMNS = ("lsn", "op", "schema_version")

# Integer widening lattice used by unify_with_widening.
_INT_ORDER = {
    pa.int8(): 0,
    pa.int16(): 1,
    pa.int32(): 2,
    pa.int64(): 3,
}


def _widen(a: pa.DataType, b: pa.DataType) -> pa.DataType:
    """Unify two field types, allowing integer (incl. list-element) widening."""
    if a.equals(b):
        return a
    if a in _INT_ORDER and b in _INT_ORDER:
        return a if _INT_ORDER[a] >= _INT_ORDER[b] else b
    if pa.types.is_list(a) and pa.types.is_list(b):
        return pa.list_(_widen(a.value_type, b.value_type))
    if pa.types.is_null(a):
        return b
    if pa.types.is_null(b):
        return a
    # float widening: int -> float64 promotion is allowed (permissive)
    if pa.types.is_floating(a) and (b in _INT_ORDER or pa.types.is_floating(b)):
        return pa.float64() if (pa.types.is_floating(b) and b.bit_width > a.bit_width) else a
    if pa.types.is_floating(b) and a in _INT_ORDER:
        return b
    raise pa.ArrowTypeError(f"cannot unify field types {a} and {b}")


def unify_with_widening(schemas: list[pa.Schema]) -> pa.Schema:
    """Union of fields across schemas, widening ints / list<int> elements.

    Field order: first-seen order (so the base schema, passed first,
    keeps its column order and evolved columns append at the end) —
    this is the monotone null-retained evolution policy.
    """
    fields: dict[str, pa.DataType] = {}
    for s in schemas:
        for f in s:
            if f.name in fields:
                fields[f.name] = _widen(fields[f.name], f.type)
            else:
                fields[f.name] = f.type
    return pa.schema([pa.field(n, t) for n, t in fields.items()])


def payload_schema(change_schema: pa.Schema) -> pa.Schema:
    """The snapshot-row schema implied by a change schema (envelope dropped)."""
    return pa.schema([f for f in change_schema if f.name not in ENVELOPE_COLUMNS])


def conform(table: pa.Table, target: pa.Schema) -> pa.Table:
    """Cast ``table`` to ``target``: missing columns null-backfilled,
    extra columns dropped, int/list-int columns widened. Zero-copy when
    already conforming."""
    if table.schema.equals(target):
        return table
    n = len(table)
    cols = []
    names = set(table.schema.names)
    for f in target:
        if f.name in names:
            col = table.column(f.name)
            if not col.type.equals(f.type):
                col = col.cast(f.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, f.type))
    return pa.Table.from_arrays(cols, schema=target)


def schema_fingerprint(schema: pa.Schema) -> str:
    """Stable hex fingerprint of a schema (recorded in the manifest)."""
    return hashlib.sha256(schema.serialize().to_pybytes()).hexdigest()[:16]
