"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or anywhere in
``tartare_ray`` (sessions are owned by the driver, bench.py and the
test fixture only).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: CDC replay of a documents-derived change log
    (insert/update/delete, schema widen + added column, exactly-once
    manifest commit) on sf0.001; returns the committed snapshot
    summary as a streaming Dataset."""
    from tartare_ray.pipelines.flagship import flagship_snapshot_summary

    return flagship_snapshot_summary("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2
    (relational, text-analysis, dedup, similarity, multimodal, CDC)."""
    from tartare_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per oracle-checkable query — including
    the CDC replay family, whose final state is rebuilt declaratively
    from the documents table (SQL-reproducible token hash).  Keys
    absent here (lang_id, fingerprints, LSH pipelines, engine-internal
    lineage) get the driver's rows-only check — see the note at the
    bottom of ``tartare_ray/pipelines/queries.py``."""
    from tartare_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
