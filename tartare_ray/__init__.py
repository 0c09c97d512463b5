"""tartare_ray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of pbougue/tartare
(a transit-feed ETL coordinator; checkout empty at build time — see
SURVEY.md §0) as a binlog/WAL-style change-event engine over Parquet
tables of pre-tokenized training sequences, per BASELINE.json's
north_rule / north_star / input_hint.

Layout
------
- ``schema``     — Arrow schemas + schema-evolution (unify/widen/backfill)
- ``gen``        — deterministic synthetic change-event generator
- ``oracle``     — trivially-correct single-process replay applier
- ``state``      — manifest / lineage / watermark (exactly-once commit)
- ``sources``    — change-log tail (LSN-watermark parquet tail)
- ``stages``     — map_batches / actor-pool stages (validate, partition,
                   apply, dedup, text, similarity, multimodal)
- ``functions``  — scalar / tokenizer helpers + step registry
- ``pipelines``  — the CDC engine driver loop + driver-oracle queries

No module here calls ``ray.init`` / ``ray.shutdown`` — sessions are
owned by the driver, ``bench.py`` and the test fixture only.
"""

__version__ = "0.1.0"
