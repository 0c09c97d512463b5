"""Deterministic synthetic change-event generator (build-plan M0).

Writes an append-only Parquet change log ``log/events-{fileno:06d}.parquet``
matching FIXTURES.md §2: strictly-increasing ``lsn`` across the whole
log (file order == LSN order), zipf-hot ``doc_id``s, an I/U/D op mix,
and a schema-evolution schedule (``tokens`` int32→int64 widening, a
``quality: float64`` column added) applied at file granularity.

Everything is vectorized numpy + Arrow array construction — the
generator is also used at bench scale (10^6–10^8 events), so no
per-row Python. Per-file RNG streams (``seed + fileno``) make each
file independently reproducible.

Reference analogue: tartare's fixture GTFS zips under ``tests/fixtures``
`[UNVERIFIED — empty checkout, SURVEY.md §0]`; same pattern (small
deterministic golden inputs), different data model.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = 50257  # GPT-2-ish vocab size per FIXTURES.md
OPS = np.array(["I", "U", "D"])


@dataclass(frozen=True)
class GenConfig:
    n_events: int
    n_docs: int
    seed: int = 42
    zipf_s: float = 1.1
    op_mix: tuple[float, float, float] = (0.2, 0.7, 0.1)  # I : U : D
    events_per_file: int = 100_000
    max_len: int = 64  # token sequence length drawn from [1, max_len]
    n_sources: int = 10
    # Schema-evolution schedule: fraction of the log (by file index) at
    # which the change applies; None disables.
    widen_frac: float | None = None  # tokens int32 -> int64 (values > 2^31)
    add_col_frac: float | None = None  # + quality: float64

    @property
    def n_files(self) -> int:
        return max(1, -(-self.n_events // self.events_per_file))


@dataclass
class GenResult:
    files: list[str] = field(default_factory=list)
    n_events: int = 0
    max_lsn: int = -1


def _doc_id_pool(n_docs: int) -> np.ndarray:
    return np.array([f"doc-{i:08d}" for i in range(n_docs)], dtype=object)


def _token_list_array(
    rng: np.random.Generator,
    n: int,
    max_len: int,
    wide: bool,
    null_mask: np.ndarray,
) -> tuple[pa.ListArray, np.ndarray]:
    """Build a list<int32|int64> column of random token sequences.

    Rows where ``null_mask`` is True (deletes) become null lists.
    Returns (list_array, lengths) — lengths valid only on non-null rows.
    """
    lengths = rng.integers(1, max_len + 1, size=n)
    lengths_eff = np.where(null_mask, 0, lengths)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths_eff, out=offsets[1:])
    total = int(offsets[-1])
    if wide:
        values = rng.integers(0, VOCAB, size=total, dtype=np.int64)
        # force genuine widening: ~1% of values exceed int32 range
        big = rng.random(total) < 0.01
        values[big] += 2**32
        value_arr = pa.array(values, type=pa.int64())
        list_type = pa.list_(pa.int64())
    else:
        values = rng.integers(0, VOCAB, size=total, dtype=np.int32)
        value_arr = pa.array(values, type=pa.int32())
        list_type = pa.list_(pa.int32())
    arr = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()) if total < 2**31 else pa.array(offsets),
        value_arr,
    ).cast(list_type)
    if null_mask.any():
        # null-out delete rows (take with null indices yields nulls;
        # mask= keeps this fully vectorized — no object/tolist churn)
        arr = arr.take(pa.array(np.arange(n, dtype=np.int64), mask=null_mask))
    return arr, lengths


def generate_log(log_dir: str, cfg: GenConfig) -> GenResult:
    """Write the full change log under ``log_dir``; returns file list.

    Idempotent: an existing complete log for the same config (marker
    file) is reused — bench runs at two parallelism levels share one
    input.
    """
    if cfg.n_events <= 0:
        raise ValueError(f"n_events must be positive, got {cfg.n_events}")
    os.makedirs(log_dir, exist_ok=True)
    marker = os.path.join(log_dir, "_COMPLETE")
    expected = [
        os.path.join(log_dir, f"events-{i:06d}.parquet") for i in range(cfg.n_files)
    ]
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == repr(cfg) and all(os.path.exists(p) for p in expected):
                return GenResult(files=expected, n_events=cfg.n_events, max_lsn=cfg.n_events - 1)
        os.remove(marker)
    # stale files from a previous (different) config would corrupt a tail
    expected_set = set(expected)
    for name in os.listdir(log_dir):
        p = os.path.join(log_dir, name)
        if name.startswith("events-") and p not in expected_set:
            os.remove(p)
    pool = _doc_id_pool(cfg.n_docs)
    src_pool = np.array([f"src{k}" for k in range(cfg.n_sources)], dtype=object)
    res = GenResult()
    for fileno in range(cfg.n_files):
        lo = fileno * cfg.events_per_file
        hi = min(cfg.n_events, lo + cfg.events_per_file)
        n = hi - lo
        frac = fileno / cfg.n_files
        wide = cfg.widen_frac is not None and frac >= cfg.widen_frac
        with_quality = cfg.add_col_frac is not None and frac >= cfg.add_col_frac
        sv = 1 + int(wide) + int(with_quality)
        rng = np.random.default_rng(cfg.seed + fileno)

        lsn = np.arange(lo, hi, dtype=np.int64)
        op_idx = rng.choice(3, size=n, p=list(cfg.op_mix))
        is_d = op_idx == 2
        doc_idx = (rng.zipf(cfg.zipf_s, size=n) - 1) % cfg.n_docs
        tokens, lengths = _token_list_array(rng, n, cfg.max_len, wide, is_d)
        n_tok = pa.array(
            np.where(is_d, 0, lengths).astype(np.int32), type=pa.int32()
        )
        if is_d.any():
            take_idx = pa.array(np.arange(n, dtype=np.int64), mask=is_d)
            n_tok = n_tok.take(take_idx)
            source = pa.array(src_pool[rng.integers(0, cfg.n_sources, n)]).take(take_idx)
        else:
            source = pa.array(src_pool[rng.integers(0, cfg.n_sources, n)])

        cols = {
            "lsn": pa.array(lsn),
            "op": pa.array(OPS[op_idx]),
            "doc_id": pa.array(pool[doc_idx]),
            "tokens": tokens,
            "n_tok": n_tok,
            "source": source,
            "schema_version": pa.array(np.full(n, sv, dtype=np.int32)),
        }
        if with_quality:
            q = rng.random(n)
            qarr = pa.array(q, type=pa.float64())
            if is_d.any():
                qarr = qarr.take(take_idx)
            cols["quality"] = qarr
        tbl = pa.table(cols)
        path = expected[fileno]
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
        res.files.append(path)
        res.n_events += n
        res.max_lsn = int(lsn[-1])
    with open(marker, "w") as f:
        f.write(repr(cfg))
    return res
