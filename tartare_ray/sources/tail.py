"""Change-log tail: LSN-watermark file discovery over an append-only
Parquet directory.

Tartare's change detection is md5-checksum polling of whole feed
archives (`tartare/core/fetcher.py`, `tartare/tasks.py::automatic_update`
`[UNVERIFIED — empty checkout, SURVEY.md §0]`).  Here the equivalent is
an LSN high-watermark: a file is *pending* iff its max LSN exceeds the
committed watermark.  Per-file LSN ranges come from the Parquet footer
statistics (no data pages are read); beyond
``DISTRIBUTED_LIST_THRESHOLD`` files the footer scan fans out as Ray
tasks, so a 10k-file log costs the driver zero parquet opens.

Files must individually be LSN-contiguous *ranges* and the log is
append-only; a straddling file (min <= W < max) can occur only if an
epoch previously committed mid-file, which the engine never does — it
is still handled by the row-level ``lsn > watermark`` filter in the
validate stage (duplicate-delivery safety).
"""

from __future__ import annotations

import os
from collections.abc import Sequence
from dataclasses import dataclass

import pyarrow.parquet as pq


@dataclass(frozen=True)
class LogFile:
    path: str
    min_lsn: int
    max_lsn: int
    num_rows: int
    bytes_uncompressed: int = 0  # from row-group metadata; sizes read blocks


def _fs_for(path: str):
    """(filesystem, fs-local path) for a URI (``s3://…``, ``file://…``)
    or (None, path) for a plain local path.  The reference's
    HTTP/FTP fetchers (§2A S1/S2) map to URI schemes here: the log
    directory itself may live on object storage, and everything
    downstream (``ray.data.read_parquet``, ``pq.read_schema``) already
    accepts the same URIs."""
    if "://" not in path:
        return None, path
    from pyarrow import fs as pafs

    return pafs.FileSystem.from_uri(path)


def _open_parquet(path: str) -> pq.ParquetFile:
    f, p = _fs_for(path)
    if f is None:
        return pq.ParquetFile(p)
    return pq.ParquetFile(f.open_input_file(p))


def read_log_schema(path: str):
    """Arrow schema of a log file by path or URI (footer-only)."""
    return _open_parquet(path).schema_arrow


def resolve_read_paths(paths: list[str]) -> tuple[list[str], object | None]:
    """(paths, filesystem) ready for ``ray.data.read_parquet``: URI
    paths become fs-local paths plus an explicit filesystem object —
    Ray resolves a URI only in the FIRST element of a path list, so
    passing mixed/URI lists without this breaks.  Plain local paths
    pass through with filesystem=None.  One scheme per log (asserted);
    a multi-scheme union should be two sources."""
    if not paths or "://" not in paths[0]:
        assert all("://" not in p for p in paths), "mixed URI/local log paths"
        return paths, None
    from pyarrow import fs as pafs

    scheme = paths[0].split("://", 1)[0]
    assert all(p.split("://", 1)[0] == scheme for p in paths), "one URI scheme per log"
    f, _ = pafs.FileSystem.from_uri(paths[0])
    return [p.split("://", 1)[1] for p in paths], f


def remove_log_file(path: str) -> None:
    """Delete a log file by path or URI (gc_log's deletion hook)."""
    f, p = _fs_for(path)
    if f is None:
        os.remove(p)
    else:
        f.delete_file(p)


def _lsn_range(path: str) -> tuple[int, int, int, int]:
    f = _open_parquet(path)
    md = f.metadata
    # the PHYSICAL leaf index of lsn (nested columns flatten in the
    # parquet schema, so the Arrow field index is wrong whenever a
    # list/struct column precedes lsn) — resolve by path
    idx = None
    if md.num_row_groups:
        rg0 = md.row_group(0)
        for i in range(rg0.num_columns):
            if rg0.column(i).path_in_schema == "lsn":
                idx = i
                break
    if idx is None:
        raise ValueError(f"log file {path!r} has no 'lsn' column")
    lo, hi, nbytes = None, None, 0
    stats_ok = True
    for rg in range(md.num_row_groups):
        nbytes += md.row_group(rg).total_byte_size
        if not stats_ok:
            continue  # keep accumulating bytes for the epoch budget
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            stats_ok = False
            continue
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    if not stats_ok:
        # fall back to reading just the lsn column; nbytes already
        # covers EVERY row group (an under-report would let plan_epoch
        # pack a spill-inducing epoch)
        import pyarrow.compute as pc

        col = f.read(columns=["lsn"])["lsn"]
        return pc.min(col).as_py(), pc.max(col).as_py(), md.num_rows, nbytes
    return int(lo), int(hi), md.num_rows, nbytes


def _lsn_ranges(paths: list[str]) -> list[tuple[int, int, int, int]]:
    """Footer scan of a path chunk — the Ray-task payload of the
    distributed listing."""
    return [_lsn_range(p) for p in paths]


# Above this many log files the footer scan fans out as Ray tasks
# (metadata-only, ~KBs per file): a 10k-file log costs the driver zero
# parquet opens and the scan parallelizes across the cluster, with
# file locality where the FS is node-local.  Below it, task dispatch
# overhead exceeds the footer reads themselves.
DISTRIBUTED_LIST_THRESHOLD = 64
_CHUNK = 32  # files per footer-scan task


def list_log_files(
    log_dir: str | Sequence[str], *, distributed_threshold: int | None = None
) -> list[LogFile]:
    """One or many log directories (N-source union, SURVEY.md §2A D2:
    tartare's coverage merging N contributor streams).  All sources must
    share ONE global LSN sequencer (sharded WAL segments of a single
    log): the merged listing is ordered by min_lsn, and
    ``plan_epoch``'s completeness chase keeps every epoch cut
    LSN-complete across sources.

    Footer reads run as Ray tasks when the file count reaches
    ``distributed_threshold`` (default ``DISTRIBUTED_LIST_THRESHOLD``)
    and a Ray session exists; small logs stay driver-local."""
    dirs = [log_dir] if isinstance(log_dir, str) else list(log_dir)
    paths: list[str] = []
    for d in dirs:
        f, p = _fs_for(d)
        if f is None:
            paths.extend(
                os.path.join(p, name)
                for name in sorted(os.listdir(p))
                if name.endswith(".parquet")
            )
        else:
            from pyarrow import fs as pafs

            scheme = d.split("://", 1)[0]
            infos = f.get_file_info(pafs.FileSelector(p))
            paths.extend(
                sorted(
                    f"{scheme}://{i.path}"
                    for i in infos
                    if i.is_file and i.path.endswith(".parquet")
                )
            )
    thr = DISTRIBUTED_LIST_THRESHOLD if distributed_threshold is None else distributed_threshold
    ranges: list[tuple[int, int, int, int]]
    if len(paths) >= thr:
        import ray

        if ray.is_initialized():
            scan = ray.remote(num_cpus=0.25)(_lsn_ranges)
            chunks = [paths[i : i + _CHUNK] for i in range(0, len(paths), _CHUNK)]
            ranges = [r for sub in ray.get([scan.remote(c) for c in chunks]) for r in sub]
        else:
            ranges = _lsn_ranges(paths)
    else:
        ranges = _lsn_ranges(paths)
    out = [LogFile(p, lo, hi, n, nb) for p, (lo, hi, n, nb) in zip(paths, ranges)]
    out.sort(key=lambda f: f.min_lsn)
    return out


def pending_files(log_dir: str | Sequence[str], watermark: int) -> list[LogFile]:
    return [f for f in list_log_files(log_dir) if f.max_lsn > watermark]


def plan_epoch(
    pending: list[LogFile],
    max_files: int | None = None,
    max_events: int | None = None,
    max_bytes: int | None = None,
) -> list[LogFile]:
    """Take a prefix of the pending files as one epoch (micro-batch).

    ``max_bytes`` (uncompressed, from footers) is the scale-honest
    bound: an epoch's shuffle must fit the cluster's aggregate object
    store, or the sort spills and throughput halves (measured 2× at
    48M events on one node).  A single file larger than the bound
    still forms a one-file epoch (progress guarantee).
    """
    if not pending:
        return []
    chosen: list[LogFile] = []
    events = 0
    nbytes = 0
    for f in pending:
        if chosen and max_files is not None and len(chosen) >= max_files:
            break
        if chosen and max_events is not None and events + f.num_rows > max_events:
            break
        if chosen and max_bytes is not None and nbytes + f.bytes_uncompressed > max_bytes:
            break
        chosen.append(f)
        events += f.num_rows
        nbytes += f.bytes_uncompressed
    # LSN-completeness chase (multi-source): the commit invariant is
    # "every lsn <= watermark is applied", so any unchosen file whose
    # range dips below the cut's watermark must join this epoch even
    # past the size bounds (progress/correctness over bound; interleaved
    # sources degrade toward one big epoch, disjoint ranges cost zero).
    watermark = max(f.max_lsn for f in chosen)
    i = len(chosen)
    while i < len(pending):
        if pending[i].min_lsn > watermark:
            break
        chosen.append(pending[i])
        watermark = max(watermark, pending[i].max_lsn)
        i += 1
    return chosen
