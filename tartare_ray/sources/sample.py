"""Sampling-based hot-key detection (SURVEY.md §2A O3 / §4.2 skew row).

Reads only the ``doc_id`` column of a bounded sample of pending log
files (column-pruned parquet reads — no token payloads leave storage)
and estimates the per-key share of the event stream.  The result
drives the explicit salted pre-reduce (``EngineConfig.hot_key_salts``):
salting costs an extra small shuffle, so it is enabled only when a key
is hot enough to skew a partition.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow.parquet as pq

from .tail import LogFile


@dataclass(frozen=True)
class HotKeyReport:
    sampled_rows: int
    top_key: str | None
    top_share: float  # fraction of sampled events on the hottest key
    recommended_salts: int | None  # None -> salting not worth it


def detect_hot_keys(
    files: list[LogFile],
    num_partitions: int,
    sample_files: int = 2,
    hot_share_threshold: float | None = None,
) -> HotKeyReport:
    """Estimate hot-key skew from the first+last sample files.

    A key is "hot" when its event share exceeds a partition's fair
    share by 4× (default threshold = 4 / num_partitions): below that,
    the per-batch pre-reduce already bounds its shuffle contribution.
    Recommended salts ≈ hot key's multiple of fair share, capped at 64.
    """
    if hot_share_threshold is None:
        hot_share_threshold = min(0.5, 4.0 / num_partitions)
    take = files[:1] + files[-1:] if len(files) > sample_files else files
    counts: dict[str, int] = {}
    total = 0
    for f in take[:sample_files]:
        col = pq.read_table(f.path, columns=["doc_id"])["doc_id"]
        arr = col.combine_chunks().to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(arr, return_counts=True)
        # only track plausible-hot keys within the file to bound memory
        order = np.argsort(-cnts)[:1024]
        for v, c in zip(vals[order], cnts[order]):
            counts[v] = counts.get(v, 0) + int(c)
        total += len(arr)
    if not total:
        return HotKeyReport(0, None, 0.0, None)
    top_key, top_count = max(counts.items(), key=lambda kv: kv[1])
    share = top_count / total
    if share < hot_share_threshold:
        return HotKeyReport(total, str(top_key), round(share, 4), None)
    salts = int(min(64, max(2, np.ceil(share * num_partitions))))
    return HotKeyReport(total, str(top_key), round(share, 4), salts)
