"""gc_log (WAL archival): fully-applied log files are trimmed once no
retained epoch can need their LSN range, and never before."""

from __future__ import annotations

import os

from tartare_ray.gen import GenConfig, generate_log
from tartare_ray.pipelines.cdc import CdcEngine, EngineConfig
from tartare_ray.state.manifest import gc_epochs, gc_log, list_committed_epochs


def _log_files(log_dir: str) -> list[str]:
    return sorted(n for n in os.listdir(log_dir) if n.endswith(".parquet"))


def _make(tmp_path, mode: str):
    res = generate_log(
        str(tmp_path / "log"),
        GenConfig(n_events=6000, n_docs=400, events_per_file=2000),
    )
    log = os.path.dirname(res.files[0])
    eng = CdcEngine(
        log,
        str(tmp_path / f"t-{mode}"),
        EngineConfig(num_partitions=4, write_mode=mode, epoch_max_files=1),
    )
    eng.replay()
    return res, log, eng


def test_log_gc_no_op_while_epochs_retained(ray_session, tmp_path):
    """cow epochs re-derive their feed from the log: while every epoch
    is retained, nothing below epoch 1's range may go."""
    _, log, eng = _make(tmp_path, "cow")
    before = _log_files(log)
    assert gc_log(eng.table_root, log) == 0
    assert _log_files(log) == before


def test_log_gc_trims_below_oldest_cow_epoch(ray_session, tmp_path):
    import shutil

    # stage 4 files; the live log starts with the first 3
    staging = str(tmp_path / "staging")
    res = generate_log(
        staging, GenConfig(n_events=8000, n_docs=400, events_per_file=2000)
    )
    log = str(tmp_path / "log")
    os.makedirs(log)
    for f in res.files[:3]:
        shutil.copy(f, log)
    eng = CdcEngine(
        log,
        str(tmp_path / "t"),
        EngineConfig(num_partitions=4, write_mode="cow", epoch_max_files=1),
    )
    eng.replay()
    snap_before = eng.snapshot_table().sort_by("doc_id")
    gc_epochs(eng.table_root, keep_last=1)
    head = list_committed_epochs(eng.table_root)
    assert len(head) == 1
    removed = gc_log(eng.table_root, log)
    # head epoch applied only the 3rd file's range
    assert removed == 2
    # committed state is untouched and replay stays a no-op
    assert eng.snapshot_table().sort_by("doc_id").to_pylist() == snap_before.to_pylist()
    assert eng.replay().epoch == head[0]
    # the head epoch's change feed still re-derives from the kept file
    assert eng.changes_dataset(head[0]).count() > 0
    # the tail keeps working: new events extend the trimmed log
    shutil.copy(res.files[3], log)
    m = eng.replay()
    assert m.epoch == head[0] + 1 and m.watermark_lsn == res.max_lsn


def test_log_gc_delta_epochs_free_the_whole_log(ray_session, tmp_path):
    """Delta-mode epochs serve their feed from delta files, so even
    with every epoch retained the log is archivable up to the
    watermark."""
    _, log, eng = _make(tmp_path, "delta")
    assert len(list_committed_epochs(eng.table_root)) == 3
    removed = gc_log(eng.table_root, log)
    assert removed == 3
    # feeds still served (delta-direct), replay still a no-op
    for e in list_committed_epochs(eng.table_root):
        assert eng.changes_dataset(e).count() > 0
    assert eng.replay() is not None


def test_log_gc_respects_consumer_pin_on_cow(ray_session, tmp_path):
    """A lagging consumer pins old cow epochs via gc_epochs, and the
    retained manifests in turn pin the log."""
    _, log, eng = _make(tmp_path, "cow")
    eng.subscribe("laggard")
    gc_epochs(eng.table_root, keep_last=1)  # consumer floor keeps all
    assert gc_log(eng.table_root, log) == 0
    # consumer catches up -> epochs collapse -> log trims
    for e, _feed in eng.consume("laggard"):
        eng.ack_changes("laggard", e)
    gc_epochs(eng.table_root, keep_last=1)
    assert gc_log(eng.table_root, log) == 2
