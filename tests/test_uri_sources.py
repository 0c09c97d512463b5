"""Remote-URI change sources (§2A S1/S2): the log directory may be a
filesystem URI (``file://`` locally; ``s3://`` etc. in production via
the same ``pyarrow.fs`` dispatch).  Tail listing, footer stats, the
full engine replay, and log GC all run against URIs; the dead-letter
requeue (a producer-side append) refuses them loudly."""

from __future__ import annotations

import os

import pytest

from tartare_ray.gen import GenConfig, generate_log
from tartare_ray.oracle import replay_oracle
from tartare_ray.pipelines.cdc import CdcEngine, EngineConfig
from tartare_ray.sources.tail import list_log_files, read_log_schema


@pytest.fixture()
def uri_log(tmp_path):
    d = str(tmp_path / "log")
    res = generate_log(d, GenConfig(n_events=4000, n_docs=300, events_per_file=1000))
    return res, d, "file://" + d


def test_uri_listing_matches_local(uri_log):
    res, local, uri = uri_log
    a = list_log_files(local)
    b = list_log_files(uri)
    assert len(a) == len(b) == 4
    for x, y in zip(a, b):
        assert y.path == "file://" + x.path
        assert (x.min_lsn, x.max_lsn, x.num_rows) == (y.min_lsn, y.max_lsn, y.num_rows)
    assert read_log_schema(b[0].path).names == read_log_schema(a[0].path).names


def test_engine_replays_from_uri_log(uri_log, ray_session, tmp_path):
    res, local, uri = uri_log
    eng = CdcEngine(uri, str(tmp_path / "tbl"), EngineConfig(num_partitions=4))
    m = eng.replay()
    assert m is not None
    exp = replay_oracle(res.files)
    got = eng.snapshot_table()
    assert got["doc_id"].to_pylist() == exp["doc_id"].to_pylist()
    assert got["tokens"].to_pylist() == exp["tokens"].to_pylist()
    with pytest.raises(ValueError, match="POSIX log dir"):
        eng.requeue_quarantine(m.epoch, fix=lambda t: t)


def test_log_gc_removes_uri_files(uri_log, ray_session, tmp_path):
    from tartare_ray.state.manifest import gc_epochs, gc_log

    res, local, uri = uri_log
    root = str(tmp_path / "tbl")
    # one epoch per file so early epochs (and their log ranges) can age out
    eng = CdcEngine(uri, root, EngineConfig(num_partitions=2, epoch_max_files=1))
    eng.replay()
    gc_epochs(root, keep_last=1)
    before = len(os.listdir(local))
    removed = gc_log(root, uri)
    assert removed > 0
    assert len(os.listdir(local)) == before - removed
