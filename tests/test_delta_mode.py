"""LSM delta write mode: chain growth, compaction, oracle equality,
resume, schema evolution across deltas."""

from __future__ import annotations

import os

import pytest

from tartare_ray.oracle import replay_oracle
from tartare_ray.pipelines.cdc import CdcEngine, EngineConfig
from tartare_ray.state.manifest import load_current


@pytest.fixture()
def delta_engine(tmp_log, ray_session):
    res, cfg, tmp_path = tmp_log  # 5 files x 1000 events, widen@0.6 add@0.8
    root = str(tmp_path / "table-delta")
    eng = CdcEngine(
        os.path.dirname(res.files[0]),
        root,
        EngineConfig(
            num_partitions=4,
            epoch_max_files=1,  # 5 epochs -> chains form
            write_mode="delta",
            compact_chain_len=3,  # compaction triggers mid-replay
        ),
    )
    return eng, res


def test_delta_replay_matches_oracle(delta_engine):
    eng, res = delta_engine
    m = eng.replay()
    assert m.epoch == 5
    expected = replay_oracle(res.files)
    actual = eng.snapshot_table()
    assert actual.schema.names == expected.schema.names
    assert len(actual) == len(expected)
    for col in actual.schema.names:  # token-array equality included
        assert actual[col].to_pylist() == expected[col].to_pylist(), col


def test_delta_chains_and_compaction(delta_engine):
    eng, res = delta_engine
    m = eng.replay()
    kinds = {}
    for pl in m.partitions:
        kinds.setdefault(pl.p, []).append(pl.kind)
    # compaction (chain_len 3) must have fired: no chain may exceed it
    for p, ks in kinds.items():
        assert len(ks) <= 3, (p, ks)
        assert ks[0] in ("base", "delta")
        # at most one base, and only at the head of the chain
        assert ks.count("base") <= 1
        if "base" in ks:
            assert ks[0] == "base"
    # some delta files should exist on disk after 5 epochs w/ chain 3
    data = os.listdir(os.path.join(eng.table_root, "data"))
    assert any(f.startswith("delta-") for f in data)


def test_delta_snapshot_dataset_merges(delta_engine):
    eng, res = delta_engine
    eng.replay()
    expected = replay_oracle(res.files)
    ds = eng.snapshot_dataset()
    got = ds.to_pandas().sort_values("doc_id", ignore_index=True)
    assert len(got) == len(expected)
    assert got["doc_id"].tolist() == expected["doc_id"].to_pylist()
    assert [list(x) for x in got["tokens"]] == expected["tokens"].to_pylist()


def test_delta_resume_mid_replay(delta_engine):
    eng, res = delta_engine
    for _ in range(2):
        eng.run_epoch()
    mid = load_current(eng.table_root)
    assert mid.epoch == 2
    eng2 = CdcEngine(eng.log_dir, eng.table_root, eng.cfg)  # fresh handle
    m = eng2.replay()
    assert m.epoch == 5
    expected = replay_oracle(res.files)
    actual = eng2.snapshot_table()
    for col in actual.schema.names:
        assert actual[col].to_pylist() == expected[col].to_pylist(), col


def test_delta_rerun_noop(delta_engine):
    eng, res = delta_engine
    m = eng.replay()
    m2 = eng.replay()
    assert m2.epoch == m.epoch and m2.watermark_lsn == m.watermark_lsn
