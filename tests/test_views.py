"""Incremental aggregate view == direct aggregate over the snapshot,
at every epoch, under inserts/updates/deletes and schema evolution."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from tartare_ray.gen import GenConfig, generate_log
from tartare_ray.pipelines.cdc import CdcEngine, EngineConfig
from tartare_ray.pipelines.views import IncrementalAggView


def direct_agg(snap: pa.Table, group_col: str, sum_col: str) -> dict:
    g = snap.group_by(group_col).aggregate([([sum_col], "sum"), ([group_col], "count")])
    # column names vary by pyarrow version; map by content
    out = {}
    for row in g.to_pylist():
        k = row[group_col]
        out[str(k)] = [
            int(row[f"{group_col}_count"]),
            float(row[f"{sum_col}_sum"]),
        ]
    return out


@pytest.mark.parametrize("mode", ["cow", "delta"])
@pytest.mark.slow
def test_view_tracks_snapshot_every_epoch(tmp_path, ray_session, mode):
    res = generate_log(
        str(tmp_path / "log"),
        GenConfig(n_events=5000, n_docs=400, events_per_file=1000, widen_frac=0.6, add_col_frac=0.8),
    )
    eng = CdcEngine(
        os.path.dirname(res.files[0]),
        str(tmp_path / "table"),
        EngineConfig(num_partitions=4, epoch_max_files=1, write_mode=mode),
    )
    view = IncrementalAggView(eng, "by_source", "source", "n_tok")
    while eng.run_epoch() is not None:
        pass
    state = view.update_to()
    snap = eng.snapshot_table()
    expect = direct_agg(snap, "source", "n_tok")
    assert set(state) == set(expect)
    for k in expect:
        assert state[k][0] == expect[k][0], (k, state[k], expect[k])
        assert abs(state[k][1] - expect[k][1]) < 1e-6, k
    # intermediate epochs were persisted and each matches its snapshot
    for e in (1, 3):
        ve = IncrementalAggView(eng, "by_source", "source", "n_tok")
        se = ve.update_to(e)
        exp_e = direct_agg(eng.snapshot_table(epoch=e), "source", "n_tok")
        assert {k: v[0] for k, v in se.items()} == {k: v[0] for k, v in exp_e.items()}


def test_view_resumes_from_persisted_state(tmp_path, ray_session):
    res = generate_log(
        str(tmp_path / "log"), GenConfig(n_events=3000, n_docs=300, events_per_file=1000)
    )
    eng = CdcEngine(
        os.path.dirname(res.files[0]),
        str(tmp_path / "table"),
        EngineConfig(num_partitions=4, epoch_max_files=1),
    )
    eng.run_epoch()
    v1 = IncrementalAggView(eng, "v", "source", "n_tok")
    v1.update_to(1)
    eng.run_epoch()
    eng.run_epoch()
    # a fresh maintainer resumes from e1's persisted file, folding only e2+e3
    v2 = IncrementalAggView(eng, "v", "source", "n_tok")
    state = v2.update_to()
    expect = direct_agg(eng.snapshot_table(), "source", "n_tok")
    assert {k: v[0] for k, v in state.items()} == {k: v[0] for k, v in expect.items()}
    assert os.path.exists(os.path.join(eng.table_root, "_views", "v", "e000003.json"))
