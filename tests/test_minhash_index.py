"""Incrementally-maintained MinHash near-dup index
(pipelines/minhash_index.py): feed-driven signature deltas, planted
near-dup detection, incremental updates across epochs, and equality
with direct signature computation over the snapshot."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import pytest

from tartare_ray.pipelines.cdc import CdcEngine, EngineConfig
from tartare_ray.pipelines.minhash_index import MinHashIndex, token_minhash_batch

from test_dedup_index import _collect, _write_events


def _pairs(ds):
    df = _collect(ds)
    if len(df) == 0:
        return set()
    return {tuple(sorted((a, b))) for a, b in zip(df["doc_a"], df["doc_b"])}


@pytest.fixture()
def engine(ray_session, tmp_path):
    rng = np.random.default_rng(11)
    base = rng.integers(0, 50000, 60).tolist()
    near = list(base)
    near[30] = 7  # one token changed out of 60
    rows = [
        (1, "I", "dup_a", base),
        (2, "I", "dup_b", list(base)),
        (3, "I", "near_c", near),
        (4, "I", "other_d", rng.integers(0, 50000, 60).tolist()),
        (5, "I", "other_e", rng.integers(0, 50000, 60).tolist()),
    ]
    log = str(tmp_path / "log")
    _write_events(f"{log}/events-000000.parquet", rows)
    eng = CdcEngine(
        log, str(tmp_path / "tbl"), EngineConfig(num_partitions=2, epoch_max_files=1)
    )
    eng.replay()
    return eng


def test_minhash_index_finds_planted_near_dups(engine):
    idx = MinHashIndex(engine)
    assert idx.update() == [1]
    live = _collect(idx.live_signatures())
    assert sorted(live["doc_id"]) == ["dup_a", "dup_b", "near_c", "other_d", "other_e"]
    pairs = _pairs(idx.near_dup_pairs(threshold=0.5))
    assert ("dup_a", "dup_b") in pairs
    assert ("dup_a", "near_c") in pairs or ("dup_b", "near_c") in pairs
    for a, b in pairs:  # unrelated docs never pair
        assert not a.startswith("other") and not b.startswith("other"), (a, b)


def test_minhash_index_is_incremental_and_tracks_deletes(engine, tmp_path):
    idx = MinHashIndex(engine)
    idx.update()
    # epoch 2: delete one twin, move the near doc to a new sequence
    live0 = _collect(idx.live_signatures()).set_index("doc_id")["sig"].to_dict()
    base_sig = live0["dup_a"]
    _write_events(
        f"{tmp_path}/log/events-000001.parquet",
        [(6, "D", "dup_b", None), (7, "U", "near_c", [1, 2, 3])],
    )
    engine.replay()
    assert idx.update() == [2]
    live = _collect(idx.live_signatures())
    assert sorted(live["doc_id"]) == ["dup_a", "near_c", "other_d", "other_e"]
    # unchanged docs keep byte-identical signatures (no recompute drift)
    m = live.set_index("doc_id")["sig"].to_dict()
    assert m["dup_a"] == base_sig
    assert m["near_c"] != live0["near_c"]
    # re-running update is a no-op (cursor acked)
    assert idx.update() == []


def test_live_signatures_match_direct_snapshot_computation(engine):
    idx = MinHashIndex(engine)
    idx.update()
    live = _collect(idx.live_signatures()).sort_values("doc_id", ignore_index=True)
    snap = pa.concat_tables(
        engine.snapshot_dataset(columns=["doc_id", "tokens"]).iter_batches(
            batch_format="pyarrow"
        )
    )
    direct = token_minhash_batch(snap).to_pandas().sort_values("doc_id", ignore_index=True)
    assert live["doc_id"].tolist() == direct["doc_id"].tolist()
    assert [bytes(x) for x in live["sig"]] == [bytes(x) for x in direct["sig"]]


def test_near_dup_losers_are_cluster_non_survivors(engine):
    idx = MinHashIndex(engine)
    idx.update()
    losers = set(_collect(idx.near_dup_losers(threshold=0.5))["doc_id"])
    # dup_a/dup_b/near_c form one transitive cluster → survivor dup_a
    assert losers == {"dup_b", "near_c"}


def test_export_drops_near_dup_losers(engine, tmp_path):
    """Near-dedup-aware export packs exactly the snapshot minus the
    near-dup cluster losers (same per-partition assertion style as
    test_export_drop_duplicates)."""
    import pyarrow.compute as pc

    from tartare_ray.pipelines.export import export_training_shards
    from tartare_ray.stages.kernels import hash_partition_ids

    SEQ = 32
    out = str(tmp_path / "shards_near")
    man = export_training_shards(engine, out, seq_len=SEQ, eos=0, near_dup_threshold=0.5)
    assert man["drop_fp"]
    snap = engine.snapshot_table()
    keep = pa.array(
        [d not in ("dup_b", "near_c") for d in snap["doc_id"].to_pylist()]
    )
    deduped = snap.filter(keep)
    assert len(deduped) == len(snap) - 2
    parts = hash_partition_ids(deduped["doc_id"], 2)
    for s in man["shards"]:
        sub = deduped.filter(pa.array(parts == s["p"]))
        total = int(pc.sum(pc.list_value_length(sub["tokens"])).as_py() or 0) + len(sub)
        assert s["n_seqs"] == total // SEQ, s
