"""Split-tolerant hash-exchange path (EngineConfig.exchange="hash",
SURVEY.md §8.1): the epoch's all-to-all becomes a HASH_SHUFFLE
repartition consumed by SplitApplier tasks.  Correctness must hold
when Ray splits one partition's rows across several blocks — each
split writes an independent same-epoch delta file and the read-side
fold resolves conflicts by LSN."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tartare_ray.gen import GenConfig, generate_log
from tartare_ray.oracle import replay_oracle
from tartare_ray.pipelines.cdc import CdcEngine, EngineConfig


def _assert_table_equals(actual: pa.Table, expected: pa.Table):
    assert actual.num_rows == expected.num_rows
    assert actual.schema.names == expected.schema.names
    for col in expected.schema.names:
        assert actual[col].to_pylist() == expected[col].to_pylist(), col


@pytest.fixture()
def gen_dir(tmp_path):
    log = str(tmp_path / "log")
    res = generate_log(
        log,
        GenConfig(
            n_events=60_000,
            n_docs=5_000,
            events_per_file=15_000,
            widen_frac=0.5,
            add_col_frac=0.75,
            zipf_s=1.3,
        ),
    )
    return log, res


def test_hash_exchange_replay_matches_oracle(ray_session, gen_dir, tmp_path):
    log, res = gen_dir
    eng = CdcEngine(
        log,
        str(tmp_path / "table"),
        EngineConfig(
            num_partitions=8, write_mode="delta", exchange="hash", epoch_max_files=2
        ),
    )
    eng.replay()
    _assert_table_equals(eng.snapshot_table(), replay_oracle(res.files))


@pytest.mark.slow
def test_hash_exchange_with_late_materialization_matches_oracle(
    ray_session, gen_dir, tmp_path
):
    """The flagship bench combination (BASELINE.md): phase-1 winner
    envelope prunes the shuffle to winners only, hash exchange moves
    them sort-free, SplitApplier writes deltas.  Must equal the oracle
    exactly across multi-epoch replay."""
    log, res = gen_dir
    eng = CdcEngine(
        log,
        str(tmp_path / "table"),
        EngineConfig(
            num_partitions=8,
            write_mode="delta",
            exchange="hash",
            epoch_max_files=2,
            late_materialization=True,
            late_mat_max_ratio=1.01,  # force the two-phase path
        ),
    )
    eng.replay()
    _assert_table_equals(eng.snapshot_table(), replay_oracle(res.files))


def test_split_applier_same_epoch_splits_fold_by_lsn(ray_session, tmp_path):
    """The machinery a block split exercises, tested directly (Ray
    2.49's hash shuffle happens to emit one block per bucket, so a
    pipeline-level split can't be forced): one part's epoch rows
    arrive at SplitApplier in two separate calls with interleaved
    LSNs for the same doc_ids; each call writes its own delta file;
    merge_chain folds base + both splits to the per-doc max-LSN row."""
    from tartare_ray.schema import BASE_SCHEMA
    from tartare_ray.stages.apply import SplitApplier
    from tartare_ray.stages.compact import merge_chain
    from tartare_ray.stages.kernels import key_hash

    root = str(tmp_path / "table")
    os.makedirs(root, exist_ok=True)

    def change_batch(rows):
        # rows: (lsn, op, doc_id, tokens)
        did = pa.array([r[2] for r in rows])
        return pa.table(
            {
                "op": pa.array([r[1] for r in rows]),
                "lsn": pa.array([r[0] for r in rows], pa.int64()),
                "doc_id": did,
                "tokens": pa.array(
                    [r[3] for r in rows], pa.list_(pa.int32())
                ),
                "n_tok": pa.array(
                    [len(r[3]) if r[3] is not None else None for r in rows],
                    pa.int32(),
                ),
                "source": pa.array(["s"] * len(rows)),
                "part": pa.array([0] * len(rows), pa.int32()),
                "doc_hash": pa.array(key_hash(did).view(np.int64)),
            }
        )

    applier = SplitApplier(root, epoch=2, snapshot_schema=BASE_SCHEMA)
    # split 1 carries the LOSING newer-doc rows for d1, winning for d2;
    # split 2 the reverse — chain position must NOT decide the fold
    l1 = applier(change_batch([(10, "U", "d1", [1]), (41, "U", "d2", [2, 2])]))
    l2 = applier(change_batch([(40, "U", "d1", [9, 9]), (11, "D", "d2", None)]))
    assert l1["kind"].to_pylist() == ["delta"] and l2["kind"].to_pylist() == ["delta"]
    f1, f2 = l1["file"].to_pylist()[0], l2["file"].to_pylist()[0]
    assert f1 != f2  # content-derived split ids cannot collide
    base = pa.table(
        {
            "doc_id": pa.array(["d1", "d2", "d3"]),
            "tokens": pa.array([[7], [8], [3]], pa.list_(pa.int32())),
            "n_tok": pa.array([1, 1, 1], pa.int32()),
            "source": pa.array(["s", "s", "s"]),
        }
    )
    merged = merge_chain(
        [base, pq.read_table(os.path.join(root, f1)), pq.read_table(os.path.join(root, f2))],
        BASE_SCHEMA,
    )
    state = {r["doc_id"]: r["tokens"] for r in merged.to_pylist()}
    # d1: lsn 40 [9,9] beats lsn 10 [1]; d2: lsn 41 U beats lsn 11 D
    # (chain position says otherwise on both — LSN must decide);
    # d3: base only.
    assert state == {"d1": [9, 9], "d2": [2, 2], "d3": [3]}


def test_split_applier_retry_writes_identical_file(ray_session, tmp_path):
    """A retried task (same batch) rewrites the SAME file name with the
    same bytes — the exactly-once argument for split mode."""
    from tartare_ray.schema import BASE_SCHEMA
    from tartare_ray.stages.apply import SplitApplier
    from tartare_ray.stages.kernels import key_hash

    root = str(tmp_path / "table")
    did = pa.array(["a", "b"])
    batch = pa.table(
        {
            "op": pa.array(["U", "U"]),
            "lsn": pa.array([5, 6], pa.int64()),
            "doc_id": did,
            "tokens": pa.array([[1], [2]], pa.list_(pa.int32())),
            "n_tok": pa.array([1, 1], pa.int32()),
            "source": pa.array(["s", "s"]),
            "part": pa.array([0, 0], pa.int32()),
            "doc_hash": pa.array(key_hash(did).view(np.int64)),
        }
    )
    a1 = SplitApplier(root, epoch=1, snapshot_schema=BASE_SCHEMA)
    f1 = a1(batch)["file"].to_pylist()[0]
    bytes1 = open(os.path.join(root, f1), "rb").read()
    a2 = SplitApplier(root, epoch=1, snapshot_schema=BASE_SCHEMA)
    f2 = a2(batch)["file"].to_pylist()[0]
    assert f1 == f2
    assert open(os.path.join(root, f2), "rb").read() == bytes1


@pytest.mark.slow
def test_hash_exchange_triggers_compaction(ray_session, gen_dir, tmp_path):
    """Chains past compact_chain_len are folded by a post-commit
    compaction pass (split mode never compacts inline)."""
    log, res = gen_dir
    eng = CdcEngine(
        log,
        str(tmp_path / "table"),
        EngineConfig(
            num_partitions=8,
            write_mode="delta",
            exchange="hash",
            epoch_max_files=1,
            compact_chain_len=3,
        ),
    )
    m = eng.replay()
    from collections import Counter

    per_p = Counter(pl.p for pl in m.partitions)
    assert max(per_p.values()) < 3 + 2  # chains kept bounded
    _assert_table_equals(eng.snapshot_table(), replay_oracle(res.files))


@pytest.mark.slow
def test_changes_dataset_split_epoch_unique_winners(ray_session, gen_dir, tmp_path):
    """A split epoch's change feed must still emit ≤1 winner per
    doc_id even when a part's winners span several delta files."""
    import ray.data

    log, res = gen_dir
    ctx = ray.data.DataContext.get_current()
    prev = ctx.target_max_block_size
    ctx.target_max_block_size = 64 << 10
    try:
        eng = CdcEngine(
            log,
            str(tmp_path / "table"),
            EngineConfig(
                num_partitions=4,
                write_mode="delta",
                exchange="hash",
                compact_chain_len=1000,
            ),
        )
        m = eng.replay()
        feed = eng.changes_dataset(m.epoch)
        ids = []
        for b in feed.iter_batches(batch_format="pyarrow"):
            ids.append(b["doc_id"].to_numpy(zero_copy_only=False))
    finally:
        ctx.target_max_block_size = prev
    allids = np.concatenate(ids)
    assert len(allids) == len(np.unique(allids))
    # feed winners == latest event per doc in the epoch's LSN range
    lo = -1
    hi = m.watermark_lsn
    latest: dict[str, int] = {}
    for f in res.files:
        t = pq.read_table(f, columns=["lsn", "doc_id"])
        for lsn, did in zip(t["lsn"].to_pylist(), t["doc_id"].to_pylist()):
            if lo < lsn <= hi and (did not in latest or latest[did] < lsn):
                latest[did] = lsn
    assert len(allids) == len(latest)


def test_hash_exchange_idempotent_rereplay(ray_session, gen_dir, tmp_path):
    """Replaying an already-committed table is a no-op (watermark
    skip), and a second engine over the same log converges to the
    same state."""
    log, res = gen_dir
    root = str(tmp_path / "table")
    cfg = EngineConfig(num_partitions=8, write_mode="delta", exchange="hash")
    eng = CdcEngine(log, root, cfg)
    m1 = eng.replay()
    snap1 = eng.snapshot_table()
    m2 = eng.run_epoch()
    assert m2 is None  # log exhausted
    _assert_table_equals(eng.snapshot_table(), snap1)


def test_envelope_prefetch_hits_and_matches_oracle(ray_session, gen_dir, tmp_path):
    """Epoch pipelining: with prefetch_envelope on (default), epochs
    after the first consume the background-computed winner set
    (phases.envelope_prefetched true) and the final table still equals
    the oracle exactly."""
    import json
    import os

    log, res = gen_dir
    eng = CdcEngine(
        log,
        str(tmp_path / "table"),
        EngineConfig(
            num_partitions=8,
            write_mode="delta",
            exchange="hash",
            epoch_max_files=2,
            late_materialization=True,
            late_mat_max_ratio=1.01,
        ),
    )
    m = eng.replay()
    assert m.epoch >= 2
    _assert_table_equals(eng.snapshot_table(), replay_oracle(res.files))
    flags = []
    for e in range(1, m.epoch + 1):
        p = os.path.join(str(tmp_path / "table"), "_metrics", f"e{e:06d}.json")
        flags.append(json.load(open(p))["phases"].get("envelope_prefetched"))
    assert flags[0] is False  # nothing to prefetch before epoch 1
    assert all(flags[1:]), flags  # every later epoch hit the prefetch


def test_envelope_prefetch_miss_on_grown_log(ray_session, tmp_path):
    """Tail mode: files arriving AFTER epoch E's prefetch was planned
    change epoch E+1's file set — the stale prefetch must be discarded
    (miss) and the epoch recomputed inline, still matching the oracle."""
    import json
    import os
    import shutil

    staging = str(tmp_path / "staging")
    res = generate_log(
        staging, GenConfig(n_events=4000, n_docs=300, events_per_file=1000)
    )
    live = str(tmp_path / "live")
    os.makedirs(live)
    shutil.copy(res.files[0], live)
    shutil.copy(res.files[1], live)
    eng = CdcEngine(
        live,
        str(tmp_path / "table"),
        EngineConfig(
            num_partitions=4,
            write_mode="delta",
            exchange="hash",
            epoch_max_files=2,
            late_materialization=True,
            late_mat_max_ratio=1.01,
        ),
    )
    eng.run_epoch()  # epoch 1 over files 0-1; prefetch planned = EMPTY rest
    # two more files arrive — epoch 2's real plan differs from anything
    # the prefetch could have seen
    shutil.copy(res.files[2], live)
    shutil.copy(res.files[3], live)
    m = eng.run_epoch()
    assert m is not None and m.epoch == 2
    p = os.path.join(str(tmp_path / "table"), "_metrics", "e000002.json")
    assert json.load(open(p))["phases"]["envelope_prefetched"] is False
    _assert_table_equals(eng.snapshot_table(), replay_oracle(res.files))


def test_hash_path_crash_before_commit_is_exactly_once(ray_session, gen_dir, tmp_path):
    """Flagship-config variant of the two-phase crash test: kill after
    the SplitApplier wrote its split delta files but before the
    manifest/CURRENT swap.  Re-run must converge to the oracle, any
    orphaned split files from the crashed attempt must never be
    referenced by a committed manifest, and gc_epochs must reclaim
    them."""
    import pytest

    from tartare_ray.state.manifest import gc_epochs, load_current, load_epoch

    log, res = gen_dir
    root = str(tmp_path / "table")
    cfg = EngineConfig(
        num_partitions=8,
        write_mode="delta",
        exchange="hash",
        epoch_max_files=2,
        late_materialization=True,
        late_mat_max_ratio=1.01,
    )

    class CrashingEngine(CdcEngine):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.crashed = False

        def _commit(self, m):
            if m.epoch == 2 and not self.crashed:
                self.crashed = True
                raise RuntimeError("injected crash before CURRENT swap")
            super()._commit(m)

    eng = CrashingEngine(log, root, cfg)
    with pytest.raises(RuntimeError, match="injected crash"):
        eng.replay()
    assert load_current(root).epoch == 1
    on_disk_after_crash = set(os.listdir(os.path.join(root, "data")))

    final = CdcEngine(log, root, cfg).replay()
    _assert_table_equals(CdcEngine(log, root, cfg).snapshot_table(), replay_oracle(res.files))

    referenced = set()
    for e in range(1, final.epoch + 1):
        m = load_epoch(root, e)
        if m is not None:
            referenced |= {os.path.basename(pl.file) for pl in m.partitions}
    orphans = {
        f for f in on_disk_after_crash if f.endswith(".parquet") and f not in referenced
    }
    # whether retry block-splitting reproduced the same names or not,
    # nothing unreferenced may survive a gc pass
    gc_epochs(root, keep_last=final.epoch)
    left = set(os.listdir(os.path.join(root, "data")))
    assert not (orphans & left), orphans & left
    _assert_table_equals(CdcEngine(log, root, cfg).snapshot_table(), replay_oracle(res.files))
