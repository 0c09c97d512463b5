"""Storage-backend contract (state/storage.py): the EXACT semantics
the manifest protocol needs, pinned against both the default POSIX
backend and the in-memory conditional-put reference.  A future
object-store backend (S3 conditional writes) must pass this file
unchanged — that is the multi-node deployment story for the state
layer (round-2 verdict item #5)."""

from __future__ import annotations

import threading

import pytest

from tartare_ray.state.lock import ConcurrentWriterError
from tartare_ray.state.storage import MemoryStorage, PosixStorage


@pytest.fixture(params=["posix", "memory"])
def storage(request, tmp_path):
    if request.param == "posix":
        return PosixStorage(str(tmp_path / "root"))
    return MemoryStorage()


def test_write_atomic_roundtrip_and_missing_read(storage):
    with pytest.raises(FileNotFoundError):
        storage.read_text("_manifests/CURRENT")
    assert not storage.exists("_manifests/CURRENT")
    storage.write_atomic("_manifests/CURRENT", "7")
    assert storage.read_text("_manifests/CURRENT") == "7"
    storage.write_atomic("_manifests/CURRENT", "8")  # last-writer-wins republish
    assert storage.read_text("_manifests/CURRENT") == "8"


def test_cas_create_if_absent(storage):
    assert storage.cas("CURRENT", "1", expected=None)
    # second create must fail and change nothing (If-None-Match)
    assert not storage.cas("CURRENT", "99", expected=None)
    assert storage.read_text("CURRENT") == "1"


def test_cas_expected_value_chain(storage):
    storage.write_atomic("CURRENT", "1")
    assert storage.cas("CURRENT", "2", expected="1")  # parent → child
    assert not storage.cas("CURRENT", "3", expected="1")  # stale parent loses
    assert storage.read_text("CURRENT") == "2"
    assert storage.cas("CURRENT", "3", expected="2")
    assert storage.read_text("CURRENT") == "3"


def test_cas_single_winner_under_concurrency(storage):
    """Two writers both building epoch 2 from parent 1: exactly one
    swap wins — the lost-update detection commit_manifest relies on."""
    storage.write_atomic("CURRENT", "1")
    wins = []
    barrier = threading.Barrier(2)

    def writer(tag):
        barrier.wait()
        if storage.cas("CURRENT", f"2-{tag}", expected="1"):
            wins.append(tag)

    ts = [threading.Thread(target=writer, args=(i,)) for i in range(2)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert len(wins) == 1
    assert storage.read_text("CURRENT") == f"2-{wins[0]}"


def test_lease_exclusive_and_reacquirable(storage):
    with storage.lease("_manifests/LOCK"):
        with pytest.raises(ConcurrentWriterError):
            with storage.lease("_manifests/LOCK"):
                pass
    with storage.lease("_manifests/LOCK"):  # released → reacquirable
        pass


def test_list_sorted_non_recursive(storage):
    storage.write_atomic("_manifests/e000002.json", "{}")
    storage.write_atomic("_manifests/e000001.json", "{}")
    storage.write_atomic("_manifests/CURRENT", "2")
    storage.write_atomic("other/x.json", "{}")
    got = storage.list("_manifests")
    assert got == ["CURRENT", "e000001.json", "e000002.json"]
    assert storage.list("nope") == []


def test_delete(storage):
    storage.write_atomic("a/b", "x")
    assert storage.delete("a/b")
    assert not storage.delete("a/b")
    assert not storage.exists("a/b")


def test_commit_manifest_cas_guard(tmp_path):
    """commit_manifest(guard_parent=True) end-to-end on POSIX: the
    child epoch commits once; a conflicting commit from a stale parent
    raises; an idempotent re-commit of the committed epoch passes."""
    import pyarrow as pa

    from tartare_ray.state.manifest import Manifest, commit_manifest, load_current

    root = str(tmp_path / "tbl")
    schema = pa.schema([("doc_id", pa.string())])
    enc = Manifest.encode_schema(schema)

    def mk(epoch, parent):
        return Manifest(
            epoch=epoch,
            parent_epoch=parent,
            watermark_lsn=epoch * 10,
            schema_b64=enc,
            schema_fingerprint="f",
            partitions=[],
        )

    commit_manifest(root, mk(1, None), guard_parent=True)
    assert load_current(root).epoch == 1
    commit_manifest(root, mk(2, 1), guard_parent=True)
    # a second writer that still thinks the parent is 1 and built its
    # own epoch 3 from it must NOT silently overwrite epoch 2
    with pytest.raises(ConcurrentWriterError):
        commit_manifest(root, mk(3, 1), guard_parent=True)  # CURRENT is 2, not 1
    assert load_current(root).epoch == 2
    # ... but re-committing the SAME epoch (crash-retry) is idempotent
    commit_manifest(root, mk(2, 1), guard_parent=True)
    assert load_current(root).epoch == 2
