"""lookup_keys_in_chain (delta-direct view retraction) == full-chain
merge + filter, and it actually stops early on the chain suffix."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from tartare_ray.stages.compact import lookup_keys_in_chain, merge_chain

SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("source", pa.string()),
        ("n_tok", pa.int64()),
    ]
)


def _write(root: str, name: str, tbl: pa.Table) -> dict:
    path = os.path.join(root, "data", name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(tbl, path)
    return {"file": os.path.join("data", name), "kind": "delta" if "delta" in name else "base"}


@pytest.fixture()
def chain_dir(tmp_path):
    root = str(tmp_path)
    chain = []
    # base (e1): no op/lsn envelope
    chain.append(
        _write(
            root,
            "part-00000-e000001.parquet",
            pa.table(
                {
                    "doc_id": ["a", "b", "c", "d"],
                    "source": ["s0"] * 4,
                    "n_tok": [10, 20, 30, 40],
                }
            ),
        )
    )
    # delta e2: updates a+b, deletes c; LACKS n_tok (pre-evolution file)
    chain.append(
        _write(
            root,
            "delta-00000-e000002-saaaa.parquet",
            pa.table(
                {
                    "doc_id": ["a", "b", "c"],
                    "op": ["U", "U", "D"],
                    "lsn": [101, 102, 103],
                    "source": ["s2", "s2", "s2"],
                }
            ),
        )
    )
    # e3 split across TWO delta files (hash-exchange block split):
    # doc a appears in both with disjoint LSNs — 202 must win
    chain.append(
        _write(
            root,
            "delta-00000-e000003-s0001.parquet",
            pa.table(
                {
                    "doc_id": ["a", "e"],
                    "op": ["U", "I"],
                    "lsn": [201, 203],
                    "source": ["s3", "s3"],
                    "n_tok": [11, 50],
                }
            ),
        )
    )
    chain.append(
        _write(
            root,
            "delta-00000-e000003-s0002.parquet",
            pa.table(
                {
                    "doc_id": ["a"],
                    "op": ["U"],
                    "lsn": [202],
                    "source": ["s3b"],
                    "n_tok": [12],
                }
            ),
        )
    )
    return root, chain


def _oracle(root, chain, keys, cols):
    tables = [pq.read_table(os.path.join(root, e["file"])) for e in chain]
    merged = merge_chain(tables, SCHEMA)
    hit = merged.filter(pc.is_in(merged["doc_id"], value_set=pa.array(keys)))
    return hit.select(cols).sort_by("doc_id")


@pytest.mark.parametrize(
    "keys",
    [
        ["a"],  # winner in split epoch (max LSN of the two splits)
        ["b"],  # winner in mid-chain delta, n_tok nulled (evolution)
        ["c"],  # tombstoned — absent from result
        ["d"],  # only in base
        ["zz"],  # never existed
        ["a", "b", "c", "d", "e", "zz"],  # all at once
    ],
)
def test_lookup_matches_full_merge(chain_dir, keys):
    root, chain = chain_dir
    cols = ["doc_id", "source", "n_tok"]
    got = lookup_keys_in_chain(
        root, chain, SCHEMA, pa.array(keys), cols
    ).sort_by("doc_id")
    want = _oracle(root, chain, keys, cols)
    assert got.to_pylist() == want.to_pylist()


def test_lookup_split_epoch_max_lsn_wins(chain_dir):
    root, chain = chain_dir
    got = lookup_keys_in_chain(
        root, chain, SCHEMA, pa.array(["a"]), ["doc_id", "source", "n_tok"]
    )
    assert got.to_pylist() == [{"doc_id": "a", "source": "s3b", "n_tok": 12}]


def test_lookup_stops_before_base(chain_dir):
    """Keys that resolve in the newest epoch never open older files —
    proven by deleting the base and mid-chain delta from disk."""
    root, chain = chain_dir
    os.remove(os.path.join(root, chain[0]["file"]))  # base
    os.remove(os.path.join(root, chain[1]["file"]))  # e2 delta
    got = lookup_keys_in_chain(
        root, chain, SCHEMA, pa.array(["a", "e"]), ["doc_id", "source", "n_tok"]
    ).sort_by("doc_id")
    assert got["doc_id"].to_pylist() == ["a", "e"]
    # ...and a key that NEEDS the deleted base does fail loudly
    with pytest.raises(FileNotFoundError):
        lookup_keys_in_chain(
            root, chain, SCHEMA, pa.array(["d"]), ["doc_id", "source", "n_tok"]
        )


def test_lookup_column_pruning(chain_dir):
    """Requesting fewer columns returns exactly those columns."""
    root, chain = chain_dir
    got = lookup_keys_in_chain(root, chain, SCHEMA, pa.array(["d"]), ["doc_id", "n_tok"])
    assert got.schema.names == ["doc_id", "n_tok"]
    assert got.to_pylist() == [{"doc_id": "d", "n_tok": 40}]


def _hash_clustered_table(n: int) -> pa.Table:
    """n docs in the engine's on-disk layout: hash-sorted with the
    int64 doc_hash cluster column stored (post-round-2 file format)."""
    import numpy as np

    from tartare_ray.stages.kernels import key_hash

    ids = pa.array([f"doc-{i:06d}" for i in range(n)])
    h = key_hash(ids).view(np.int64)
    order = np.argsort(h, kind="stable")
    return pa.table(
        {
            "doc_id": ids.take(pa.array(order)),
            "source": pa.array(["s"] * n),
            "n_tok": pa.array(range(n), pa.int64()).take(pa.array(order)),
            "doc_hash": pa.array(h[order]),
        }
    )


def test_read_pruned_skips_row_groups(tmp_path):
    """Hash-clustered files resolve point reads from ~1 row group per
    key: _read_pruned must read a strict subset of a 10-row-group file
    and still return every requested key."""
    import numpy as np

    from tartare_ray.stages.compact import _read_pruned
    from tartare_ray.stages.kernels import key_hash

    tbl = _hash_clustered_table(10_000)
    path = str(tmp_path / "part.parquet")
    pq.write_table(tbl, path, row_group_size=1000)
    pf = pq.ParquetFile(path)
    assert pf.metadata.num_row_groups == 10

    keys = pa.array(["doc-000007", "doc-004242", "doc-009999"])
    khs = np.sort(key_hash(keys).view(np.int64))
    got = _read_pruned(pf, ["doc_id", "n_tok"], khs)
    # pruning: at most one row group per key was read
    assert len(got) <= 3000
    hit = got.filter(pc.is_in(got["doc_id"], value_set=keys))
    assert sorted(hit["doc_id"].to_pylist()) == sorted(keys.to_pylist())
    assert sorted(hit["n_tok"].to_pylist()) == [7, 4242, 9999]


def test_read_pruned_no_match_reads_nothing(tmp_path):
    import numpy as np

    from tartare_ray.stages.compact import _read_pruned

    tbl = _hash_clustered_table(1000)
    path = str(tmp_path / "part.parquet")
    pq.write_table(tbl, path, row_group_size=100)
    pf = pq.ParquetFile(path)
    # a hash below every stored value intersects no row group
    lo = pc.min(tbl["doc_hash"]).as_py() - 1
    got = _read_pruned(pf, ["doc_id", "n_tok"], np.array([lo], dtype=np.int64))
    assert len(got) == 0
    assert got.schema.names == ["doc_id", "n_tok"]


def test_lookup_mixed_format_chain(tmp_path):
    """A chain mixing pre-round-2 files (no doc_hash) and hash-
    clustered files resolves identically: the stored column is purely
    a pruning aid and never leaks into results."""
    root = str(tmp_path)
    base = _hash_clustered_table(500)  # new format, with doc_hash
    chain = [_write(root, "part-00000-e000001.parquet", base)]
    # old-format delta: no doc_hash column
    chain.append(
        _write(
            root,
            "delta-00000-e000002-sold.parquet",
            pa.table(
                {
                    "doc_id": ["doc-000007", "doc-000400"],
                    "op": ["U", "D"],
                    "lsn": [11, 12],
                    "source": ["s2", "s2"],
                    "n_tok": [70, 0],
                }
            ),
        )
    )
    keys = pa.array(["doc-000007", "doc-000400", "doc-000123"])
    got = lookup_keys_in_chain(
        root, chain, SCHEMA, keys, ["doc_id", "source", "n_tok"]
    ).sort_by("doc_id")
    assert got.to_pylist() == [
        {"doc_id": "doc-000007", "source": "s2", "n_tok": 70},
        {"doc_id": "doc-000123", "source": "s", "n_tok": 123},
    ]
    assert "doc_hash" not in got.schema.names


def test_lookup_without_doc_id_in_projection(chain_dir):
    """doc_id is an internal requirement, not a caller contract: a
    projection omitting it must work and not leak the key column."""
    root, chain = chain_dir
    got = lookup_keys_in_chain(root, chain, SCHEMA, pa.array(["d"]), ["n_tok"])
    assert got.schema.names == ["n_tok"]
    assert got.to_pylist() == [{"n_tok": 40}]
    empty = lookup_keys_in_chain(root, chain, SCHEMA, pa.array([]), ["n_tok"])
    assert empty.schema.names == ["n_tok"] and len(empty) == 0
