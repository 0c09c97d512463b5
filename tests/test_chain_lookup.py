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
