"""Near-duplicate detection stages: MinHash+LSH, SimHash, n-gram
Jaccard verification — the training-data dedup suite.

Reference analogue: tartare's dedup-by-md5-checksum of fetched archives
(`tartare/tasks.py::automatic_update` `[UNVERIFIED — empty checkout,
SURVEY.md §0 / §2A A4]`), generalized from whole-file identity to
content near-duplication.

Shape of every pipeline (see ``pipelines/queries.py``):

    documents ──map_batches(SignatureStage)──▶ (doc_id, sig…)
        ──map_batches(explode bands/blocks)──▶ (bucket, doc_id)
        ──groupby(bucket).map_groups(pairs)──▶ candidate (doc_a, doc_b)
        ──groupby(pair).first──▶ distinct pairs
        ──map_batches(VerifyStage, broadcast signatures)──▶ confirmed

Scale notes (100 TB): the candidate-pair groupby is the only shuffle
and it moves (doc_id, 8-byte bucket) rows, never text.  Verification
broadcasts the signature matrix via ``ray.put`` — fine up to ~10^8 docs
× 64 perms; beyond that, replace the broadcast with a hash-partitioned
signature join on doc_id (same groupby machinery).  Buckets larger
than ``max_bucket`` are skipped and counted (a bucket that collects
thousands of docs is a degenerate band — all-pairs there is O(n²) and
its members are caught by their other bands).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..functions import text as T
from ..functions.hashing import (
    band_keys,
    hamming_distance_u64,
    minhash_signatures,
    shingle_hashes,
    simhash_signatures,
)

SHINGLE_K = 3


class MinHashBandStage:
    """documents → LSH band rows (band, band_key, doc_id).

    Callable class (actor pool): the permutation family and band layout
    are fixed in ``__init__`` once per actor; ``__call__`` is pure
    vectorized numpy per zero-copy Arrow batch.
    """

    def __init__(self, num_perms: int = 64, bands: int = 16, seed: int = 42):
        self.num_perms = num_perms
        self.bands = bands
        self.seed = seed

    def signatures(self, batch: pa.Table) -> np.ndarray:
        wh, offsets = T.word_hash_lists(batch["text"])
        sh, sho = shingle_hashes(wh, offsets, k=SHINGLE_K)
        return minhash_signatures(sh, sho, num_perms=self.num_perms, seed=self.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sig = self.signatures(batch)
        bk = band_keys(sig, bands=self.bands)  # (n_docs, bands)
        n = len(batch)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(self.bands, dtype=np.int32), n)),
                "band_key": pa.array(bk.reshape(-1).view(np.int64)),
                "doc_id": pa.array(np.repeat(doc_ids, self.bands)),
            }
        )


class MinHashSignatureStage(MinHashBandStage):
    """documents → (doc_id, sig list<int64>) — the raw signature rows
    used for broadcast verification / est-Jaccard."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        sig = self.signatures(batch).view(np.int64)
        n, p = sig.shape
        arr = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * p, p, dtype=np.int32)),
            pa.array(sig.reshape(-1)),
        )
        return pa.table({"doc_id": batch["doc_id"], "sig": arr})


class SimHashBlockStage:
    """documents → (block, block_val, doc_id) rows for Hamming-LSH.

    Splitting the 64-bit simhash into ``blocks`` equal blocks
    guarantees (pigeonhole) that any pair within Hamming distance
    ``blocks - 1`` collides on at least one block.
    """

    def __init__(self, blocks: int = 4):
        assert 64 % blocks == 0
        self.blocks = blocks
        self.width = 64 // blocks

    def signatures(self, batch: pa.Table) -> np.ndarray:
        wh, offsets = T.word_hash_lists(batch["text"])
        return simhash_signatures(wh, offsets)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sig = self.signatures(batch)
        n = len(sig)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        shifts = (np.arange(self.blocks, dtype=np.uint64) * np.uint64(self.width))[None, :]
        mask = np.uint64((1 << self.width) - 1)
        vals = ((sig[:, None] >> shifts) & mask).astype(np.int64)
        return pa.table(
            {
                "block": pa.array(np.tile(np.arange(self.blocks, dtype=np.int32), n)),
                "block_val": pa.array(vals.reshape(-1)),
                "doc_id": pa.array(np.repeat(doc_ids, self.blocks)),
            }
        )


class SimHashSignatureStage(SimHashBlockStage):
    def __call__(self, batch: pa.Table) -> pa.Table:
        sig = self.signatures(batch).view(np.int64)
        return pa.table({"doc_id": batch["doc_id"], "sig": pa.array(sig)})


def minhash_bands_from_sigs_batch(batch: pa.Table, bands: int) -> pa.Table:
    """(doc_id, sig list<int64>) → exploded LSH band rows — derived
    from the materialized signature dataset so the text is read and
    hashed exactly ONCE per pipeline."""
    sig_col = batch["sig"]
    if isinstance(sig_col, pa.ChunkedArray):
        sig_col = sig_col.combine_chunks()
    n = len(batch)
    if n == 0:
        return pa.table(
            {
                "band": pa.array([], pa.int32()),
                "band_key": pa.array([], pa.int64()),
                "doc_id": pa.array([], batch["doc_id"].type),
            }
        )
    flat = sig_col.values.to_numpy(zero_copy_only=False).view(np.uint64)
    sig = flat.reshape(n, -1)
    bk = band_keys(sig, bands=bands)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
            "band_key": pa.array(bk.reshape(-1).view(np.int64)),
            "doc_id": pa.array(np.repeat(doc_ids, bands)),
        }
    )


def simhash_blocks_from_sigs_batch(batch: pa.Table, blocks: int) -> pa.Table:
    """(doc_id, sig int64) → exploded Hamming-LSH block rows."""
    width = 64 // blocks
    sig_col = batch["sig"]
    if isinstance(sig_col, pa.ChunkedArray):
        sig_col = sig_col.combine_chunks()
    n = len(batch)
    if n == 0:
        return pa.table(
            {
                "block": pa.array([], pa.int32()),
                "block_val": pa.array([], pa.int64()),
                "doc_id": pa.array([], batch["doc_id"].type),
            }
        )
    sig = sig_col.to_numpy(zero_copy_only=False).view(np.uint64)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    shifts = (np.arange(blocks, dtype=np.uint64) * np.uint64(width))[None, :]
    mask = np.uint64((1 << width) - 1)
    vals = ((sig[:, None] >> shifts) & mask).astype(np.int64)
    return pa.table(
        {
            "block": pa.array(np.tile(np.arange(blocks, dtype=np.int32), n)),
            "block_val": pa.array(vals.reshape(-1)),
            "doc_id": pa.array(np.repeat(doc_ids, blocks)),
        }
    )


def bucket_pairs_group(group: pa.Table, max_bucket: int = 256) -> pa.Table:
    """All (doc_a < doc_b) pairs within one LSH bucket; oversized
    buckets are dropped (degenerate bands — see module docstring)."""
    ids = np.unique(group["doc_id"].to_numpy(zero_copy_only=False))
    n = len(ids)
    if n < 2 or n > max_bucket:
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
        )
    ia, ib = np.triu_indices(n, k=1)
    return pa.table({"doc_a": pa.array(ids[ia]), "doc_b": pa.array(ids[ib])})


class MinHashVerifyStage:
    """Candidate pairs → estimated Jaccard from broadcast signatures.

    ``sig_ref`` is a ``ray.put`` handle to {doc_id: uint64 sig row};
    resolved ONCE per actor in ``__init__`` (the broadcast-small-side
    pattern, SURVEY.md §2A J1)."""

    def __init__(self, sig_ref, threshold: float):
        doc_ids, sig = ray.get(sig_ref)
        self.index = {d: i for i, d in enumerate(doc_ids)}
        self.sig = sig
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_numpy(zero_copy_only=False)
        b = batch["doc_b"].to_numpy(zero_copy_only=False)
        ia = np.fromiter((self.index[x] for x in a), dtype=np.int64, count=len(a))
        ib = np.fromiter((self.index[x] for x in b), dtype=np.int64, count=len(b))
        est = (self.sig[ia] == self.sig[ib]).mean(axis=1)
        keep = est >= self.threshold
        return pa.table(
            {
                "doc_a": pa.array(a[keep]),
                "doc_b": pa.array(b[keep]),
                "est_jaccard": pa.array(np.round(est[keep], 6)),
            }
        )


class SimHashVerifyStage:
    def __init__(self, sig_ref, max_hamming: int):
        doc_ids, sig = ray.get(sig_ref)
        self.index = {d: i for i, d in enumerate(doc_ids)}
        self.sig = sig
        self.max_hamming = max_hamming

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_numpy(zero_copy_only=False)
        b = batch["doc_b"].to_numpy(zero_copy_only=False)
        ia = np.fromiter((self.index[x] for x in a), dtype=np.int64, count=len(a))
        ib = np.fromiter((self.index[x] for x in b), dtype=np.int64, count=len(b))
        ham = hamming_distance_u64(self.sig[ia], self.sig[ib])
        keep = ham <= self.max_hamming
        return pa.table(
            {
                "doc_a": pa.array(a[keep]),
                "doc_b": pa.array(b[keep]),
                "hamming": pa.array(ham[keep].astype(np.int64)),
            }
        )


class JaccardVerifyStage:
    """Candidate pairs → EXACT shingle-set Jaccard, via a broadcast
    {doc_id → sorted unique shingle array} built from the candidate
    docs only (the small side by construction)."""

    def __init__(self, shingles_ref, threshold: float):
        self.shingles: dict = ray.get(shingles_ref)
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_numpy(zero_copy_only=False)
        b = batch["doc_b"].to_numpy(zero_copy_only=False)
        out_a, out_b, out_j = [], [], []
        for x, y in zip(a, b):  # per-PAIR loop (few candidates), set math vectorized
            sx, sy = self.shingles[x], self.shingles[y]
            inter = len(np.intersect1d(sx, sy, assume_unique=True))
            union = len(sx) + len(sy) - inter
            j = inter / union if union else 1.0
            if j >= self.threshold:
                out_a.append(x)
                out_b.append(y)
                out_j.append(round(j, 6))
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )


def doc_shingle_sets(batch: pa.Table) -> dict[int, np.ndarray]:
    """{doc_id: sorted unique shingle hashes} for one Arrow batch."""
    wh, offsets = T.word_hash_lists(batch["text"])
    sh, sho = shingle_hashes(wh, offsets, k=SHINGLE_K)
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    return {
        int(d): np.unique(sh[sho[i] : sho[i + 1]]) for i, d in enumerate(ids)
    }
