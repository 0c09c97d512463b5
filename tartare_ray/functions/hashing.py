"""Deterministic vectorized hashing primitives.

Everything here is numpy-vectorized uint64 arithmetic (wraparound mod
2^64 is intentional — it *is* the hash space); nothing iterates Python
rows.  Determinism across processes/runs/machines is load-bearing:
partition routing, dedup fingerprints and minhash signatures must not
depend on PYTHONHASHSEED or library versions, so the only string
hasher used is ``pandas.util.hash_array`` with a pinned key (stable,
documented, used the same way for partition routing in
``stages/kernels.py``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# 16-byte keys as required by pandas.util.hash_array.
WORD_HASH_KEY = "tartare_ray.w.v1"
TEXT_HASH_KEY = "tartare_ray.t.v1"

# splitmix64-style odd multipliers for positional mixing.
_MIX = np.uint64(0x9E3779B97F4A7C15)
_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)
_C3 = np.uint64(0xFF51AFD7ED558CCD)


def hash_strings(values: np.ndarray | pa.Array | pa.ChunkedArray, key: str = TEXT_HASH_KEY) -> np.ndarray:
    """uint64 hash of a string column; stable across processes."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_numpy(zero_copy_only=False)
    return pd.util.hash_array(np.asarray(values, dtype=object), hash_key=key, categorize=False)


def mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — decorrelates derived hashes."""
    h = h.astype(np.uint64, copy=True)
    h ^= h >> np.uint64(30)
    h *= _C1
    h ^= h >> np.uint64(27)
    h *= _C2
    h ^= h >> np.uint64(31)
    return h


def shingle_hashes(
    word_hashes: np.ndarray, offsets: np.ndarray, k: int = 3
) -> tuple[np.ndarray, np.ndarray]:
    """Word-``k``-gram shingle hashes per document, fully vectorized.

    ``word_hashes``: uint64 hashes of the flattened word stream;
    ``offsets``: int64 array of n_docs+1 list offsets into it.
    Returns ``(sh_values, sh_offsets)`` in the same flattened-list
    layout.  A document with fewer than ``k`` words contributes its
    word hashes directly (so no document is shingle-less unless empty).
    """
    n_words = len(word_hashes)
    offsets = np.asarray(offsets, dtype=np.int64)
    lengths = np.diff(offsets)
    h = word_hashes.astype(np.uint64, copy=False)
    if n_words >= k:
        # positional combine over a sliding window of k
        s = h[: n_words - k + 1] * _C1
        for j in range(1, k):
            s = (s * _MIX) ^ (h[j : n_words - k + j + 1] * _C2)
        s = mix64(s)
    else:
        s = np.empty(0, dtype=np.uint64)
    # Window starting at word i is valid iff i + k <= doc_end.
    sh_counts = np.maximum(lengths - (k - 1), 0)
    short = lengths < k
    out_counts = np.where(short, lengths, sh_counts)
    sh_offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(out_counts, out=sh_offsets[1:])
    total = int(sh_offsets[-1])
    out = np.empty(total, dtype=np.uint64)
    # gather: for long docs take s[doc_start : doc_start+count]; for
    # short docs take h[doc_start : doc_start+len]. Build source index.
    doc_ids = np.repeat(np.arange(len(lengths)), out_counts)
    within = np.arange(total, dtype=np.int64) - np.repeat(sh_offsets[:-1], out_counts)
    src_start = offsets[:-1][doc_ids]
    idx = src_start + within
    is_short = short[doc_ids]
    if is_short.any():
        out[is_short] = h[idx[is_short]]
    if (~is_short).any():
        out[~is_short] = s[idx[~is_short]]
    return out, sh_offsets


def minhash_signatures(
    sh_values: np.ndarray, sh_offsets: np.ndarray, num_perms: int = 64, seed: int = 42
) -> np.ndarray:
    """(n_docs, num_perms) uint64 minhash signature matrix.

    Permutations are the standard ``a*x + b`` family over mod-2^64
    wraparound (``a`` odd).  ``np.minimum.reduceat`` does the per-doc
    min; empty docs get the max sentinel.
    """
    rng = np.random.default_rng(seed)
    a = (rng.integers(1, 2**63, size=num_perms, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
    b = rng.integers(0, 2**63, size=num_perms, dtype=np.uint64)
    n_docs = len(sh_offsets) - 1
    sig = np.full((n_docs, num_perms), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(sh_values) == 0:
        return sig
    lengths = np.diff(sh_offsets)
    nonempty = lengths > 0
    starts = np.asarray(sh_offsets[:-1][nonempty], dtype=np.intp)
    # One contiguous 1-D pass per permutation: the (n_shingles, perms)
    # broadcast layout is ~40x slower (strided stores + two matrix-sized
    # temporaries); per-perm `sh*a+b` + 1-D reduceat stays in L2 and is
    # bit-identical (measured 1.47s -> 0.037s on a 213k-shingle batch).
    out = np.empty((int(nonempty.sum()), num_perms), dtype=np.uint64)
    for j in range(num_perms):
        out[:, j] = np.minimum.reduceat(sh_values * a[j] + b[j], starts)
    sig[nonempty] = out
    return sig


def simhash_signatures(
    feat_values: np.ndarray, feat_offsets: np.ndarray
) -> np.ndarray:
    """(n_docs,) uint64 simhash over per-doc feature-hash multisets."""
    n_docs = len(feat_offsets) - 1
    out = np.zeros(n_docs, dtype=np.uint64)
    if len(feat_values) == 0:
        return out
    bits = (feat_values[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    contrib = bits.astype(np.int32) * 2 - 1  # ±1 per bit
    lengths = np.diff(feat_offsets)
    nonempty = lengths > 0
    sums = np.add.reduceat(contrib, feat_offsets[:-1][nonempty], axis=0)
    packed = ((sums > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    out[nonempty] = packed
    return out


def hamming_distance_u64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount(a ^ b) for uint64 arrays."""
    x = (a ^ b).view(np.uint64)
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)


def band_keys(sig: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, bands) uint64 LSH band keys from an (n_docs, P) minhash
    signature matrix (P divisible by ``bands``)."""
    n_docs, p = sig.shape
    r = p // bands
    view = sig[:, : bands * r].reshape(n_docs, bands, r)
    key = view[:, :, 0] * _C1
    for j in range(1, r):
        key = (key * _MIX) ^ (view[:, :, j] * _C3)
    return mix64(key.reshape(-1)).reshape(n_docs, bands)


def rolling_fingerprint(
    word_hashes: np.ndarray, offsets: np.ndarray
) -> np.ndarray:
    """Order-sensitive per-document fingerprint: a Horner-style
    polynomial rolling hash over the word-hash stream (Karp–Rabin
    shape, mod 2^64).  Vectorized via per-position powers + segment
    sums — no Python loop over documents.
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    lengths = np.diff(offsets)
    n_docs = len(lengths)
    out = np.zeros(n_docs, dtype=np.uint64)
    if len(word_hashes) == 0:
        return mix64(out)
    pos = np.arange(len(word_hashes), dtype=np.int64) - np.repeat(offsets[:-1], lengths)
    # base^pos via cumulative product per segment in log space is not
    # exact for uint64; use repeated-squaring table (max_len bounded).
    max_len = int(lengths.max())
    powers = np.empty(max_len, dtype=np.uint64)
    powers[0] = np.uint64(1)
    with np.errstate(over="ignore"):  # wraparound mod 2^64 is the hash space
        for i in range(1, max_len):  # O(max doc length), not O(rows)
            powers[i] = powers[i - 1] * _MIX
    terms = word_hashes.astype(np.uint64) * powers[pos]
    nonempty = lengths > 0
    out[nonempty] = np.bitwise_xor.reduceat(terms, offsets[:-1][nonempty])
    return mix64(out ^ lengths.astype(np.uint64) * _C2)
