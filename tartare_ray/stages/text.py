"""Text-analysis stages for the ``documents`` table: token counting,
quality stats, language-ID, document fingerprinting.

Reference analogue: tartare's per-feed CSV normalization preprocesses
(`tartare/processes/contributor/*.py` `[UNVERIFIED — empty checkout,
SURVEY.md §0]`), generalized to the text operators a training-data
pipeline needs.  All stages are pure-function ``map_batches`` bodies
over zero-copy Arrow batches — stateless, so they run as tasks, not
actors (no per-worker state to amortize).  Regex compilation happens
inside Arrow's kernel cache; the only Python-level state (stopword
sets, language profiles) is module-level constants shipped once per
worker with the function closure.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import text as T
from ..functions.hashing import rolling_fingerprint

# Stopwords drawn from the testdata vocabulary's English function words;
# the set is part of the operator contract (mirrored in the SQL oracle).
STOPWORDS = ("the", "a")


def token_count_batch(batch: pa.Table) -> pa.Table:
    """doc_id + whitespace word count (matches DuckDB
    ``len(regexp_split_to_array(trim(text),'\\s+'))``)."""
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_words": pc.cast(T.word_counts(batch["text"]), pa.int64()),
        }
    )


def repetition_stats_batch(batch: pa.Table, k: int = 3) -> pa.Table:
    """Gopher-style within-document repetition quality signal: the
    fraction of duplicate word-``k``-gram shingles per document
    (0 = no repetition, →1 = the same phrase over and over).  Fully
    vectorized across the batch: one lexsort over (doc, shingle)
    pairs counts distinct shingles per document — no per-row Python.
    Documents shorter than ``k`` words fall back to word-level
    duplicates (via ``shingle_hashes``'s short-doc rule); empty
    documents score 0."""
    from ..functions.hashing import shingle_hashes

    wh, offsets = T.word_hash_lists(batch["text"])
    sh, sho = shingle_hashes(wh, offsets, k=k)
    total = np.diff(sho)
    n = len(total)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), total)
    order = np.lexsort((sh, doc_idx))
    ds_, hs = doc_idx[order], sh[order]
    new = np.ones(len(hs), dtype=bool)
    new[1:] = (ds_[1:] != ds_[:-1]) | (hs[1:] != hs[:-1])
    uniq = np.bincount(ds_[new], minlength=n) if len(ds_) else np.zeros(n, np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        rep = np.where(total > 0, 1.0 - uniq / np.maximum(total, 1), 0.0)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_shingles": pa.array(total.astype(np.int64)),
            "repetition_ratio": pa.array(np.round(rep, 6)),
        }
    )


def text_stats_batch(batch: pa.Table) -> pa.Table:
    """Quality-scoring feature columns, all integer-valued so the
    driver's value-hash comparison is exact (ratios are left to the
    consumer; see SURVEY.md §2B float-boundary note)."""
    text = batch["text"]
    words = T.word_lists(text)
    vals, offsets = T.flat_words(words)
    n_words = np.diff(offsets)
    stop = T.segment_member_counts(vals, offsets, frozenset(STOPWORDS))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
            "n_words": pa.array(n_words, type=pa.int64()),
            "n_stopwords": pa.array(stop, type=pa.int64()),
        }
    )


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Heuristic language-ID (function-word + CJK-ratio scorer).
    Round-5 oracle upgrade: the argmax and score ride EXACT integer
    arithmetic over a common denominator
    (``functions/text.py::lang_scores_exact``), so the driver now
    value-hash-checks prediction AND score against a DuckDB rebuild
    generated from the same LANG_PROFILES
    (``functions/text.py::lang_id_oracle_sql``); accuracy vs the
    testdata ``lang`` column stays pytest-asserted."""
    pred, num, den = T.lang_scores_exact(batch["text"])
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "pred_lang": pa.array(pred, type=pa.string()),
            "score_num": pa.array(num, type=pa.int64()),
            "score_den": pa.array(den, type=pa.int64()),
        }
    )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Order-sensitive rolling-hash document fingerprint (Karp–Rabin
    shape over word hashes) — deterministic across runs/processes, used
    for exact-dup detection without shuffling full text at scale."""
    wh, offsets = T.word_hash_lists(batch["text"])
    fp = rolling_fingerprint(wh, offsets)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            # int64 view keeps the driver/duckdb hash path happy (uint64
            # round-trips poorly through pandas); the bit pattern is the id.
            "fingerprint": pa.array(fp.view(np.int64), type=pa.int64()),
        }
    )


def fingerprint_poly_batch(batch: pa.Table) -> pa.Table:
    """SQL-reproducible order-sensitive document fingerprint: Horner
    fold (mod 1e9+7) over the per-word polynomial hashes — the
    declarative sibling of ``fingerprint_batch`` (which keys on SipHash
    and stays the internal scale path: keyed, 64-bit, adversary-safe).
    An independent engine recomputes this one exactly (DuckDB nested
    ``list_reduce``), so the operator carries a full value oracle."""
    wh, offsets = T.word_polyhash_lists(batch["text"])
    fp = T.rolling_poly_hash(wh, offsets)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fingerprint": pa.array(fp, type=pa.int64()),
        }
    )


# --- hashed linear quality model -------------------------------------------
# Deterministic "model checkpoint" for the classifier-scoring stage:
# integer weights per hash bucket (Knuth multiplicative mix), so the
# score is exact BIGINT arithmetic — no float drift between engines.
QUALITY_BUCKETS = 65536
QUALITY_MIX = 2654435761  # Knuth's 2^32 / phi multiplier (public constant)
QUALITY_SPAN = 2_000_001  # weights in [-1e6, 1e6]


def quality_weights(n_buckets: int = QUALITY_BUCKETS) -> np.ndarray:
    """The deterministic weight table: w[b] = ((b+1)*MIX) % SPAN - 1e6.
    Stands in for a trained fastText-style linear classifier's weight
    vector — the artifact a real pipeline would load from a checkpoint
    and broadcast once via ``ray.put``."""
    b = np.arange(1, n_buckets + 1, dtype=np.int64)
    return (b * QUALITY_MIX) % QUALITY_SPAN - (QUALITY_SPAN - 1) // 2


class QualityScoreStage:
    """Hashed-bag-of-words linear scorer — the canonical 'small model
    inference' stage shape: the weight table is broadcast once
    (``ray.put``) and fetched ONCE per actor in ``__init__``;
    ``__call__`` scores a batch fully vectorized (word poly-hash →
    bucket → weight gather → segment sum).  Integer weights make the
    score exact, so DuckDB recomputes it to the last bit."""

    def __init__(self, weights_ref):
        import ray

        self.w = ray.get(weights_ref)
        self.n_buckets = len(self.w)

    def __call__(self, batch: pa.Table) -> pa.Table:
        wh, offsets = T.word_polyhash_lists(batch["text"])
        contrib = self.w[wh % self.n_buckets]
        n_docs = len(offsets) - 1
        lens = np.diff(offsets)
        score = np.zeros(n_docs, dtype=np.int64)
        nonempty = lens > 0
        if len(contrib):
            score[nonempty] = np.add.reduceat(contrib, offsets[:-1][nonempty])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(lens, pa.int64()),
                "score": pa.array(score, pa.int64()),
                "keep": pa.array(score > 0),
            }
        )


# GPT-2-style pre-tokenizer pattern, RE2-compatible (pyarrow and DuckDB
# both run RE2, so counts agree exactly — the basis of the SQL oracle).
BPE_PRETOKEN_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count_batch(batch: pa.Table) -> pa.Table:
    """BPE-ish token counting: the GPT-2 pre-tokenizer regex applied as
    one vectorized RE2 kernel (``pc.count_substring_regex``) — an upper
    bound on real BPE token counts (merges only shrink) used for corpus
    sizing/budgeting without loading a tokenizer."""
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_pretokens": pc.cast(
                pc.count_substring_regex(batch["text"], BPE_PRETOKEN_PATTERN), pa.int64()
            ),
        }
    )


class BpeEncodeStage:
    """Real byte-level BPE encoding as the canonical stateful stage:
    the merge ranks (the 'model checkpoint') are broadcast once via
    ``ray.put`` and the encoder — with its per-actor word cache — is
    built ONCE per actor in ``__init__``; ``__call__`` encodes a batch.
    Zipfian word reuse makes the cache hit rate →1, so the amortized
    per-word cost is a dict lookup despite BPE being inherently
    sequential per NEW word (``functions/bpe.py``)."""

    def __init__(self, merges_ref):
        import ray

        from ..functions.bpe import BpeEncoder

        self.enc = BpeEncoder(ray.get(merges_ref))

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        encoded = [self.enc.encode(t) for t in texts]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "bpe_tokens": pa.array(encoded, pa.list_(pa.int32())),
                "n_bpe_tokens": pa.array([len(e) for e in encoded], pa.int64()),
            }
        )


def token_fingerprints_batch(batch: pa.Table, col: str = "tokens") -> pa.Table:
    """Per-row 64-bit fingerprint of the token ARRAY (order- and
    length-sensitive rolling hash over mixed token ids) — the partial
    half of token-sequence exact dedup: the shuffle carries one uint64
    per row, never the token lists themselves."""
    from ..functions.hashing import mix64, rolling_fingerprint

    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lo = int(offsets[0])
    flat = arr.values.to_numpy(zero_copy_only=False)[lo : int(offsets[-1])]
    mixed = mix64(flat.astype(np.uint64))
    fp = rolling_fingerprint(mixed, offsets - lo)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fp": pa.array(fp.view(np.int64), pa.int64()),
            "n_tok": pc.cast(pc.list_value_length(arr), pa.int64()),
        }
    )


def bigram_counts_batch(batch: pa.Table) -> pa.Table:
    """Partial per-batch bigram counts — the combiner half of the
    n-gram statistics pipeline: each batch emits its own (bigram, n)
    partials so the global shuffle moves counted bigrams, not word
    streams (shuffle-minimization, SURVEY.md §4).  Word splitting is
    the same whitespace convention as ``token_count`` (exact DuckDB
    oracle); bigram join uses Arrow's vectorized
    ``binary_join_element_wise``."""
    words = T.word_lists(batch["text"])
    vals, offsets = T.flat_words(words)
    empty = pa.table(
        {"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
    )
    if len(vals) < 2:
        return empty
    left = pa.array(vals[:-1], pa.string())
    right = pa.array(vals[1:], pa.string())
    joined = pc.binary_join_element_wise(left, right, " ")
    # drop pairs that straddle a document boundary: pair i covers word
    # positions (i, i+1); it crosses iff i+1 starts the next document
    mask = np.ones(len(vals) - 1, dtype=bool)
    interior = offsets[1:-1]
    mask[interior - 1] = False
    joined = joined.filter(pa.array(mask))
    if len(joined) == 0:
        return empty
    counts = joined.value_counts()
    return pa.table(
        {
            "bigram": counts.field("values"),
            "n": pc.cast(counts.field("counts"), pa.int64()),
        }
    )


def paragraph_chunk_rows(batch: pa.Table, chunk_words: int = 8) -> pa.Table:
    """(chunk, doc_id, chunk_idx) rows — fixed-``chunk_words``-word
    windows of each document, the dedup unit for ``paragraph_dedup``
    (this synthetic corpus is single-line, so the 'paragraph' boundary
    is a fixed word window; on a real corpus the same machinery runs
    on a ``\\n\\n`` split).  Fully vectorized: one word split, one
    global chunk-offset array, one Arrow ``binary_join`` — chunks tile
    each document contiguously so list offsets need no per-row loop."""
    words = T.word_lists(batch["text"])
    off = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    nw = np.diff(off)
    counts = -(-nw // chunk_words)  # ceil; split always yields ≥1 word
    total = int(counts.sum())
    doc_of = np.repeat(np.arange(len(nw)), counts)
    first = np.repeat(np.cumsum(counts) - counts, counts)
    cidx = np.arange(total) - first
    starts = off[doc_of] + chunk_words * cidx
    bounds = np.append(starts, off[-1] if len(off) else 0)
    chunks = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(bounds, pa.int32()), words.values),
        " ",
    )
    return pa.table(
        {
            "chunk": chunks,
            "doc_id": batch["doc_id"].take(pa.array(doc_of)),
            "chunk_idx": pa.array(cidx, pa.int64()),
        }
    )


def first_occurrence_fold(g: pa.Table) -> pa.Table:
    """Keep the argmin-(doc_id, chunk_idx) occurrence of every distinct
    chunk in this hash partition — one sort + run mask, vectorized (P
    Python calls per query, never one per chunk).  Used both as the
    per-block combiner (shrinks the shuffle) and as the per-partition
    reducer (all occurrences of a chunk co-locate by hash)."""
    t = g.sort_by(
        [("chunk", "ascending"), ("doc_id", "ascending"), ("chunk_idx", "ascending")]
    )
    c = t["chunk"].combine_chunks()
    n = len(c)
    if n <= 1:
        return t
    neq = pc.not_equal(c.slice(1), c.slice(0, n - 1)).to_numpy(zero_copy_only=False)
    return t.filter(pa.array(np.r_[True, neq]))


def chunk_hash_rows(batch: pa.Table, mod: int = 1000000007) -> pa.Table:
    """Surviving chunk rows → (doc_id, chunk_idx, h): the chunk string
    folds to its polynomial codepoint hash HERE, so the doc-side
    shuffle of ``paragraph_dedup`` moves three int64s per chunk, never
    the paragraph text."""
    h = T.poly_hash_words(
        np.asarray(
            batch["chunk"].combine_chunks().to_numpy(zero_copy_only=False),
            dtype=object,
        ),
        mod=mod,
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "chunk_idx": batch["chunk_idx"],
            "h": pa.array(h, pa.int64()),
        }
    )


def doc_chunk_digest_fold(g: pa.Table, mod: int = 1000000007) -> pa.Table:
    """(doc_id, n_kept, kept_digest) per document from its surviving
    chunk hashes: the house polynomial fold of per-chunk polynomial
    hashes in chunk order — SQL-reproducible (the cdc_apply_small
    convention), so paragraph-level dedup gets a FULL value oracle.
    Vectorized as masked column passes over a (docs × max_chunks)
    hash matrix."""
    t = g.sort_by([("doc_id", "ascending"), ("chunk_idx", "ascending")])
    n = len(t)
    if n == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_kept": pa.array([], pa.int64()),
                "kept_digest": pa.array([], pa.int64()),
            }
        )
    h = t["h"].to_numpy(zero_copy_only=False).astype(np.int64)
    d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
    counts = np.diff(np.append(starts, n))
    k = int(counts.max())
    rank = np.arange(n) - np.repeat(starts, counts)
    mat = np.zeros((len(starts), k), dtype=np.int64)
    mat[np.repeat(np.arange(len(starts)), counts), rank] = h
    dig = np.zeros(len(starts), dtype=np.int64)
    for j in range(k):  # ≤ max chunks/doc masked passes, not per-doc
        m = counts > j
        dig[m] = (dig[m] * 31 + mat[m, j]) % mod
    return pa.table(
        {
            "doc_id": pa.array(d[starts]),
            "n_kept": pa.array(counts.astype(np.int64)),
            "kept_digest": pa.array(dig),
        }
    )
