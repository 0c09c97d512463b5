"""Vectorized text-analysis kernels (Arrow compute + numpy only).

Reference analogue: tartare's CSV string munging inside preprocesses
(`tartare/processes/contributor/*.py` `[UNVERIFIED — empty checkout,
SURVEY.md §0]`).  Every function here takes whole Arrow columns and
returns whole columns/arrays — these run on the hot path inside
``map_batches`` over zero-copy batches, so no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import WORD_HASH_KEY, hash_strings

_WS_RE = r"\s+"


def normalize(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """lower(trim(text)) — the canonical form for exact dedup; matches
    the DuckDB oracle expression ``lower(trim(text))`` byte-for-byte on
    ASCII and simple unicode."""
    return pc.utf8_lower(pc.utf8_trim_whitespace(col))


def word_lists(col: pa.ChunkedArray | pa.Array) -> pa.ListArray:
    """Whitespace-split word lists; semantics match DuckDB
    ``regexp_split_to_array(trim(text), '\\s+')``."""
    arr = pc.split_pattern_regex(pc.utf8_trim_whitespace(col), pattern=_WS_RE)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr


def word_counts(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    return pc.list_value_length(word_lists(col))


def flat_words(words: pa.ListArray) -> tuple[np.ndarray, np.ndarray]:
    """(flat word values as object ndarray, int64 offsets) for a
    (non-null) list<string> array."""
    offsets = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = words.values.to_numpy(zero_copy_only=False)
    # Slice the values to the window this list array views (offsets are
    # absolute into the parent buffer).
    lo, hi = int(offsets[0]), int(offsets[-1])
    return np.asarray(values[lo:hi], dtype=object), offsets - lo


def word_hash_lists(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(uint64 word hashes flattened, offsets) per document."""
    words = word_lists(col)
    vals, offsets = flat_words(words)
    return hash_strings(vals, key=WORD_HASH_KEY), offsets


POLY_MOD = 50257  # flagship token vocabulary (GPT-2-sized, public constant)


def poly_hash_words(vals: np.ndarray, mod: int = POLY_MOD) -> np.ndarray:
    """Per-word polynomial codepoint hash ``h = (h*31 + codepoint) % mod``.

    Chosen over the keyed SipHash because an INDEPENDENT engine can
    recompute it — DuckDB expresses it exactly as
    ``list_reduce(list_prepend(0, list_transform(list_filter(
    string_split(w, ''), c -> c <> ''), c -> unicode(c))),
    (a, b) -> (a*31 + b) % mod)`` (the filter covers the empty word:
    DuckDB's ``string_split('', '')`` is ``['']`` and ``unicode('')``
    is -1, while this side reduces to the 0 seed; parity is
    property-tested in tests/test_polyhash_parity.py) — which is what
    gives the CDC flagship replay a full value-level SQL oracle
    (ORACLE_SQL['cdc_apply_small'] and friends) instead of a rows-only
    check.  Vectorized as O(max_word_len) masked numpy passes over a
    padded UTF-32 view; assumes no NUL codepoints in words (NUL is the
    padding sentinel — true for any real text corpus)."""
    n = len(vals)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    u = np.asarray(vals, dtype="U")
    if u.dtype.itemsize == 0:  # every word is the empty string
        return np.zeros(n, dtype=np.int64)
    cp = u.view(np.uint32).reshape(n, -1).astype(np.int64)
    h = np.zeros(n, dtype=np.int64)
    for j in range(cp.shape[1]):
        c = cp[:, j]
        m = c != 0
        if not m.any():
            break
        h[m] = (h[m] * 31 + c[m]) % mod
    return h


def word_polyhash_lists(
    col: pa.ChunkedArray | pa.Array,
) -> tuple[np.ndarray, np.ndarray]:
    """(int64 polynomial word hashes flattened, offsets) per document —
    the SQL-reproducible sibling of ``word_hash_lists``."""
    words = word_lists(col)
    vals, offsets = flat_words(words)
    return poly_hash_words(vals), offsets


ROLL_MOD = 1_000_000_007  # Horner modulus: a*31 + b stays < 2^35, BIGINT-safe


def rolling_poly_hash(
    flat: np.ndarray, offsets: np.ndarray, mult: int = 31, mod: int = ROLL_MOD
) -> np.ndarray:
    """Order-sensitive per-document Horner fold over a flattened int64
    stream: ``h = (h*mult + v) % mod``, seed 0 — the SQL-reproducible
    sibling of ``hashing.rolling_fingerprint`` (DuckDB:
    ``list_reduce(list_prepend(0, vs), (a, b) -> (a*31 + b) % mod)``).
    Vectorized as O(max doc length) masked passes, like
    ``poly_hash_words`` — no Python loop over documents."""
    offsets = np.asarray(offsets, dtype=np.int64)
    lens = np.diff(offsets)
    n = len(lens)
    h = np.zeros(n, dtype=np.int64)
    if n == 0 or len(flat) == 0:
        return h
    starts = offsets[:-1]
    for j in range(int(lens.max())):
        m = lens > j
        if not m.any():
            break
        h[m] = (h[m] * mult + flat[starts[m] + j]) % mod
    return h


def segment_member_counts(
    flat_values: np.ndarray, offsets: np.ndarray, vocab: frozenset[str]
) -> np.ndarray:
    """Per-document count of flattened values that are in ``vocab``
    (e.g. stopword counts): vectorized membership + segment-sum."""
    n_docs = len(offsets) - 1
    if len(flat_values) == 0:
        return np.zeros(n_docs, dtype=np.int64)
    member = np.isin(flat_values, np.array(sorted(vocab), dtype=object)).astype(np.int64)
    out = np.zeros(n_docs, dtype=np.int64)
    lengths = np.diff(offsets)
    nonempty = lengths > 0
    out[nonempty] = np.add.reduceat(member, offsets[:-1][nonempty])
    return out


# --- language-ID heuristic -------------------------------------------------
# Tiny built-in function-word profiles (public knowledge). This is a
# heuristic n-gram/stopword scorer, NOT a trained model — the container
# has no language-ID package, so this is the honest from-scratch path.
LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the a of and to in is it you that was for on are with as at be this".split()),
    "fr": frozenset("le la les de des et un une du en est que qui dans pour pas sur au ce il".split()),
    "de": frozenset("der die das und ist nicht ein eine zu den von mit sich auf für im dem ich".split()),
    "es": frozenset("el la los las de y que en un una es no por con para su al lo como más".split()),
    "zh": frozenset(list("的一是不了人我在有他这中大来上国")),
}


def lang_scores(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(pred_lang: object ndarray, score: float64 ndarray) via
    function-word hit-rate per language, vectorized per column.  Ties
    break by profile order (deterministic dict order above)."""
    words = word_lists(col)
    vals, offsets = flat_words(words)
    lengths = np.maximum(np.diff(offsets), 1)
    langs = list(LANG_PROFILES)
    scores = np.zeros((len(lengths), len(langs)), dtype=np.float64)
    for j, lang in enumerate(langs):
        scores[:, j] = segment_member_counts(vals, offsets, LANG_PROFILES[lang]) / lengths
    # zh has no whitespace words: add a CJK character-ratio signal
    s = pc.utf8_trim_whitespace(col)
    total_chars = pc.utf8_length(s).to_numpy(zero_copy_only=False).astype(np.float64)
    # count CJK chars by replacing them and diffing lengths
    no_cjk = pc.replace_substring_regex(s, pattern=r"[一-鿿]", replacement="")
    cjk = total_chars - pc.utf8_length(no_cjk).to_numpy(zero_copy_only=False)
    scores[:, langs.index("zh")] += np.divide(
        cjk, np.maximum(total_chars, 1.0)
    )
    best = scores.argmax(axis=1)
    return np.array(langs, dtype=object)[best], scores[np.arange(len(best)), best]


def lang_scores_exact(
    col: pa.ChunkedArray | pa.Array,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(pred_lang, score_num, score_den) with the argmax decided in
    EXACT integer arithmetic so an independent engine reproduces it
    bit-for-bit (the round-5 lang_id oracle upgrade): over the common
    denominator den = L·C (L = max(words,1), C = chars of the trimmed
    text), each whitespace language scores v_j = hits_j·C and zh
    scores v_zh = hits_zh·C + cjk·L — the same rationals
    ``lang_scores`` compares in float, minus the float.  Ties break by
    profile order (np.argmax = first max)."""
    words = word_lists(col)
    vals, offsets = flat_words(words)
    L = np.maximum(np.diff(offsets), 1).astype(np.int64)
    langs = list(LANG_PROFILES)
    hits = np.zeros((len(L), len(langs)), dtype=np.int64)
    for j, lang in enumerate(langs):
        hits[:, j] = segment_member_counts(vals, offsets, LANG_PROFILES[lang])
    s = pc.utf8_trim_whitespace(col)
    C = pc.utf8_length(s).to_numpy(zero_copy_only=False).astype(np.int64)
    no_cjk = pc.replace_substring_regex(s, pattern=r"[一-鿿]", replacement="")
    cjk = C - pc.utf8_length(no_cjk).to_numpy(zero_copy_only=False).astype(np.int64)
    v = hits * C[:, None]
    v[:, langs.index("zh")] += cjk * L
    best = v.argmax(axis=1)
    return (
        np.array(langs, dtype=object)[best],
        v[np.arange(len(best)), best],
        L * C,
    )


def lang_id_oracle_sql(table: str = "documents") -> str:
    """The DuckDB query reproducing ``lang_scores_exact`` — built from
    the same LANG_PROFILES so the two sides can never drift."""
    langs = list(LANG_PROFILES)

    def in_list(lang: str) -> str:
        ws = ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(LANG_PROFILES[lang]))
        return f"len(list_filter(w, x -> x IN ({ws})))"

    hit_cols = ",\n               ".join(
        f"{in_list(lang)} AS h_{lang}" for lang in langs
    )
    v_cols = ", ".join(
        f"h_{lang}*C + cjk*L AS v_{lang}" if lang == "zh" else f"h_{lang}*C AS v_{lang}"
        for lang in langs
    )
    # first-max tie-break in profile order
    cases = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(f"v_{lang} >= v_{o}" for o in langs[i + 1 :])
        cases.append(f"WHEN {conds} THEN '{lang}'")
    case = "CASE " + " ".join(cases) + f" ELSE '{langs[-1]}' END"
    greatest = "GREATEST(" + ", ".join(f"v_{lang}" for lang in langs) + ")"
    return f"""
        WITH b AS (
            SELECT doc_id, trim(text) AS s,
                   regexp_split_to_array(trim(text), '\\s+') AS w
            FROM {table}
        ), m AS (
            SELECT doc_id,
               CAST(GREATEST(len(w), 1) AS BIGINT) AS L,
               CAST(length(s) AS BIGINT) AS C,
               CAST(length(s) - length(regexp_replace(s, '[一-鿿]', '', 'g')) AS BIGINT) AS cjk,
               {hit_cols}
            FROM b
        ), v AS (
            SELECT doc_id, {v_cols}, L*C AS den FROM m
        )
        SELECT doc_id, {case} AS pred_lang,
               CAST({greatest} AS BIGINT) AS score_num,
               CAST(den AS BIGINT) AS score_den
        FROM v
    """
