"""The SQL-reproducibility contract behind every CDC value oracle:
``functions/text.py poly_hash_words`` must equal DuckDB's
``list_reduce`` expression codepoint-for-codepoint, for arbitrary
unicode words — if this ever drifts, cdc_apply_small & friends go
red at the driver.  No Ray needed."""

from __future__ import annotations

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tartare_ray.functions.text import POLY_MOD, poly_hash_words

# words: any unicode codepoints except NUL (the numpy padding
# sentinel, absent from real text) — whitespace is fine here because
# we hash WORDS directly, not split text
WORD = st.text(
    alphabet=st.characters(blacklist_characters="\x00", blacklist_categories=("Cs",)),
    min_size=0,
    max_size=24,
)


def _duck_hash(words: list[str]) -> list[int]:
    con = duckdb.connect()
    con.execute("CREATE TABLE w(i INTEGER, s VARCHAR)")
    con.executemany("INSERT INTO w VALUES (?, ?)", list(enumerate(words)))
    rows = con.execute(
        """
        SELECT list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                     list_transform(list_filter(string_split(s, ''), c -> c <> ''),
                                    c -> CAST(unicode(c) AS BIGINT))),
                 (a, b) -> (a * 31 + b) % 50257)
        FROM w ORDER BY i
        """
    ).fetchall()
    return [r[0] for r in rows]


@settings(max_examples=30, deadline=None)
@given(st.lists(WORD, min_size=1, max_size=40))
def test_poly_hash_matches_duckdb(words):
    ours = poly_hash_words(np.asarray(words, dtype=object))
    theirs = _duck_hash(words)
    assert ours.tolist() == theirs, words


def test_poly_hash_edges():
    assert POLY_MOD == 50257
    out = poly_hash_words(np.asarray(["", "a", "a" * 100, "héllo", "木"], dtype=object))
    assert out[0] == 0  # empty word reduces to the seed
    # independent recomputation
    def ph(w):
        h = 0
        for c in w:
            h = (h * 31 + ord(c)) % POLY_MOD
        return h

    assert out.tolist() == [ph(w) for w in ["", "a", "a" * 100, "héllo", "木"]]
