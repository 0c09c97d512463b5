"""Built-in named steps — the stock preprocess vocabulary.

Tartare ships a fixed set of named preprocesses that contributor/
coverage configs reference by name (`tartare/processes/processes.py`
`[UNVERIFIED — empty checkout, SURVEY.md §0]`).  This module is the
analogue: importing it registers the engine's stock transforms in the
step registry, so a JSON pipeline config like

    {"steps": [{"name": "text_stats"},
               {"name": "quality_filter",
                "kwargs": {"min_words": 8, "max_chars": 1200}}]}

runs them in declared order via ``registry.build_pipeline`` (each step
one streaming map_batches stage; see ``python -m tartare_ray pipeline``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..stages import multimodal as MM
from ..stages import text as TX
from .registry import register_step

register_step("token_count")(TX.token_count_batch)
register_step("text_stats")(TX.text_stats_batch)
register_step("lang_id")(TX.lang_id_batch)
register_step("fingerprint")(TX.fingerprint_batch)
register_step("bpe_token_count")(TX.bpe_token_count_batch)
register_step("attach_payload")(MM.attach_payload_batch)
register_step("byte_histogram")(MM.byte_histogram_batch)
# stateful (actor-pool) steps: callable classes
register_step("decode")(MM.DecodeStage)
register_step("resize")(MM.ResizeStage)
register_step("frame_sample")(MM.FrameSampleStage)


@register_step("quality_filter", row_filter=True)
def quality_filter(
    batch: pa.Table,
    min_words: int = 8,
    max_chars: int = 1200,
    min_stopword_x10: int = 10,
) -> pa.Table:
    """Keep documents passing the curation thresholds (corpus_filter's
    predicate as a reusable named step over a ``text`` column)."""
    s = TX.text_stats_batch(batch)
    keep = pc.and_(
        pc.and_(
            pc.greater_equal(s["n_words"], min_words),
            pc.less_equal(s["n_chars"], max_chars),
        ),
        pc.greater_equal(pc.multiply(s["n_stopwords"], min_stopword_x10), s["n_words"]),
    )
    return batch.filter(keep)


@register_step("truncate_tokens")
def truncate_tokens(batch: pa.Table, max_len: int = 2048) -> pa.Table:
    """Cap token sequences at ``max_len`` and keep ``n_tok`` consistent
    — vectorized ``list_slice`` (a context-length guard at ingest)."""
    if "tokens" not in batch.schema.names or len(batch) == 0:
        return batch
    sliced = pc.list_slice(batch["tokens"], 0, max_len)
    batch = batch.set_column(batch.schema.get_field_index("tokens"), "tokens", sliced)
    if "n_tok" in batch.schema.names:
        n = pc.list_value_length(sliced)
        batch = batch.set_column(
            batch.schema.get_field_index("n_tok"),
            "n_tok",
            pc.cast(n, batch["n_tok"].type),
        )
    return batch


@register_step("pack_sequences")
def pack_sequences(batch: pa.Table, seq_len: int = 128, eos: int | None = None, pad: int | None = None) -> pa.Table:
    from ..stages.pack import pack_batch

    return pack_batch(batch, seq_len=seq_len, eos=eos, pad=pad)


@register_step("select_columns")
def select_columns(batch: pa.Table, columns: list[str] | None = None) -> pa.Table:
    return batch.select(columns) if columns else batch
