"""Sequence packing — variable-length token lists → fixed-length
training rows.

The last mile of a pre-training data pipeline: concatenate documents'
token sequences (optionally separated by an EOS token) and emit
``seq_len``-sized rows.  Packing is BLOCK-LOCAL: each input block
packs independently and its tail remainder is dropped (or padded) —
the standard shard-local packing used by training pipelines, chosen
here because cross-block carry would serialize an otherwise perfectly
parallel stage.  Wasted tokens per block ≤ seq_len - 1, negligible at
real block sizes (10^5+ tokens).

Fully vectorized: one concatenation of the flat values buffer, one
reshape — no per-token Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pack_batch(
    batch: pa.Table,
    seq_len: int = 128,
    eos: int | None = None,
    pad: int | None = None,
    tokens_col: str = "tokens",
) -> pa.Table:
    """Pack one block.  ``eos`` is appended after every document when
    set; the tail is padded with ``pad`` into a final row when set,
    dropped otherwise.  Output: ``seq`` (fixed-length list), ``n_tok``
    (non-pad tokens in the row)."""
    col = batch[tokens_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arrs = []
    flat = col.flatten().to_numpy(zero_copy_only=False)
    if eos is not None and len(col):
        # interleave eos after each document, vectorized via offset math
        lens = np.diff(col.offsets.to_numpy(zero_copy_only=False))
        out = np.empty(len(flat) + len(lens), dtype=flat.dtype)
        # target index for each source token: position + #eos inserted before it
        doc_of = np.repeat(np.arange(len(lens)), lens)
        src_pos = np.arange(len(flat))
        out[src_pos + doc_of] = flat
        eos_pos = np.cumsum(lens + 1) - 1
        out[eos_pos] = eos
        flat = out
    n_rows = len(flat) // seq_len
    used = n_rows * seq_len
    rows = flat[:used].reshape(n_rows, seq_len)
    n_tok = np.full(n_rows, seq_len, dtype=np.int32)
    if pad is not None and used < len(flat):
        tail = flat[used:]
        padded = np.full(seq_len, pad, dtype=flat.dtype)
        padded[: len(tail)] = tail
        rows = np.vstack([rows, padded[None, :]]) if n_rows else padded[None, :]
        n_tok = np.append(n_tok, np.int32(len(tail)))
    value_type = pa.int64() if flat.dtype == np.int64 else pa.int32()
    seq = pa.FixedSizeListArray.from_arrays(
        pa.array(rows.reshape(-1), value_type), seq_len
    )
    return pa.table({"seq": seq, "n_tok": pa.array(n_tok, pa.int32())})
