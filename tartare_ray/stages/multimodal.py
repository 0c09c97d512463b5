"""Multimodal-column plumbing: opaque ``binary`` payload columns with
typed metadata, decoded / feature-extracted by actor-pool stages.

Reference analogue: tartare's GridFS blob handling — payloads moved as
opaque binaries with metadata documents alongside
(`tartare/core/gridfs_handler.py` `[UNVERIFIED — empty checkout,
SURVEY.md §0]`).

The container has no image/audio libraries, so the DECODE KERNEL IS A
STUB (deterministic fake, or ``NotImplementedError`` when a real
decode is requested) — but the Ray-side plumbing is real and tested:
binary column schema, small batch sizes for large payloads, actor-pool
signature with per-actor setup, and a scalar-metadata output layout
that downstream relational stages consume.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def attach_payload_batch(batch: pa.Table) -> pa.Table:
    """documents → (doc_id, payload: binary, mime) — a deterministic
    fake blob (the UTF-8 bytes of ``text``).  In a real pipeline this
    column arrives from storage; here it exists so the decode stage has
    real binary Arrow buffers to chew on."""
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "payload": pc.cast(batch["text"], pa.binary()),
            "mime": pa.array(["application/fake-image"] * len(batch), pa.string()),
        }
    )


class DecodeStage:
    """Actor-pool decode: payload binary → typed metadata columns.

    ``__init__`` is where a real build would load the codec / model
    once per actor; with ``real=True`` it raises ``NotImplementedError``
    (no image libs in this container — clearly-marked stub).  The fake
    decode derives width/height/n_frames deterministically from the
    byte length, so the full pipeline remains oracle-checkable in SQL
    (``octet_length``-based)."""

    def __init__(self, real: bool = False):
        if real:
            raise NotImplementedError(
                "real image/audio decode requires PIL/torchvision/ffmpeg, "
                "not present in this container — run with real=False for "
                "the deterministic stub"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch["payload"]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        byte_len = pc.binary_length(payload).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "byte_len": pa.array(byte_len),
                "width": pa.array(byte_len % 640 + 1),
                "height": pa.array((byte_len * 7) % 480 + 1),
                "n_frames": pa.array(np.ones(len(byte_len), dtype=np.int32)),
            }
        )
