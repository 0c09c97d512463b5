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


class ResizeStage:
    """Actor-pool resize: payload → payload', width/height set to the
    target box.  STUB kernel (no PIL in this container — ``real=True``
    raises), but the data movement is real: the output binary column is
    a proportional byte slice of the input, so downstream stages see
    genuinely smaller buffers, exactly as a real thumbnailer would
    shrink block sizes mid-pipeline."""

    def __init__(self, target_w: int = 64, target_h: int = 64, real: bool = False):
        if real:
            raise NotImplementedError(
                "real resize requires PIL/opencv, not present in this "
                "container — run with real=False for the deterministic stub"
            )
        self.target_w = target_w
        self.target_h = target_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch["payload"]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        n = len(payload)
        lens = pc.binary_length(payload).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.minimum(lens, self.target_w * self.target_h // 16 + 1)
        resized = pa.array(
            [payload[i].as_py()[: keep[i]] for i in range(n)], pa.binary()
        )  # slicing variable-width binaries is per-row by nature; buffers stay small
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "payload": resized,
                "width": pa.array(np.full(n, self.target_w, dtype=np.int32)),
                "height": pa.array(np.full(n, self.target_h, dtype=np.int32)),
            }
        )


class FrameSampleStage:
    """Actor-pool frame sampling (video shape): the payload is treated
    as ``frame_bytes``-sized frames; every ``stride``-th frame is kept
    and re-concatenated.  Fully vectorized over the flat byte buffer —
    frame index per byte, boolean keep mask, one slice."""

    def __init__(self, frame_bytes: int = 64, stride: int = 4):
        self.frame_bytes = frame_bytes
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch["payload"]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        off = np.frombuffer(payload.buffers()[1], dtype=np.int32)[
            payload.offset : payload.offset + len(payload) + 1
        ].astype(np.int64)
        data = np.frombuffer(payload.buffers()[2], dtype=np.uint8)
        lens = np.diff(off)
        row_of_byte = np.repeat(np.arange(len(payload)), lens)
        pos_in_row = np.arange(off[0], off[-1]) - np.repeat(off[:-1], lens)
        frame_no = pos_in_row // self.frame_bytes
        keep = (frame_no % self.stride) == 0
        kept_bytes = data[off[0] : off[-1]][keep]
        kept_per_row = np.bincount(row_of_byte[keep], minlength=len(payload))
        new_off = np.zeros(len(payload) + 1, dtype=np.int32)
        np.cumsum(kept_per_row, out=new_off[1:])
        sampled = pa.Array.from_buffers(
            pa.binary(),
            len(payload),
            [None, pa.py_buffer(new_off.tobytes()), pa.py_buffer(kept_bytes.tobytes())],
        )
        n_frames = -(-lens // self.frame_bytes)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "payload": sampled,
                "n_frames_total": pa.array(n_frames, pa.int64()),
                "n_frames_sampled": pa.array(-(-n_frames // self.stride), pa.int64()),
            }
        )


def byte_histogram_batch(batch: pa.Table, dim: int = 64) -> pa.Table:
    """REAL feature extraction (no stub needed): a ``dim``-bucket byte
    histogram per payload — one vectorized pass over the flat buffer
    (np.add.at on (row, bucket)), emitted as ``list<int64>`` — the
    embedding-column shape the similarity suite consumes."""
    payload = batch["payload"]
    if isinstance(payload, pa.ChunkedArray):
        payload = payload.combine_chunks()
    off = np.frombuffer(payload.buffers()[1], dtype=np.int32)[
        payload.offset : payload.offset + len(payload) + 1
    ].astype(np.int64)
    data = np.frombuffer(payload.buffers()[2], dtype=np.uint8)[off[0] : off[-1]]
    lens = np.diff(off)
    rows = np.repeat(np.arange(len(payload)), lens)
    hist = np.zeros((len(payload), dim), dtype=np.int64)
    np.add.at(hist, (rows, data // (256 // dim)), 1)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "feature": pa.array(hist.tolist(), pa.list_(pa.int64())),
            "feat_nbytes": pa.array(lens, pa.int64()),
        }
    )
