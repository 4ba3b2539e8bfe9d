"""Multimodal column plumbing — decode / feature-extract / resize /
frame-sample stages.

Media payloads are opaque ``binary`` columns with typed metadata
(``media_type`` derived from the ref scheme: ``img://`` / ``vid://``
…). The Ray-side plumbing (schema, actor signature, batch sizing,
output layout) is real and tested; the actual codec work is STUBBED —
this container ships no image/audio libraries — behind
``decoder="fake"`` (deterministic: byte-hash-derived dimensions and
features) or ``decoder="real"`` → ``NotImplementedError`` until a
codec lib is importable.

Batch-size note (memory-aware): binary payloads are wide — callers
should use a small ``batch_size`` (≤32) so batch x concurrency fits
the worker heap; blocks of wide rows are kept Arrow end-to-end
(pandas would object-box the bytes).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("media_ref", pa.string()),
    ("media_type", pa.string()),
    ("payload", pa.binary()),
])


def media_type_of(ref: str) -> str:
    scheme = ref.split("://", 1)[0] if "://" in ref else ""
    return {"img": "image", "vid": "video", "aud": "audio"}.get(scheme,
                                                                "unknown")


def collect_media_refs(batch: pa.Table) -> pa.Table:
    """Extracted-spans rows → one row per media span (doc_id,
    media_ref, media_type). Feed this to a fetch/decode pool."""
    col = batch.column("spans")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    import pyarrow.compute as pc
    parents = pc.list_parent_indices(col)
    flat = col.flatten()
    kinds = flat.field("kind")
    mask = pc.equal(kinds, "media")
    refs = flat.field("media_ref").filter(mask)
    doc_ids = batch.column("doc_id").take(parents.filter(mask))
    return pa.table({
        "doc_id": doc_ids,
        "media_ref": refs,
        "media_type": pa.array([media_type_of(r)
                                for r in refs.to_pylist()], pa.string()),
    })


def synth_payloads(batch: pa.Table) -> pa.Table:
    """Deterministic fake payload bytes per media_ref (test/bench
    stand-in for a fetch stage; no external data)."""
    refs = batch.column("media_ref").to_pylist()
    payloads = []
    for r in refs:
        seed = hashlib.md5(r.encode()).digest()
        payloads.append(seed * 64)      # 1 KiB deterministic blob
    return batch.append_column("payload", pa.array(payloads, pa.binary()))


class DecodeMedia:
    """Actor-pool decode stage. ``__init__`` loads the decoder once
    per actor (the expensive step for a real codec); ``__call__``
    decodes a batch.

    Output per row: width, height, n_frames, feature vector
    (list<float>, ``feat_dim``).
    """

    def __init__(self, decoder: str = "fake", feat_dim: int = 16):
        if decoder == "real":           # pragma: no cover - no codec libs
            raise NotImplementedError(
                "no image/audio codec libraries in this environment; "
                "use decoder='fake' (deterministic stub) — the Ray "
                "plumbing (schema/actors/batching) is identical")
        if decoder != "fake":
            raise ValueError(f"unknown decoder: {decoder}")
        self.feat_dim = feat_dim

    def _decode_one(self, payload: bytes, media_type: str):
        h = hashlib.sha256(payload).digest()
        width = 64 + h[0] * 4
        height = 64 + h[1] * 4
        n_frames = 1 if media_type == "image" else 1 + h[2]
        feats = (np.frombuffer(h[:self.feat_dim], dtype=np.uint8)
                 .astype(np.float32) / 255.0)
        return width, height, n_frames, feats

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        mtypes = batch.column("media_type").to_pylist()
        w, hgt, nf, feats = [], [], [], []
        for p, mt in zip(payloads, mtypes):
            a, b, c, f = self._decode_one(p or b"", mt)
            w.append(a)
            hgt.append(b)
            nf.append(c)
            feats.append(f.tolist())
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "media_ref": batch.column("media_ref"),
            "media_type": batch.column("media_type"),
            "width": pa.array(w, pa.int32()),
            "height": pa.array(hgt, pa.int32()),
            "n_frames": pa.array(nf, pa.int32()),
            "features": pa.array(feats, pa.list_(pa.float32())),
        })


class ResizeStub:
    """Resize/frame-sample stage shape: in a real deployment this
    transforms payload bytes; the stub records the target geometry so
    downstream schema/layout is exercised."""

    def __init__(self, target: tuple = (224, 224), max_frames: int = 8):
        self.target = target
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        n = len(batch)
        tw, th = self.target
        return (batch
                .append_column("out_width",
                               pa.array([tw] * n, pa.int32()))
                .append_column("out_height",
                               pa.array([th] * n, pa.int32()))
                .append_column("out_frames",
                               pc.min_element_wise(
                                   batch.column("n_frames"),
                                   pa.scalar(self.max_frames, pa.int32()))))
