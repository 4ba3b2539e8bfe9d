"""Multimodal column plumbing — decode / feature-extract / resize /
frame-sample stages.

Media payloads are opaque ``binary`` columns with typed metadata
(``media_type`` derived from the ref scheme: ``img://`` / ``vid://``
…). The Ray-side plumbing (schema, actor signature, batch sizing,
output layout) is real and tested; the codec is selected by an
import probe — ``decoder="auto"`` uses Pillow when importable and
falls back to the deterministic stub (byte-hash-derived dimensions
and features) in this container, which ships no image libraries;
``decoder="real"`` raises ``NotImplementedError`` when no codec is
importable.

Batch-size note (memory-aware): binary payloads are wide — callers
should use a small ``batch_size`` (≤32) so batch x concurrency fits
the worker heap; blocks of wide rows are kept Arrow end-to-end
(pandas would object-box the bytes).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


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


# ---------------------------------------------------- real containers

def synth_image_bytes(doc_id: int) -> bytes:
    """Deterministic REAL image container per doc: format cycles
    PNG / GIF89a / JPEG(JFIF+SOF0) by ``doc_id % 3``; dimensions are
    pure functions of doc_id (width = 16 + 3*id % 240,
    height = 16 + 7*id % 240) so the decoded geometry has an exact
    SQL oracle.  The bytes are honest container headers — any
    standards-conforming reader (Pillow included) reports the same
    dimensions ``parse_image_header`` does."""
    import struct
    import zlib
    w = 16 + (doc_id * 3) % 240
    h = 16 + (doc_id * 7) % 240
    fmt = doc_id % 3
    if fmt == 0:                                        # PNG
        ihdr = struct.pack(">II5B", w, h, 8, 2, 0, 0, 0)
        out = [b"\x89PNG\r\n\x1a\n"]
        for typ, data in ((b"IHDR", ihdr), (b"IEND", b"")):
            out.append(struct.pack(">I", len(data)) + typ + data
                       + struct.pack(">I", zlib.crc32(typ + data)))
        return b"".join(out)
    if fmt == 1:                                        # GIF89a
        return (b"GIF89a" + struct.pack("<HH", w, h)
                + b"\x70\x00\x00" + b"\x3b")
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"   # JPEG
    sof0 = (struct.pack(">BHH", 8, h, w) + b"\x03"
            + b"\x01\x11\x00" + b"\x02\x11\x00" + b"\x03\x11\x00")
    return (b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
            + b"\xff\xc0" + struct.pack(">H", 2 + len(sof0)) + sof0
            + b"\xff\xd9")


def synth_image_payloads(batch: pa.Table) -> pa.Table:
    """Deterministic real-container payloads per row (fetch-stage
    stand-in; no external data).  Needs a ``doc_id`` column castable
    to int."""
    ids = batch.column("doc_id").to_pylist()
    payloads = [synth_image_bytes(int(i)) for i in ids]
    return batch.append_column("payload", pa.array(payloads, pa.binary()))


def parse_image_header(payload: bytes):
    """Pure-Python image header decode: PNG IHDR / GIF logical screen
    descriptor / JPEG SOFn frame header → (format, width, height), or
    None when the payload is not a recognizable image container.  This
    is REAL decoding of the real container formats (no image library
    needed for geometry) — the scale path for corpus-wide media stats
    where full pixel decode is wasted work."""
    import struct
    if len(payload) >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        if payload[12:16] == b"IHDR":
            w, h = struct.unpack(">II", payload[16:24])
            return ("png", w, h)
        return None
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return ("gif", w, h)
    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":
        pos = 2
        n = len(payload)
        while pos + 4 <= n:
            if payload[pos] != 0xFF:
                return None
            marker = payload[pos + 1]
            if marker == 0xFF:              # fill byte
                pos += 1
                continue
            if 0xD0 <= marker <= 0xD9 or marker == 0x01:
                pos += 2                    # parameterless markers
                continue
            seg_len = struct.unpack(">H", payload[pos + 2:pos + 4])[0]
            if (0xC0 <= marker <= 0xCF
                    and marker not in (0xC4, 0xC8, 0xCC)):
                if pos + 9 > n:
                    return None
                h, w = struct.unpack(">HH", payload[pos + 5:pos + 9])
                return ("jpeg", w, h)
            pos += 2 + seg_len
        return None
    return None


def probe_image_codec():
    """Import-probe for a real image codec (Pillow).  Returns the
    Image module or None; called once per actor in DecodeMedia
    __init__, never per batch."""
    try:                                # pragma: no cover - lib absent here
        from PIL import Image
        return Image
    except ImportError:
        return None


class DecodeMedia:
    """Actor-pool decode stage. ``__init__`` loads the decoder once
    per actor (the expensive step for a real codec); ``__call__``
    decodes a batch.

    ``decoder``:

    * ``"fake"`` — deterministic stub (byte-hash-derived geometry and
      features); always available.
    * ``"headers"`` — REAL pure-Python container-header decode
      (``parse_image_header``: PNG IHDR / GIF LSD / JPEG SOF);
      geometry is exact for real containers, features are the
      payload-hash vector (pixel decode needs a codec).
    * ``"real"`` — full Pillow decode; raises ``NotImplementedError``
      if no codec library is importable (this container ships none).
    * ``"auto"`` — Pillow if importable, else the header decoder; the
      chosen mode is recorded in ``self.mode`` and emitted per row in
      the ``decoder`` column, so downstream can tell full decode from
      header-only geometry.

    Output per row: format, width, height, n_frames, feature vector
    (list<float>, ``feat_dim``), decoder.
    """

    def __init__(self, decoder: str = "fake", feat_dim: int = 16):
        if decoder not in ("fake", "headers", "real", "auto"):
            raise ValueError(f"unknown decoder: {decoder}")
        self._codec = None
        if decoder in ("real", "auto"):
            self._codec = probe_image_codec()
            if decoder == "real" and self._codec is None:
                raise NotImplementedError(
                    "no image codec library importable (Pillow); use "
                    "decoder='headers' (real geometry, no pixels), "
                    "'fake' or 'auto' — the Ray plumbing "
                    "(schema/actors/batching) is identical")
        if self._codec is not None:
            self.mode = "real"
        elif decoder in ("headers", "auto"):
            self.mode = "headers"
        else:
            self.mode = "fake"
        self.feat_dim = feat_dim

    def _decode_one(self, payload: bytes, media_type: str):
        h = hashlib.sha256(payload).digest()
        width = 64 + h[0] * 4
        height = 64 + h[1] * 4
        n_frames = 1 if media_type == "image" else 1 + h[2]
        feats = (np.frombuffer(h[:self.feat_dim], dtype=np.uint8)
                 .astype(np.float32) / 255.0)
        return "", width, height, n_frames, feats

    def _decode_one_headers(self, payload: bytes, media_type: str):
        """Real container-header geometry; hash features (pixel
        decode needs a codec).  Unrecognized containers → sentinel."""
        parsed = parse_image_header(payload)
        if parsed is None:
            raise ValueError("unrecognized image container")
        fmt, width, height = parsed
        h = hashlib.sha256(payload).digest()
        feats = (np.frombuffer(h[:self.feat_dim], dtype=np.uint8)
                 .astype(np.float32) / 255.0)
        return fmt, width, height, 1, feats

    def _decode_one_real(self, payload: bytes, media_type: str):
        """Pillow path: geometry from the decoded image; features =
        mean-pooled grayscale thumbnail (deterministic)."""
        import io
        img = self._codec.open(io.BytesIO(payload))
        width, height = img.size
        n_frames = int(getattr(img, "n_frames", 1))
        fmt = (getattr(img, "format", None) or "").lower()
        side = max(1, int(self.feat_dim ** 0.5))
        thumb = img.convert("L").resize((side, side))
        raw = np.frombuffer(thumb.tobytes(), dtype=np.uint8)
        feats = np.zeros(self.feat_dim, dtype=np.float32)
        feats[:len(raw)] = raw[:self.feat_dim].astype(np.float32) / 255.0
        return fmt, width, height, n_frames, feats

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        mtypes = batch.column("media_type").to_pylist()
        decode = {"real": self._decode_one_real,
                  "headers": self._decode_one_headers,
                  "fake": self._decode_one}[self.mode]
        fmts, w, hgt, nf, feats = [], [], [], [], []
        for p, mt in zip(payloads, mtypes):
            try:
                fm, a, b, c, f = decode(p or b"", mt)
                if not (-1 <= a < 1 << 31 and -1 <= b < 1 << 31
                        and -1 <= c < 1 << 31):
                    # hostile header geometry (e.g. PNG width 2^31):
                    # the int32 Arrow build below runs OUTSIDE this
                    # try, so out-of-range values must become the
                    # sentinel here or they fail the whole batch
                    raise ValueError("geometry out of int32 range")
            except Exception:
                # undecodable payload → sentinel row, batch never fails
                fm, a, b, c, f = "", -1, -1, 0, np.zeros(
                    self.feat_dim, dtype=np.float32)
            fmts.append(fm)
            w.append(a)
            hgt.append(b)
            nf.append(c)
            feats.append(f.tolist())
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "media_ref": batch.column("media_ref"),
            "media_type": batch.column("media_type"),
            "format": pa.array(fmts, pa.string()),
            "width": pa.array(w, pa.int32()),
            "height": pa.array(hgt, pa.int32()),
            "n_frames": pa.array(nf, pa.int32()),
            "features": pa.array(feats, pa.list_(pa.float32())),
            "decoder": pa.array([self.mode] * len(w), pa.string()),
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
