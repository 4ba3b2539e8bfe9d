"""PDF / layout parsing plumbing (north-rule: "PDF/layout parse").

Same stub discipline as stages/media.py: the container ships no PDF
library, so the DECODE step is stubbed (``parser="fake"``:
deterministic layout blocks derived from the payload hash;
``parser="real"`` → NotImplementedError until a pdf lib is
importable). Everything around it is real and tested:

* schema: binary payload → (page, block_idx, text, x0, y0, x1, y1)
  layout blocks,
* actor-pool stage shape (parser state loads once per actor, small
  batches for wide binary rows),
* **reading-order reconstruction** (`layout_to_spans`): blocks sorted
  by (page, row-banded y, x) → ordered span sequence — the real
  layout-analysis logic a swapped-in decoder would feed.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

LAYOUT_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("page", pa.int32()),
    ("block_idx", pa.int32()),
    ("text", pa.string()),
    ("x0", pa.float32()), ("y0", pa.float32()),
    ("x1", pa.float32()), ("y1", pa.float32()),
])

_WORDS = ("report summary figure table result method data model "
          "analysis section appendix reference").split()


def probe_pdf_lib():
    """Import-probe for a real PDF library (pypdf).  Returns the
    module or None; called once per actor, never per batch."""
    try:                                # pragma: no cover - lib absent here
        import pypdf
        return pypdf
    except ImportError:
        return None


class PdfParse:
    """Actor-pool stage: (doc_id, payload:binary) → layout blocks.

    ``parser="fake"`` — deterministic stub layout; ``"real"`` — pypdf,
    raising ``NotImplementedError`` when not importable; ``"auto"`` —
    pypdf if importable else the stub (``self.mode`` records the
    choice)."""

    def __init__(self, parser: str = "fake"):
        if parser not in ("fake", "real", "auto"):
            raise ValueError(f"unknown parser: {parser}")
        self._lib = None
        if parser in ("real", "auto"):
            self._lib = probe_pdf_lib()
            if parser == "real" and self._lib is None:
                raise NotImplementedError(
                    "no PDF library importable (pypdf); use "
                    "parser='fake' or 'auto' — schema/actors/batching "
                    "are identical to a real decoder")
        self.mode = "real" if self._lib is not None else "fake"

    def _fake_layout(self, doc_id: str, payload: bytes):
        h = hashlib.sha256(payload).digest()
        n_pages = 1 + h[0] % 3
        rows = []
        rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
        for page in range(n_pages):
            n_blocks = 2 + h[1 + page] % 4
            for b in range(n_blocks):
                y0 = 700.0 - 90.0 * b + float(rng.randint(0, 10))
                x0 = 72.0 if b % 2 == 0 else 306.0
                text = " ".join(rng.choice(_WORDS, 6))
                rows.append((doc_id, page, b, text,
                             x0, y0, x0 + 200.0, y0 + 60.0))
        return rows

    def _real_layout(self, doc_id: str, payload: bytes):
        """pypdf path: one text block per double-newline paragraph per
        page; synthetic top-down bboxes (pypdf exposes no geometry) so
        layout_to_spans ordering still applies."""
        import io
        reader = self._lib.PdfReader(io.BytesIO(payload))
        rows = []
        for page_i, page in enumerate(reader.pages):
            text = page.extract_text() or ""
            paras = [t.strip() for t in text.split("\n\n") if t.strip()]
            for b, para in enumerate(paras):
                y0 = 700.0 - 90.0 * b
                rows.append((doc_id, page_i, b, para,
                             72.0, y0, 272.0, y0 + 60.0))
        return rows

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        layout = (self._real_layout if self._lib is not None
                  else self._fake_layout)
        rows = []
        for i, p in zip(ids, payloads):
            try:
                rows.extend(layout(str(i), p or b""))
            except Exception:
                # unparseable payload → zero blocks for the doc; the
                # batch never fails
                continue
        cols = list(zip(*rows)) if rows else [[] for _ in range(8)]
        return pa.table({
            "doc_id": pa.array(cols[0], pa.string()),
            "page": pa.array(cols[1], pa.int32()),
            "block_idx": pa.array(cols[2], pa.int32()),
            "text": pa.array(cols[3], pa.string()),
            "x0": pa.array(cols[4], pa.float32()),
            "y0": pa.array(cols[5], pa.float32()),
            "x1": pa.array(cols[6], pa.float32()),
            "y1": pa.array(cols[7], pa.float32()),
        })


def layout_to_spans(batch: pa.Table, *, row_band: float = 24.0
                    ) -> pa.Table:
    """Reading-order reconstruction — REAL layout logic: per document,
    blocks sorted by (page, descending y banded into rows of
    ``row_band`` points, then x left→right) → ordered
    ``(kind="text", text, media_ref="", offset)`` spans.

    Two-column pages interleave correctly because banding groups
    blocks at the same height before x-ordering.
    """
    import collections
    docs = collections.defaultdict(list)
    for r in batch.to_pylist():
        docs[r["doc_id"]].append(r)
    out_ids, out_spans = [], []
    spans_type = pa.list_(pa.struct([
        ("kind", pa.string()), ("text", pa.string()),
        ("media_ref", pa.string()), ("offset", pa.int32())]))
    for doc_id in sorted(docs):
        blocks = docs[doc_id]
        blocks.sort(key=lambda r: (r["page"],
                                   -(round(r["y0"] / row_band)),
                                   r["x0"]))
        out_ids.append(doc_id)
        out_spans.append([
            {"kind": "text", "text": b["text"], "media_ref": "",
             "offset": i}
            for i, b in enumerate(blocks)])
    return pa.table({"doc_id": pa.array(out_ids, pa.string()),
                     "spans": pa.array(out_spans, spans_type)})
