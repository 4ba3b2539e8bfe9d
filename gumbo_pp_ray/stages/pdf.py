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

_WORDS = ("report summary figure table result method data model "
          "analysis section appendix reference").split()


# ------------------------------------------------------ real mini-PDFs

def synth_pdf_bytes(doc_id: int) -> bytes:
    """Deterministic REAL (well-formed, uncompressed) PDF per doc:
    ``1 + doc_id % 2`` pages, ``2 + (doc_id + page) % 3`` text blocks
    per page laid out in two columns (x = 72 / 306, rows 90pt apart
    from y=700).  Blocks are written into each content stream in
    REVERSED order, so extracting the correct reading order requires
    actually using the Td coordinates — the layout-analysis step is
    exercised, not pantomimed.  Text is a pure function of
    (doc_id, page, block), so the final span sequence has an exact
    SQL oracle."""
    n_pages = 1 + doc_id % 2
    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)                 # object number (1-based)

    font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    page_ids, content_ids = [], []
    for p in range(n_pages):
        n_blocks = 2 + (doc_id + p) % 3
        parts = []
        for k in reversed(range(n_blocks)):
            x = 72 if k % 2 == 0 else 306
            y = 700 - 90 * (k // 2)
            parts.append(f"BT /F1 12 Tf {x} {y} Td "
                         f"(doc {doc_id} p{p} b{k}) Tj ET".encode())
        stream = b"\n".join(parts)
        content_ids.append(add(
            b"<< /Length " + str(len(stream)).encode() + b" >>\n"
            b"stream\n" + stream + b"\nendstream"))
        page_ids.append(len(objs) + 1)   # page obj comes next
        add(b"")                         # placeholder, patched below
    pages = add(
        b"<< /Type /Pages /Kids ["
        + b" ".join(b"%d 0 R" % i for i in page_ids)
        + b"] /Count " + str(n_pages).encode() + b" >>")
    for p, (pid, cid) in enumerate(zip(page_ids, content_ids)):
        objs[pid - 1] = (
            b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
            b"/Contents %d 0 R /Resources << /Font << /F1 %d 0 R >> >> "
            b">>" % (pages, cid, font))
    catalog = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages)

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n"
            b"%%%%EOF\n" % (len(objs) + 1, catalog, xref_at))
    return bytes(out)


def synth_pdf_payloads(batch: pa.Table) -> pa.Table:
    """Deterministic real-PDF payloads per row (fetch-stage stand-in;
    no external data)."""
    ids = batch.column("doc_id").to_pylist()
    payloads = [synth_pdf_bytes(int(i)) for i in ids]
    return pa.table({
        "doc_id": pa.array([str(i) for i in ids], pa.string()),
        "payload": pa.array(payloads, pa.binary()),
    })


_OBJ_RE = None
_TD_TJ_RE = None


def _mini_regexes():
    global _OBJ_RE, _TD_TJ_RE
    if _OBJ_RE is None:
        import re
        _OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj\s*(.*?)\s*endobj",
                             re.DOTALL)
        _TD_TJ_RE = re.compile(
            # string body = any run of non-backslash-non-paren chars
            # or escape pairs — an even-backslash-count-safe close:
            # a lookbehind alone cannot tell \\) (escaped backslash
            # then REAL terminator) from \) (escaped paren)
            rb"(-?[\d.]+)\s+(-?[\d.]+)\s+Td\s*"
            rb"\(((?:[^\\)]|\\.)*)\)\s*Tj",
            re.DOTALL)
    return _OBJ_RE, _TD_TJ_RE


def _pdf_unescape(raw: bytes) -> str:
    return (raw.replace(rb"\)", b")").replace(rb"\(", b"(")
            .replace(rb"\\", b"\\").decode("latin-1"))


def mini_pdf_layout(doc_id: str, payload: bytes):
    """Pure-Python minimal PDF text extractor — REAL parsing of real
    (uncompressed) PDF bytes, no library: object table → /Pages /Kids
    page order → each page's /Contents stream → BT..ET text ops
    ((text) Tj with the preceding x y Td position).  Returns layout
    rows (doc_id, page, block_idx, text, x0, y0, x1, y1) with REAL
    coordinates from the content stream; compressed streams and exotic
    text operators are out of scope (→ pypdf when importable)."""
    import re
    obj_re, td_tj_re = _mini_regexes()
    objs = {int(m.group(1)): m.group(2)
            for m in obj_re.finditer(payload)}
    kids: list[int] = []
    for body in objs.values():
        if b"/Type /Pages" in body or b"/Type/Pages" in body:
            m = re.search(rb"/Kids\s*\[(.*?)\]", body, re.DOTALL)
            if m:
                kids = [int(x) for x in
                        re.findall(rb"(\d+)\s+0\s+R", m.group(1))]
            break
    rows = []
    for page_i, pid in enumerate(kids):
        body = objs.get(pid, b"")
        m = re.search(rb"/Contents\s+(\d+)\s+0\s+R", body)
        if not m:
            continue
        content = objs.get(int(m.group(1)), b"")
        sm = re.search(rb"stream\r?\n(.*?)\r?\nendstream", content,
                       re.DOTALL)
        if not sm:
            continue
        for b_idx, (xs, ys, raw) in enumerate(
                td_tj_re.findall(sm.group(1))):
            x0, y0 = float(xs), float(ys)
            text = _pdf_unescape(raw)
            rows.append((doc_id, page_i, b_idx, text,
                         x0, y0, x0 + 200.0, y0 + 12.0))
    return rows


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

    ``parser="fake"`` — deterministic stub layout; ``"mini"`` — the
    pure-Python minimal extractor (REAL parsing of real uncompressed
    PDFs, real coordinates; see ``mini_pdf_layout``); ``"real"`` —
    pypdf, raising ``NotImplementedError`` when not importable;
    ``"auto"`` — pypdf if importable else the mini extractor
    (``self.mode`` records the choice)."""

    def __init__(self, parser: str = "fake"):
        if parser not in ("fake", "mini", "real", "auto"):
            raise ValueError(f"unknown parser: {parser}")
        self._lib = None
        if parser in ("real", "auto"):
            self._lib = probe_pdf_lib()
            if parser == "real" and self._lib is None:
                raise NotImplementedError(
                    "no PDF library importable (pypdf); use "
                    "parser='mini' (real parse of uncompressed PDFs), "
                    "'fake' or 'auto' — schema/actors/batching are "
                    "identical to a real decoder")
        if self._lib is not None:
            self.mode = "real"
        elif parser in ("mini", "auto"):
            self.mode = "mini"
        else:
            self.mode = "fake"

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
        layout = {"real": self._real_layout,
                  "mini": mini_pdf_layout,
                  "fake": self._fake_layout}[self.mode]
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

    CONTRACT: batches must be DOC-COMPLETE — call with
    ``batch_size=None`` directly over PdfParse's output blocks (which
    keep a document's rows contiguous).  Ray's default rebatching can
    split a doc's rows across batches, which would emit the doc twice
    with offset-restarted partial span lists.
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
