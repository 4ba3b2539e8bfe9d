"""Deterministic documents-table → interleaved-spans wrapper.

The driver testdata's ``documents`` table (doc_id:int64, text, lang,
source, n_chars — plain text, not HTML; TESTDATA.md) is wrapped into
the engine's interleaved input shape with a FIXED template, so that
extraction output is exactly predictable from the row's columns —
which is what makes the DuckDB oracle SQL in ``__ray_entry__`` able to
reproduce it (FIXTURES.md §4).

Template (simple mode; one span each):

  0 ``<html><head><title>doc {id}</title></head><body>``  + nav boilerplate
  1 ``<h1>{source}</h1>``                      → heading span (offset 0)
  2 ``<p>{text}</p>``                          → text span    (offset 1)
  3 ``<img src='img://doc/{id}.jpg'>``         → media span   (offset 2)
  4 ad div + ``<footer>…</footer></body></html>``  (stripped)

Chunked mode (bench realism; NOT oracle-checked) splits the text into
~12-word paragraphs, multiplying parse work per doc.
"""

from __future__ import annotations

import pyarrow as pa

SPANS_TYPE = pa.list_(pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
]))

_NAV = "<nav><ul><li><a href='/'>home</a></li></ul></nav>"
_AD = "<div class='ad-banner'>BUY</div>"
_FOOT = "<footer>(c) corp</footer></body></html>"


def _span(kind, text, media_ref=""):
    return {"kind": kind, "text": text, "media_ref": media_ref}


def wrap_documents(batch: pa.Table, *, chunk_words: int | None = None,
                   repeat_text: int = 1) -> pa.Table:
    """map_batches transform: documents rows → (doc_id:string, spans).

    ``repeat_text`` tiles the text N times before wrapping — used by
    the bench corpus to reach realistic web-page sizes (the testdata
    texts are ~2 KB; real pages are tens of KB)."""
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    sources = batch.column("source").to_pylist()
    out_ids, out_spans = [], []
    for i, t, src in zip(ids, texts, sources):
        if repeat_text > 1:
            t = " ".join([t] * repeat_text)
        sid = str(i)
        ref = f"img://doc/{sid}.jpg"
        spans = [
            _span("text", f"<html><head><title>doc {sid}</title>"
                          f"<meta name=\"description\" content=\"{src}\">"
                          f"</head><body>{_NAV}"),
            _span("text", f"<h1>{src}</h1>"),
        ]
        if chunk_words:
            words = t.split()
            for j in range(0, len(words), chunk_words):
                spans.append(
                    _span("text",
                          "<p>" + " ".join(words[j:j + chunk_words]) + "</p>"))
        else:
            spans.append(_span("text", f"<p>{t}</p>"))
        spans.append(_span("media", f"<img src='{ref}'>", ref))
        spans.append(_span("text", _AD + _FOOT))
        out_ids.append(sid)
        out_spans.append([{**s, "offset": k} for k, s in enumerate(spans)])
    return pa.table({"doc_id": pa.array(out_ids, pa.string()),
                     "spans": pa.array(out_spans, SPANS_TYPE)})


def wrap_documents_chunked(batch: pa.Table) -> pa.Table:
    return wrap_documents(batch, chunk_words=12)
