"""WARC (Web ARChive, ISO 28500) reader — the Common-Crawl-shaped
ingestion path for the extraction engine.

The reference has no sources at all (SURVEY.md §2.7: documents are
string literals in its tests); at 100 TB the real input is WARC
archives, so this module turns them into the engine's documents shape
(url / fetch metadata / html text) as a streaming Ray Data read:

* **One task per archive.**  WARC files are only splittable at gzip
  member boundaries, which cannot be found without scanning; the
  public convention (Common Crawl) is ~1 GB archives, so per-file
  tasks match Ray's block sizing.  Parallelism = number of archives —
  pass many shards, not one giant file.
* **Per-record gzip** (the Common Crawl layout: each record its own
  gzip member, members concatenated) is handled transparently:
  ``gzip.GzipFile`` reads concatenated members as one stream, and
  records are self-delimiting via ``Content-Length``.
* **Corruption is quarantined, not fatal**: a malformed record emits
  an ``error`` row and the parser resyncs on the next ``WARC/1.``
  magic — one bad record cannot drop an archive (mirrors the
  extractor's status="error" contract, stages/extractor.py).

Only ``response`` records with an HTTP payload become document rows;
request/metadata/warcinfo records are counted and skipped.  The HTTP
status line and headers are parsed for status / MIME / charset, and
the body is decoded with the declared charset (``errors="replace"``).

``build_warc`` writes deterministic archives for tests and demos.
"""

from __future__ import annotations

import gzip
import io


_MAGIC = b"WARC/1."
_CRLF2 = b"\r\n\r\n"

SCHEMA_COLUMNS = ("warc_file", "record_id", "url", "warc_date",
                  "status", "mime", "html", "n_bytes", "error")


def _parse_headers(blob: bytes) -> dict:
    """Header block (after the version line) → lowercase-key dict."""
    out = {}
    for line in blob.split(b"\r\n"):
        if b":" in line:
            k, _, v = line.partition(b":")
            out[k.strip().lower().decode("latin-1")] = \
                v.strip().decode("latin-1")
    return out


def _decode_http(payload: bytes) -> tuple[int | None, str, str]:
    """HTTP response bytes → (status, mime, body_text)."""
    head_end = payload.find(_CRLF2)
    if head_end < 0:                      # headers only / truncated
        head, body = payload, b""
    else:
        head, body = payload[:head_end], payload[head_end + 4:]
    lines = head.split(b"\r\n")
    status = None
    first = lines[0] if lines else b""
    if first[:5] == b"HTTP/":
        parts = first.split()
        if len(parts) >= 2 and parts[1].isdigit():
            status = int(parts[1])
    hdrs = _parse_headers(b"\r\n".join(lines[1:]))
    ctype = hdrs.get("content-type", "")
    mime = ctype.split(";")[0].strip().lower()
    charset = "utf-8"
    if "charset=" in ctype:
        charset = ctype.split("charset=")[-1].split(";")[0].strip(
            ' "\'') or "utf-8"
    try:
        text = body.decode(charset, errors="replace")
    except LookupError:                   # unknown charset label
        text = body.decode("utf-8", errors="replace")
    return status, mime, text


def iter_warc_records(data: bytes, *, source: str = ""):
    """Yield one dict per WARC record (SCHEMA_COLUMNS keys).

    Pure-bytes parser: version line, CRLF headers, ``Content-Length``
    payload, ``\\r\\n\\r\\n`` separator.  On any malformed record an
    ``error`` row is yielded and scanning resyncs at the next
    ``WARC/1.`` magic.  Gzipped input (single- or multi-member) is
    decompressed first.
    """
    if data[:2] == b"\x1f\x8b":
        data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(_MAGIC, pos)
        if start < 0:
            break
        head_end = data.find(_CRLF2, start)
        if head_end < 0:
            yield {"warc_file": source, "record_id": None, "url": None,
                   "warc_date": None, "status": None, "mime": None,
                   "html": None, "n_bytes": 0,
                   "error": "truncated-header"}
            break
        hdrs = _parse_headers(data[start:head_end])
        try:
            length = int(hdrs["content-length"])
            if length < 0:
                raise ValueError
        except (KeyError, ValueError):
            yield {"warc_file": source, "record_id":
                   hdrs.get("warc-record-id"), "url":
                   hdrs.get("warc-target-uri"), "warc_date":
                   hdrs.get("warc-date"), "status": None, "mime": None,
                   "html": None, "n_bytes": 0,
                   "error": "bad-content-length"}
            pos = head_end + len(_CRLF2)   # resync at next magic
            continue
        body_start = head_end + len(_CRLF2)
        payload = data[body_start:body_start + length]
        pos = body_start + length
        # spec: two CRLFs close a record; tolerate their absence
        if data[pos:pos + 4] == _CRLF2:
            pos += 4
        if len(payload) < length:
            yield {"warc_file": source, "record_id":
                   hdrs.get("warc-record-id"), "url":
                   hdrs.get("warc-target-uri"), "warc_date":
                   hdrs.get("warc-date"), "status": None, "mime": None,
                   "html": None, "n_bytes": len(payload),
                   "error": "truncated-payload"}
            break
        if hdrs.get("warc-type") != "response":
            continue                       # request/metadata/warcinfo
        status, mime, text = _decode_http(payload)
        yield {"warc_file": source,
               "record_id": hdrs.get("warc-record-id"),
               "url": hdrs.get("warc-target-uri"),
               "warc_date": hdrs.get("warc-date"),
               "status": status, "mime": mime, "html": text,
               "n_bytes": len(payload), "error": None}


def _records_table(rows: list[dict]):
    import pyarrow as pa
    return pa.table({
        "warc_file": pa.array([r["warc_file"] for r in rows],
                              pa.string()),
        "record_id": pa.array([r["record_id"] for r in rows],
                              pa.string()),
        "url": pa.array([r["url"] for r in rows], pa.string()),
        "warc_date": pa.array([r["warc_date"] for r in rows],
                              pa.string()),
        "status": pa.array([r["status"] for r in rows], pa.int32()),
        "mime": pa.array([r["mime"] for r in rows], pa.string()),
        "html": pa.array([r["html"] for r in rows], pa.string()),
        "n_bytes": pa.array([r["n_bytes"] for r in rows], pa.int64()),
        "error": pa.array([r["error"] for r in rows], pa.string()),
    })


def read_warc(paths, *, html_only: bool = True,
              **read_kwargs) -> "ray.data.Dataset":
    """WARC archive(s) → Dataset(warc_file, record_id, url, warc_date,
    status, mime, html, n_bytes, error).

    ``html_only`` keeps 2xx text/html rows plus all error rows (the
    quarantine must survive downstream filters); pass False for every
    response record.  Feed the result straight into the extraction
    pipeline — html is the raw-bytes-decoded page, exactly what
    ``parse`` expects.
    """
    import pyarrow as pa
    import ray.data

    def to_records(batch: pa.Table) -> pa.Table:
        out = []
        paths_col = batch.column("path").to_pylist()
        bytes_col = batch.column("bytes").to_pylist()
        for path, blob in zip(paths_col, bytes_col):
            for row in iter_warc_records(bytes(blob), source=path):
                if html_only and row["error"] is None and not (
                        row["status"] == 200
                        and row["mime"] == "text/html"):
                    continue
                out.append(row)
        return _records_table(out)

    files = ray.data.read_binary_files(paths, include_paths=True,
                                       **read_kwargs)
    return files.map_batches(to_records, batch_format="pyarrow",
                             batch_size=1)    # one archive per batch


def warc_to_interleaved(batch) -> "pa.Table":
    """map_batches adapter: ``read_warc`` rows → the engine's
    interleaved input shape (doc_id:string, spans list<struct>) with
    ONE raw-HTML span per page, so WARC archives feed
    ``extract_dataset`` / the flagship pipeline unchanged::

        read_warc(archives).map_batches(warc_to_interleaved,
                                        batch_format="pyarrow")
          |> extract_dataset |> write_parquet

    ``doc_id`` is the target URI (the stable key of a crawl).  Error
    rows (html is null) are dropped here — they are already
    quarantined in the ``read_warc`` output; keep that dataset if you
    need them."""
    import pyarrow as pa
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    ids, spans = [], []
    for url, html in zip(urls, htmls):
        if html is None:
            continue
        ids.append(url)
        spans.append([{"kind": "text", "text": html,
                       "media_ref": "", "offset": 0}])
    from ..pipelines.wrap import SPANS_TYPE
    return pa.table({"doc_id": pa.array(ids, pa.string()),
                     "spans": pa.array(spans, SPANS_TYPE)})


# ------------------------------------------------------ test builder

def build_warc(records, *, gzip_members: bool = False) -> bytes:
    """Deterministic WARC bytes for tests/demos.

    ``records``: iterable of dicts with keys ``url``, ``html`` and
    optional ``warc_type`` (default response), ``status`` (200),
    ``mime`` (text/html), ``charset``, ``date``, ``record_id``.
    ``gzip_members=True`` emits the Common Crawl layout (one gzip
    member per record, concatenated); mtime is pinned for
    byte-determinism.
    """
    out = []
    for i, r in enumerate(records):
        body = r["html"].encode(r.get("charset", "utf-8"))
        ctype = r.get("mime", "text/html")
        if r.get("charset"):
            ctype += f"; charset={r['charset']}"
        http = (f"HTTP/1.1 {r.get('status', 200)} OK\r\n"
                f"Content-Type: {ctype}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
                ).encode("latin-1") + body
        head = (
            "WARC/1.0\r\n"
            f"WARC-Type: {r.get('warc_type', 'response')}\r\n"
            f"WARC-Record-ID: "
            f"{r.get('record_id', f'<urn:uuid:rec-{i:04d}>')}\r\n"
            f"WARC-Date: {r.get('date', '2024-01-01T00:00:00Z')}\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode("latin-1")
        rec = head + http + _CRLF2
        if gzip_members:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as z:
                z.write(rec)
            rec = buf.getvalue()
        out.append(rec)
    return b"".join(out)
