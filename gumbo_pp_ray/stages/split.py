"""Mega-document splitter — the skew defuser (SURVEY.md §4.2).

One pathological multi-hundred-MB document must not stall a whole
batch/actor. Before extraction, documents whose span count exceeds
``max_spans`` are split into chunk rows ``(doc_id, chunk_id,
n_chunks, spans-slice)``; each chunk is assembled + parsed
independently and the per-doc span sequence is re-merged by
``groupby(doc_id)`` downstream (stages/reassemble.py).

Partitioning assumption (documented per SURVEY.md §2 "custom
operators"): splitting at *span* boundaries is semantically safe
because the interleaved-table contract makes each span a
self-contained block-level fragment (FIXTURES.md §1) — chunk-local
HTML parses stand alone. Arbitrary byte-level splitting of HTML would
not be safe and is not attempted.

The fast path (no row over threshold — the overwhelmingly common
case) only appends two constant columns to the batch; no row
materialization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class SplitMegaDocs:
    """Stateless-shaped callable (used as a plain function stage; class
    form keeps the threshold picklable-configurable)."""

    def __init__(self, max_spans: int = 256):
        self.max_spans = max_spans

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column("spans")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lengths = np.diff(col.offsets.to_numpy(zero_copy_only=False))
        n = len(batch)
        if n == 0 or lengths.max(initial=0) <= self.max_spans:
            return batch.append_column(
                "chunk_id", pa.array(np.zeros(n, dtype=np.int32))
            ).append_column(
                "n_chunks", pa.array(np.ones(n, dtype=np.int32)))
        doc_ids = batch.column("doc_id").to_pylist()
        spans_py = col.to_pylist()
        # carry the upstream-corruption marker (sources/warc.py) if
        # present; error rows have 0 spans so they never split
        ierr = (batch.column("input_error").to_pylist()
                if "input_error" in batch.schema.names else None)
        out_ids, out_spans, out_chunk, out_nchunks = [], [], [], []
        out_ierr = []
        m = self.max_spans
        for i in range(n):
            spans = spans_py[i]
            if len(spans) <= m:
                out_ids.append(doc_ids[i])
                out_spans.append(spans)
                out_chunk.append(0)
                out_nchunks.append(1)
                if ierr is not None:
                    out_ierr.append(ierr[i])
                continue
            chunks = [spans[j:j + m] for j in range(0, len(spans), m)]
            for ci, ch in enumerate(chunks):
                out_ids.append(doc_ids[i])
                out_spans.append(ch)
                out_chunk.append(ci)
                out_nchunks.append(len(chunks))
                if ierr is not None:
                    out_ierr.append(ierr[i])
        cols = {
            "doc_id": pa.array(out_ids, pa.string()),
            "spans": pa.array(out_spans, col.type),
            "chunk_id": pa.array(out_chunk, pa.int32()),
            "n_chunks": pa.array(out_nchunks, pa.int32()),
        }
        if ierr is not None:
            cols["input_error"] = pa.array(out_ierr, pa.string())
        return pa.table(cols)
