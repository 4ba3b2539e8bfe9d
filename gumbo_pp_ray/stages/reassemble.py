"""Span-sequence reassembly after chunked extraction.

``groupby("doc_id").map_groups(reassemble_chunks)`` — the pipeline's
only wide (shuffle) operation, per the north rule's
``groupby(doc_id) + sort-by-offset`` design. The shuffle moves
EXTRACTED spans, not raw HTML (extraction already ran), so the
exchanged volume is the output size, not the input size.

Skew note: group size is bounded by the splitter — a mega-doc of S
spans becomes ceil(S/max_spans) chunk rows whose *extracted* spans are
small; no salting of the groupby key itself is needed because chunking
already bounded per-task work (the salt lives in ``chunk_id``). Within
a group, ordering is (chunk_id, in-chunk offset) — never Ray block
order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def reassemble_chunks(group: pa.Table) -> pa.Table:
    """Merge the chunk rows of one document into a single output row
    (identity for unchunked docs). Offsets are renumbered to the
    global per-doc sequence; counters summed; status degrades to
    'error' if any chunk errored."""
    if group.num_rows == 1:
        # fast path: already a complete document
        return group.drop_columns(["chunk_id", "n_chunks"])
    order = np.argsort(group.column("chunk_id").to_numpy(zero_copy_only=False),
                       kind="stable")
    group = group.take(pa.array(order))
    spans_col = group.column("spans")
    if isinstance(spans_col, pa.ChunkedArray):
        spans_col = spans_col.combine_chunks()
    merged = []
    for row_spans in spans_col.to_pylist():
        merged.extend(row_spans)
    for i, s in enumerate(merged):
        s["offset"] = i
    statuses = group.column("status").to_pylist()
    return pa.table({
        "doc_id": group.column("doc_id").slice(0, 1),
        "spans": pa.array([merged], spans_col.type),
        "status": pa.array(
            ["ok" if all(s == "ok" for s in statuses) else "error"]),
        "n_parse_errors": pa.array(
            [int(pa.compute.sum(group.column("n_parse_errors")).as_py())],
            pa.int64()),
        "n_spans": pa.array([len(merged)], pa.int64()),
        "n_bytes_in": pa.array(
            [int(pa.compute.sum(group.column("n_bytes_in")).as_py())],
            pa.int64()),
    })
