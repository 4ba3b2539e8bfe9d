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


def add_reassembly_bucket(batch: pa.Table, *,
                          num_buckets: int) -> pa.Table:
    """Hash bucket for the vectorized reassembly co-group."""
    import zlib
    ids = batch.column("doc_id").to_pylist()
    return batch.append_column("rb", pa.array(
        [zlib.crc32(i.encode("utf-8")) % num_buckets for i in ids],
        pa.int64()))


def reassemble_bucket(group: pa.Table) -> pa.Table:
    """One HASH BUCKET of documents → one output row per doc, fully
    vectorized (sort_indices + reduceat + one ListArray rebuild).  One
    UDF call per bucket instead of one ``map_groups`` dispatch per doc:
    at 100k docs the per-group dispatch alone costs seconds.  Same
    output as ``reassemble_chunks`` per doc."""
    group = group.drop_columns(["rb"])
    n = group.num_rows
    if n == 0:
        return group.drop_columns(["chunk_id", "n_chunks"])
    idx = pa.compute.sort_indices(
        group, sort_keys=[("doc_id", "ascending"),
                          ("chunk_id", "ascending")])
    t = group.take(idx)
    doc = t.column("doc_id")
    if isinstance(doc, pa.ChunkedArray):
        doc = doc.combine_chunks()
    neq = pa.compute.not_equal(doc.slice(1), doc.slice(0, n - 1)) \
        .to_numpy(zero_copy_only=False)
    starts = np.concatenate([[0], np.nonzero(neq)[0] + 1]).astype(np.int64)
    spans_col = t.column("spans")
    if isinstance(spans_col, pa.ChunkedArray):
        spans_col = spans_col.combine_chunks()
    row_lens = pa.compute.list_value_length(spans_col) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    doc_lens = np.add.reduceat(row_lens, starts)
    flat = spans_col.flatten()              # values in (doc, chunk) order
    total = int(row_lens.sum())
    if total > 2**31 - 1:
        # list<int32> offsets would wrap silently — an oversized bucket
        # means reassembly_buckets needs to scale with the corpus
        raise ValueError(
            f"reassembly bucket holds {total} spans (> int32 offsets); "
            f"raise extract_dataset(reassembly_buckets=...) so one "
            f"bucket stays worker-sized")
    doc_flat_starts = np.concatenate([[0], np.cumsum(doc_lens)[:-1]])
    new_off = (np.arange(total, dtype=np.int64)
               - np.repeat(doc_flat_starts, doc_lens)).astype(np.int32)
    span_fields = list(spans_col.type.value_type)
    new_flat = pa.StructArray.from_arrays(
        [flat.field("kind"), flat.field("text"),
         flat.field("media_ref"), pa.array(new_off, pa.int32())],
        fields=span_fields)
    merged = pa.ListArray.from_arrays(
        pa.array(np.concatenate([[0], np.cumsum(doc_lens)])
                 .astype(np.int32), pa.int32()),
        new_flat)
    ok = pa.compute.equal(t.column("status"), "ok") \
        .to_numpy(zero_copy_only=False).astype(np.int8)
    doc_ok = np.minimum.reduceat(ok, starts).astype(bool)
    perr = np.add.reduceat(
        t.column("n_parse_errors").to_numpy(zero_copy_only=False), starts)
    nbytes = np.add.reduceat(
        t.column("n_bytes_in").to_numpy(zero_copy_only=False), starts)
    return pa.table({
        "doc_id": doc.take(pa.array(starts)),
        "spans": merged,
        "status": pa.array(np.where(doc_ok, "ok", "error").tolist(),
                           pa.string()),
        "n_parse_errors": pa.array(perr.astype(np.int64), pa.int64()),
        "n_spans": pa.array(doc_lens.astype(np.int64), pa.int64()),
        "n_bytes_in": pa.array(nbytes.astype(np.int64), pa.int64()),
    })
