"""Vectorized span explode: one row per span.

``(doc_id, spans:list<struct>, ...)`` → ``(doc_id, kind, text,
media_ref, offset)`` — pure Arrow kernel work: the list column is
flattened zero-copy and ``doc_id`` is repeated via list-offset
arithmetic (``pc.list_parent_indices`` + ``take``). No Python loop.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def explode_spans(batch: pa.Table) -> pa.Table:
    col = batch.column("spans")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    parents = pc.list_parent_indices(col)
    values = col.flatten()
    doc_ids = batch.column("doc_id").take(parents)
    return pa.table({
        "doc_id": doc_ids,
        "kind": values.field("kind"),
        "text": values.field("text"),
        "media_ref": values.field("media_ref"),
        "offset": values.field("offset"),
    })
