"""Distributed structured-table extraction (Q5, reference
tests/src/table_scrape.cpp).

Each documents row is rendered into a fixed template containing a
2x2 table derived from its columns; the scoped scrape (div#t →
table → per-TR per-TD content text) runs per row and emits
``(doc_id, row_idx, col_idx, cell)`` — exactly reproducible in SQL.

Template::

  <div id="t"><table>
    <tr><td>{lang}</td><td>{source}</td></tr>
    <tr><td>n{n_chars}</td><td><strong>{doc_id}</strong></td></tr>
  </table></div>
"""

from __future__ import annotations

import pyarrow as pa

from ..html import match
from ..html.extract import scrape_table
from ..html.parser import parse


def table_doc_html(doc_id, lang, source, n_chars) -> str:
    return (f"<html><body><div id=\"t\"><table>"
            f"<tr><td>{lang}</td><td>{source}</td></tr>"
            f"<tr><td>n{n_chars}</td><td><strong>{doc_id}</strong></td></tr>"
            f"</table></div>"
            f"<table><tr><td>decoy</td></tr></table>"
            f"</body></html>")


class TableScrapeQuery:
    """Actor: compiled scope selector applied per row (the reference's
    div#important_table scoping, table_scrape.cpp:46-50)."""

    def __init__(self):
        self.scope = match.tag.DIV & match.id.is_("t")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        langs = batch.column("lang").to_pylist()
        sources = batch.column("source").to_pylist()
        n_chars = batch.column("n_chars").to_pylist()
        out = {"doc_id": [], "row_idx": [], "col_idx": [], "cell": []}
        for i, lg, src, nc in zip(ids, langs, sources, n_chars):
            doc = parse(table_doc_html(i, lg, src, nc))
            for ri, row in enumerate(scrape_table(doc, self.scope)):
                for ci, cell in enumerate(row):
                    out["doc_id"].append(str(i))
                    out["row_idx"].append(ri)
                    out["col_idx"].append(ci)
                    out["cell"].append(cell)
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "row_idx": pa.array(out["row_idx"], pa.int64()),
            "col_idx": pa.array(out["col_idx"], pa.int64()),
            "cell": pa.array(out["cell"], pa.string()),
        })
