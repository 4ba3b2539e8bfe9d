"""Distributed selector queries over the documents table.

Each documents row is rendered into a FIXED per-row HTML template, a
compiled selector (the reference's matcher algebra, SURVEY.md §2.3-2.4)
is applied over the parsed DOM with ``find_all`` (Q2), and every match
emits ``(doc_id, match_text)`` — ``match_text`` = normalized content
text of the matched node (E1).

Because the template is a pure function of the row's columns, each
selector query has an exact ANSI-SQL oracle over the original table
(see ``__ray_entry__.oracle_sql``): the correctness gate for matcher
semantics at distributed scale.

Template (per row)::

  <html><head><title>t</title></head><body>
  <div id="doc-{id}" class="{lang}" data-source="{source}"><p>{text}</p></div>
  <span id="lang-{id}" lang="{lang}-std" data-note="...">{lang}</span>
  </body></html>

(``data-note`` is empty for short docs and ``"long"`` for
``n_chars > 300`` — gives the M10 empty/has-value matchers a
selective, SQL-reproducible predicate.)

The stage is a callable class: the selector is compiled/deserialized
ONCE per actor, not per batch.
"""

from __future__ import annotations

import pyarrow as pa

from ..html.parser import parse
from ..html.text import content_text
from ..html.walk import find_all, walk


def selector_doc_html(doc_id, text, lang, source, n_chars=None) -> str:
    # data-long is present iff n_chars > 300 — gives presence-style
    # matchers (attribute.exists, xor combinations) a selective,
    # SQL-reproducible predicate
    long_attr = " data-long=\"y\"" if (n_chars or 0) > 300 else ""
    note = "long" if (n_chars or 0) > 300 else ""
    return (f"<html><head><title>t</title></head><body>"
            f"<div id=\"doc-{doc_id}\" class=\"{lang}\" "
            f"data-source=\"{source}\"{long_attr}><p>{text}</p></div>"
            f"<span id=\"lang-{doc_id}\" lang=\"{lang}-std\" "
            f"data-note=\"{note}\">{lang}</span>"
            f"</body></html>")


class MultiSelectorQuery:
    """Compound selector query: ONE parse per document, a whole named
    family of compiled selectors applied to the tree, each match
    emitting ``(doc_id, matcher, match_text)``.

    This folds what used to be N independent driver queries (N parses
    of the same corpus) into one pass — the per-matcher oracles stay
    exact (UNION ALL with a ``matcher`` literal per branch), and the
    whole matcher surface fits inside the driver's per-round query
    budget (VERDICT r3 item 1).
    """

    def __init__(self, selectors):
        # dict name -> picklable Selector AST; compiled once per actor
        self.selectors = list(selectors.items())

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        sources = batch.column("source").to_pylist()
        if "n_chars" in batch.schema.names:
            n_chars = batch.column("n_chars").to_pylist()
        else:
            n_chars = [None] * len(ids)
        out_ids, out_names, out_texts = [], [], []
        for i, t, lg, src, nc in zip(ids, texts, langs, sources, n_chars):
            doc = parse(selector_doc_html(i, t, lg, src, nc))
            nodes = list(walk(doc))
            for name, sel in self.selectors:
                for node in nodes:
                    if sel(node):
                        out_ids.append(str(i))
                        out_names.append(name)
                        out_texts.append(content_text(
                            node, normalize_ws=True,
                            include_comments=False))
        return pa.table({"doc_id": pa.array(out_ids, pa.string()),
                         "matcher": pa.array(out_names, pa.string()),
                         "match_text": pa.array(out_texts, pa.string())})


class SelectorQuery:
    def __init__(self, selector):
        self.selector = selector        # picklable Selector AST

    def __call__(self, batch: pa.Table) -> pa.Table:
        sel = self.selector
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        sources = batch.column("source").to_pylist()
        if "n_chars" in batch.schema.names:
            n_chars = batch.column("n_chars").to_pylist()
        else:
            n_chars = [None] * len(ids)
        out_ids, out_texts = [], []
        for i, t, lg, src, nc in zip(ids, texts, langs, sources, n_chars):
            doc = parse(selector_doc_html(i, t, lg, src, nc))
            for node in find_all(walk(doc), sel):
                out_ids.append(str(i))
                out_texts.append(content_text(node, normalize_ws=True,
                                              include_comments=False))
        return pa.table({"doc_id": pa.array(out_ids, pa.string()),
                         "match_text": pa.array(out_texts, pa.string())})
