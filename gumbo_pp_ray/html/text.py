"""Text extraction — gumbo_text.h semantics (E1-E3).

* ``content_text`` (reference gumbo_text.h:23-58): recursive DFS
  concatenation. For element/document nodes: per child, append the
  child's text if it is a Text node, otherwise recurse; the recursion
  returns the node's own text for Text/CData/Comment/Whitespace leaves
  — so whitespace-only text nodes, CDATA and COMMENT text are included
  in content text, with no separators and no normalization. We
  replicate that exactly, and additionally offer ``normalize_ws`` and
  ``include_comments=False`` options for the engine's span output
  (inner-text-normalization conformance; divergence documented).
* ``inner_text`` (reference gumbo_text.h:78-108): raw source slice
  between the original start tag end and original end tag start
  (markup included); document → slice spanning the children; text-ish
  → node text.
* ``outer_text`` (reference gumbo_text.h:60-76): raw source slice from
  the start tag through the end tag; whole doc for Document.

Iterative implementations (explicit stack) — no recursion limits.
"""

from __future__ import annotations

import re

from .dom import COMMENT, DOCUMENT, ELEMENT, TEMPLATE, Node

_WS_RUN = re.compile(r"\s+")


def content_text(node: Node, *, normalize_ws: bool = False,
                 include_comments: bool = True) -> str:
    """E1 — reference gumbo_text.h:23-58 (see module docstring).

    Default flags replicate the reference exactly (comments and
    whitespace nodes included, no normalization).
    """
    parts: list[str] = []
    stack = [node]
    if node.kind in (ELEMENT, DOCUMENT, TEMPLATE):
        # DFS over descendants collecting text-ish leaves in order.
        stack = list(reversed(node.children))
        while stack:
            cur = stack.pop()
            k = cur.kind
            if k in (ELEMENT, DOCUMENT, TEMPLATE):
                stack.extend(reversed(cur.children))
            elif k == COMMENT:
                if include_comments:
                    parts.append(cur.text)
            else:               # Text / CData / Whitespace
                parts.append(cur.text)
    else:
        if node.kind != COMMENT or include_comments:
            parts.append(node.text)
    out = "".join(parts)
    if normalize_ws:
        out = _WS_RUN.sub(" ", out).strip()
    return out


def inner_text(node: Node, html: str) -> str:
    """E2 — reference gumbo_text.h:78-108: zero-copy raw source slice
    between tags."""
    k = node.kind
    if k in (ELEMENT, TEMPLATE):
        return html[node.start_tag_end: node.end_tag_start]
    if k == DOCUMENT:
        ch = node.children
        if not ch:
            return ""
        return html[ch[0].start: ch[-1].end]
    return node.text


def outer_text(node: Node, html: str) -> str:
    """E3 — reference gumbo_text.h:60-76: raw source slice including
    the tags; whole document for Document nodes."""
    k = node.kind
    if k in (ELEMENT, TEMPLATE):
        return html[node.start: node.end]
    if k == DOCUMENT:
        return html
    return node.text
