"""Reference-style API façade — eases porting code written against
beached/gumbo_pp's names onto this engine.

Maps the reference's public surface 1:1 (reference
include/daw/gumbo_pp.h):

=========================  ====================================
reference                  here
=========================  ====================================
``gumbo_range(html)``      ``GumboRange(html)`` (iterable; also
                           ``.document()`` / ``.root()`` /
                           ``.errors()`` — src/gumbo_pp.cpp:24-34,
                           gumbo_node_iterator.h:216-250)
``gumbo_child_range(n)``   ``gumbo_child_range(node)``
``node_content_text``      same name (gumbo_text.h:23-58)
``node_inner_text``        same name (gumbo_text.h:78-108)
``node_outer_text``        same name (gumbo_text.h:60-76)
``node_attribute_value``   same name ("" when absent,
                           gumbo_util.h:148-159)
``match::...``             ``match.…`` (select.py)
``find_if / for_each_if``  ``find_first / find_all`` (walk.py)
=========================  ====================================
"""

from __future__ import annotations

from .dom import Node
from .parser import parse
from .text import content_text, inner_text, outer_text
from .walk import subtree, walk


class GumboRange:
    """``gumbo_range`` analogue: parse + DFS node range over the whole
    document, exposing document()/root()/errors()."""

    def __init__(self, html: str):
        self._html = html
        self._doc = parse(html)

    def __iter__(self):
        return walk(self._doc)

    def document(self) -> Node:
        return self._doc

    def root(self) -> Node | None:
        """The <html> element (GumboOutput::root analogue)."""
        for c in self._doc.children:
            if c.tag == "html":
                return c
        return self._doc.children[0] if self._doc.children else None

    def errors(self) -> int:
        """Parse error count (the reference exposes the error vector;
        we count — gumbo_node_iterator.h:247-249)."""
        return self._doc.parse_errors

    @property
    def source(self) -> str:
        return self._html


def gumbo_range(html: str) -> GumboRange:
    return GumboRange(html)


def gumbo_child_range(node: Node):
    """Subtree range (reference src/gumbo_pp.cpp:37-59): first child →
    DFS-successor of the last child ⇒ every descendant."""
    return subtree(node)


def node_content_text(node: Node, **kw) -> str:
    return content_text(node, **kw)


def node_inner_text(node: Node, html_document: str) -> str:
    return inner_text(node, html_document)


def node_outer_text(node: Node, html_document: str) -> str:
    return outer_text(node, html_document)


def node_attribute_value(node: Node, name: str) -> str:
    """Returns "" when absent — the reference's contract
    (gumbo_util.h:148-159)."""
    return node.attr(name, "")


def advance_until(nodes, pred):
    """T6 (reference gumbo_node_iterator.h:268-275): advance an
    iterator to the first matching node; returns the remaining
    iterator positioned there, or an exhausted one."""
    it = iter(nodes)
    for n in it:
        if pred(n):
            return _Chain(n, it)
    return iter(())


class _Chain:
    __slots__ = ("_first", "_rest")

    def __init__(self, first, rest):
        self._first = first
        self._rest = rest

    def __iter__(self):
        yield self._first
        yield from self._rest
