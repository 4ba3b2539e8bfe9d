"""DFS pre-order traversal — gumbo_node_iterator semantics.

Reference: gumbo_node_iterator.h (reference include/daw/gumbo_pp/).

Key contract points replicated:

* **Pre-order, child-first** successor: descend to first child, else
  climb until an ancestor has a next sibling, else end (reference
  gumbo_node_iterator.h:158-195).
* **Continue-past-subtree**: a walk started at an interior node does
  NOT stop at the end of that node's subtree — ``end()`` is the null
  iterator (reference gumbo_node_iterator.h:102-104), so ``walk_from``
  continues into the rest of the document (exercised by the
  reference's table_scrape.cpp:51-53 TBODY search from a DIV).
  Subtree-scoped iteration is only via the ``children`` range
  (reference gumbo_node_iterator.h:35-85): ``subtree(node)`` here.

All iterative (explicit climb, no recursion) — mega-documents must not
hit Python's recursion limit.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator

from .dom import Node


def _dfs_next(node: Node) -> Node | None:
    """Pre-order successor, continuing past subtree boundaries
    (reference gumbo_node_iterator.h:158-195)."""
    ch = node.children
    if ch:
        return ch[0]
    while node is not None:
        p = node.parent
        if p is None:
            return None
        sibs = p.children
        i = node.index_within_parent + 1
        if i < len(sibs):
            return sibs[i]
        node = p
    return None


def walk(root: Node) -> Iterator[Node]:
    """DFS pre-order over ``root`` and its whole subtree, stopping at
    the subtree end — the common document-walk entry (pass the
    Document: its subtree IS the whole document, matching
    ``gumbo_range`` begin/end)."""
    # Iterative with an explicit index stack: ~2x faster than repeated
    # _dfs_next parent climbs for full-tree walks.
    node = root
    stack: list[tuple[Node, int]] = []
    while True:
        yield node
        ch = node.children
        if ch:
            stack.append((node, 0))
            node = ch[0]
            continue
        while stack:
            parent, i = stack.pop()
            i += 1
            kids = parent.children
            if i < len(kids):
                stack.append((parent, i))
                node = kids[i]
                break
        else:
            return


def walk_from(node: Node) -> Iterator[Node]:
    """DFS pre-order from ``node`` to the END OF THE DOCUMENT —
    the reference's continue-past-subtree iterator semantics
    (see module docstring)."""
    cur: Node | None = node
    while cur is not None:
        yield cur
        cur = _dfs_next(cur)


def subtree(node: Node) -> Iterator[Node]:
    """The ``children`` range (reference gumbo_node_iterator.h:35-85):
    begin = first child, end = DFS-successor of the last child ⇒ yields
    every DESCENDANT of ``node`` in DFS order (node itself excluded)."""
    it = walk(node)
    next(it)            # skip node itself
    return it


Pred = Callable[[Node], bool]


def find_first(nodes: Iterable[Node] | Node, pred: Pred) -> Node | None:
    """std::find_if analogue (Q1, reference tests/src/test.cpp:61-63).
    Accepts a node (walked with continue-past-subtree semantics, like
    an iterator starting there) or any node iterable."""
    if isinstance(nodes, Node):
        nodes = walk_from(nodes)
    for n in nodes:
        if pred(n):
            return n
    return None


def find_all(nodes: Iterable[Node] | Node, pred: Pred) -> Iterator[Node]:
    """for_each_if / find_iterator analogue (Q2/Q3, reference
    tests/src/test.cpp:32-46, table_scrape.cpp:54-62)."""
    if isinstance(nodes, Node):
        nodes = walk_from(nodes)
    return (n for n in nodes if pred(n))


def find_some(nodes: Iterable[Node] | Node, *preds: Pred):
    """daw::algorithm::find_some analogue (Q4, reference
    tests/src/test.cpp:96-102): first node matching ANY predicate,
    plus the per-predicate hit mask at that node.

    Returns ``(node, [bool, ...])`` or ``(None, [False, ...])``.
    """
    if isinstance(nodes, Node):
        nodes = walk_from(nodes)
    for n in nodes:
        mask = [p(n) for p in preds]
        if any(mask):
            return n, mask
    return None, [False] * len(preds)
