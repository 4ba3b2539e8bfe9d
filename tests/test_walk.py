"""DFS traversal semantics (reference gumbo_node_iterator.h, T1-T6,
Q1-Q4)."""

from gumbo_pp_ray.html import ELEMENT, parse, walk, subtree, match
from gumbo_pp_ray.html.walk import walk_from, find_first, find_all, find_some

HTML = ("<html><head><title>t</title></head><body>"
        "<div id='a'><p>1</p><p>2</p></div>"
        "<div id='b'><span>3</span></div>"
        "</body></html>")


def test_preorder_document_order():
    d = parse(HTML)
    els = [n.tag for n in walk(d) if n.kind == ELEMENT]
    assert els == ["html", "head", "title", "body", "div", "p", "p",
                   "div", "span"]


def test_walk_yields_root_first():
    d = parse(HTML)
    it = walk(d)
    assert next(it) is d


def test_continue_past_subtree():
    # a walk started at an interior node continues into the REST of the
    # document (reference gumbo_node_iterator.h:102-104; exercised by
    # table_scrape.cpp:51-53)
    d = parse(HTML)
    div_a = find_first(walk(d), match.id.is_("a"))
    seen = [n.tag for n in walk_from(div_a) if n.kind == ELEMENT]
    assert seen == ["div", "p", "p", "div", "span"]  # div#b reached


def test_subtree_scoped():
    # the children range is the only subtree-scoped iteration
    # (reference gumbo_node_iterator.h:35-85)
    d = parse(HTML)
    div_a = find_first(walk(d), match.id.is_("a"))
    seen = [n.tag for n in subtree(div_a) if n.kind == ELEMENT]
    assert seen == ["p", "p"]


def test_parent_child_consistency():
    d = parse(HTML)
    for n in walk(d):
        for i, c in enumerate(n.children):
            assert c.parent is n
            assert c.index_within_parent == i
            assert n.child_at(i) is c
    assert d.child_at(99) is None


def test_next_last_sibling():
    d = parse(HTML)
    body = find_first(walk(d), match.tag.BODY)
    div_a, div_b = body.children
    assert div_a.next_sibling() is div_b
    assert div_b.next_sibling() is None
    assert div_a.last_sibling() is div_b


def test_deep_nesting_no_recursion_limit():
    n = 50_000
    d = parse("<div>" * n)
    count = sum(1 for x in walk(d) if x.tag == "div")
    assert count == n


def test_find_first_accepts_node():
    d = parse(HTML)
    div_a = find_first(d, match.id.is_("a"))
    assert div_a.attr("id") == "a"
    assert find_first(d, match.tag.TABLE) is None


def test_find_all_generator():
    d = parse(HTML)
    ps = list(find_all(d, match.tag.P))
    assert len(ps) == 2


def test_find_some_mask():
    d = parse(HTML)
    n, mask = find_some(d, match.tag.SPAN, match.id.is_("b"))
    assert n.attr("id") == "b" and mask == [False, True]
    n2, mask2 = find_some(d, match.tag.TABLE, match.tag.CAPTION)
    assert n2 is None and mask2 == [False, False]
