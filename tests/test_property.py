"""Property-based tests (hypothesis): generate random small DOMs,
serialize, parse, and assert structural invariants (SURVEY.md §5.2)."""

import string

from hypothesis import given, settings, strategies as st

from gumbo_pp_ray.html import (
    ELEMENT, TEXT, WHITESPACE, parse, walk, content_text, outer_text,
    inner_text, extract_spans,
)

TAGS = ["div", "span", "p", "b", "i", "section", "em", "ul", "li"]
_text = st.text(alphabet=string.ascii_letters + " ", min_size=1,
                max_size=12).filter(lambda s: not s.isspace())


@st.composite
def dom(draw, depth=0):
    """A random serialized well-formed fragment."""
    if depth >= 3 or draw(st.booleans()):
        return draw(_text)
    tag = draw(st.sampled_from(TAGS))
    n = draw(st.integers(0, 3))
    kids = "".join(draw(dom(depth + 1)) for _ in range(n))
    attr = ""
    if draw(st.booleans()):
        attr = f' class="{draw(st.sampled_from(["a", "b c", "x"]))}"'
    return f"<{tag}{attr}>{kids}</{tag}>"


@given(dom())
@settings(max_examples=120, deadline=None)
def test_parse_never_raises_and_structure_consistent(html):
    doc = parse(html)
    seen = set()
    for n in walk(doc):
        assert id(n) not in seen, "DFS revisited a node"
        seen.add(id(n))
        for i, c in enumerate(n.children):
            assert c.parent is n
            assert c.index_within_parent == i


@given(dom())
@settings(max_examples=120, deadline=None)
def test_offsets_reconstruct_slices(html):
    doc = parse(html)
    for n in walk(doc):
        if n.kind == ELEMENT and not n.implied:
            outer = outer_text(n, html)
            assert outer.startswith("<" + n.tag)
            assert html[n.start:n.end] == outer
        if n.kind in (TEXT, WHITESPACE):
            # no entities in the alphabet → decoded == raw slice
            assert html[n.start:n.end] == n.text


@given(dom())
@settings(max_examples=120, deadline=None)
def test_content_text_preserves_all_text(html):
    # every character of every text node appears in document
    # content_text, in order (DFS concat invariant)
    doc = parse(html)
    texts = [n.text for n in walk(doc) if n.kind in (TEXT, WHITESPACE)]
    assert content_text(doc) == "".join(texts)


@given(dom())
@settings(max_examples=120, deadline=None)
def test_extraction_identity_when_no_boilerplate(html):
    # none of the generated tags are in the strip set → the
    # concatenated span text must equal the normalized content text
    doc = parse(html)
    spans = extract_spans(doc)
    got = "".join(s[1] for s in spans if s[0] != "media")
    expected = content_text(doc)
    # block boundaries may split where DFS concat had no separator
    # (reference gumbo_text.h inserts none) — the character stream
    # modulo whitespace is what extraction must preserve
    assert "".join(got.split()) == "".join(expected.split())
    # offsets are the sequence 0..n-1
    assert [s[3] for s in spans] == list(range(len(spans)))


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_arbitrary_input_never_raises(blob):
    doc = parse(blob)
    extract_spans(doc)
    content_text(doc)
    for n in walk(doc):
        inner_text(n, blob)
