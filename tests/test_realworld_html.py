"""Real-world HTML oddities — hardening corpus beyond the reference's
own documents (conditional comments, malformed attributes, namespaced
tags, table scaffolding, entity edge cases)."""

import pytest

from gumbo_pp_ray.html import parse, walk, content_text, extract_spans


CASES = [
    ("unquoted attr with url",
     "<a href=http://x.com/y>L</a>",
     lambda d: [n.attr("href") for n in walk(d) if n.tag == "a"]
     == ["http://x.com/y"]),
    ("attrs jammed together",
     "<div a='1'b='2'>x</div>",
     lambda d: [n.attrs for n in walk(d) if n.tag == "div"]
     == [{"a": "1", "b": "2"}]),
    ("quote inside unquoted attr value",
     '<div class=foo"bar>x</div>',
     lambda d: [n.attrs for n in walk(d) if n.tag == "div"]
     == [{"class": 'foo"bar'}] and content_text(d) == "x"),
    ("numeric entities dec and hex",
     "<p>&#x41;&#66;</p>",
     lambda d: content_text(d) == "AB"),
    ("bare ampersand survives",
     "<p>a&ampb &lt c</p>",
     lambda d: "&" in content_text(d)),
    ("thead th plus tbody td",
     "<table><thead><tr><th>H</th></tr></thead>"
     "<tbody><tr><td>x</td></tr></tbody></table>",
     lambda d: [s[1] for s in extract_spans(d)] == ["H", "x"]),
    ("unclosed dt dd",
     "<dl><dt>term<dd>def</dl>",
     lambda d: [s[1] for s in extract_spans(d)] == ["term", "def"]),
    ("legacy doctype",
     '<!DOCTYPE HTML PUBLIC "-//W3C//DTD HTML 4.01//EN">'
     "<html><body>x</body></html>",
     lambda d: d.doctype.lower().startswith("html")),
    ("conditional comment excluded",
     "<!--[if IE]><p>ie</p><![endif]--><p>all</p>",
     lambda d: [s[1] for s in extract_spans(d)] == ["all"]),
    ("nested tables",
     "<table><tr><td><table><tr><td>inner</td></tr></table></td></tr>"
     "</table>",
     lambda d: [s[1] for s in extract_spans(d)] == ["inner"]),
    ("svg subtree stripped",
     "<svg><text>vector</text></svg><p>keep</p>",
     lambda d: [s[1] for s in extract_spans(d)] == ["keep"]),
    ("colgroup and col",
     "<table><colgroup><col span='2'></colgroup><tr><td>a</td></tr>"
     "</table>",
     lambda d: [s[1] for s in extract_spans(d)] == ["a"]),
    ("select options stripped",
     "<select><option>one</option></select><p>k</p>",
     lambda d: [s[1] for s in extract_spans(d)] == ["k"]),
    ("iframe fallback stripped",
     "<iframe><p>fallback</p></iframe><p>k</p>",
     lambda d: [s[1] for s in extract_spans(d)] == ["k"]),
    ("crlf normalized",
     "<p>a\r\nb</p>",
     lambda d: extract_spans(d)[0][1] == "a b"),
    ("namespaced office tag treated as element",
     "<o:p>ms office</o:p>",
     lambda d: content_text(d) == "ms office"),
    ("newline inside tag",
     "<a\nhref='x'>L</a>",
     lambda d: [n.attr("href") for n in walk(d) if n.tag == "a"] == ["x"]),
    ("duplicate body ignored",
     "<body><p>a</p></body><body><p>b</p></body>",
     lambda d: "".join(s[1] for s in extract_spans(d)) == "ab"),
    ("gt inside quoted attr",
     '<div title="a>b">x</div>',
     lambda d: [n.attr("title") for n in walk(d) if n.tag == "div"]
     == ["a>b"]),
    ("wbr does not split block",
     "<p>super<wbr>cali</p>",
     lambda d: "".join(s[1] for s in extract_spans(d)).replace(" ", "")
     == "supercali"),
]


@pytest.mark.parametrize("name,html,check",
                         CASES, ids=[c[0] for c in CASES])
def test_realworld_case(name, html, check):
    d = parse(html)
    assert check(d), name


# ---- misnesting family: adoption agency furthest-block + </p> synthesis


def _tags(node):
    out = []
    for c in node.children:
        if getattr(c, "tag", ""):
            out.append((c.tag, _tags(c)))
        elif getattr(c, "text", "").strip():
            out.append(("#text", c.text))
    return out


def test_adoption_agency_furthest_block():
    # spec example family: later text must NOT be inside the
    # formatting element (the defining adoption-agency behavior)
    from gumbo_pp_ray.html.parser import parse
    doc = parse("<b><p>x</b>y</p>")
    body = doc.children[0].children[1]
    assert _tags(body) == [
        ("b", []),
        ("p", [("b", [("#text", "x")]), ("#text", "y")]),
    ]
    assert doc.parse_errors == 1


def test_adoption_agency_furthest_block_with_leading_text():
    from gumbo_pp_ray.html.parser import parse
    doc = parse("<b>1<p>2</b>3</p>")
    body = doc.children[0].children[1]
    assert _tags(body) == [
        ("b", [("#text", "1")]),
        ("p", [("b", [("#text", "2")]), ("#text", "3")]),
    ]


def test_adoption_agency_empty_furthest_block():
    # spec's own misnested-tags example: <b><p></b>TEST</p>
    from gumbo_pp_ray.html.parser import parse
    doc = parse("<b><p></b>TEST</p>")
    body = doc.children[0].children[1]
    assert _tags(body) == [
        ("b", []),
        ("p", [("b", []), ("#text", "TEST")]),
    ]


def test_stray_end_p_synthesizes_empty_p():
    from gumbo_pp_ray.html.parser import parse
    doc = parse("x</p>y")
    body = doc.children[0].children[1]
    assert _tags(body) == [("#text", "x"), ("p", []), ("#text", "y")]
    assert doc.parse_errors == 1
    # inside a div too
    doc = parse("<div></p></div>")
    body = doc.children[0].children[1]
    assert _tags(body) == [("div", [("p", [])])]


def test_adoption_agency_simple_family_still_reconstructs():
    # the no-furthest-block family must keep the reconstruction path:
    # <b><i>x</b>y</i> → b>i(x), i(y)
    from gumbo_pp_ray.html.parser import parse
    doc = parse("<b><i>x</b>y</i>")
    body = doc.children[0].children[1]
    assert _tags(body) == [
        ("b", [("i", [("#text", "x")])]),
        ("i", [("#text", "y")]),
    ]


# ---- network-cut / hostile-input probes (verify-skill checklist)


def test_truncated_mid_attribute_recovers():
    from gumbo_pp_ray.html.parser import parse
    doc = parse('<div><p>keep this</p><a href="http://x.com/page?q=')
    body = doc.children[0].children[1]
    texts = [c for c in _tags(body) if c[0] == "div"]
    assert texts, _tags(body)
    assert doc.parse_errors >= 1


def test_truncated_mid_comment_and_cdata():
    from gumbo_pp_ray.html.parser import parse
    d1 = parse("<p>x</p><!-- never closed")
    assert d1.parse_errors >= 1
    d2 = parse("<p>x</p><![CDATA[never closed")
    assert d2.parse_errors >= 1
    for d in (d1, d2):
        body = d.children[0].children[1]
        assert _tags(body)[0] == ("p", [("#text", "x")])


def test_script_with_fake_closers_and_concat_trap():
    from gumbo_pp_ray.html.extract import DEFAULT_PROFILE, extract_spans
    from gumbo_pp_ray.html.parser import parse
    page = ("<html><body><script>var a = '</div>' + '</p>' + "
            "'</scr' + 'ipt>'; if (a < b && c > d) {}</script>"
            "<p>visible</p></body></html>")
    doc = parse(page)
    spans = list(extract_spans(doc, DEFAULT_PROFILE))
    assert [s[1] for s in spans] == ["visible"]


def test_million_char_flat_text_single_doc():
    from gumbo_pp_ray.html.parser import parse
    from gumbo_pp_ray.html.text import content_text
    big = "word " * 200_000
    doc = parse(f"<html><body><p>{big}</p></body></html>")
    body = doc.children[0].children[1]
    p = body.children[0]
    assert len(content_text(p)) == len(big)


# ---- table + mis-nesting conformance audit (round-3, FIXTURES.md §audit)
# Expected span sequences hand-derived from the HTML5 tree-construction
# spec (the algorithm gumbo implements); divergences kept on purpose are
# recorded as contract decisions in FIXTURES.md.

TABLE_MISNEST_CASES = [
    ("foster text in table", "<table>lost<tr><td>a</td></tr></table>",
     [("text", "lost"), ("table_cell", "a")]),
    ("foster text in tr", "<table><tr>x<td>a</td></tr></table>",
     [("text", "x"), ("table_cell", "a")]),
    ("implied td close", "<table><tr><td>a<td>b</table>",
     [("table_cell", "a"), ("table_cell", "b")]),
    ("implied tr close", "<table><tr><td>a<tr><td>b</table>",
     [("table_cell", "a"), ("table_cell", "b")]),
    ("caption before rows",
     "<table><caption>Cap</caption><tr><td>a</td></tr></table>",
     [("text", "Cap"), ("table_cell", "a")]),
    ("tfoot before tbody kept in DOM order",
     "<table><tfoot><tr><td>f</td></tr></tfoot>"
     "<tbody><tr><td>b</td></tr></tbody></table>",
     [("table_cell", "f"), ("table_cell", "b")]),
    ("table start closes open p",
     "<p>before<table><tr><td>in</td></tr></table>after",
     [("text", "before"), ("table_cell", "in"), ("text", "after")]),
    ("a start implies close of open a",
     "<a href=1>one<a href=2>two</a>",
     [("link", "one"), ("link", "two")]),
    ("li implied closes", "<ul><li>a<li>b</ul>",
     [("list_item", "a"), ("list_item", "b")]),
    ("blocks inside cell keep block kinds",   # contract decision
     "<table><tr><td><p>pa</p><p>pb</p></td></tr></table>",
     [("text", "pa"), ("text", "pb")]),
    ("mixed th td implied closes",
     "<table><tbody><tr><th>h1<td>d1</table>",
     [("table_cell", "h1"), ("table_cell", "d1")]),
    ("div start closes open p", "<div><p>one<div>two</div>three",
     [("text", "one"), ("text", "two"), ("text", "three")]),
    ("text after row fostered before table",
     "<table><tr><td>a</td></tr>zz</table>",
     [("text", "zz"), ("table_cell", "a")]),
    ("form in table inserted empty, rows survive",
     "<table><form><tr><td>x</td></tr></form></table>",
     [("table_cell", "x")]),
    ("element fostered out of table",
     "<table><div>d</div><tr><td>a</td></tr></table>",
     [("text", "d"), ("table_cell", "a")]),
    ("nested table inside cell",
     "<table><tr><td>o<table><tr><td>i</td></tr></table></td></tr>"
     "</table>",
     [("table_cell", "o"), ("table_cell", "i")]),
    ("whitespace-only table text dropped",
     "<table> <tr> <td>a</td> </tr> </table>",
     [("table_cell", "a")]),
    ("form in cell stripped as boilerplate",  # contract decision
     "<table><tr><td><form><input name=q></form>keep</td></tr></table>",
     [("table_cell", "keep")]),
]


@pytest.mark.parametrize("name,html,expected", TABLE_MISNEST_CASES,
                         ids=[c[0] for c in TABLE_MISNEST_CASES])
def test_table_misnest_conformance(name, html, expected):
    from gumbo_pp_ray.html.extract import DEFAULT_PROFILE
    d = parse(html)
    spans = [(s[0], s[1]) for s in extract_spans(d, DEFAULT_PROFILE)]
    assert spans == expected, name


def test_noahs_ark_bounds_formatting_reconstruction():
    """At most 3 identical formatting entries survive in the active
    list (HTML5 Noah's Ark clause): churn input must parse in linear
    time and reconstruction depth must cap at 3."""
    import time
    from gumbo_pp_ray.html.parser import parse

    doc = parse("<p>" + "<b>" * 10 + "x</p><p>y</p>")
    body = doc.children[0].children[1]
    node, depth = body.children[1], 0
    while node.children and getattr(node.children[0], "tag", "") == "b":
        node = node.children[0]
        depth += 1
    assert depth == 3

    # distinct attrs are distinct ark entries: no eviction below 4
    doc = parse('<p><b class="a"><b class="b">x</p><p>y</p>')
    body = doc.children[0].children[1]
    node, depth = body.children[1], 0
    while node.children and getattr(node.children[0], "tag", "") == "b":
        node = node.children[0]
        depth += 1
    assert depth == 2

    t0 = time.perf_counter()
    parse("<p><b></p>" * 3000 + "x")
    assert time.perf_counter() - t0 < 5.0   # was ~25s (O(N^2)) before


def test_deep_misnesting_preserves_text_order():
    """Formatting-above-formatting and multi-block misnesting: the
    single-furthest-block adoption agency may shape the tree slightly
    differently from the spec's multi-iteration loop on exotic inputs,
    but the OBSERVABLE contract — span text sequence in document
    order — must hold (and does match the spec tree for the common
    family, see test_adoption_agency_*)."""
    from gumbo_pp_ray.html.extract import DEFAULT_PROFILE, extract_spans
    from gumbo_pp_ray.html.parser import parse

    for html, want in [
        ("<i><b><p>x</b>y</i>z", "xyz"),
        ("<b><p>1<div>2</b>3", "123"),
        ("<p><i>1<b>2</p><p>3</b>4</i>5</p>", "12345"),
        ("<a href=u><div>card</div></a>after", "cardafter"),
    ]:
        doc = parse(html)
        got = "".join(s[1] for s in extract_spans(doc, DEFAULT_PROFILE))
        assert got == want, (html, got)
    # the block-link (valid HTML5) keeps its link identity
    doc = parse("<a href=u><div>card</div></a>after")
    kinds = [s[0] for s in extract_spans(doc, DEFAULT_PROFILE)]
    assert kinds == ["link", "text"]


def test_random_garbage_never_raises():
    """Arbitrary byte soup (decoded with replacement) must parse to a
    tree — never raise; the pipeline's per-row quarantine only covers
    genuine crashes, so the kernel's contract is total."""
    import random
    from gumbo_pp_ray.html.extract import DEFAULT_PROFILE, extract_spans

    rng = random.Random(11)
    for _ in range(40):
        raw = bytes(rng.randrange(256)
                    for _ in range(rng.randint(0, 3000)))
        d = parse(raw.decode("utf-8", errors="replace"))
        list(extract_spans(d, DEFAULT_PROFILE))
        assert d.parse_errors >= 0


def test_forum_post_unclosed_bold_across_blocks():
    """Real-world shape (FIXTURES §6 item 4): forum posts routinely
    leave <b>/<strong> unclosed across several paragraphs and a quote
    box; the close then lands blocks later.  Pins the full span-kind
    and text order over the multi-block misnesting (the case the
    single-furthest-block form must keep observable-correct)."""
    from gumbo_pp_ray.html.extract import DEFAULT_PROFILE, extract_spans
    from gumbo_pp_ray.html.parser import parse

    html = ("<html><body>"
            "<p>intro</p>"
            "<b>shouting starts"
            "<p>first bold para</p>"
            "<div class=quote>quoted reply</div>"
            "more shouting</b> calm now"
            "<p>outro</p></body></html>")
    doc = parse(html)
    spans = extract_spans(doc, DEFAULT_PROFILE)
    assert [s[1] for s in spans if s[0] == "text"] == [
        "intro", "shouting starts", "first bold para", "quoted reply",
        "more shouting calm now", "outro"]
    texts = "".join(s[1] for s in spans)
    assert texts == ("introshouting startsfirst bold para"
                     "quoted replymore shouting calm nowoutro")


def test_news_article_italic_crossing_list():
    """<i> opened mid-paragraph, closed inside a later list item —
    the emphasis crosses p → ul/li block boundaries (a pattern from
    CMS-pasted copy).  Text order and heading/link kinds must hold."""
    from gumbo_pp_ray.html.extract import DEFAULT_PROFILE, extract_spans
    from gumbo_pp_ray.html.parser import parse

    html = ("<article><h2>Titles</h2>"
            "<p>lead <i>emphatic</p>"
            "<ul><li>alpha</li><li>beta</i> tail</li></ul>"
            "<p>closer</p></article>")
    doc = parse(html)
    spans = extract_spans(doc, DEFAULT_PROFILE)
    assert spans[0] == ("heading", "Titles", "", 0)
    assert "".join(s[1] for s in spans) == (
        "Titleslead emphaticalphabeta tailcloser")


def test_nested_divs_inside_formatting_close():
    """</b> with TWO open divs above the b (stack [b, div, div]) —
    beyond the single-furthest-block shape, so the pop-through path
    runs; later text must NOT be bold-wrapped and order must hold."""
    from gumbo_pp_ray.html.extract import DEFAULT_PROFILE, extract_spans
    from gumbo_pp_ray.html.parser import parse
    from gumbo_pp_ray.html.walk import walk

    html = "<b><div>1<div>2</b>3</div>4</div>5"
    doc = parse(html)
    got = "".join(s[1] for s in extract_spans(doc, DEFAULT_PROFILE))
    assert got == "12345"
    # '3' must not sit under any b element (the close is honored)
    for node in walk(doc):
        if getattr(node, "tag", "") == "b":
            sub = "".join(
                t.text for t in _subtree_text_nodes(node))
            assert "3" not in sub and "4" not in sub and "5" not in sub


def _subtree_text_nodes(node):
    from gumbo_pp_ray.html.dom import TEXT
    from gumbo_pp_ray.html.walk import subtree
    return [n for n in subtree(node)
            if getattr(n, "type", None) == TEXT]


# ---- full adoption agency: multi-block misnesting (round-5 closure of
# the single-furthest-block divergence — VERDICT r4 item 7).  Trees are
# the WHATWG algorithm's (html5lib adoption01 family); span TEXT order
# is the contract the extractor exports.

MULTIBLOCK_CASES = [
    # (name, html, expected (kind, text) span sequence)
    ("two nested blocks",
     "<b>1<div>2<div>3</b>4</div>5</div>",
     [("text", "1"), ("text", "2"), ("text", "34"), ("text", "5")]),
    ("three nested blocks",
     "<i>a<div>b<div>c<div>d</i>e</div>f</div>g</div>h",
     [("text", "a"), ("text", "b"), ("text", "c"), ("text", "de"),
      ("text", "f"), ("text", "g"), ("text", "h")]),
    ("anchor across block",
     "<a href='u'>1<p>2</a>3</p>",
     [("link", "1"), ("link", "2"), ("text", "3")]),
    ("formatting pair across block",
     "<b>1<i>2<p>3</b>4</p>5</i>6",
     [("text", "12"), ("text", "34"), ("text", "56")]),
    ("heading as furthest block",
     "<b>t<h1>head</b>tail</h1>rest",
     [("text", "t"), ("heading", "headtail"), ("text", "rest")]),
    ("table between formatting",
     "<b>A<table><tr><td>B</td></tr></table>C</b>",
     [("text", "A"), ("table_cell", "B"), ("text", "C")]),
    ("em strong crossing p",
     "<em><p>x<strong>y</p>z</em>w",
     [("text", "xy"), ("text", "zw")]),
    ("p ladder reconstruction",
     "<b><p>A</b><p>B</b><p>C",
     [("text", "A"), ("text", "B"), ("text", "C")]),
]


@pytest.mark.parametrize("name,html,expected", MULTIBLOCK_CASES,
                         ids=[c[0] for c in MULTIBLOCK_CASES])
def test_multiblock_misnesting_span_sequence(name, html, expected):
    d = parse(html)
    assert [(s[0], s[1]) for s in extract_spans(d)] == expected, name


def test_adoption_agency_clones_into_every_block():
    # the defining multi-iteration shape (html5lib adoption01):
    # <a>1<div>2<div>3</a> → a(1); div[a(2), div[a(3)]]
    from gumbo_pp_ray.html.parser import parse as p
    doc = p("<a>1<div>2<div>3</a>4</div>5</div>")
    body = doc.children[0].children[1]
    assert _tags(body) == [
        ("a", [("#text", "1")]),
        ("div", [
            ("a", [("#text", "2")]),
            ("div", [("a", [("#text", "3")]), ("#text", "4")]),
            ("#text", "5"),
        ]),
    ]


def test_adoption_agency_inner_loop_clones_intermediates():
    # <b>1<i>2<p>3</b>4: i is BETWEEN fe and the furthest block —
    # the inner loop clones it: b[1, i[2]], i'[p[b'[3], 4]]
    from gumbo_pp_ray.html.parser import parse as p
    doc = p("<b>1<i>2<p>3</b>4")
    body = doc.children[0].children[1]
    assert _tags(body) == [
        ("b", [("#text", "1"), ("i", [("#text", "2")])]),
        ("i", [("p", [("b", [("#text", "3")]), ("#text", "4")])]),
    ]


def test_formatting_end_tag_never_crosses_table_cell():
    # the afe MARKER case: <b> opened before a <td> is invisible to a
    # </b> inside the cell (spec: any-other-end-tag stops at SPECIAL)
    from gumbo_pp_ray.html.parser import parse as p
    doc = p("<b>x<table><tr><td>y</b>z</td></tr></table>")
    spans = [(s[0], s[1]) for s in extract_spans(doc)]
    assert spans == [("text", "x"), ("table_cell", "yz")]


def test_adoption_foster_no_table_keeps_rest_of_document():
    """Adoption agency with a table-scaffold common ancestor but NO
    open <table>: the foster fallback must insert before/into the
    html element — never the stack top, which at that point is the
    furthest block itself (a detached parent cycle that silently
    swallowed everything after the trigger; round-5 review finding,
    fuzz-reproduced on stray-scaffold + misnested formatting soup)."""
    from gumbo_pp_ray.html.parser import parse
    from gumbo_pp_ray.html.text import content_text
    from gumbo_pp_ray.html.walk import walk

    for src, want in (("<tr><em><p></em>w", "w"),
                      ("<tbody><b><div></b>LOST", "LOST"),
                      ("<thead><i><section></i>tail kept", "tail kept")):
        doc = parse(src)
        assert content_text(doc) == want, src
        # and the tree is a tree: the walk terminates and sees a
        # bounded node count (a parent cycle would loop forever)
        assert sum(1 for _ in walk(doc)) < 50


def test_adoption_clone_offsets_monotonic():
    """Intermediate adoption clones anchor at their first child's
    start: parent.start <= child.start everywhere, so raw slices of
    adopted subtrees recover real source."""
    from gumbo_pp_ray.html.parser import parse

    doc = parse("<b>1<i>2<p>3</b>4")

    def check(node):
        for c in node.children:
            ns = getattr(node, "start", None)
            cs = getattr(c, "start", None)
            if ns is not None and cs is not None:
                assert cs >= ns, (node.tag, ns, getattr(c, "tag", "txt"),
                                  cs)
            check(c)

    check(doc)
