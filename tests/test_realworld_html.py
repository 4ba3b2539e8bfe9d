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
