"""Span extraction (engine flagship): boilerplate strip, kind mapping,
media_ref preservation, ordering."""

from gumbo_pp_ray.html import parse, extract_spans, ExtractProfile


def spans_of(html, **kw):
    profile = ExtractProfile(**kw) if kw else None
    d = parse(html)
    return extract_spans(d, profile) if profile else extract_spans(d)


def test_boilerplate_and_media_golden():
    # FIXTURES.md §3.4
    html = ("<html><head><title>T</title><style>p{}</style></head><body>"
            "<nav><a href='/'>home</a></nav>"
            "<header>hdr</header><aside>a</aside>"
            "<div class='ad-banner'>BUY</div>"
            "<article><h1>Headline</h1><p>First para.</p>"
            "<img src='img://h/p.jpg'>"
            "<p>Second para.</p>"
            "<video src='vid://h/v.mp4'></video></article>"
            "<footer>ftr</footer>"
            "<script>var x='<div>f</div>';</script></body></html>")
    assert spans_of(html) == [
        ("heading", "Headline", "", 0),
        ("text", "First para.", "", 1),
        ("media", "", "img://h/p.jpg", 2),
        ("text", "Second para.", "", 3),
        ("media", "", "vid://h/v.mp4", 4),
    ]


def test_offsets_are_sequential():
    s = spans_of("<p>a</p><p>b</p><p>c</p>")
    assert [x[3] for x in s] == [0, 1, 2]


def test_inline_flattening_single_span():
    # the reference's inner-text-normalization case (test.cpp:87-95)
    s = spans_of("<p id='example'>This is an <strong>example</strong> paragraph</p>")
    assert s == [("text", "This is an example paragraph", "", 0)]


def test_block_boundaries_split_spans():
    s = spans_of("<div>one<div>two</div>three</div>")
    assert [x[1] for x in s] == ["one", "two", "three"]


def test_kind_mapping():
    s = spans_of("<h2>h</h2><ul><li>l</li></ul><table><tr><td>c</td></tr>"
                 "</table><pre>code</pre>")
    assert [(x[0], x[1]) for x in s] == [
        ("heading", "h"), ("list_item", "l"), ("table_cell", "c"),
        ("code", "code")]


def test_table_cells_row_major():
    # table_scrape.cpp golden as spans (FIXTURES.md §3.3)
    html = ("<div id='important_table'><table><tbody>"
            "<tr><td><strong>Item</strong></td><td><strong>Quantity</strong></td></tr>"
            "<tr><td>Plate</td><td>10</td></tr>"
            "<tr><td>Bowl</td><td>5</td></tr>"
            "</tbody></table></div>")
    assert [x[1] for x in spans_of(html)] == [
        "Item", "Quantity", "Plate", "10", "Bowl", "5"]


def test_link_spans_carry_href():
    s = spans_of("<p>see <a href='https://e.com/x'>here</a> now</p>")
    assert s == [
        ("text", "see", "", 0),
        ("link", "here", "https://e.com/x", 1),
        ("text", "now", "", 2),
    ]


def test_anchor_without_href_is_inline():
    s = spans_of("<p>see <a>here</a> now</p>")
    assert s == [("text", "see here now", "", 0)]


def test_media_src_fallback_data_src():
    s = spans_of("<img data-src='lazy://x.jpg'>")
    assert s == [("media", "", "lazy://x.jpg", 0)]


def test_ad_token_heuristics():
    for cls in ("ad", "ads", "ad-banner", "sidebar-ads", "advertisement",
                "promo", "sponsored", "cookie"):
        assert spans_of(f"<div class='{cls}'>junk</div><p>keep</p>") == [
            ("text", "keep", "", 0)], cls
    # non-ad tokens that merely contain 'ad' must NOT be stripped
    for cls in ("admin", "shadow", "grade", "loaded"):
        texts = [x[1] for x in spans_of(f"<div class='{cls}'>keep1</div>")]
        assert texts == ["keep1"], cls


def test_ad_id_heuristics():
    assert spans_of("<div id='ads'>j</div><p>k</p>") == [("text", "k", "", 0)]


def test_comments_and_cdata_excluded():
    s = spans_of("<p>a<!--no-->b</p><![CDATA[zz]]>")
    assert s == [("text", "ab", "", 0)]


def test_form_controls_stripped():
    s = spans_of("<form><input value='v'><textarea>t</textarea>"
                 "<button>b</button></form><p>k</p>")
    assert s == [("text", "k", "", 0)]


def test_normalize_ws_default_on():
    s = spans_of("<p>a \n\t  b</p>")
    assert s == [("text", "a b", "", 0)]


def test_normalize_ws_off_preserves_raw():
    s = spans_of("<p>a \n b</p>", normalize_ws=False)
    assert s == [("text", "a \n b", "", 0)]


def test_custom_strip_profile():
    s = spans_of("<nav>n</nav><p>k</p>", strip_tags=frozenset({"script"}))
    assert [x[1] for x in s] == ["n", "k"]


def test_empty_and_whitespace_only_docs():
    assert spans_of("") == []
    assert spans_of("   \n\t ") == []
    assert spans_of("<div>   </div>") == []


def test_nested_list_items():
    s = spans_of("<ul><li>a<ul><li>b</li></ul></li></ul>")
    assert [(x[0], x[1]) for x in s] == [("list_item", "a"), ("list_item", "b")]


def test_scrape_table_reference_golden():
    # the reference's table-scrape query (tests/src/table_scrape.cpp)
    from gumbo_pp_ray.html.extract import scrape_table
    from gumbo_pp_ray.html import parse, match
    doc = parse(
        "<html><head><title>Table example</title></head><body>"
        "<div id='important_table'><table><tbody>"
        "<tr><td><strong>Item</strong></td><td><strong>Quantity</strong></td></tr>"
        "<tr><td>Plate</td><td>10</td></tr>"
        "<tr><td>Bowl</td><td>5</td></tr>"
        "</tbody></table></div></body>")
    rows = scrape_table(doc, match.tag.DIV & match.id.is_("important_table"))
    assert rows == [["Item", "Quantity"], ["Plate", "10"], ["Bowl", "5"]]
    # CSV golden (reference stdout format)
    assert "\n".join(",".join(r) for r in rows) == \
        "Item,Quantity\nPlate,10\nBowl,5"


def test_scrape_table_defaults_and_misses():
    from gumbo_pp_ray.html.extract import scrape_table
    from gumbo_pp_ray.html import parse, match
    assert scrape_table(parse("<p>none</p>")) == []
    assert scrape_table(parse("<table><tr><th>h</th></tr></table>")) == [["h"]]
    # scope with no table inside
    doc = parse("<div id='x'>text</div><table><tr><td>y</td></tr></table>")
    assert scrape_table(doc, match.id.is_("x")) == []


def test_default_strip_selector_algebra():
    # the strip set expressed in the reference's selector algebra
    # (SURVEY.md §2.4) agrees with the profile's is_stripped on the
    # element classes it covers
    from gumbo_pp_ray.html.extract import _default_strip_selector, DEFAULT_PROFILE
    from gumbo_pp_ray.html import parse, walk
    sel = _default_strip_selector()
    d = parse("<nav>n</nav><script>s</script><div class='ad-banner'>a</div>"
              "<p>keep</p><article>k</article>")
    for n in walk(d):
        if n.tag in ("nav", "script"):
            assert sel(n) and DEFAULT_PROFILE.is_stripped(n)
        if n.tag == "div":
            assert sel(n) and DEFAULT_PROFILE.is_stripped(n)
        if n.tag in ("p", "article"):
            assert not sel(n) and not DEFAULT_PROFILE.is_stripped(n)


def test_pre_preserves_internal_whitespace():
    s = spans_of("<pre>def f():\n    return 1\n</pre><p>a   b</p>")
    assert s[0] == ("code", "def f():\n    return 1", "", 0)
    assert s[1] == ("text", "a b", "", 1)   # prose still collapses
    assert spans_of("<pre>   \n  </pre>") == []   # ws-only pre dropped


def test_extract_metadata():
    from gumbo_pp_ray.html.extract import extract_metadata
    from gumbo_pp_ray.html import parse
    m = extract_metadata(parse(
        '<html lang="fr"><head><title>T  One</title>'
        '<meta name="description" content="D">'
        '<meta name="keywords" content="k1,k2">'
        '<meta property="og:title" content="OT">'
        '<link rel="canonical" href="https://c/x"></head>'
        '<body><title>ignored</title></body></html>'))
    assert m == {"title": "T One", "description": "D",
                 "keywords": "k1,k2", "canonical": "https://c/x",
                 "lang": "fr", "og": {"title": "OT"}}
    empty = extract_metadata(parse("<p>nothing</p>"))
    assert empty["title"] == "" and empty["og"] == {}


def test_svg_and_mathml_subtrees_stripped():
    from gumbo_pp_ray.html.extract import DEFAULT_PROFILE, extract_spans
    from gumbo_pp_ray.html.parser import parse

    page = ("<html><body><article><p>Real text.</p>"
            "<svg viewBox='0 0 10 10'><title>chart</title>"
            "<text x='1' y='1'>42%</text></svg>"
            "<math><mi>x</mi><mo>=</mo><mn>1</mn></math>"
            "<p>More text.</p></article></body></html>")
    spans = list(extract_spans(parse(page), DEFAULT_PROFILE))
    texts = [s[1] for s in spans]
    assert texts == ["Real text.", "More text."]
