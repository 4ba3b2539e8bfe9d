"""Text extraction semantics (reference gumbo_text.h, E1-E3)."""

from gumbo_pp_ray.html import (
    parse, walk, content_text, inner_text, outer_text, match,
)
from gumbo_pp_ray.html.walk import find_first


def el(doc, tagname):
    return find_first(walk(doc), match.tag.types(tagname))


def test_content_text_recursive_dfs_concat():
    d = parse("<div>a<b>b1<i>b2</i></b>c</div>")
    assert content_text(el(d, "div")) == "ab1b2c"


def test_content_text_includes_whitespace_nodes():
    d = parse("<div> <p>x</p> </div>")
    assert content_text(el(d, "div")) == " x "


def test_content_text_includes_comment_text():
    # reference semantics: comment text IS included
    # (gumbo_text.h:23-58 default branch)
    d = parse("<div>a<!--mid-->b</div>")
    assert content_text(el(d, "div")) == "amidb"
    # engine option excludes it
    assert content_text(el(d, "div"), include_comments=False) == "ab"


def test_content_text_no_separators_or_normalization():
    d = parse("<div><p>a</p><p>b</p></div>")
    assert content_text(el(d, "div")) == "ab"


def test_content_text_normalize_ws_option():
    d = parse("<div>  a \n\t b  </div>")
    assert content_text(el(d, "div"), normalize_ws=True) == "a b"


def test_content_text_of_text_node():
    d = parse("<p>hello</p>")
    t = el(d, "p").children[0]
    assert content_text(t) == "hello"


def test_inner_text_raw_slice():
    html = "<div >a<b>c</b></div >"
    d = parse(html)
    assert inner_text(el(d, "div"), html) == "a<b>c</b>"


def test_inner_text_entities_stay_raw():
    html = "<p>a&amp;b</p>"
    d = parse(html)
    assert inner_text(el(d, "p"), html) == "a&amp;b"     # raw slice
    assert content_text(el(d, "p")) == "a&b"             # decoded


def test_outer_text_includes_tags():
    html = "<body><div class='x'>y</div></body>"
    d = parse(html)
    assert outer_text(el(d, "div"), html) == "<div class='x'>y</div>"


def test_document_inner_outer():
    html = "<html><body>x</body></html>"
    d = parse(html)
    assert outer_text(d, html) == html
    assert inner_text(d, html) == html  # slice from first to last child


def test_unclosed_element_inner_extends_to_eof():
    html = "<div>never closed"
    d = parse(html)
    assert inner_text(el(d, "div"), html) == "never closed"
    assert outer_text(el(d, "div"), html) == "<div>never closed"


def test_implied_element_zero_width_tags():
    html = "<p>x</p>"
    d = parse(html)
    body = el(d, "body")
    assert body.implied
    assert inner_text(body, html) == "<p>x</p>"
    assert outer_text(body, html) == "<p>x</p>"


def test_mega_flat_doc_no_recursion():
    n = 30_000
    d = parse("<div>" + "<p>x</p>" * n + "</div>")
    assert content_text(el(d, "div")) == "x" * n
