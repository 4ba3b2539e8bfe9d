"""Reference-API façade tests — the reference's two example programs
(tests/src/test.cpp, table_scrape.cpp) rewritten verbatim against the
compat surface, asserting their golden outputs."""

from gumbo_pp_ray.html import match
from gumbo_pp_ray.html.compat import (
    GumboRange, advance_until, gumbo_child_range, gumbo_range,
    node_attribute_value, node_content_text, node_inner_text,
    node_outer_text,
)
from gumbo_pp_ray.html.walk import find_all, find_first, find_some

HTML = ("\n<html>\n\t<head>\n\t\t<title>Test</title>\n\t</head>\n\t"
        "<body><div class='hello'><b>Hey folks!</b></div> "
        "<a href=\"https://www.google.com\">Google</a></body>\n</html>")


def test_reference_test_cpp_program():
    doc_range = gumbo_range(HTML)

    # node_content_text of the document (test.cpp:28)
    ct = node_content_text(doc_range.document())
    assert "Test" in ct and "Hey folks!" in ct and "Google" in ct

    # for_each_if over DIV (test.cpp:32-46)
    divs = list(find_all(iter(doc_range), match.tag.DIV))
    assert len(divs) == 1
    assert node_content_text(divs[0]) == "Hey folks!"
    assert node_inner_text(divs[0], HTML) == "<b>Hey folks!</b>"

    # class_type::is("hello") (test.cpp:51-58)
    hello = find_first(iter(doc_range), match.class_type.is_("hello"))
    assert node_outer_text(hello, HTML) == \
        "<div class='hello'><b>Hey folks!</b></div>"

    # attribute::value::is (test.cpp:61-68)
    pos = find_first(iter(doc_range),
                     match.attribute.value.is_("class", "hello"))
    assert pos is hello

    # anchor (test.cpp:71-76)
    a = find_first(iter(doc_range), match.tag.A)
    assert node_content_text(a) == "Google"
    assert node_attribute_value(a, "href") == "https://www.google.com"
    assert node_attribute_value(a, "missing") == ""

    # fragment doc + composed matcher + find_some (test.cpp:79-102)
    rng2 = gumbo_range('<p id="example">This is an <strong>example'
                       '</strong> paragraph</p>')
    p = find_first(iter(rng2), match.tag.P & match.id.is_("example"))
    assert p is not None
    assert node_content_text(p) == "This is an example paragraph"
    node, mask = find_some(iter(rng2), match.tag.P, match.id.is_("example"))
    assert node is p and all(mask)


def test_reference_table_scrape_program():
    doc = ("\n<html>\n<head>\n\t<title>Table example</title>\n</head>\n"
           "<body>\n\t<div id=\"important_table\">\n\t\t<table>\n"
           "\t\t\t<tbody>\n\t\t\t\t<tr>\n"
           "\t\t\t\t\t<td><strong>Item</strong></td>\n"
           "\t\t\t\t\t<td><strong>Quantity</strong></td>\n"
           "\t\t\t\t</tr>\n\t\t\t\t<tr>\n\t\t\t\t\t<td>Plate</td>\n"
           "\t\t\t\t\t<td>10</td>\n\t\t\t\t</tr>\n\t\t\t\t<tr>\n"
           "\t\t\t\t\t<td>Bowl</td>\n\t\t\t\t\t<td>5</td>\n"
           "\t\t\t\t</tr>\n\t\t\t</tbody>\n\t\t</table>\n\t</div>\n"
           "</body>\n")
    html = gumbo_range(doc)
    from gumbo_pp_ray.html.walk import walk_from, subtree

    parent_div = find_first(iter(html),
                            match.tag.DIV & match.id.is_("important_table"))
    assert parent_div is not None
    tbl = find_first(walk_from(parent_div), match.tag.TBODY)
    assert tbl is not None
    lines = []
    for tr in find_all(gumbo_child_range(tbl), match.tag.TR):
        cells = [node_content_text(td)
                 for td in find_all(subtree(tr), match.tag.TD)]
        lines.append(",".join(cells))
    assert lines == ["Item,Quantity", "Plate,10", "Bowl,5"]


def test_range_accessors():
    rng = GumboRange("<html><body>x</body></html>")
    assert rng.root().tag == "html"
    assert rng.errors() == 0
    assert rng.document().kind == 0
    bad = GumboRange("<div>x</span></div>")
    assert bad.errors() >= 1


def test_advance_until():
    rng = gumbo_range("<div><p>a</p><span>b</span></div>")
    it = advance_until(iter(rng), match.tag.SPAN)
    first = next(iter(it))
    assert first.tag == "span"
    assert list(advance_until(iter(rng), match.tag.TABLE)) == []
