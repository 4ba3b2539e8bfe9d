"""PDF/layout plumbing tests: stub decode determinism, reading-order
reconstruction (incl. two-column pages), Ray pipeline shape."""

import pyarrow as pa
import pytest

from gumbo_pp_ray.stages.pdf import PdfParse, layout_to_spans


def payload_tbl():
    return pa.table({
        "doc_id": pa.array(["p1", "p2"], pa.string()),
        "payload": pa.array([b"fake-pdf-bytes-1", b"fake-pdf-bytes-2"],
                            pa.binary()),
    })


def test_fake_parse_deterministic():
    p = PdfParse(parser="fake")
    a = p(payload_tbl()).to_pylist()
    b = p(payload_tbl()).to_pylist()
    assert a == b and len(a) > 0
    assert {r["doc_id"] for r in a} == {"p1", "p2"}
    cols = set(a[0].keys())
    assert {"page", "block_idx", "text", "x0", "y0", "x1", "y1"} <= cols


def test_real_parser_raises():
    with pytest.raises(NotImplementedError):
        PdfParse(parser="real")
    with pytest.raises(ValueError):
        PdfParse(parser="nope")


def test_reading_order_two_columns():
    # page with two columns: reading order = row by row, left then right
    rows = []
    for b, (x, y, txt) in enumerate([
            (72.0, 700.0, "L1"), (306.0, 701.0, "R1"),
            (72.0, 600.0, "L2"), (306.0, 599.0, "R2")]):
        rows.append({"doc_id": "d", "page": 0, "block_idx": b,
                     "text": txt, "x0": x, "y0": y,
                     "x1": x + 200, "y1": y + 60})
    batch = pa.Table.from_pylist(rows)
    out = layout_to_spans(batch).to_pylist()
    assert [s["text"] for s in out[0]["spans"]] == ["L1", "R1", "L2", "R2"]
    assert [s["offset"] for s in out[0]["spans"]] == [0, 1, 2, 3]


def test_reading_order_pages_sorted():
    rows = [
        {"doc_id": "d", "page": 1, "block_idx": 0, "text": "second",
         "x0": 72.0, "y0": 700.0, "x1": 272.0, "y1": 760.0},
        {"doc_id": "d", "page": 0, "block_idx": 0, "text": "first",
         "x0": 72.0, "y0": 100.0, "x1": 272.0, "y1": 160.0},
    ]
    out = layout_to_spans(pa.Table.from_pylist(rows)).to_pylist()
    assert [s["text"] for s in out[0]["spans"]] == ["first", "second"]


def test_pdf_pipeline_over_ray(ray_session):
    import ray.data
    ds = ray.data.from_arrow(payload_tbl())
    out = (ds.map_batches(PdfParse, fn_constructor_kwargs={"parser": "fake"},
                          batch_format="pyarrow", batch_size=16,
                          concurrency=2)
             .map_batches(layout_to_spans, batch_format="pyarrow",
                          batch_size=None))
    rows = out.take_all()
    ids = {r["doc_id"] for r in rows}
    assert ids == {"p1", "p2"}
    for r in rows:
        offs = [s["offset"] for s in r["spans"]]
        assert offs == list(range(len(offs)))


def test_prune_link_runs():
    from gumbo_pp_ray.html.extract import prune_link_runs
    nav = [("link", f"item{i}", f"/{i}", i) for i in range(4)]
    prose = [("text", "a genuinely long paragraph of real prose", "", 4),
             ("link", "ref", "/r", 5),
             ("text", "and more genuinely long prose follows here", "", 6)]
    out = prune_link_runs(nav + prose)
    assert [s[1] for s in out] == [
        "a genuinely long paragraph of real prose", "ref",
        "and more genuinely long prose follows here"]
    assert [s[3] for s in out] == [0, 1, 2]
    # below min_links: kept
    assert prune_link_runs(nav[:2]) == [(k, t, m, i) for i, (k, t, m, _x)
                                        in enumerate(nav[:2])]
    assert prune_link_runs([]) == []


def test_pdf_parse_auto_probe_fallback():
    import pytest

    from gumbo_pp_ray.stages import pdf as m

    p = m.PdfParse(parser="auto")
    assert p.mode == "mini"          # no pypdf → real mini extractor
    with pytest.raises(NotImplementedError):
        m.PdfParse(parser="real")
    with pytest.raises(ValueError):
        m.PdfParse(parser="nope")


def test_pdf_parse_real_path_with_fake_lib(monkeypatch):
    import pyarrow as pa

    from gumbo_pp_ray.stages import pdf as m

    class FakePage:
        def __init__(self, text):
            self._t = text
        def extract_text(self):
            return self._t

    class FakeReader:
        def __init__(self, fp):
            self.pages = [FakePage("intro para\n\nsecond para"),
                          FakePage("last page")]

    class FakeLib:
        PdfReader = FakeReader

    monkeypatch.setattr(m, "probe_pdf_lib", lambda: FakeLib)
    p = m.PdfParse(parser="auto")
    assert p.mode == "real"
    out = p(pa.table({"doc_id": ["d"], "payload": [b"%PDF-1.7 fake"]}))
    texts = out.column("text").to_pylist()
    assert texts == ["intro para", "second para", "last page"]
    assert out.column("page").to_pylist() == [0, 0, 1]


@pytest.mark.realcodec
def test_pdf_parse_real_lib_roundtrip():
    """Real-lib CI hook: runs the ACTUAL pypdf parse path the moment a
    wheel is available (skipped in lib-less containers)."""
    import io
    from gumbo_pp_ray.stages.pdf import PdfParse, probe_pdf_lib

    pypdf = probe_pdf_lib()
    if pypdf is None:
        pytest.skip("pypdf not installed")
    writer = pypdf.PdfWriter()
    writer.add_blank_page(width=612, height=792)
    buf = io.BytesIO()
    writer.write(buf)
    p = PdfParse(parser="real")
    assert p.mode == "real"
    out = p(pa.table({"doc_id": ["d"], "payload": [buf.getvalue()]}))
    # a blank page extracts no text blocks; the decode path must still
    # run without tripping the per-doc quarantine
    assert out.num_rows == 0


def test_synth_pdf_is_wellformed():
    """The synthesized PDFs are honest: header, object table, page
    tree, xref, trailer — and every content stream is addressable
    through the /Pages → /Page → /Contents chain."""
    import re

    from gumbo_pp_ray.stages import pdf as p

    raw = p.synth_pdf_bytes(7)
    assert raw.startswith(b"%PDF-1.4")
    assert raw.rstrip().endswith(b"%%EOF")
    assert b"/Type /Catalog" in raw and b"xref" in raw
    n_objs = len(re.findall(rb"\d+ 0 obj", raw))
    assert len(re.findall(rb"endobj", raw)) == n_objs


def test_mini_pdf_layout_recovers_reading_order():
    """Blocks are written to the streams in REVERSED order; the mini
    extractor + layout_to_spans must restore p-asc, block-asc order
    from the real Td coordinates."""
    import pyarrow as pa

    from gumbo_pp_ray.stages import pdf as p

    doc_id = 5                       # 2 pages: 4 blocks then 2
    rows = p.mini_pdf_layout(str(doc_id), p.synth_pdf_bytes(doc_id))
    # stream order is reversed per page
    assert rows[0][3] == "doc 5 p0 b3"
    cols = list(zip(*rows))
    batch = pa.table({
        "doc_id": pa.array(cols[0]),
        "page": pa.array(cols[1], pa.int32()),
        "block_idx": pa.array(cols[2], pa.int32()),
        "text": pa.array(cols[3]),
        "x0": pa.array(cols[4], pa.float32()),
        "y0": pa.array(cols[5], pa.float32()),
        "x1": pa.array(cols[6], pa.float32()),
        "y1": pa.array(cols[7], pa.float32()),
    })
    spans = p.layout_to_spans(batch).to_pylist()[0]["spans"]
    assert [s["text"] for s in spans] == [
        "doc 5 p0 b0", "doc 5 p0 b1", "doc 5 p0 b2", "doc 5 p0 b3",
        "doc 5 p1 b0", "doc 5 p1 b1"]
    assert [s["offset"] for s in spans] == [0, 1, 2, 3, 4, 5]


def test_mini_pdf_handles_escapes_and_junk():
    from gumbo_pp_ray.stages import pdf as p

    assert p.mini_pdf_layout("x", b"not a pdf at all") == []
    assert p.mini_pdf_layout("x", b"") == []
    # escaped parens/backslash inside a Tj string
    pdf = p.synth_pdf_bytes(0).replace(
        b"(doc 0 p0 b0)", rb"(a \(b\) c \\ d)")
    texts = [r[3] for r in p.mini_pdf_layout("x", pdf)]
    assert r"a (b) c \ d" in texts


def test_pdfparse_mini_mode_selection():
    import pytest

    from gumbo_pp_ray.stages import pdf as p

    assert p.PdfParse(parser="mini").mode == "mini"
    assert p.PdfParse(parser="auto").mode == "mini"   # no pypdf here
    assert p.PdfParse(parser="fake").mode == "fake"
    with pytest.raises(NotImplementedError):
        p.PdfParse(parser="real")
