"""End-to-end Ray Data pipeline tests: span-sequence equality vs the
single-process kernel, mega-doc split/reassembly, quarantine,
checkpoint/resume."""

import json
import os
import shutil

import pyarrow as pa
import pytest

from gumbo_pp_ray.html import parse, extract_spans
from gumbo_pp_ray.pipelines.corpus import CorpusSpec, gen_corpus, write_corpus
from gumbo_pp_ray.stages.assemble import assemble_payloads, assemble_html
from gumbo_pp_ray.stages.split import SplitMegaDocs
from gumbo_pp_ray.stages.extractor import ExtractSpans


def kernel_reference(table: pa.Table) -> dict:
    """Single-process ground truth: per doc, assemble + parse + extract
    with the local kernel (what span-sequence equality is measured
    against)."""
    out = {}
    for doc_id, html in zip(table.column("doc_id").to_pylist(),
                            assemble_payloads(table)):
        out[doc_id] = extract_spans(parse(html))
    return out


# ---------- local (no-Ray) stage units ----------

def test_assemble_joins_in_offset_order():
    t = pa.table({
        "doc_id": ["a"],
        "spans": [[
            {"kind": "text", "text": "<p>B</p>", "media_ref": "", "offset": 1},
            {"kind": "text", "text": "<p>A</p>", "media_ref": "", "offset": 0},
        ]],
    })
    assert assemble_payloads(t) == ["<p>A</p><p>B</p>"]
    out = assemble_html(t)
    assert out.column("html").to_pylist() == ["<p>A</p><p>B</p>"]


def test_split_fast_path_adds_constant_columns():
    t = gen_corpus(CorpusSpec(num_docs=10, mega_every=0))
    out = SplitMegaDocs(10_000)(t)
    assert out.num_rows == t.num_rows
    assert set(out.column("n_chunks").to_pylist()) == {1}


def test_split_chunks_mega_docs():
    t = gen_corpus(CorpusSpec(num_docs=5, mega_every=2, mega_spans=300))
    out = SplitMegaDocs(64)(t)
    assert out.num_rows > t.num_rows
    by_doc = {}
    for r in out.to_pylist():
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        n = rows[0]["n_chunks"]
        assert len(rows) == n
        assert sorted(r["chunk_id"] for r in rows) == list(range(n))
        assert all(len(r["spans"]) <= 64 for r in rows)


def test_extractor_quarantines_oversize():
    t = pa.table({
        "doc_id": ["big", "ok"],
        "spans": [
            [{"kind": "text", "text": "<p>" + "x" * 100 + "</p>",
              "media_ref": "", "offset": 0}],
            [{"kind": "text", "text": "<p>fine</p>", "media_ref": "",
              "offset": 0}],
        ],
    })
    out = ExtractSpans(max_doc_bytes=50)(t)
    rows = out.to_pylist()
    assert rows[0]["status"] == "oversize" and rows[0]["spans"] == []
    assert rows[1]["status"] == "ok"
    assert rows[1]["spans"][0]["text"] == "fine"


def test_extractor_batch_never_raises_on_garbage():
    t = pa.table({
        "doc_id": ["g1", "g2"],
        "spans": [
            [{"kind": "text", "text": "\x00<<<!%", "media_ref": "", "offset": 0}],
            [{"kind": "text", "text": "", "media_ref": "", "offset": 0}],
        ],
    })
    out = ExtractSpans()(t)
    assert out.column("status").to_pylist() == ["ok", "ok"]


# ---------- Ray e2e ----------

@pytest.fixture(scope="module")
def corpus_table():
    return gen_corpus(CorpusSpec(num_docs=80, mega_every=25, mega_spans=400))


@pytest.mark.parametrize("reassembly", ["map", "shuffle"])
def test_e2e_span_sequence_equality(ray_session, corpus_table, reassembly):
    import ray.data
    from gumbo_pp_ray.pipelines.extract_pipeline import extract_dataset

    expected = kernel_reference(corpus_table)
    ds = ray.data.from_arrow(corpus_table)
    out = extract_dataset(ds, split_threshold=64, reassembly=reassembly,
                          concurrency=2, batch_size=16)
    rows = out.take_all()
    assert len(rows) == corpus_table.num_rows
    for r in rows:
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"])
               for s in r["spans"]]
        assert got == expected[r["doc_id"]], r["doc_id"]
        assert r["status"] == "ok"


def test_e2e_no_split_pure_map_path(ray_session, corpus_table):
    import ray.data
    from gumbo_pp_ray.pipelines.extract_pipeline import extract_dataset

    expected = kernel_reference(corpus_table)
    ds = ray.data.from_arrow(corpus_table)
    out = extract_dataset(ds, split_threshold=None, concurrency=2,
                          batch_size=16)
    for r in out.take_all():
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"])
               for s in r["spans"]]
        assert got == expected[r["doc_id"]]


def test_run_extraction_resume(ray_session, tmp_path):
    from gumbo_pp_ray.pipelines.extract_pipeline import run_extraction

    inp = str(tmp_path / "corpus")
    out1 = str(tmp_path / "out")
    write_corpus(inp, CorpusSpec(num_docs=40, mega_every=0), files=4)

    s1 = run_extraction(inp, out1, files_per_wave=1, concurrency=2,
                        batch_size=16)
    assert s1["waves_total"] == 4 and s1["waves_run"] == 4
    assert s1["docs"] == 40 and s1["errors"] == 0

    # simulate a crash that lost the last wave
    shutil.rmtree(os.path.join(out1, "wave-00003"))
    os.remove(os.path.join(out1, "_lineage", "wave-00003.json"))

    s2 = run_extraction(inp, out1, files_per_wave=1, concurrency=2,
                        batch_size=16)
    assert s2["waves_skipped"] == 3 and s2["waves_run"] == 1
    assert s2["docs"] == 40

    # every wave has a manifest with counters
    for i in range(4):
        with open(os.path.join(out1, "_lineage", f"wave-{i:05d}.json")) as f:
            m = json.load(f)
        assert m["docs"] == 10 and m["spans"] > 0

    # output readable and complete, byte-identical doc set
    import ray.data
    from gumbo_pp_ray.sources.io import list_input_files
    files = [f for f in list_input_files(out1) if "_lineage" not in f]
    ds = ray.data.read_parquet(files)
    assert sorted(r["doc_id"] for r in ds.select_columns(["doc_id"]).take_all()) \
        == [f"doc-{i:06d}" for i in range(40)]


def test_run_extraction_resume_uncommitted_wave(ray_session, tmp_path):
    """Crash window between the wave-dir rename and the manifest write:
    a final_dir WITHOUT a manifest is uncommitted — resume must clear
    and re-run it, not wedge on os.replace into a non-empty dir."""
    from gumbo_pp_ray.pipelines.extract_pipeline import run_extraction

    inp = str(tmp_path / "corpus")
    out1 = str(tmp_path / "out")
    write_corpus(inp, CorpusSpec(num_docs=20, mega_every=0), files=2)
    s1 = run_extraction(inp, out1, files_per_wave=1, concurrency=2,
                        batch_size=16)
    assert s1["waves_run"] == 2
    # simulate: wave dir committed, manifest write lost
    os.remove(os.path.join(out1, "_lineage", "wave-00001.json"))
    assert os.path.isdir(os.path.join(out1, "wave-00001"))
    s2 = run_extraction(inp, out1, files_per_wave=1, concurrency=2,
                        batch_size=16)
    assert s2["waves_skipped"] == 1 and s2["waves_run"] == 1
    assert s2["docs"] == 20
    assert os.path.exists(os.path.join(out1, "_lineage",
                                       "wave-00001.json"))


def test_table_scrape_query_stage(ray_session):
    import ray.data
    from gumbo_pp_ray.stages.table_query import TableScrapeQuery

    t = pa.table({"doc_id": [7], "lang": ["en"], "source": ["src3"],
                  "n_chars": [42]})
    out = (ray.data.from_arrow(t)
           .map_batches(TableScrapeQuery, batch_format="pyarrow",
                        concurrency=1).take_all())
    cells = {(r["row_idx"], r["col_idx"]): r["cell"] for r in out}
    assert cells == {(0, 0): "en", (0, 1): "src3",
                     (1, 0): "n42", (1, 1): "7"}
    assert all(r["doc_id"] == "7" for r in out)


def test_cli_gen_and_extract_and_stats(ray_session, tmp_path, capsys):
    from gumbo_pp_ray import cli

    inp = str(tmp_path / "c")
    out = str(tmp_path / "o")
    assert cli.main(["gen-corpus", "--output", inp, "--docs", "30",
                     "--files", "3", "--mega-every", "0"]) == 0
    # note: cmd_extract shuts the session down; re-init in fixture scope
    import ray
    rc = cli.main(["extract", "--input", inp, "--output", out,
                   "--files-per-wave", "2"])
    assert rc == 0
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    assert cli.main(["stats", "--output", out]) == 0
    captured = capsys.readouterr().out.strip().splitlines()
    import json
    st = json.loads(captured[-1])
    assert st["docs"] == 30 and st["errors"] == 0


def test_run_extraction_quarantine(ray_session, tmp_path):
    from gumbo_pp_ray.pipelines.extract_pipeline import run_extraction

    inp = str(tmp_path / "qc")
    out = str(tmp_path / "qo")
    write_corpus(inp, CorpusSpec(num_docs=20, mega_every=0), files=2)
    # tiny byte cap → most docs quarantined as oversize
    s = run_extraction(inp, out, files_per_wave=2, concurrency=2,
                       batch_size=8, max_doc_bytes=400)
    assert s["errors"] > 0
    assert s["docs"] == 20
    qdir = os.path.join(out, "_quarantine", "wave-00000")
    assert os.path.isdir(qdir)
    import ray.data
    from gumbo_pp_ray.sources.io import list_input_files
    bad = ray.data.read_parquet(list_input_files(qdir))
    assert bad.count() == s["errors"]
    assert set(r["status"] for r in bad.take_all()) == {"oversize"}
    # clean output contains only ok rows (filter on the path RELATIVE
    # to the run dir — the absolute tmp path itself contains the
    # substring "_quarantine" via the test name)
    good_files = [f for f in list_input_files(out)
                  if not os.path.relpath(f, out).startswith("_")]
    good = ray.data.read_parquet(good_files)
    assert good.count() == 20 - s["errors"]


def test_extractor_duplicate_payload_cache():
    html = ("<html><body><article><h1>T</h1><p>" + "word " * 50 +
            "</p></article></body></html>")
    rows = [[{"kind": "text", "text": html, "media_ref": "", "offset": 0}]
            ] * 50
    t = pa.table({"doc_id": [f"d{i}" for i in range(50)],
                  "spans": pa.array(rows, t_spans_type())})
    cached = ExtractSpans(cache_size=256)
    plain = ExtractSpans(cache_size=0)
    a, b = cached(t), plain(t)
    assert cached.cache_hits == 49 and plain.cache_hits == 0
    assert a.column("spans").to_pylist() == b.column("spans").to_pylist()
    assert a.column("n_parse_errors").to_pylist() == \
        b.column("n_parse_errors").to_pylist()


def test_extractor_cache_keys_on_span_structure():
    """Two payloads with identical concatenation but different span
    boundaries must NOT share a cache entry when chunk_spans slices
    them into different fragment groupings."""
    p1 = "<p>alpha beta</p>"
    p2 = "<p>gamma delta</p>"
    whole = p1 + p2
    rows = [
        # doc A: two spans, chunked at 1 → parsed as two fragments
        [{"kind": "text", "text": p1, "media_ref": "", "offset": 0},
         {"kind": "text", "text": p2, "media_ref": "", "offset": 1}],
        # doc B: one span with the same concatenation → one fragment
        [{"kind": "text", "text": whole, "media_ref": "", "offset": 0}],
    ]
    t = pa.table({"doc_id": ["a", "b"],
                  "spans": pa.array(rows, t_spans_type())})
    cached = ExtractSpans(cache_size=256, chunk_spans=1)
    plain = ExtractSpans(cache_size=0, chunk_spans=1)
    a, b = cached(t), plain(t)
    assert cached.cache_hits == 0          # structures differ → no reuse
    assert a.column("spans").to_pylist() == b.column("spans").to_pylist()


def t_spans_type():
    return pa.list_(pa.struct([
        ("kind", pa.string()), ("text", pa.string()),
        ("media_ref", pa.string()), ("offset", pa.int32())]))


def test_broadcast_lookup_stage(ray_session):
    import numpy as np
    import ray.data
    from gumbo_pp_ray.stages.lookup import BroadcastLookup, broadcast_dim

    dim = pa.table({"k": pa.array([5, 1, 9], pa.int64()),
                    "v": ["five", "one", "nine"]})
    ref = broadcast_dim(dim, "k", "v")
    facts = pa.table({"event_id": [1, 2, 3, 4],
                      "user_id": pa.array([1, 9, 5, 42], pa.int64())})
    out = (ray.data.from_arrow(facts)
           .map_batches(BroadcastLookup,
                        fn_constructor_kwargs={
                            "dim_ref": ref, "fk_col": "user_id",
                            "out_col": "name", "default": "?"},
                        batch_format="pyarrow", concurrency=2)
           .take_all())
    got = {r["event_id"]: r["name"] for r in out}
    assert got == {1: "one", 2: "nine", 3: "five", 4: "?"}


def test_custom_profile_ships_to_actors(ray_session):
    # profile objects (slots classes) must survive pickling into the
    # actor pool; prune_links + normalize off exercised end-to-end
    import ray.data
    from gumbo_pp_ray.html.extract import ExtractProfile
    from gumbo_pp_ray.pipelines.extract_pipeline import extract_dataset

    html = ("<div><a href='/1'>A</a><a href='/2'>B</a><a href='/3'>C</a>"
            "</div><p>real   prose stays with its   spacing</p>")
    t = pa.table({"doc_id": ["x"],
                  "spans": pa.array(
                      [[{"kind": "text", "text": html, "media_ref": "",
                         "offset": 0}]], t_spans_type())})
    prof = ExtractProfile(normalize_ws=False, prune_links=True)
    out = extract_dataset(ray.data.from_arrow(t), profile=prof,
                          concurrency=1, batch_size=4).take_all()
    spans = out[0]["spans"]
    texts = [s["text"] for s in spans]
    assert "real   prose stays with its   spacing" in texts  # raw ws kept
    assert all("A" != s["text"] for s in spans)              # nav run pruned


def test_run_extraction_lance_requires_wheel(ray_session, tmp_path):
    """output_format='lance' is import-gated: without the wheel it
    raises ImportError before writing anything."""
    import pytest

    from gumbo_pp_ray.pipelines.extract_pipeline import run_extraction

    inp = str(tmp_path / "lc")
    write_corpus(inp, CorpusSpec(num_docs=10, mega_every=0), files=1)
    try:
        import lance  # noqa: F401
        pytest.skip("lance installed; the gated branch is live")
    except ImportError:
        pass
    with pytest.raises(ImportError):
        run_extraction(inp, str(tmp_path / "lo"), files_per_wave=1,
                       concurrency=2, output_format="lance")


def test_broadcast_membership_semi_anti(ray_session):
    import pyarrow as pa
    import ray.data
    from gumbo_pp_ray.stages.lookup import BroadcastMembership, broadcast_keys

    dim = pa.table({"k": [2, 4, 6]})
    ref = broadcast_keys(dim, "k")
    t = pa.table({"event_id": [1, 2, 3, 4], "user_id": [2, 3, 4, 9]})
    def run(mode):
        return sorted(r["event_id"] for r in ray.data.from_arrow(t)
                      .map_batches(BroadcastMembership,
                                   fn_constructor_kwargs={
                                       "dim_ref": ref,
                                       "fk_col": "user_id",
                                       "mode": mode},
                                   batch_format="pyarrow",
                                   concurrency=(1, 2)).take_all())
    assert run("semi") == [1, 3]
    assert run("anti") == [2, 4]


def test_wave_commit_race_first_wins(ray_session, tmp_path, monkeypatch):
    """Two runs racing on one out_dir: a competitor commits the wave
    between our processing and our os.replace — the loser must adopt
    the winner's manifest instead of crashing with ENOTEMPTY
    (observed live in the round-5 1M-page drill)."""
    import json
    import os as _os
    import pyarrow as pa
    import ray.data
    from gumbo_pp_ray.pipelines import extract_pipeline as ep
    from gumbo_pp_ray.pipelines.wrap import wrap_documents

    src = tmp_path / "in"
    src.mkdir()
    docs = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": [f"doc {i} body words here" for i in range(6)],
        "lang": ["en"] * 6, "source": ["t"] * 6,
    })
    ray.data.from_arrow(wrap_documents(docs)).repartition(2) \
        .write_parquet(str(src))

    out = tmp_path / "out"
    real_replace = _os.replace
    fired = {}

    def racing_replace(a, b):
        # simulate the competitor winning the FIRST wave commit
        if b.endswith("wave-00000") and "fired" not in fired:
            fired["fired"] = True
            _os.makedirs(b)
            with open(_os.path.join(b, "part-0.parquet"), "wb") as f:
                f.write(b"winner")
            with open(str(out / "_lineage" / "wave-00000.json"),
                      "w") as f:
                json.dump({"wave": "wave-00000", "docs": 6,
                           "spans": 6, "errors": 0}, f)
        return real_replace(a, b)

    monkeypatch.setattr(ep.os, "replace", racing_replace)
    s = ep.run_extraction(str(src), str(out), concurrency=2)
    # the loser adopted the winner's manifest: no crash, wave counted
    assert s["waves_skipped"] == 1 and s["errors"] == 0
    assert s["docs"] == 6


def test_run_extraction_resume_rejects_changed_input(ray_session,
                                                     tmp_path):
    """Adding shards shifts wave boundaries; skipping committed waves
    by index would silently drop/double-process shards — resume must
    fail loudly on an input-set mismatch (round-5 review finding)."""
    from gumbo_pp_ray.pipelines.extract_pipeline import run_extraction

    inp = str(tmp_path / "corpus")
    out1 = str(tmp_path / "out")
    write_corpus(inp, CorpusSpec(num_docs=20, mega_every=0), files=2)
    run_extraction(inp, out1, files_per_wave=2, concurrency=2,
                   batch_size=16)
    # grow the input set: wave 0's composition changes
    write_corpus(str(tmp_path / "extra"),
                 CorpusSpec(num_docs=10, mega_every=0), files=1)
    extra = os.listdir(str(tmp_path / "extra"))[0]
    # sorts FIRST, shifting every wave boundary (a file sorting last
    # only appends new waves, which resume handles fine)
    shutil.copy(os.path.join(str(tmp_path / "extra"), extra),
                os.path.join(inp, "aa-extra.parquet"))
    with pytest.raises(ValueError, match="resume mismatch"):
        run_extraction(inp, out1, files_per_wave=2, concurrency=2,
                       batch_size=16)


def test_run_extraction_zero_row_wave_commits(ray_session, tmp_path):
    """A wave whose rows are all filtered away (e.g. WARC archives
    with no 200 text/html records) writes nothing — the wave must
    still COMMIT (empty dir + manifest with zero counts) so resume
    skips it, not crash on the accounting read."""
    import pyarrow.parquet as pq

    from gumbo_pp_ray.pipelines.wrap import SPANS_TYPE
    from gumbo_pp_ray.pipelines.extract_pipeline import run_extraction

    inp = str(tmp_path / "empty_corpus")
    os.makedirs(inp)
    empty = pa.table({
        "doc_id": pa.array([], pa.string()),
        "spans": pa.array([], SPANS_TYPE),
    })
    pq.write_table(empty, os.path.join(inp, "shard-0.parquet"))
    out = str(tmp_path / "out")
    s = run_extraction(inp, out, files_per_wave=1, concurrency=2,
                       batch_size=16)
    assert s["waves_run"] == 1 and s["docs"] == 0 and s["errors"] == 0
    assert os.path.isdir(os.path.join(out, "wave-00000"))
    with open(os.path.join(out, "_lineage", "wave-00000.json")) as f:
        assert json.load(f)["docs"] == 0
    # resume skips the committed empty wave
    s2 = run_extraction(inp, out, files_per_wave=1, concurrency=2,
                        batch_size=16)
    assert s2["waves_skipped"] == 1 and s2["waves_run"] == 0


def test_null_span_text_quarantined_not_fatal(ray_session):
    """A null span text in a corrupt shard must quarantine the ROW as
    status='error'/oversize-free, never crash the batch (the
    documented contract; total_bytes ran outside the try)."""
    from gumbo_pp_ray.pipelines.wrap import SPANS_TYPE

    spans_ok = [{"kind": "text", "text": "<p>fine</p>",
                 "media_ref": "", "offset": 0}]
    spans_null = [{"kind": "text", "text": None,
                   "media_ref": "", "offset": 0}]
    t = pa.table({
        "doc_id": pa.array(["a", "b"], pa.string()),
        "spans": pa.array([spans_ok, spans_null], SPANS_TYPE),
    })
    out = ExtractSpans()(t)
    by_id = {r["doc_id"]: r for r in out.to_pylist()}
    assert by_id["a"]["status"] == "ok" and by_id["a"]["n_spans"] > 0
    # the null-text doc parses as an empty payload: ok with 0 spans
    assert by_id["b"]["status"] in ("ok", "error")
