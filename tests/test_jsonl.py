"""JSONL source tests: plain + gzip members, projection, and feeding
a downstream text stage."""

import gzip
import json


def _write(path, rows, gz=False):
    if gz:
        with gzip.open(path, "wt") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    else:
        with open(path, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


def test_read_jsonl_plain_and_gzip(ray_session, tmp_path):
    from gumbo_pp_ray.sources.io import read_jsonl

    _write(tmp_path / "a.jsonl",
           [{"doc_id": i, "text": f"doc {i} alpha", "junk": i * 2}
            for i in range(4)])
    _write(tmp_path / "b.jsonl.gz",
           [{"doc_id": 10 + i, "text": f"doc {10+i} beta", "junk": 0}
            for i in range(3)], gz=True)

    ds = read_jsonl(str(tmp_path), columns=["doc_id", "text"])
    rows = sorted(ds.take_all(), key=lambda r: r["doc_id"])
    assert [r["doc_id"] for r in rows] == [0, 1, 2, 3, 10, 11, 12]
    assert set(rows[0]) == {"doc_id", "text"}      # junk projected out


def test_read_jsonl_feeds_text_stage(ray_session, tmp_path):
    from gumbo_pp_ray.sources.io import read_jsonl
    from gumbo_pp_ray.stages.text_analysis import token_stats

    _write(tmp_path / "c.jsonl",
           [{"doc_id": i, "text": "one two three four"}
            for i in range(5)])
    out = read_jsonl(str(tmp_path), columns=["doc_id", "text"]) \
        .map_batches(token_stats, batch_format="pyarrow").take_all()
    assert len(out) == 5
    assert all(r["n_tokens"] == 4 for r in out)
