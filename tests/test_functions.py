"""Batch pre-filter function tests (SURVEY.md §2.9 vectorized
counterparts)."""

import pyarrow as pa

from gumbo_pp_ray.functions import (
    dash_match, drop_empty_payloads, payload_contains,
    payload_matches_any,
)


def tbl(**cols):
    return pa.table(cols)


def test_payload_contains():
    t = tbl(text=["alpha beta", "gamma", "beta gamma"])
    out = payload_contains(t, column="text", needle="beta")
    assert out.column("text").to_pylist() == ["alpha beta", "beta gamma"]


def test_payload_matches_any_or_semantics():
    t = tbl(text=["aa", "bb", "cc", "dd"])
    out = payload_matches_any(t, column="text", needles=("a", "c"))
    assert out.column("text").to_pylist() == ["aa", "cc"]
    assert payload_matches_any(t, column="text", needles=()).num_rows == 0


def test_drop_empty_payloads():
    t = tbl(text=pa.array(["x", "", None, "y"], pa.string()))
    out = drop_empty_payloads(t, column="text")
    assert out.column("text").to_pylist() == ["x", "y"]


def test_dash_match_semantics():
    col = pa.chunked_array([["en", "en-US", "enx", "den", "fr"]])
    mask = dash_match(col, "en")
    assert mask.to_pylist() == [True, True, False, False, False]


def test_prefilter_in_pipeline(ray_session):
    import ray.data
    from gumbo_pp_ray.functions.prefilters import contains_filter
    t = tbl(doc_id=[1, 2, 3], text=["keep me", "drop", "also keep"])
    out = (ray.data.from_arrow(t)
           .map_batches(contains_filter("text", "keep"),
                        batch_format="pyarrow")
           .take_all())
    assert [r["doc_id"] for r in out] == [1, 3]
