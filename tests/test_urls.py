"""URL canonicalization operator (stages/urls.py)."""

import pyarrow as pa
import pytest

from gumbo_pp_ray.stages.urls import (
    canonicalize_batch, canonicalize_url, canonicalize_urls, url_host,
)


@pytest.mark.parametrize("raw,want", [
    ("HTTP://WWW.Example.COM:80/path/9?b=2&a=1#frag",
     "http://www.example.com/path/9?a=1&b=2"),
    ("https://Site.FR:443", "https://site.fr/"),
    ("https://Site.FR:443?x=1", "https://site.fr/?x=1"),
    ("HTTPS://a.ES/q/7#x", "https://a.es/q/7"),
    ("http://m.it:8080/5?a=2&a=1", "http://m.it:8080/5?a=1&a=2"),
    ("  http://h.de/p%20x/3?z=9 ", "http://h.de/p%20x/3?z=9"),
    ("img://cdn/pic.jpg", "img://cdn/pic.jpg"),
    ("no-scheme/path", "no-scheme/path"),
    ("http://X.com/?", "http://x.com/"),
    ("http://x.com:80", "http://x.com/"),      # default port, no path
    ("https://x.com:80/a", "https://x.com:80/a"),  # :80 NOT default for https
    ("", ""),
])
def test_canonicalize_url(raw, want):
    assert canonicalize_url(raw) == want


def test_url_host():
    assert url_host("http://m.it:8080/5") == "m.it"
    assert url_host("https://site.fr/") == "site.fr"
    assert url_host("HTTPS://UP.example.ORG?q=1") == "up.example.org"
    assert url_host("plain") == ""


def test_canonicalize_batch_columns():
    t = pa.table({"doc_id": [1, 2],
                  "url": ["HTTP://A.COM:80/x#f", None]})
    out = canonicalize_batch(t)
    assert out.column("url_canon").to_pylist() == ["http://a.com/x", ""]
    assert out.column("host").to_pylist() == ["a.com", ""]


def test_canonicalize_urls_dataset(ray_session):
    import ray.data
    t = pa.table({"url": [f"HTTP://H{i % 3}.COM:80/p/{i}?b=1&a=2"
                          for i in range(100)]})
    out = canonicalize_urls(ray.data.from_arrow(t)).to_pandas()
    assert len(out) == 100
    assert (out["url_canon"].str.startswith("http://h")).all()
    assert set(out["host"]) == {"h0.com", "h1.com", "h2.com"}
    assert out["url_canon"].str.endswith("?a=2&b=1").all()


def test_read_parquet_clean_directory(ray_session, tmp_path):
    """read_parquet_clean resolves the schema from a DIRECTORY of
    pandas-written files (metadata stripped, columns pruned)."""
    import pandas as pd
    import pyarrow as pa
    from gumbo_pp_ray.sources.io import read_parquet_clean

    d = tmp_path / "pq"
    d.mkdir()
    pd.DataFrame({"a": [1, 2], "b": ["x", "y"]}).to_parquet(
        d / "part0.parquet")
    pd.DataFrame({"a": [3], "b": ["z"]}).to_parquet(d / "part1.parquet")
    ds = read_parquet_clean(str(d), columns=["a"])
    assert ds.schema().names == ["a"]
    assert sorted(r["a"] for r in ds.take_all()) == [1, 2, 3]
