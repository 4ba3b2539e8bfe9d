"""Driver-contract consistency guards: every oracle has a query, SQL
strings are syntactically valid against the registered views, and the
contract module never initializes Ray at import/build time."""

import duckdb
import pytest


def _entry_module():
    import importlib
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__
    return importlib.reload(__ray_entry__)


def test_every_oracle_has_a_query():
    e = _entry_module()
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs), set(os_) - set(qs)
    assert len(qs) >= 38


def test_oracle_sql_parses_in_duckdb():
    e = _entry_module()
    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    for name, sql in e.oracle_sql().items():
        try:
            con.execute(f"SELECT * FROM ({sql}) LIMIT 1")
        except Exception as ex:          # pragma: no cover
            pytest.fail(f"oracle {name} failed to parse/run: {ex}")


def test_import_does_not_touch_ray_session():
    # the driver initializes Ray BEFORE importing; building the query
    # dict must not require or create a session
    import ray
    e = _entry_module()
    was = ray.is_initialized()
    e.queries()
    e.oracle_sql()
    assert ray.is_initialized() == was
