"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in the library code.

Naming contract: every computed column is named identically in the Ray
pipeline and the oracle SQL (the driver sorts columns by name before
hashing).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import pyarrow as pa

_SF0001 = "/root/testdata/sf0.001"


def _docs(sf_dir: str):
    import ray.data
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source"])


# --------------------------------------------------------------- entry

def entry() -> Any:
    """Flagship pipeline on sf0.001: documents → interleaved spans →
    split → actor-pool extraction → reassembly. Returns the extracted
    Dataset (doc_id, spans, status, counters)."""
    from gumbo_pp_ray.pipelines.extract_pipeline import extract_dataset
    from gumbo_pp_ray.pipelines.wrap import wrap_documents_chunked

    ds = _docs(_SF0001).map_batches(wrap_documents_chunked,
                                    batch_format="pyarrow")
    return extract_dataset(ds, split_threshold=256, batch_size=64)


# ------------------------------------------------------------- queries

def _q_extract_flagship(sf_dir: str):
    """Full extraction pipeline; spans exploded to one row per span so
    the oracle can reproduce them relationally."""
    from gumbo_pp_ray.pipelines.extract_pipeline import extract_dataset
    from gumbo_pp_ray.pipelines.wrap import wrap_documents
    from gumbo_pp_ray.stages.explode import explode_spans

    ds = _docs(sf_dir).map_batches(wrap_documents, batch_format="pyarrow")
    out = extract_dataset(ds, split_threshold=256, batch_size=64)
    return (out.select_columns(["doc_id", "spans"])
               .map_batches(explode_spans, batch_format="pyarrow"))


def _sel(selector_builder):
    """Selector query runner: compiled selector applied over the fixed
    per-row template; see stages/selector_query.py."""
    def run(sf_dir: str):
        from gumbo_pp_ray.stages.selector_query import SelectorQuery
        from gumbo_pp_ray.state.sizing import default_pool_size
        return _docs(sf_dir).map_batches(
            SelectorQuery,
            fn_constructor_kwargs={"selector": selector_builder()},
            batch_format="pyarrow", batch_size=256,
            concurrency=default_pool_size())
    return run


def _sel_class_exact():
    from gumbo_pp_ray.html import match
    # M12 — whole-attribute exact equality (reference
    # gumbo_matchers.h:466-476)
    return match.class_type.is_("en")


def _sel_attr_starts_with():
    from gumbo_pp_ray.html import match
    return match.attribute.value.starts_with("data-source", "src1")


def _sel_attr_contains():
    from gumbo_pp_ray.html import match
    return match.attribute.value.contains("data-source", "c1")


def _sel_attr_ends_with():
    from gumbo_pp_ray.html import match
    return match.attribute.value.ends_with("data-source", "3")


def _sel_attr_dash_match():
    from gumbo_pp_ray.html import match
    # M5 — CSS [a|=v]: matches lang="en-std" for prefix "en" only
    return match.attribute.value.contains_prefix("lang", "en")


def _sel_find_all_tag():
    from gumbo_pp_ray.html import match
    return match.tag.P


def _sel_and_not():
    from gumbo_pp_ray.html import match
    return match.tag.DIV & ~match.class_type.is_("en")


def _sel_content_contains():
    from gumbo_pp_ray.html import match
    return match.tag.P & match.content_text.contains("window")


def _sel_id_prefix():
    from gumbo_pp_ray.html import match
    return match.attribute.value.starts_with("id", "doc-1")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "extract_flagship": _q_extract_flagship,
        "sel_class_exact": _sel(_sel_class_exact),
        "sel_attr_starts_with": _sel(_sel_attr_starts_with),
        "sel_attr_contains": _sel(_sel_attr_contains),
        "sel_attr_ends_with": _sel(_sel_attr_ends_with),
        "sel_attr_dash_match": _sel(_sel_attr_dash_match),
        "sel_find_all_tag": _sel(_sel_find_all_tag),
        "sel_and_not": _sel(_sel_and_not),
        "sel_content_contains": _sel(_sel_content_contains),
        "sel_id_prefix": _sel(_sel_id_prefix),
    }


# -------------------------------------------------------------- oracle

def oracle_sql() -> dict[str, str]:
    return {
        "extract_flagship": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id, 'heading' AS kind,
                   source AS text, '' AS media_ref, 0 AS "offset"
            FROM documents
            UNION ALL
            SELECT CAST(doc_id AS VARCHAR), 'text', text, '', 1
            FROM documents
            UNION ALL
            SELECT CAST(doc_id AS VARCHAR), 'media', '',
                   'img://doc/' || CAST(doc_id AS VARCHAR) || '.jpg', 2
            FROM documents
        """,
        "sel_class_exact": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id, text AS match_text
            FROM documents WHERE lang = 'en'
        """,
        "sel_attr_starts_with": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id, text AS match_text
            FROM documents WHERE source LIKE 'src1%'
        """,
        "sel_attr_contains": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id, text AS match_text
            FROM documents WHERE source LIKE '%c1%'
        """,
        "sel_attr_ends_with": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id, text AS match_text
            FROM documents WHERE source LIKE '%3'
        """,
        "sel_attr_dash_match": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id, lang AS match_text
            FROM documents WHERE lang = 'en'
        """,
        "sel_find_all_tag": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id, text AS match_text
            FROM documents
        """,
        "sel_and_not": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id, text AS match_text
            FROM documents WHERE lang <> 'en'
        """,
        "sel_content_contains": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id, text AS match_text
            FROM documents WHERE text LIKE '%window%'
        """,
        "sel_id_prefix": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id, text AS match_text
            FROM documents WHERE CAST(doc_id AS VARCHAR) LIKE '1%'
        """,
    }
