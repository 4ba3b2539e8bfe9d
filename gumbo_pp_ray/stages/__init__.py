"""Ray Data batch transforms (the engine's operators as stages).

Modules:
    assemble        span-list → HTML payload plumbing
    split           mega-doc splitter (shuffle topology)
    extractor       the hot parse+select+strip actor pool
    reassemble      groupby(doc_id) span re-merge
    explode         spans list<struct> → one row per span
    selector_query  distributed matcher queries over templates
    table_query     scoped structured-table scrape (Q5)
    dedup           exact / MinHash+LSH / SimHash near-dup
    similarity      brute-force + LSH ANN, embedding near-dup pairs
    text_analysis   token stats, quality, lang-id, fingerprints,
                    jaccard-vs-query, frequent tokens
    sketches        HyperLogLog distinct counting + exact counterpart
    windows         tumbling / session windows over event logs
    asof            point-in-time join (bucketed merge_asof)
    lookup          broadcast dimension lookup (no-shuffle join)
    media           multimodal binary columns (stub decode)
    pdf             PDF/layout parse plumbing (stub decode)
"""

from .assemble import assemble_html
from .split import SplitMegaDocs
from .extractor import ExtractSpans, EXTRACTED_SCHEMA
from .reassemble import reassemble_chunks
from .explode import explode_spans

__all__ = ["assemble_html", "SplitMegaDocs", "ExtractSpans",
           "EXTRACTED_SCHEMA", "reassemble_chunks", "explode_spans"]
