"""Batch-level scalar functions — vectorized pre-filters.

The reference's scalar surface is string predicates only (SURVEY.md
§2.9: equality, contains, prefix/suffix, emptiness, dash-match —
reference gumbo_matchers.h M5-M10/M15-M19). The per-node forms live in
``html.select``; these are their BATCH-level pyarrow.compute
counterparts, used to prune rows before a parse stage ever sees them
(ray_guide: vectorized predicate inside map_batches beats row
filters).
"""

from .prefilters import (
    payload_contains, payload_matches_any, drop_empty_payloads,
    dash_match,
)

__all__ = ["payload_contains", "payload_matches_any",
           "drop_empty_payloads", "dash_match"]
