"""As-of (point-in-time) join — the guide's co-group pattern.

``asof_join_events_orders``: for every event, the most recent order of
the same customer at or before the event time. Shape (ray_guide: as-of
/ range join): both sides are bucketed by ``hash(key) % B``, unioned
with a source tag, and each bucket group runs one
``pandas.merge_asof(..., by=key, direction="backward")`` over
ts-sorted frames — per-bucket work is a linear merge; the exchange
carries only the join columns.

Determinism: the right side is sorted by (ts, right_id) so ties on the
as-of timestamp resolve to the highest id — the same rule the SQL
oracle uses. Events with no matching order are dropped (inner as-of),
keeping the output schema null-free and dtype-exact vs the oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _tag_left(batch: pa.Table) -> pa.Table:
    n = len(batch)
    return pa.table({
        "key": batch.column("user_id").cast(pa.int64()),
        "ts": batch.column("ts"),
        "left_id": batch.column("event_id").cast(pa.int64()),
        "right_id": pa.nulls(n, pa.int64()),
        "src": pa.array(np.zeros(n, dtype=np.int8)),
    })


def _tag_right(batch: pa.Table) -> pa.Table:
    n = len(batch)
    return pa.table({
        "key": batch.column("o_custkey").cast(pa.int64()),
        "ts": batch.column("o_orderdate"),
        "left_id": pa.nulls(n, pa.int64()),
        "right_id": batch.column("o_orderkey").cast(pa.int64()),
        "src": pa.array(np.ones(n, dtype=np.int8)),
    })


def _add_bucket(batch: pa.Table, *, num_buckets: int) -> pa.Table:
    keys = batch.column("key").to_numpy(zero_copy_only=False)
    return batch.append_column(
        "bucket", pa.array((keys % num_buckets).astype(np.int64)))


def _bucket_asof(group: pd.DataFrame) -> pd.DataFrame:
    left = group[group["src"] == 0]
    right = group[group["src"] == 1]
    if left.empty or right.empty:
        return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                             "user_id": pd.Series([], dtype="int64"),
                             "o_orderkey": pd.Series([], dtype="int64")})
    left = left.sort_values("ts", kind="stable")
    # tie rule: highest right_id wins at equal ts (merge_asof backward
    # takes the last row ≤ ts in sort order)
    right = right.sort_values(["ts", "right_id"], kind="stable")
    merged = pd.merge_asof(
        left[["key", "ts", "left_id"]],
        right[["key", "ts", "right_id"]],
        on="ts", by="key", direction="backward")
    merged = merged.dropna(subset=["right_id"])
    return pd.DataFrame({
        "event_id": merged["left_id"].astype("int64"),
        "user_id": merged["key"].astype("int64"),
        "o_orderkey": merged["right_id"].astype("int64"),
    })


#: target rows per bucket group — sized so one bucket's pandas frame
#: (join columns only, ~40 B/row) stays well under a worker's heap
_ROWS_PER_BUCKET = 250_000


def derive_num_buckets(total_rows: int) -> int:
    """Bucket count from input size: ~_ROWS_PER_BUCKET rows per
    bucket, floor 16 (parallelism on small inputs), cap 65536."""
    return max(16, min(65536, -(-total_rows // _ROWS_PER_BUCKET)))


def asof_join_events_orders(events_ds, orders_ds, *,
                            num_buckets: int | None = None):
    """(event_id, user_id, o_orderkey) — latest order at or before each
    event's timestamp, per customer.

    ``num_buckets=None`` derives the bucket count from
    ``events.count() + orders.count()`` so per-bucket frames stay
    bounded as inputs grow (for parquet-read inputs ``count()`` is a
    metadata lookup; pass an explicit count-derived value to keep a
    transformed lineage fully lazy).  Both sides are pruned to the
    join columns BEFORE the bucket shuffle (_tag_left/_tag_right), so
    a bucket group holds ~1/B of the narrow join keys, never the full
    payload rows.  Caveat: ``merge_asof(by=key)`` needs all rows of
    one key in one bucket, so a single pathologically hot KEY still
    bounds a task; splitting a hot key needs a time-sliced prefix scan
    (carry the latest order across slice boundaries) — not implemented."""
    import functools
    if num_buckets is None:
        num_buckets = derive_num_buckets(
            events_ds.count() + orders_ds.count())
    left = events_ds.map_batches(_tag_left, batch_format="pyarrow")
    right = orders_ds.map_batches(_tag_right, batch_format="pyarrow")
    both = left.union(right).map_batches(
        functools.partial(_add_bucket, num_buckets=num_buckets),
        batch_format="pyarrow")
    return both.groupby("bucket").map_groups(_bucket_asof,
                                             batch_format="pandas")
