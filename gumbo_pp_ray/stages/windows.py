"""Streaming-shaped workloads over an ordered, partitioned log.

Ray Data is a batch engine with no event-time watermarks (ray_guide:
streaming-shaped workloads); windows are expressed as
``groupby(key)`` + per-group ordered computation:

* **Tumbling windows**: window id = epoch_us // window_us computed
  VECTORIZED per batch (no shuffle for the id), then a
  ``groupby([key, window_id])`` count — the only exchange carries the
  narrow key columns.
* **Session windows**: ``groupby(key).map_groups`` sorts each user's
  events by ts and splits on inactivity gaps — incremental state
  stays inside the group; the ordering assumption (per-key sort
  within the group) is established by the sort, never by block order.

Integer-only outputs (counts, ids) so results are exactly
SQL-reproducible for the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def add_tumbling_window(batch: pa.Table, *, window_sec: int,
                        ts_col: str = "ts") -> pa.Table:
    ts = batch.column(ts_col)
    if isinstance(ts, pa.ChunkedArray):
        ts = ts.combine_chunks()
    us = ts.cast(pa.int64())            # timestamp[us] → microseconds
    win = pa.compute.divide(us, np.int64(window_sec) * 1_000_000)
    return batch.append_column("window_id", win)


def tumbling_counts(ds, *, key: str = "user_id", window_sec: int = 86400,
                    ts_col: str = "ts"):
    """Events per (key, tumbling window) → (user_id, window_id,
    n_events)."""
    import functools
    ds = ds.map_batches(
        functools.partial(add_tumbling_window, window_sec=window_sec,
                          ts_col=ts_col),
        batch_format="pyarrow")
    out = ds.groupby([key, "window_id"]).count()
    return out.map_batches(
        lambda t: t.rename_columns([key, "window_id", "n_events"]),
        batch_format="pyarrow")


def _sessionize_group(group: pd.DataFrame, *, gap_sec: int,
                      key: str, ts_col: str) -> pd.DataFrame:
    g = group.sort_values(ts_col, kind="stable")
    delta = g[ts_col].diff().dt.total_seconds()
    new_session = (delta > gap_sec).fillna(False)
    session_id = new_session.cumsum().astype(np.int64)
    out = (g.assign(session_id=session_id)
            .groupby("session_id", sort=True)
            .size()
            .reset_index(name="n_events"))
    out.insert(0, key, g[key].iloc[0])
    out["n_events"] = out["n_events"].astype(np.int64)
    return out


def session_windows(ds, *, key: str = "user_id", gap_sec: int = 1800,
                    ts_col: str = "ts"):
    """Inactivity-gap sessionization → (user_id, session_id,
    n_events); session_id is the 0-based per-user session index in ts
    order."""
    import functools
    return ds.groupby(key).map_groups(
        functools.partial(_sessionize_group, gap_sec=gap_sec, key=key,
                          ts_col=ts_col),
        batch_format="pandas")
