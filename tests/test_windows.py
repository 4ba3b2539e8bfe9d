"""Window operator tests: tumbling ids, session gap splits, ordering
independence from block layout."""

import datetime as dt

import pandas as pd
import pyarrow as pa

from gumbo_pp_ray.stages.windows import (
    add_tumbling_window, session_windows, tumbling_counts,
)


def ev(user, *minutes):
    base = dt.datetime(2024, 1, 1)
    return [{"user_id": user,
             "ts": base + dt.timedelta(minutes=m)} for m in minutes]


def to_table(rows):
    df = pd.DataFrame(rows)
    return pa.Table.from_pandas(df, preserve_index=False).set_column(
        1, "ts", pa.Table.from_pandas(df).column("ts").cast(
            pa.timestamp("us")))


def test_add_tumbling_window_ids():
    t = to_table(ev(1, 0, 59, 60, 61, 120))
    out = add_tumbling_window(t, window_sec=3600)
    assert out.column("window_id").to_pylist() == [
        473352, 473352, 473353, 473353, 473354]  # hours since epoch


def test_tumbling_counts_pipeline(ray_session):
    import ray.data
    t = to_table(ev(1, 0, 10, 70) + ev(2, 5))
    out = tumbling_counts(ray.data.from_arrow(t), window_sec=3600)
    rows = {(r["user_id"], r["window_id"]): r["n_events"]
            for r in out.take_all()}
    assert rows == {(1, 473352): 2, (1, 473353): 1, (2, 473352): 1}


def test_session_windows_gap_split(ray_session):
    import ray.data
    # user 1: events at 0,10,20 then a 60-min gap then 80,85
    t = to_table(ev(1, 0, 10, 20, 80, 85) + ev(2, 0))
    out = session_windows(ray.data.from_arrow(t), gap_sec=1800)
    rows = {(r["user_id"], r["session_id"]): r["n_events"]
            for r in out.take_all()}
    assert rows == {(1, 0): 3, (1, 1): 2, (2, 0): 1}


def _sessions_reference(rows, gap_sec):
    """Single-pass local sessionization for cross-checking."""
    out = {}
    by_user = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"])):
        by_user.setdefault(r["user_id"], []).append(r["ts"])
    for u, tss in by_user.items():
        sid = -1
        prev = None
        for ts in tss:
            if prev is None or (ts - prev).total_seconds() > gap_sec:
                sid += 1
            out[(u, sid)] = out.get((u, sid), 0) + 1
            prev = ts
    return out


def test_session_windows_two_phase_straddles_buckets(ray_session):
    """Sessions that straddle phase-bucket boundaries must merge in
    phase 2: tiny phase_sec forces many straddles, and a hot user
    owning most events exercises the skew-bounding path."""
    import numpy as np
    import ray.data

    rng = np.random.RandomState(11)
    rows = []
    # hot user: 400 events in bursts with gaps around the 600 s gap
    minutes = 0.0
    for _ in range(400):
        minutes += float(rng.choice([1, 2, 3, 15]))  # 15 min > gap
        rows.extend(ev(1, minutes))
    for u in range(2, 8):
        rows.extend(ev(u, *[float(m) for m in
                            sorted(rng.randint(0, 600, 20))]))
    t = to_table(rows)
    out = session_windows(ray.data.from_arrow(t).random_shuffle(seed=5),
                          gap_sec=600, phase_sec=900)
    got = {(r["user_id"], r["session_id"]): r["n_events"]
           for r in out.take_all()}
    assert got == _sessions_reference(rows, 600)


def test_session_windows_order_independent(ray_session):
    import ray.data
    # shuffled input blocks must not change sessionization (in-group
    # sort owns the ordering)
    rows = ev(1, 85, 0, 80, 20, 10)
    t = to_table(rows)
    out = session_windows(ray.data.from_arrow(t).random_shuffle(seed=3),
                          gap_sec=1800)
    got = {(r["user_id"], r["session_id"]): r["n_events"]
           for r in out.take_all()}
    assert got == {(1, 0): 3, (1, 1): 2}


def test_hopping_windows_membership(ray_session):
    import ray.data
    from gumbo_pp_ray.stages.windows import hopping_counts

    # 1h windows hopping every 15min: each event in exactly 4 windows
    t = to_table(ev(1, 0) + ev(1, 30) + ev(2, 90))
    out = hopping_counts(ray.data.from_arrow(t), window_sec=3600,
                         hop_sec=900).take_all()
    per_user = {}
    for r in out:
        per_user.setdefault(r["user_id"], []).append(
            (r["window_id"], r["n_events"]))
    # total memberships = 4 per event
    assert sum(n for _, n in per_user[1]) == 8
    assert sum(n for _, n in per_user[2]) == 4
    # the two user-1 events (0 and 30 min apart) co-occur in exactly
    # the 2 windows covering both
    assert sorted(n for _, n in per_user[1]).count(2) == 2


def test_hopping_explode_empty_batch():
    """Ray Data can deliver 0-row blocks; the explode must not crash
    (np.repeat of offsets against empty counts used to raise)."""
    import pyarrow as pa
    from gumbo_pp_ray.stages.windows import explode_hopping_windows

    empty = pa.table({
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
    })
    out = explode_hopping_windows(empty, window_sec=3600, hop_sec=900)
    assert out.num_rows == 0
    assert out.column_names == ["user_id", "window_id"]


def test_tumbling_pre_epoch_floor_semantics():
    """Pre-epoch timestamps floor to NEGATIVE window ids (matching
    the hopping path's numpy // and the DuckDB // oracle) — Arrow's
    truncate-toward-zero divide merged 1969 events into window 0."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from gumbo_pp_ray.stages.windows import add_tumbling_window

    ts = pd.to_datetime(["1969-12-31 12:00:00", "1970-01-01 12:00:00"])
    t = pa.table({"user_id": pa.array([1, 1], pa.int64()),
                  "ts": pa.array(ts.astype("datetime64[us]"))})
    out = add_tumbling_window(t, window_sec=86400)
    assert out.column("window_id").to_pylist() == [-1, 0]
