"""Contiguous shard packing (stages/packing.py)."""

import numpy as np
import pyarrow as pa
import pytest


def test_shard_assignment_matches_serial(ray_session):
    import ray.data
    from gumbo_pp_ray.stages.packing import assign_contiguous_shards

    rng = np.random.RandomState(5)
    n = 500
    w = rng.randint(10, 400, n).astype(np.int64)
    t = pa.table({"doc_id": pa.array(np.arange(n), pa.int64()),
                  "n_chars": pa.array(w)})
    # shuffled, multi-block input: order must come from the sort
    ds = ray.data.from_arrow(t).random_shuffle(seed=1).repartition(7)
    out = assign_contiguous_shards(ds, budget=1000).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    serial = np.concatenate([[0], np.cumsum(w)[:-1]]) // 1000
    assert (out["shard_id"].to_numpy() == serial).all()
    # shards are contiguous and monotone
    assert (np.diff(out["shard_id"].to_numpy()) >= 0).all()
    # each shard's weight < budget + max doc weight (no doc split)
    sums = out.groupby("shard_id")["n_chars"].sum()
    assert (sums < 1000 + w.max()).all()


def test_shard_budget_validation(ray_session):
    import ray.data
    from gumbo_pp_ray.stages.packing import assign_contiguous_shards
    ds = ray.data.from_arrow(pa.table({"doc_id": [1], "n_chars": [5]}))
    with pytest.raises(ValueError):
        assign_contiguous_shards(ds, budget=0)
