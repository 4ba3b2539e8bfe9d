"""Sketch tests: HLL accuracy/mergeability + distributed pipelines vs
exact counterpart."""

import numpy as np
import pyarrow as pa

from gumbo_pp_ray.stages.sketches import (
    HllSketch, exact_distinct_tokens, hll_distinct_tokens,
)


def test_hll_accuracy():
    for n in (50, 1000, 50_000):
        sk = HllSketch(12)
        sk.add_batch([f"t{i}" for i in range(n)])
        assert abs(sk.estimate() - n) / n < 0.05


def test_hll_merge_equals_single_pass():
    items = [f"x{i}" for i in range(20_000)]
    a, b, c = HllSketch(12), HllSketch(12), HllSketch(12)
    a.add_batch(items[:12_000])
    b.add_batch(items[8_000:])          # overlapping halves
    c.add_batch(items)
    assert (a.merge(b).registers == c.registers).all()


def test_hll_serialization_roundtrip():
    sk = HllSketch(12)
    sk.add_batch(["a", "b", "c"])
    back = HllSketch.from_bytes(12, sk.to_bytes())
    assert (back.registers == sk.registers).all()
    assert HllSketch(12).estimate() == 0.0 or \
        HllSketch(12).estimate() < 1   # empty ≈ 0


def test_distributed_sketch_vs_exact(ray_session):
    import ray.data

    rng = np.random.RandomState(13)
    vocab = [f"w{i}" for i in range(4000)]
    texts = [" ".join(rng.choice(vocab, 50)) for _ in range(400)]
    true_n = len({t for x in texts for t in x.split()})
    table = pa.table({"doc_id": list(range(len(texts))), "text": texts})

    exact = exact_distinct_tokens(ray.data.from_arrow(table))
    assert exact.column("n_distinct_tokens").to_pylist() == [true_n]

    est = hll_distinct_tokens(ray.data.from_arrow(table)).take_all()
    got = est[0]["n_distinct_tokens_est"]
    assert abs(got - true_n) / true_n < 0.05, (got, true_n)


def test_count_min_sketch_unit():
    from gumbo_pp_ray.stages.sketches import CountMinSketch

    cms = CountMinSketch(d=4, w=1 << 10)
    items = ["apple"] * 100 + ["banana"] * 10 + [f"noise{i}" for i in range(200)]
    cms.add_many(items)
    # CM estimates are always >= truth; with this load factor they
    # should be exact or near-exact
    assert 100 <= cms.estimate("apple") <= 110
    assert 10 <= cms.estimate("banana") <= 20
    assert cms.estimate("absent") <= 5
    # merge = sum
    other = CountMinSketch(d=4, w=1 << 10)
    other.add_many(["apple"] * 50)
    m = cms.merge(other)
    assert m.estimate("apple") >= 150
    # round-trip
    rt = CountMinSketch.from_bytes(m.to_bytes(), 4, 1 << 10)
    assert rt.estimate("apple") == m.estimate("apple")


def test_cms_pipeline_vs_exact(ray_session):
    import pyarrow as pa
    import ray.data
    from gumbo_pp_ray.stages.sketches import cms_token_counts

    texts = ["the cat sat on the mat"] * 30 + ["dogs run fast"] * 5
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    _, est = cms_token_counts(ray.data.from_arrow(t),
                              probes=["the", "dogs", "zebra"])
    assert est["the"] >= 60           # 2 per doc x 30 docs
    assert est["the"] <= 66
    assert 5 <= est["dogs"] <= 8
    assert est["zebra"] <= 2


def test_histogram_sketch_quantiles(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data
    from gumbo_pp_ray.stages.sketches import (
        HistogramSketch, histogram_quantiles,
    )

    rng = np.random.RandomState(3)
    vals = rng.randint(0, 1000, 20_000)
    # unit: estimate within one bin width of the exact quantile
    h = HistogramSketch(0, 1000, bins=200)
    h.add_many(vals)
    for q in (0.5, 0.9, 0.99):
        exact = np.sort(vals)[int(np.ceil(q * len(vals))) - 1]
        assert abs(h.quantile(q) - exact) <= 1000 / 200 + 1
    # merge = concat
    h1 = HistogramSketch(0, 1000, bins=200)
    h2 = HistogramSketch(0, 1000, bins=200)
    h1.add_many(vals[:10000]); h2.add_many(vals[10000:])
    assert (h1.merge(h2).counts == h.counts).all()
    # pipeline over a Dataset
    t = pa.table({"n": vals.astype("int64")})
    est = histogram_quantiles(ray.data.from_arrow(t), col="n",
                              lo=0, hi=1000, bins=200)
    exact50 = np.sort(vals)[int(np.ceil(0.5 * len(vals))) - 1]
    assert abs(est[0.5] - exact50) <= 6


def test_histogram_sketch_rejects_degenerate_range():
    import pytest
    from gumbo_pp_ray.stages.sketches import HistogramSketch

    with pytest.raises(ValueError):
        HistogramSketch(5, 5)
    with pytest.raises(ValueError):
        HistogramSketch(10, 3)


def test_tree_merge_many_blobs(ray_session):
    """Tree-reduce with a tiny fanin forces multiple merge rounds and
    must agree with the single-pass sketch."""
    import pyarrow as pa
    import ray.data
    from gumbo_pp_ray.stages.sketches import (
        CountMinSketch, cms_token_counts,
    )

    texts = [f"tok{i % 7} common" for i in range(200)]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    # many blocks -> many blobs; fanin=2 forces ~log2 rounds
    ds = ray.data.from_arrow(t).repartition(16)
    _, est = cms_token_counts(ds, probes=["common", "tok0"], fanin=2)
    exact = CountMinSketch()
    for s in texts:
        exact.add_many(s.split())
    assert est["common"] == exact.estimate("common") == 200
    assert est["tok0"] >= 29
