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
