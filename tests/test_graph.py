"""Connected-components tests: chains, stars, singletons, convergence
against a local union-find reference."""

import numpy as np
import pyarrow as pa
import pytest

from gumbo_pp_ray.stages.graph import (
    _star_group, cluster_keepers, connected_components, star_edges,
)


def _uf_reference(n_nodes, pairs):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min id per component
    comp = {}
    for v in range(n_nodes):
        r = find(v)
        comp.setdefault(r, []).append(v)
    return {v: min(members) for r, members in comp.items()
            for v in members}


def test_star_group_unit():
    g = pa.table({"doc_id": [7, 3, 9]})
    out = _star_group(g, id_col="doc_id")
    assert out.column("doc_a").to_pylist() == [3, 3]
    assert out.column("doc_b").to_pylist() == [7, 9]
    single = _star_group(pa.table({"doc_id": [5]}), id_col="doc_id")
    assert single.num_rows == 0


def test_connected_components_chain_and_singletons(ray_session):
    import ray.data
    # chain 0-1-2-3-4 (diameter 4), pair (6,7), singletons 5, 8
    pairs = pa.table({"doc_a": [0, 1, 2, 3, 6],
                      "doc_b": [1, 2, 3, 4, 7]})
    nodes = pa.table({"doc_id": list(range(9))})
    clusters = connected_components(ray.data.from_arrow(pairs),
                                    ray.data.from_arrow(nodes),
                                    num_partitions=4)
    out = clusters.take_all()
    got = {r["doc_id"]: r["cluster_id"] for r in out}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0,
                   5: 5, 6: 6, 7: 6, 8: 8}
    keep = cluster_keepers(clusters).take_all()
    assert sorted(r["doc_id"] for r in keep) == [0, 5, 6, 8]


def test_connected_components_random_vs_union_find(ray_session):
    import ray.data
    rng = np.random.RandomState(13)
    n = 200
    m = 150
    a = rng.randint(0, n, m)
    b = rng.randint(0, n, m)
    pairs = pa.table({"doc_a": a.astype("int64"),
                      "doc_b": b.astype("int64")})
    nodes = pa.table({"doc_id": list(range(n))})
    out = connected_components(ray.data.from_arrow(pairs),
                               ray.data.from_arrow(nodes),
                               num_partitions=8).take_all()
    got = {r["doc_id"]: r["cluster_id"] for r in out}
    ref = _uf_reference(n, [(x, y) for x, y in zip(a, b) if x != y])
    assert got == ref


def test_connected_components_nonconvergence_raises(ray_session):
    import ray.data
    pairs = pa.table({"doc_a": [0, 1, 2], "doc_b": [1, 2, 3]})
    nodes = pa.table({"doc_id": [0, 1, 2, 3]})
    with pytest.raises(RuntimeError):
        connected_components(ray.data.from_arrow(pairs),
                             ray.data.from_arrow(nodes),
                             num_partitions=2, max_iters=1)


def test_star_edges_pipeline(ray_session):
    import ray.data
    t = pa.table({"doc_id": [10, 11, 12, 20, 21, 30],
                  "grp": ["a", "a", "a", "b", "b", "c"]})
    out = star_edges(ray.data.from_arrow(t), "grp").take_all()
    got = sorted((r["doc_a"], r["doc_b"]) for r in out)
    assert got == [(10, 11), (10, 12), (20, 21)]


def test_cc_broadcast_plan_matches_cogroup(ray_session):
    """The broadcast-label fast plan must produce exactly the co-group
    scale plan's clusters on a multi-hop random graph."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from gumbo_pp_ray.stages.graph import connected_components

    rng = np.random.RandomState(7)
    n = 400
    # chain-y random graph: guarantees multi-hop label propagation
    a = rng.randint(0, n, 300)
    b = np.clip(a + rng.randint(1, 8, 300), 0, n - 1)
    pairs = ray.data.from_arrow(pa.table({
        "doc_a": pa.array(a, pa.int64()),
        "doc_b": pa.array(b, pa.int64())})).repartition(4)
    nodes = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64())})).repartition(4)

    fast = connected_components(pairs, nodes, plan="broadcast") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    slow = connected_components(pairs, nodes, plan="cogroup",
                                num_partitions=4) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert fast.equals(slow)
    # sanity: a singleton keeps its own id
    iso = set(range(n)) - set(a) - set(b)
    if iso:
        v = iso.pop()
        assert fast.loc[fast.doc_id == v, "cluster_id"].item() == v


def test_cc_broadcast_long_chain_converges(ray_session):
    """A pure chain has diameter = n: without driver-side pointer
    jumping the broadcast plan would need n rounds (and trip
    max_iters); with shortcutting it converges in ~log n rounds."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from gumbo_pp_ray.stages.graph import connected_components

    n = 1500
    pairs = ray.data.from_arrow(pa.table({
        "doc_a": pa.array(np.arange(n - 1), pa.int64()),
        "doc_b": pa.array(np.arange(1, n), pa.int64())})).repartition(4)
    nodes = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64())})).repartition(4)
    out = connected_components(pairs, nodes, plan="broadcast",
                               max_iters=30).to_pandas()
    assert (out["cluster_id"] == 0).all()


def test_cc_plans_agree_on_edge_only_ids(ray_session):
    """Edges may name ids absent from nodes_ds (e.g. pairs from a
    stale index); BOTH plans must confine output to the node table —
    the cogroup plan used to emit label rows for edge-only ids while
    the broadcast plan dropped them (plan-dependent row counts)."""
    import ray.data

    from gumbo_pp_ray.stages.graph import connected_components

    pairs = pa.table({"doc_a": pa.array([5, 9], pa.int64()),
                      "doc_b": pa.array([3, 5], pa.int64())})
    nodes = pa.table({"doc_id": pa.array([5, 9, 11], pa.int64())})
    outs = {}
    for plan in ("broadcast", "cogroup"):
        rows = connected_components(
            ray.data.from_arrow(pairs), ray.data.from_arrow(nodes),
            plan=plan, num_partitions=4).take_all()
        outs[plan] = sorted((r["doc_id"], r["cluster_id"])
                            for r in rows)
    assert outs["broadcast"] == outs["cogroup"]
    ids = [d for d, _ in outs["broadcast"]]
    assert ids == [5, 9, 11]                 # node universe only
    # edge-only id 3 neither labels nor relays: the component is
    # {5, 9} (joined by the direct 9-5 edge) with min KNOWN id 5
    by_id = dict(outs["broadcast"])
    assert by_id[5] == by_id[9] == 5
    assert by_id[11] == 11
