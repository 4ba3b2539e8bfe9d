"""Substring-level exact dedup (stages/substring.py) — planted
duplicated passages, overlap unions, within-doc repeats, short docs,
and pipeline equivalence to a pure-Python reference."""

import numpy as np
import pyarrow as pa

from gumbo_pp_ray.stages.substring import (
    _bucket_removals, _gram_occurrences, substring_dedup,
)


def _py_reference(docs: dict[int, str], k: int) -> dict[int, tuple]:
    occ: dict[str, list] = {}
    for did in sorted(docs):
        toks = docs[did].split()
        for i in range(len(toks) - k + 1):
            occ.setdefault(" ".join(toks[i:i + k]), []).append((did, i))
    removed = set()
    for lst in occ.values():
        if len(lst) > 1:
            for did, i in sorted(lst)[1:]:
                removed.update((did, j) for j in range(i, i + k))
    out = {}
    for did, s in docs.items():
        toks = s.split()
        kept = [t for j, t in enumerate(toks) if (did, j) not in removed]
        out[did] = (" ".join(kept), len(toks), len(toks) - len(kept))
    return out


def test_gram_occurrences_and_bucket_removals_unit():
    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["a b c d e", "x a b c d y"],
    })
    g = _gram_occurrences(t, k=4, num_partitions=1)
    # doc1: positions 0,1; doc2: positions 0,1,2
    assert g.num_rows == 5
    rem = _bucket_removals(g, k=4)
    # 'a b c d' occurs at (1,0) and (2,1): keep (1,0), remove
    # (2,1..4)
    got = sorted(zip(rem.column("doc_id").to_pylist(),
                     rem.column("rpos").to_pylist()))
    assert got == [(2, 1), (2, 2), (2, 3), (2, 4)]


def test_substring_dedup_pipeline(ray_session):
    import ray.data

    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(40)]
    passage = "the quick brown fox jumps over the lazy dog again"
    docs = {}
    for did in range(40):
        words = list(rng.choice(vocab, size=30))
        if did % 4 == 0:      # plant the passage in 10 docs
            at = int(rng.randint(0, 20))
            words[at:at] = passage.split()
        docs[did] = " ".join(words)
    docs[40] = "tiny doc"                       # shorter than k
    docs[41] = " ".join(passage.split() * 2)    # within-doc repeat
    ref = _py_reference(docs, k=8)

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(sorted(docs), pa.int64()),
        "text": [docs[d] for d in sorted(docs)],
    }))
    out = {r["doc_id"]: r for r in
           substring_dedup(ds, k=8, num_partitions=4).take_all()}
    assert len(out) == len(docs)
    for did, (text, n_in, n_rm) in ref.items():
        r = out[did]
        assert (r["text"], r["n_tokens_in"], r["n_removed"]) == \
            (text, n_in, n_rm), did
    # the planted passage must survive in exactly one doc
    survivors = [d for d, r in out.items() if passage in r["text"]]
    assert len(survivors) == 1
    # short doc untouched
    assert out[40]["text"] == "tiny doc" and out[40]["n_removed"] == 0
    # within-doc repeat: second copy removed
    assert out[41]["n_removed"] >= 8


def test_substring_dedup_plan_equivalence(ray_session):
    import ray.data

    rng = np.random.RandomState(11)
    vocab = [f"v{i}" for i in range(25)]
    passage = " ".join(f"p{i}" for i in range(10))
    docs = {}
    for did in range(30):
        words = list(rng.choice(vocab, size=25))
        if did % 3 == 0:
            words[5:5] = passage.split()
        docs[did] = " ".join(words)
    t = pa.table({
        "doc_id": pa.array(sorted(docs), pa.int64()),
        "text": [docs[d] for d in sorted(docs)],
    })
    outs = {}
    for plan in ("broadcast", "cogroup", "auto"):
        out = substring_dedup(ray.data.from_arrow(t), k=8,
                              num_partitions=4, plan=plan).take_all()
        outs[plan] = sorted((r["doc_id"], r["text"], r["n_removed"])
                            for r in out)
    assert outs["broadcast"] == outs["cogroup"] == outs["auto"]
    assert any(rm for _, _, rm in outs["broadcast"])
    # auto with a zero broadcast budget must take the cogroup path
    out = substring_dedup(ray.data.from_arrow(t), k=8,
                          num_partitions=4, plan="auto",
                          broadcast_max_removals=0).take_all()
    assert sorted((r["doc_id"], r["text"], r["n_removed"])
                  for r in out) == outs["broadcast"]
