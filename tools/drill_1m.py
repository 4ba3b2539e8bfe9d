"""1M-document dedup drills — the reproducible source of BASELINE.md's
round-5 scale numbers.

Generates a deterministic synthetic corpus ONCE (parquet under
/tmp/gumbo_bench): N 40-token docs from a seeded per-doc RNG; every
doc_id divisible by 100 is an exact copy of doc_id+1's text (1% planted
dup pairs, ground truth known in closed form).  Then runs the requested
drills, each reporting wall time plus EXACT planted-truth accounting —
a drill passes only if the counts match the construction exactly.

Usage:
    python tools/drill_1m.py [N] [drill ...]
    # drills: minhash_ids minhash_signatures incremental exact simhash
    #         substring   (default: all)
    # e.g. python tools/drill_1m.py 250000 minhash_ids minhash_signatures

Expected counts at any N (multiple of 200):
* minhash/simhash/exact pairs-or-groups: N/100 planted pairs.
* incremental (index = doc_id & 7 != 0, new shard = & 7 == 0): planted
  pair (i, i+1) has its even side in the new shard iff i % 200 == 0 →
  N/200 pairs emitted, the other N/200 suppressed as old-old.
* substring: N/100 docs lose all 40 tokens (every 8-gram of a copy
  resolves to the original's earlier occurrence).
"""
from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def corpus_dir(n: int) -> str:
    return f"/tmp/gumbo_bench/drillcorpus-{n}"


def ensure_corpus(n: int) -> str:
    import ray.data
    d = corpus_dir(n)
    marker = os.path.join(d, "_ready")
    if os.path.exists(marker):
        return d
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy() if hasattr(batch["id"], "to_numpy") \
            else np.asarray(batch["id"])
        out_ids, out_texts = [], []
        for i in ids.astype(np.int64):
            base = int(i) + 1 if int(i) % 100 == 0 else int(i)
            rng = np.random.RandomState(base % (2 ** 31 - 1))
            toks = rng.randint(0, 50000, size=40)
            out_ids.append(int(i))
            out_texts.append(" ".join(f"w{t}" for t in toks))
        return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                         "text": pa.array(out_texts)})

    (ray.data.range(n, override_num_blocks=max(64, n // 4000))
        .map_batches(gen, batch_format="pyarrow").write_parquet(d))
    open(marker, "w").write("ok")
    return d


def _docs(n: int):
    from gumbo_pp_ray.sources.io import read_parquet_clean
    return read_parquet_clean(corpus_dir(n), columns=["doc_id", "text"])


def drill_minhash(n: int, plan: str) -> None:
    from gumbo_pp_ray.stages.dedup import minhash_lsh_pairs
    t0 = time.perf_counter()
    pairs = minhash_lsh_pairs(_docs(n), threshold=0.5,
                              band_exchange=plan).count()
    dt = time.perf_counter() - t0
    ok = pairs == n // 100
    print(f"minhash_{plan}: wall={dt:.1f}s pairs={pairs} "
          f"(want {n // 100}) docs_per_sec={n / dt:.0f} "
          f"{'OK' if ok else 'MISMATCH'}")


def drill_incremental(n: int) -> None:
    from gumbo_pp_ray.sources.io import read_parquet_clean
    from gumbo_pp_ray.stages.incremental import (
        minhash_lsh_pairs_incremental, write_signature_index,
    )
    base = f"/tmp/gumbo_bench/drillincr-{n}"
    idx, shard = os.path.join(base, "sigidx"), os.path.join(base, "shard")
    if not os.path.exists(os.path.join(base, "_ready")):
        shutil.rmtree(base, ignore_errors=True)
        os.makedirs(base)
        t0 = time.perf_counter()
        write_signature_index(_docs(n).map_batches(
            lambda t: t.filter(pc.not_equal(
                pc.bit_wise_and(t.column("doc_id"), 7), 0)),
            batch_format="pyarrow"), idx)
        print(f"  index build (untimed setup) "
              f"{time.perf_counter() - t0:.1f}s")
        _docs(n).map_batches(
            lambda t: t.filter(pc.equal(
                pc.bit_wise_and(t.column("doc_id"), 7), 0)),
            batch_format="pyarrow").write_parquet(shard)
        open(os.path.join(base, "_ready"), "w").write("ok")
    new = read_parquet_clean(shard, columns=["doc_id", "text"])
    t0 = time.perf_counter()
    pairs = minhash_lsh_pairs_incremental(new, idx, threshold=0.5).count()
    dt = time.perf_counter() - t0
    ok = pairs == n // 200
    print(f"incremental: wall={dt:.1f}s pairs={pairs} (want {n // 200}, "
          f"the other {n // 200} are old-old → suppressed) "
          f"{'OK' if ok else 'MISMATCH'}")


def drill_exact(n: int) -> None:
    from gumbo_pp_ray.stages.dedup import exact_dedup
    t0 = time.perf_counter()
    out = exact_dedup(_docs(n))
    s = out.map_batches(lambda t: pa.table({
        "hashes": [t.num_rows],
        "dupg": [int(pc.sum(pc.greater(
            t.column("n_dups"), 1)).as_py() or 0)],
        "total": [int(pc.sum(t.column("n_dups")).as_py() or 0)],
    }), batch_format="pyarrow").to_pandas().sum()
    dt = time.perf_counter() - t0
    ok = (s["hashes"] == n - n // 100 and s["dupg"] == n // 100
          and s["total"] == n)
    print(f"exact: wall={dt:.1f}s distinct={s['hashes']} "
          f"dup_groups={s['dupg']} total={s['total']} "
          f"{'OK' if ok else 'MISMATCH'}")


def drill_simhash(n: int) -> None:
    from gumbo_pp_ray.stages.dedup import simhash_neardup_pairs
    t0 = time.perf_counter()
    pairs = simhash_neardup_pairs(_docs(n), max_hamming=3).count()
    dt = time.perf_counter() - t0
    ok = pairs == n // 100
    print(f"simhash: wall={dt:.1f}s pairs={pairs} (want {n // 100}) "
          f"{'OK' if ok else 'MISMATCH'}")


def drill_substring(n: int) -> None:
    from gumbo_pp_ray.stages.substring import substring_dedup
    t0 = time.perf_counter()
    out = substring_dedup(_docs(n), k=8)
    s = out.map_batches(lambda t: pa.table({
        "docs": [t.num_rows],
        "rmdocs": [int(pc.sum(pc.greater(
            t.column("n_removed"), 0)).as_py() or 0)],
        "tokrm": [int(pc.sum(t.column("n_removed")).as_py() or 0)],
    }), batch_format="pyarrow").to_pandas().sum()
    dt = time.perf_counter() - t0
    ok = s["docs"] == n and s["rmdocs"] == n // 100 \
        and s["tokrm"] == 40 * (n // 100)
    print(f"substring: wall={dt:.1f}s docs={s['docs']} "
          f"removed_docs={s['rmdocs']} tok_removed={s['tokrm']} "
          f"docs_per_sec={n / dt:.0f} {'OK' if ok else 'MISMATCH'}")


DRILLS = {
    "minhash_ids": lambda n: drill_minhash(n, "ids"),
    "minhash_signatures": lambda n: drill_minhash(n, "signatures"),
    "incremental": drill_incremental,
    "exact": drill_exact,
    "simhash": drill_simhash,
    "substring": drill_substring,
}


def main() -> None:
    import ray
    args = sys.argv[1:]
    n = int(args.pop(0)) if args and args[0].isdigit() else 1_000_000
    names = args or list(DRILLS)
    bad = [x for x in names if x not in DRILLS]
    if bad:
        raise SystemExit(f"unknown drills {bad}; choose from "
                         f"{sorted(DRILLS)}")
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False)
    ensure_corpus(n)
    print(f"corpus: {n} docs at {corpus_dir(n)}")
    for name in names:
        DRILLS[name](n)
    ray.shutdown()


if __name__ == "__main__":
    main()
