"""Incremental near-dup: dedup a NEW shard against a persisted
signature index, never recomputing the existing corpus.

At 100 TB, the corpus's MinHash signatures (~1-2% of corpus bytes at
128 perms) are the artifact you keep: ``write_signature_index`` runs
the signature stage once and writes a partitioned parquet index plus a
params sidecar; ``minhash_lsh_pairs_incremental`` computes signatures
for the new shard ONLY, unions its band rows with band rows derived
from the index, and emits candidate pairs where at least one side is
new — old-old pairs are suppressed by construction (the indexed corpus
was already deduped; re-emitting its internal pairs would be
output-sized noise).

Scale shape: identical to stages/dedup.py's signatures plan (one
band-key shuffle, in-bucket verify, hot buckets star-linked around the
new members), with the index side streaming from parquet — the index
read is column-pruned and the exchange carries (band_key, doc_id,
signature, is_new) rows.
"""

from __future__ import annotations

import functools
import json
import os

import numpy as np
import pyarrow as pa

from .dedup import (
    HOT_BUCKET_CAP, MinHashSignatures, _distinct_pairs, _sig_matrix,
    lsh_bands,
)

_PARAMS_FILE = "_index_params.json"


def write_signature_index(ds, index_dir: str, *, num_perm: int = 128,
                          shingle_words: int = 3, seed: int = 42,
                          concurrency=None) -> dict:
    """documents Dataset → parquet signature index at ``index_dir``
    (columns: doc_id, signature) + a params sidecar that
    ``minhash_lsh_pairs_incremental`` validates against — a signature
    computed with different perms/shingles/seed is not comparable, so
    a mismatch must fail loudly, not degrade recall silently."""
    from ..state.sizing import default_pool_size
    if concurrency is None:
        concurrency = (2, default_pool_size())
    sigs = ds.map_batches(
        MinHashSignatures,
        fn_constructor_kwargs={"num_perm": num_perm,
                               "shingle_words": shingle_words,
                               "seed": seed},
        batch_format="pyarrow", concurrency=concurrency)
    sigs.write_parquet(index_dir)
    params = {"num_perm": num_perm, "shingle_words": shingle_words,
              "seed": seed}
    with open(os.path.join(index_dir, _PARAMS_FILE), "w") as f:
        json.dump(params, f)
    return params


def read_index_params(index_dir: str) -> dict:
    with open(os.path.join(index_dir, _PARAMS_FILE)) as f:
        return json.load(f)


def append_signature_index(ds, index_dir: str, *,
                           concurrency=None) -> dict:
    """Accrete a new shard's signatures into an EXISTING index — the
    ingest loop's commit step after the shard has been deduped against
    the corpus.  Hash params are read from the sidecar (never passed
    in), so an accreted index can never silently mix incomparable
    signatures; the shard's parquet files land beside the prior
    generations' (Ray writes unique filenames — no rewrite of old
    data, which at 100 TB is the difference between appending ~1-2%
    and rewriting everything)."""
    from ..state.sizing import default_pool_size
    params = read_index_params(index_dir)
    if concurrency is None:
        concurrency = (2, default_pool_size())
    sigs = ds.map_batches(
        MinHashSignatures,
        fn_constructor_kwargs={"num_perm": params["num_perm"],
                               "shingle_words": params["shingle_words"],
                               "seed": params["seed"]},
        batch_format="pyarrow", concurrency=concurrency)
    sigs.write_parquet(index_dir)
    return params


def _flag_rows(batch: pa.Table, *, is_new: int) -> pa.Table:
    return batch.append_column(
        "is_new", pa.array(np.full(len(batch), is_new, dtype=np.int8)))


def bucket_candidate_pairs_incremental(group: pa.Table, *,
                                       threshold: float) -> pa.Table:
    """One LSH bucket: verify every NEW member against all members
    (new-new pairs once via doc_a < doc_b; new-old always; old-old
    never).  Hot buckets: the comparison set is capped at
    HOT_BUCKET_CAP id-sorted members plus the bucket minimum as a
    star hub, matching the main path's recall policy."""
    raw_ids = group.column("doc_id").to_numpy(zero_copy_only=False)
    flags = group.column("is_new").to_numpy(zero_copy_only=False)
    sigs = _sig_matrix(group.column("signature"))
    order = np.argsort(raw_ids, kind="stable")
    # one row per doc (a doc can reach a bucket once per band, and the
    # same doc can appear on both sides if the caller re-indexes)
    seen: dict = {}
    for i in order:
        cur = seen.get(raw_ids[i])
        if cur is None:
            seen[raw_ids[i]] = (sigs[i], bool(flags[i]))
        elif flags[i] and not cur[1]:
            seen[raw_ids[i]] = (sigs[i], True)
    ids = np.array(list(seen.keys()), dtype=np.int64)
    mat = np.stack([v[0] for v in seen.values()]) if len(seen) else \
        np.zeros((0, 1))
    newf = np.array([v[1] for v in seen.values()], dtype=bool)
    a_out, b_out, j_out = [], [], []

    def emit(a, b, jv):
        if jv >= threshold and a != b:
            if a > b:
                a, b = b, a
            a_out.append(int(a))
            b_out.append(int(b))
            j_out.append(int(jv * 1000))

    head = min(len(ids), HOT_BUCKET_CAP)
    for i in np.nonzero(newf[:head])[0]:
        eq = (mat[:head] == mat[i]).mean(axis=1)
        for k in range(head):
            if k == i:
                continue
            if newf[k] and ids[k] < ids[i]:
                continue                    # new-new emitted once
            emit(ids[i], ids[k], eq[k])
    if len(ids) > HOT_BUCKET_CAP:
        # star policy: overflow NEW members verify against the hub
        hub_sig = mat[0]
        for k in range(HOT_BUCKET_CAP, len(ids)):
            if not newf[k]:
                continue
            emit(ids[0], ids[k], float((mat[k] == hub_sig).mean()))
    return pa.table({"doc_a": pa.array(a_out, pa.int64()),
                     "doc_b": pa.array(b_out, pa.int64()),
                     "jaccard_est_milli": pa.array(j_out, pa.int64())})


def minhash_lsh_pairs_incremental(new_ds, index_dir: str, *,
                                  bands: int = 16, rows: int = 8,
                                  threshold: float = 0.5,
                                  concurrency=None,
                                  num_partitions: int = 16):
    """Near-dup pairs (doc_a, doc_b, jaccard_est_milli) involving at
    least one NEW document: new-vs-index and new-vs-new; never
    index-vs-index.

    Partitioning assumption: one band-key shuffle partition holds
    ~(index+new) x bands / num_partitions signature rows — size
    ``num_partitions`` ≈ total band rows / 1M at corpus scale (the
    default 16 fits single-node corpora); band rows carry signatures,
    so an extreme index side would use an ids-style exchange like
    dedup.minhash_lsh_pairs(band_exchange="ids")."""
    from ..sources.io import read_parquet_clean
    from ..state.sizing import default_pool_size
    params = read_index_params(index_dir)
    if bands * rows > params["num_perm"]:
        raise ValueError(
            f"bands*rows = {bands * rows} exceeds index num_perm "
            f"{params['num_perm']}")
    if concurrency is None:
        concurrency = (2, default_pool_size())
    new_sigs = new_ds.map_batches(
        MinHashSignatures,
        fn_constructor_kwargs={"num_perm": params["num_perm"],
                               "shingle_words": params["shingle_words"],
                               "seed": params["seed"]},
        batch_format="pyarrow", concurrency=concurrency).map_batches(
        functools.partial(_flag_rows, is_new=1), batch_format="pyarrow")
    from ..sources.io import list_input_files
    idx_files = list_input_files(index_dir)   # skips the _params sidecar
    idx_sigs = read_parquet_clean(
        idx_files, columns=["doc_id", "signature"]).map_batches(
        functools.partial(_flag_rows, is_new=0), batch_format="pyarrow")

    def bands_with_flag(batch: pa.Table) -> pa.Table:
        flags = batch.column("is_new")
        rows_t = lsh_bands(batch.drop_columns(["is_new"]),
                           bands=bands, rows=rows, carry_signature=True)
        # lsh_bands emits ``bands`` rows per input row, in input order
        rep = np.repeat(flags.to_numpy(zero_copy_only=False), bands)
        return rows_t.append_column("is_new",
                                    pa.array(rep, pa.int8()))

    bandrows = new_sigs.union(idx_sigs).map_batches(
        bands_with_flag, batch_format="pyarrow")
    pairs = bandrows.groupby(
        "band_key", num_partitions=num_partitions).map_groups(
        functools.partial(bucket_candidate_pairs_incremental,
                          threshold=threshold),
        batch_format="pyarrow")
    return _distinct_pairs(pairs, ("jaccard_est_milli",))
