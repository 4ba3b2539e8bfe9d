"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram
Jaccard verification.

Scale shapes (ray_guide: aggregation at scale):

* **Exact / normalized-exact**: vectorized content-hash column in
  ``map_batches`` → prune to (hash, doc_id) BEFORE the shuffle →
  ``groupby(hash)`` keep min(doc_id). The exchange moves 2 narrow
  columns, never the text.
* **MinHash+LSH**: per batch, shingle → 128-permutation minhash
  signature (numpy, one matrix min per doc) → explode to
  (band_id, band_hash, doc_id, signature) rows → groupby on the
  band key → within-bucket pairwise signature Jaccard estimate →
  candidate pairs above threshold. No driver-side state; bucket
  groups bound the pairwise work. Signature hashing uses CRC32 —
  deterministic across processes (PYTHONHASHSEED-free).
* **SimHash**: 64-bit signatures; near-dup = small Hamming distance.
* Exact verification (``ngram_jaccard``) recomputes true Jaccard for
  candidate pairs from their shingle sets.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa

# ---------------------------------------------------------- exact dedup

def add_content_hash(batch: pa.Table, *, normalize: bool = False
                     ) -> pa.Table:
    """md5 hex of the text (optionally lowercased + whitespace-
    collapsed) — matches DuckDB's md5() for the oracle."""
    texts = batch.column("text").to_pylist()
    if normalize:
        texts = [" ".join(t.lower().split()) for t in texts]
    hashes = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "content_hash": pa.array(hashes, pa.string()),
    })


def keep_first_in_group(group: pa.Table) -> pa.Table:
    """map_groups reducer: deterministic winner = min(doc_id)."""
    ids = group.column("doc_id")
    m = pa.compute.min(ids).as_py()
    return pa.table({
        "content_hash": group.column("content_hash").slice(0, 1),
        "doc_id": pa.array([m], ids.type),
        "n_dups": pa.array([group.num_rows], pa.int64()),
    })


def exact_dedup(ds, *, normalize: bool = False):
    """documents Dataset → (content_hash, doc_id=min, n_dups)."""
    import functools
    ds = ds.map_batches(
        functools.partial(add_content_hash, normalize=normalize),
        batch_format="pyarrow")
    return ds.groupby("content_hash").map_groups(
        keep_first_in_group, batch_format="pyarrow")


# ------------------------------------------------------ MinHash + LSH

_MERSENNE = (1 << 61) - 1


class MinHasher:
    """128-perm MinHash signatures over word shingles.

    Permutations h_i(x) = (a_i * x + b_i) mod p (universal hashing,
    standard Broder minhash construction) with a fixed seed; shingle
    base hash = CRC32 (process-stable).
    """

    def __init__(self, num_perm: int = 128, shingle_words: int = 3,
                 seed: int = 42):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_words = shingle_words

    def shingles(self, text: str) -> np.ndarray:
        toks = text.split()
        w = self.shingle_words
        if len(toks) < w:
            grams = [" ".join(toks)] if toks else [""]
        else:
            grams = [" ".join(toks[i:i + w])
                     for i in range(len(toks) - w + 1)]
        return np.asarray(
            sorted({zlib.crc32(g.encode("utf-8")) for g in grams}),
            dtype=np.uint64)

    def signature(self, text: str) -> np.ndarray:
        x = self.shingles(text)
        if len(x) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        # (P, S) matrix of permuted hashes → min over shingles
        hx = (np.outer(self.a, x) + self.b[:, None]) % _MERSENNE
        return hx.min(axis=1)


class MinHashSignatures:
    """map_batches actor: text → signature (list<uint64 as int64>).

    Vectorized across the whole batch: ONE (P x total_shingles)
    permuted-hash matrix + per-doc segment minima
    (``np.minimum.reduceat``) instead of a per-document outer product.
    """

    def __init__(self, num_perm: int = 128, shingle_words: int = 3,
                 seed: int = 42):
        self.mh = MinHasher(num_perm, shingle_words, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mh = self.mh
        texts = batch.column("text").to_pylist()
        shingle_arrays = [mh.shingles(t) for t in texts]
        counts = np.asarray([len(s) for s in shingle_arrays],
                            dtype=np.int64)
        out = np.zeros((len(texts), mh.num_perm), dtype=np.int64)
        nonempty = counts > 0
        if nonempty.any():
            x = np.concatenate([s for s in shingle_arrays if len(s)])
            # (P, total) permuted hashes; modest memory: P*total*8B
            hx = (np.outer(mh.a, x) + mh.b[:, None]) % _MERSENNE
            starts = np.zeros(int(nonempty.sum()), dtype=np.int64)
            np.cumsum(counts[nonempty][:-1], out=starts[1:])
            mins = np.minimum.reduceat(hx, starts, axis=1)  # (P, docs)
            out[nonempty] = mins.T.astype(np.int64)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "signature": pa.array(out.tolist(), pa.list_(pa.int64())),
        })


def lsh_bands(batch: pa.Table, *, bands: int = 16, rows: int = 8,
              carry_signature: bool = True) -> pa.Table:
    """Explode signatures to LSH band rows; band_key =
    "band_id:md5(band values)" — the bucket join key. Stateless
    function stage (NOT an actor pool — stacking a second fixed pool
    in the pipeline can reserve every CPU and starve the shuffle; see
    state/sizing.py).

    ``carry_signature=False`` emits only (band_key, doc_id) — the
    scale shape: the exchange shrinks from ~bands x signature bytes
    per doc (16 KB/doc at 128 perms) to ~16 B/doc, and signatures are
    joined back over the (small) candidate set afterwards."""
    ids = batch.column("doc_id").to_pylist()
    sigs = batch.column("signature").to_pylist()
    out_key, out_id, out_sig = [], [], []
    for i, sig in zip(ids, sigs):
        for b in range(bands):
            chunk = sig[b * rows:(b + 1) * rows]
            h = hashlib.md5(
                np.asarray(chunk, dtype=np.int64).tobytes()).hexdigest()[:16]
            out_key.append(f"{b}:{h}")
            out_id.append(i)
            if carry_signature:
                out_sig.append(sig)
    cols = {
        "band_key": pa.array(out_key, pa.string()),
        "doc_id": pa.array(out_id),
    }
    if carry_signature:
        cols["signature"] = pa.array(out_sig, pa.list_(pa.int64()))
    return pa.table(cols)


def bucket_candidate_ids(group: pa.Table) -> pa.Table:
    """Within one LSH bucket: all candidate id pairs (doc_a < doc_b),
    no similarity yet — verification happens after the signatures are
    joined back. Hot-bucket cap 256 (same policy as the carrying
    variant)."""
    ids = sorted(set(group.column("doc_id").to_pylist()))[:256]
    if len(ids) < 2:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64())})
    a_out, b_out = [], []
    for i in range(len(ids) - 1):
        for j in range(i + 1, len(ids)):
            a_out.append(ids[i])
            b_out.append(ids[j])
    return pa.table({"doc_a": pa.array(a_out, pa.int64()),
                     "doc_b": pa.array(b_out, pa.int64())})


def bucket_candidate_pairs(group: pa.Table, *, threshold: float = 0.5
                           ) -> pa.Table:
    """Within one LSH bucket: pairwise signature-estimated Jaccard;
    emit pairs above threshold (doc_a < doc_b). Bucket sizes bound the
    quadratic work; a hot bucket (all-identical boilerplate) is capped
    at 256 members (cap logged via the truncated flag)."""
    ids = group.column("doc_id").to_pylist()
    if len(ids) < 2:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "jaccard_est_milli": pa.array([], pa.int64())})
    order = np.argsort(ids, kind="stable")
    cap = 256
    truncated = len(ids) > cap
    order = order[:cap]
    sigs = group.column("signature").to_pylist()
    mat = np.asarray([sigs[i] for i in order], dtype=np.int64)
    ids = [ids[i] for i in order]
    a_out, b_out, j_out = [], [], []
    n = len(ids)
    for i in range(n - 1):
        eq = (mat[i + 1:] == mat[i]).mean(axis=1)
        for k, jv in enumerate(eq):
            if jv >= threshold:
                a, b = ids[i], ids[i + 1 + k]
                if a == b:
                    continue
                if a > b:
                    a, b = b, a
                a_out.append(a)
                b_out.append(b)
                j_out.append(int(jv * 1000))
    return pa.table({"doc_a": pa.array(a_out, pa.int64()),
                     "doc_b": pa.array(b_out, pa.int64()),
                     "jaccard_est_milli": pa.array(j_out, pa.int64())})


def _dedupe_pairs_local(batch: pa.Table) -> pa.Table:
    """Single-block distinct over (doc_a, doc_b) — pandas drop_duplicates
    on two int columns."""
    if batch.num_rows == 0:
        return batch
    df = batch.to_pandas().drop_duplicates(["doc_a", "doc_b"])
    return pa.Table.from_pandas(df, preserve_index=False)


def _verify_pairs_with_sigs(pairs: pa.Table, sig_lookup: dict,
                            threshold: float) -> pa.Table:
    """Signature-estimated Jaccard for candidate pairs; keep ≥
    threshold."""
    a_ids = pairs.column("doc_a").to_pylist()
    b_ids = pairs.column("doc_b").to_pylist()
    a_out, b_out, j_out = [], [], []
    for a, b in zip(a_ids, b_ids):
        sa, sb = sig_lookup.get(a), sig_lookup.get(b)
        if sa is None or sb is None:
            continue
        jv = float((sa == sb).mean())
        if jv >= threshold:
            a_out.append(a)
            b_out.append(b)
            j_out.append(int(jv * 1000))
    return pa.table({"doc_a": pa.array(a_out, pa.int64()),
                     "doc_b": pa.array(b_out, pa.int64()),
                     "jaccard_est_milli": pa.array(j_out, pa.int64())})


def minhash_lsh_pairs(ds, *, num_perm=128, bands=16, rows=8,
                      shingle_words=3, threshold=0.5, seed=42,
                      concurrency=None, pair_dedup="local",
                      band_exchange="ids"):
    """Full MinHash-LSH near-dup candidate pipeline over a documents
    Dataset → distinct (doc_a, doc_b, jaccard_est_milli).

    ``band_exchange`` controls what the bucket shuffle moves:

    * ``"ids"`` (default, the SCALE shape): band rows carry only
      (band_key, doc_id) — ~16 B/doc exchanged instead of
      bands x signature ≈ 16 KB/doc (a 1000x reduction; at 10^12 docs
      the difference is petabytes). Candidate pairs come out id-only
      and are verified afterwards against the signatures of the
      candidate docs (semi-join: only candidates' signatures move).
    * ``"signatures"`` — the band rows carry signatures and buckets
      verify in place; avoids the second pass when candidate sets are
      a large fraction of the corpus.

    ``pair_dedup``: a pair can surface from several bands. ``"local"``
    (default) coalesces candidates into one block and dedupes with
    pandas — right when pairs are output-sized; ``"shuffle"`` uses a
    groupby for huge candidate sets.
    """
    import functools
    import ray
    from ..state.sizing import default_pool_size
    if concurrency is None:
        concurrency = default_pool_size()
    sigs = ds.map_batches(
        MinHashSignatures,
        fn_constructor_kwargs={"num_perm": num_perm,
                               "shingle_words": shingle_words, "seed": seed},
        batch_format="pyarrow", concurrency=concurrency)
    carry = band_exchange == "signatures"
    if carry:
        bandrows = sigs.map_batches(
            functools.partial(lsh_bands, bands=bands, rows=rows),
            batch_format="pyarrow")
        pairs = bandrows.groupby("band_key").map_groups(
            functools.partial(bucket_candidate_pairs, threshold=threshold),
            batch_format="pyarrow")
        if pair_dedup == "shuffle":
            return pairs.groupby(["doc_a", "doc_b"]).map_groups(
                lambda g: g.slice(0, 1), batch_format="pyarrow")
        return pairs.repartition(1).map_batches(
            _dedupe_pairs_local, batch_format="pyarrow", batch_size=None)

    # scale shape: id-only band rows; signatures materialized once and
    # re-read for the candidate verification (semi-join by membership)
    sigs = sigs.materialize()
    bandrows = sigs.map_batches(
        functools.partial(lsh_bands, bands=bands, rows=rows,
                          carry_signature=False),
        batch_format="pyarrow")
    cand = bandrows.groupby("band_key").map_groups(
        bucket_candidate_ids, batch_format="pyarrow")
    cand = cand.repartition(1).map_batches(
        _dedupe_pairs_local, batch_format="pyarrow", batch_size=None)
    cand = cand.materialize()
    cand_rows = cand.take_all()
    if not cand_rows:
        return cand.map_batches(
            lambda t: t.append_column(
                "jaccard_est_milli", pa.nulls(len(t), pa.int64())),
            batch_format="pyarrow")
    wanted = {r["doc_a"] for r in cand_rows} | {r["doc_b"] for r in cand_rows}
    # membership semi-join: only the candidates' signatures leave the
    # signature dataset (wanted is pair-set-sized)
    wanted_ref = ray.put(frozenset(wanted))

    def pick(batch: pa.Table) -> pa.Table:
        w = ray.get(wanted_ref)
        keep = [i in w for i in batch.column("doc_id").to_pylist()]
        return batch.filter(pa.array(keep, pa.bool_()))

    sig_rows = sigs.map_batches(pick, batch_format="pyarrow").take_all()
    lookup = {r["doc_id"]: np.asarray(r["signature"], dtype=np.int64)
              for r in sig_rows}
    pairs_tbl = pa.table({
        "doc_a": pa.array([r["doc_a"] for r in cand_rows], pa.int64()),
        "doc_b": pa.array([r["doc_b"] for r in cand_rows], pa.int64()),
    })
    verified = _verify_pairs_with_sigs(pairs_tbl, lookup, threshold)
    import ray.data
    return ray.data.from_arrow(verified)


# ------------------------------------------------------------- SimHash

class SimHash:
    """64-bit SimHash (Charikar's random-hyperplane sketch, public
    STOC'02 construction) over word features; CRC32 feature hashes
    extended to 64 bits via a second salted CRC."""

    def __init__(self):
        pass

    @staticmethod
    def simhash64(text: str) -> int:
        toks = text.split()
        if not toks:
            return 0
        acc = np.zeros(64, dtype=np.int64)
        for t in toks:
            b = t.encode("utf-8")
            h = (zlib.crc32(b) << 32) | zlib.crc32(b + b"#salt")
            bits = np.unpackbits(
                np.frombuffer(np.uint64(h).tobytes(), dtype=np.uint8))
            acc += bits.astype(np.int64) * 2 - 1
        out = np.uint64(0)
        for i, v in enumerate(acc):
            if v > 0:
                out |= np.uint64(1) << np.uint64(i)
        return int(out)

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = [self.simhash64(t) for t in batch.column("text").to_pylist()]
        # store as signed int64 bit pattern
        signed = [int(np.uint64(h).astype(np.int64)) for h in hs]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "simhash": pa.array(signed, pa.int64()),
        })


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


# -------------------------------------------- exact n-gram verification

def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    """Exact word n-gram Jaccard — the verifier for candidate pairs."""
    def grams(t):
        toks = t.split()
        if len(toks) < n:
            return {" ".join(toks)} if toks else set()
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
    ga, gb = grams(text_a), grams(text_b)
    if not ga and not gb:
        return 1.0
    u = len(ga | gb)
    return len(ga & gb) / u if u else 0.0


def simhash_bands(batch: pa.Table, *, bands: int = 4) -> pa.Table:
    """Explode 64-bit simhashes into bit-band rows (band_id:band_value
    key). Pigeonhole guarantee: two hashes within Hamming distance
    bands-1 share at least one exact band — the standard bit-sampling
    LSH for Hamming space. Stateless function stage."""
    ids = batch.column("doc_id").to_pylist()
    hs = batch.column("simhash").to_numpy(zero_copy_only=False)
    width = 64 // bands
    mask = (1 << width) - 1
    out_key, out_id, out_h = [], [], []
    u = hs.astype(np.uint64)
    for b in range(bands):
        vals = (u >> np.uint64(b * width)) & np.uint64(mask)
        for i, v in zip(ids, vals):
            out_key.append((b << 16) ^ int(v))
            out_id.append(i)
    out_h = list(hs) * bands
    return pa.table({
        "band_key": pa.array(out_key, pa.int64()),
        "doc_id": pa.array(out_id),
        "simhash": pa.array(out_h, pa.int64()),
    })


def simhash_bucket_pairs(group: pa.Table, *, max_hamming: int = 3
                         ) -> pa.Table:
    """Within one simhash band bucket: pairwise Hamming; emit pairs
    (doc_a < doc_b, hamming <= max_hamming). Bucket size capped at 256
    (hot-bucket guard, same policy as MinHash buckets)."""
    ids = group.column("doc_id").to_pylist()
    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      "hamming": pa.array([], pa.int64())})
    if len(ids) < 2:
        return empty
    order = np.argsort(ids, kind="stable")[:256]
    hs = group.column("simhash").to_numpy(zero_copy_only=False)
    ids = [ids[i] for i in order]
    u = hs[order].astype(np.uint64)
    a_out, b_out, d_out = [], [], []
    for i in range(len(ids) - 1):
        x = u[i + 1:] ^ u[i]
        # vectorized popcount via uint8 view + unpackbits
        bits = np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1)
        dist = bits.sum(axis=1)
        for k in np.nonzero(dist <= max_hamming)[0]:
            a, b = ids[i], ids[i + 1 + k]
            if a == b:
                continue
            if a > b:
                a, b = b, a
            a_out.append(a)
            b_out.append(b)
            d_out.append(int(dist[k]))
    if not a_out:
        return empty
    return pa.table({"doc_a": pa.array(a_out, pa.int64()),
                     "doc_b": pa.array(b_out, pa.int64()),
                     "hamming": pa.array(d_out, pa.int64())})


def simhash_neardup_pairs(ds, *, max_hamming: int = 3, bands: int = 4,
                          concurrency=None):
    """SimHash near-dup pipeline over a documents Dataset:
    simhash → bit-band explode → groupby(band) → within-bucket Hamming
    → distinct (doc_a, doc_b, hamming). Exact for
    max_hamming <= bands-1 (pigeonhole); the only shuffle moves
    (band_key, doc_id, simhash) rows."""
    import functools
    from ..state.sizing import default_pool_size
    if concurrency is None:
        concurrency = default_pool_size()
    sh = ds.map_batches(SimHash, batch_format="pyarrow",
                        concurrency=concurrency)
    bandrows = sh.map_batches(
        functools.partial(simhash_bands, bands=bands),
        batch_format="pyarrow")
    pairs = bandrows.groupby("band_key").map_groups(
        functools.partial(simhash_bucket_pairs, max_hamming=max_hamming),
        batch_format="pyarrow")
    # output-sized candidate set → local distinct (see minhash_lsh_pairs)
    return pairs.repartition(1).map_batches(
        _dedupe_pairs_local, batch_format="pyarrow", batch_size=None)
