"""Mergeable sketches — distributed approximate aggregates.

HyperLogLog distinct counting (Flajolet et al.'s public HLL algorithm
with the standard small-range linear-counting correction): each batch
emits ONE 2^p-byte register blob; blobs merge by elementwise max — the
canonical "emit one serialized sketch per batch, merge in a second,
tiny stage" shape (ray_guide: aggregation at scale). The merge moves
kilobytes regardless of corpus size.

The exact counterpart (``exact_distinct_tokens``) shuffles distinct
tokens — correct at any scale but exchange cost grows with vocabulary;
it is the verification oracle for the sketch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class HllSketch:
    """Dense HyperLogLog, p bits of bucket index (m = 2^p registers).

    Hash = blake2b-64 — process-stable AND uniform in every bit
    (CRC32 composition was measured to bias the leading-zero rank
    statistic by +24% at n=5k; cryptographic hashes don't).
    """

    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (registers if registers is not None
                          else np.zeros(self.m, dtype=np.uint8))

    @staticmethod
    def _hash64(items: list[str]) -> np.ndarray:
        from hashlib import blake2b
        out = np.empty(len(items), dtype=np.uint64)
        for i, s in enumerate(items):
            out[i] = int.from_bytes(
                blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")
        return out

    def add_batch(self, items: list[str]):
        if not items:
            return
        h = self._hash64(items)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of the remaining bits + 1
        ranks = np.zeros(len(h), dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        rest_work = rest.copy()
        rank = 1
        alive = np.ones(len(h), dtype=bool)
        while alive.any() and rank <= 64 - self.p + 1:
            top = (rest_work & mask) != 0
            newly = alive & top
            ranks[newly] = rank
            alive &= ~top
            rest_work = rest_work << np.uint64(1)
            rank += 1
        np.maximum.at(self.registers, idx, ranks)

    def merge(self, other: "HllSketch") -> "HllSketch":
        assert self.p == other.p
        return HllSketch(self.p, np.maximum(self.registers,
                                            other.registers))

    def estimate(self) -> float:
        m = self.m
        regs = self.registers.astype(np.float64)
        alpha = 0.7213 / (1 + 1.079 / m)
        e = alpha * m * m / np.sum(np.exp2(-regs))
        if e <= 2.5 * m:                        # small-range correction
            zeros = int((self.registers == 0).sum())
            if zeros:
                return m * np.log(m / zeros)
        return float(e)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, p: int, blob: bytes) -> "HllSketch":
        return cls(p, np.frombuffer(blob, dtype=np.uint8).copy())


def _batch_token_sketch(batch: pa.Table, *, p: int) -> pa.Table:
    sk = HllSketch(p)
    toks = set()
    for t in batch.column("text").to_pylist():
        toks.update(t.split())
    sk.add_batch(list(toks))
    return pa.table({"registers": pa.array([sk.to_bytes()], pa.binary())})


def _tree_merge_blobs(blobs, merge_batch, *, fanin: int = 64):
    """Tree-reduce a Dataset of one-blob rows down to a SINGLE blob row
    without ever landing the blob list anywhere central: each round
    repartitions the surviving blobs into groups of ≤ ``fanin`` and one
    map task merges each group into one blob.  log_fanin(num_blocks)
    rounds; every task (and eventually the driver) sees at most
    ``fanin`` blobs.  A flat driver-side fold would pull one blob per
    input block — ~130 GB of CMS blobs at 10^6 blocks — and merge them
    single-threaded; this exchanges kilobytes per task instead.

    ``merge_batch`` must be blob-table → one-row blob-table.  The blob
    dataset itself is materialized (one tiny row per input block) so
    the per-round ``count()`` does not re-run the upstream sketch pass.
    """
    import math
    blobs = blobs.materialize()
    n = blobs.count()
    while n > fanin:
        blobs = blobs.repartition(math.ceil(n / fanin)).map_batches(
            merge_batch, batch_format="pyarrow",
            batch_size=None).materialize()
        n = blobs.count()
    return blobs.repartition(1).map_batches(
        merge_batch, batch_format="pyarrow", batch_size=None)


def _merge_hll_blobs(batch: pa.Table, *, p: int) -> pa.Table:
    sk = HllSketch(p)
    for blob in batch.column("registers").to_pylist():
        sk = sk.merge(HllSketch.from_bytes(p, blob))
    return pa.table({"registers": pa.array([sk.to_bytes()], pa.binary())})


def _hll_estimate_row(batch: pa.Table, *, p: int) -> pa.Table:
    sk = HllSketch.from_bytes(p, batch.column("registers")[0].as_py())
    return pa.table({
        "n_distinct_tokens_est": pa.array([int(round(sk.estimate()))],
                                          pa.int64())})


def hll_distinct_tokens(ds, *, p: int = 12, fanin: int = 64):
    """Approximate distinct whitespace-token count over a documents
    Dataset → one row (n_distinct_tokens_est). One blob per batch,
    tree-merged inside the dataset (no O(num_blocks) blob list on any
    single task or the driver)."""
    import functools
    blobs = ds.map_batches(functools.partial(_batch_token_sketch, p=p),
                           batch_format="pyarrow")
    final = _tree_merge_blobs(
        blobs, functools.partial(_merge_hll_blobs, p=p), fanin=fanin)
    return final.map_batches(functools.partial(_hll_estimate_row, p=p),
                             batch_format="pyarrow")


def _batch_distinct_tokens(batch: pa.Table) -> pa.Table:
    toks = set()
    for t in batch.column("text").to_pylist():
        if t:                        # null/empty text contributes nothing
            toks.update(t.split())
    return pa.table({"tok": pa.array(sorted(toks), pa.string())})


def exact_distinct_tokens(ds):
    """Exact distinct token count → one row (n_distinct_tokens).
    Batch-local dedup first (the combiner), then a groupby shuffle of
    the surviving distinct tokens only."""
    toks = ds.map_batches(_batch_distinct_tokens, batch_format="pyarrow")
    # NOTE: aggregate(Count()) over a groupby().count() result collides
    # with its existing "count()" column in this Ray version (returns
    # 0) — Dataset.count() avoids the name clash.
    n = toks.groupby("tok").count().count()
    return pa.table({"n_distinct_tokens": pa.array([int(n)], pa.int64())})


class CountMinSketch:
    """Count-min sketch (Cormode & Muthukrishnan's public CM
    construction): d rows of w counters; add = increment one counter
    per row at h_i(x); estimate = min over rows (always ≥ truth).
    Mergeable by elementwise sum — the same one-blob-per-batch shape
    as the HLL sketch, so corpus-wide frequency estimates cost a
    kilobytes-sized exchange regardless of token count.

    Hashes: ONE blake2b call per item with an 8*d-byte digest, split
    into d independent 64-bit row-hashes (process-stable; see HllSketch
    for why not CRC).  One wide digest costs the same as one narrow one
    and replaces the previous d seeded calls per item — hashing is the
    hot path of the per-batch sketch build.
    """

    __slots__ = ("d", "w", "table")

    def __init__(self, d: int = 4, w: int = 1 << 12,
                 table: np.ndarray | None = None):
        if not 1 <= d <= 8:
            raise ValueError(f"d must be in [1, 8] (8*d-byte blake2b "
                             f"digest), got {d}")
        self.d = d
        self.w = w
        self.table = (table if table is not None
                      else np.zeros((d, w), dtype=np.int64))

    def _cols(self, items: list[str]) -> np.ndarray:
        from hashlib import blake2b
        d, size = self.d, 8 * self.d
        raw = bytearray(size * len(items))
        for j, it in enumerate(items):
            raw[j * size:(j + 1) * size] = blake2b(
                it.encode("utf-8"), digest_size=size).digest()
        h = np.frombuffer(bytes(raw), dtype=np.uint64).reshape(-1, d)
        return (h.T % np.uint64(self.w)).astype(np.int64)

    def add_many(self, items: list[str]):
        if not items:
            return
        cols = self._cols(items)
        for r in range(self.d):
            np.add.at(self.table[r], cols[r], 1)

    def estimate(self, item: str) -> int:
        cols = self._cols([item])
        return int(min(self.table[r, cols[r, 0]] for r in range(self.d)))

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (self.d, self.w) != (other.d, other.w):
            raise ValueError(
                f"cannot merge CMS({self.d},{self.w}) with "
                f"CMS({other.d},{other.w}) — numpy broadcasting would "
                "silently produce garbage counts")
        return CountMinSketch(self.d, self.w, self.table + other.table)

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes, d: int = 4, w: int = 1 << 12):
        return cls(d, w, np.frombuffer(raw, dtype=np.int64)
                   .reshape(d, w).copy())


def _cms_batch(batch: pa.Table, *, d: int, w: int) -> pa.Table:
    cms = CountMinSketch(d, w)
    for t in batch.column("text").to_pylist():
        if t:                        # null/empty text contributes nothing
            cms.add_many(t.split())
    return pa.table({"sketch": pa.array([cms.to_bytes()], pa.binary())})


def _merge_cms_blobs(batch: pa.Table, *, d: int, w: int) -> pa.Table:
    merged = CountMinSketch(d, w)
    for blob in batch.column("sketch").to_pylist():
        merged = merged.merge(CountMinSketch.from_bytes(blob, d, w))
    return pa.table({"sketch": pa.array([merged.to_bytes()], pa.binary())})


def cms_token_counts(ds, *, d: int = 4, w: int = 1 << 12,
                     probes: list[str] | None = None, fanin: int = 64):
    """documents Dataset → merged corpus-wide count-min sketch.
    Returns (sketch, estimates) where estimates maps each probe token
    to its estimated corpus frequency.  One d*w*8-byte blob per batch;
    blobs tree-merge inside the dataset and the driver receives exactly
    ONE final blob (a flat fold would pull ~130 GB at 10^6 blocks)."""
    import functools
    blobs = ds.map_batches(functools.partial(_cms_batch, d=d, w=w),
                           batch_format="pyarrow")
    rows = _tree_merge_blobs(
        blobs, functools.partial(_merge_cms_blobs, d=d, w=w),
        fanin=fanin).take_all()
    merged = (CountMinSketch.from_bytes(rows[0]["sketch"], d, w)
              if rows else CountMinSketch(d, w))
    est = {p: merged.estimate(p) for p in (probes or [])}
    return merged, est


class HistogramSketch:
    """Fixed-bin histogram sketch for quantile estimates over a
    KNOWN-range integer metric (doc lengths, token counts): per batch
    one (bins+2)-counter blob (underflow/overflow guards), elementwise
    sum merge — same one-blob-per-batch exchange shape as the
    HLL/count-min sketches.  Quantile error is bounded by the bin
    width; exact per-group order statistics live in the
    lang_percentiles query (groupby path)."""

    __slots__ = ("lo", "hi", "bins", "counts")

    def __init__(self, lo: int, hi: int, bins: int = 256,
                 counts: np.ndarray | None = None):
        if hi <= lo:
            # a degenerate range would make add_many divide by zero:
            # NaN bin indices cast to int64 silently land in the
            # underflow bin and quantiles come out wrong
            raise ValueError(
                f"HistogramSketch needs hi > lo, got [{lo}, {hi}]")
        self.lo = lo
        self.hi = hi
        self.bins = bins
        self.counts = (counts if counts is not None
                       else np.zeros(bins + 2, dtype=np.int64))

    def add_many(self, values: np.ndarray):
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]          # null metric values are SKIPPED,
        if not len(v):               # not counted in the underflow bin
            return                   # (NaN floors to INT64_MIN → bin 0)
        idx = np.floor((v - self.lo) / (self.hi - self.lo)
                       * self.bins).astype(np.int64) + 1
        idx = np.clip(idx, 0, self.bins + 1)
        np.add.at(self.counts, idx, 1)

    def merge(self, other: "HistogramSketch") -> "HistogramSketch":
        if (self.lo, self.hi, self.bins) != (other.lo, other.hi,
                                             other.bins):
            raise ValueError(
                "cannot merge histograms over different ranges: "
                f"[{self.lo},{self.hi})x{self.bins} vs "
                f"[{other.lo},{other.hi})x{other.bins}")
        return HistogramSketch(self.lo, self.hi, self.bins,
                               self.counts + other.counts)

    def quantile(self, q: float) -> float:
        """Estimate: left edge of the bin where the cumulative count
        crosses q (discrete-percentile flavor)."""
        total = int(self.counts.sum())
        if total == 0:
            return float(self.lo)
        target = max(1, int(np.ceil(q * total)))
        cum = np.cumsum(self.counts)
        b = int(np.searchsorted(cum, target))
        if b == 0:
            return float(self.lo)
        if b >= self.bins + 1:
            return float(self.hi)
        return self.lo + (b - 1) * (self.hi - self.lo) / self.bins

    def to_bytes(self) -> bytes:
        return self.counts.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes, lo: int, hi: int, bins: int = 256):
        return cls(lo, hi, bins,
                   np.frombuffer(raw, dtype=np.int64).copy())


def _hist_batch(batch: pa.Table, *, col: str, lo: int, hi: int,
                bins: int) -> pa.Table:
    h = HistogramSketch(lo, hi, bins)
    h.add_many(batch.column(col).to_numpy(zero_copy_only=False))
    return pa.table({"sketch": pa.array([h.to_bytes()], pa.binary())})


def _merge_hist_blobs(batch: pa.Table, *, lo: int, hi: int,
                      bins: int) -> pa.Table:
    merged = HistogramSketch(lo, hi, bins)
    for blob in batch.column("sketch").to_pylist():
        merged = merged.merge(
            HistogramSketch.from_bytes(blob, lo, hi, bins))
    return pa.table({"sketch": pa.array([merged.to_bytes()], pa.binary())})


def histogram_quantiles(ds, *, col: str, lo: int, hi: int,
                        bins: int = 256,
                        quantiles=(0.5, 0.9, 0.99),
                        fanin: int = 64) -> dict:
    """Dataset → approximate quantiles of ``col`` via histogram blobs
    (one per batch) tree-merged inside the dataset; the driver receives
    exactly ONE final blob."""
    import functools
    blobs = ds.map_batches(
        functools.partial(_hist_batch, col=col, lo=lo, hi=hi, bins=bins),
        batch_format="pyarrow")
    rows = _tree_merge_blobs(
        blobs, functools.partial(_merge_hist_blobs, lo=lo, hi=hi,
                                 bins=bins), fanin=fanin).take_all()
    merged = (HistogramSketch.from_bytes(rows[0]["sketch"], lo, hi, bins)
              if rows else HistogramSketch(lo, hi, bins))
    return {q: merged.quantile(q) for q in quantiles}
