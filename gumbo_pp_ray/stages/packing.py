"""Training-shard assembly — deterministic contiguous packing by a
weight budget (the "fill each training shard with ~N tokens" step).

``shard_id(doc) = exclusive_prefix_sum(weight) // budget`` over docs in
id order: shards are contiguous id ranges whose weight is ~budget
(never splitting a doc), reproducible across runs and partitionings —
the property a resumable training-data build needs.

The prefix sum is the one primitive here the Dataset API genuinely
cannot express (map stages see one block with no global position), so
this stage drops to raw Ray tasks over the SORTED dataset's blocks —
the classic two-pass distributed scan:

1. one tiny task per block computes its weight sum (num_blocks scalars
   to the driver — not rows);
2. the driver prefix-sums those block totals (O(num_blocks));
3. one task per block adds its exclusive offset and computes the
   in-block running sum vectorized.

Everything else stays Dataset (`sort`, and the result is returned as a
Dataset via ``from_arrow_refs``).  Exchange cost: the sort; the scan
itself moves only block-count scalars.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def assign_contiguous_shards(ds, *, budget: int,
                             weight_col: str = "n_chars",
                             id_col: str = "doc_id"):
    """Dataset(id, weight, ...) → same rows + ``shard_id``:
    ``exclusive_prefix_sum(weight) // budget`` in ``id_col`` order.
    Docs are never split; a shard's weight is < budget + max(weight)."""
    import ray
    import ray.data

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    # range-partitioned ordered blocks; to_arrow_refs preserves order
    refs = ds.sort(id_col).materialize().to_arrow_refs()

    @ray.remote
    def block_sum(t: pa.Table) -> int:
        if t.num_rows == 0:
            return 0
        return int(pa.compute.sum(t.column(weight_col)).as_py() or 0)

    @ray.remote
    def add_shard(t: pa.Table, offset: int) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("shard_id", pa.array([], pa.int64()))
        # nulls: pa.compute.sum (block_sum) skips them, so treat as
        # 0 here too — a NaN would astype to INT64_MIN and poison
        # every subsequent prefix in the block
        w = np.nan_to_num(
            t.column(weight_col).to_numpy(zero_copy_only=False)
            .astype(np.float64), nan=0.0).astype(np.int64)
        prefix = offset + np.concatenate([[0], np.cumsum(w)[:-1]])
        return t.append_column(
            "shard_id", pa.array(prefix // budget, pa.int64()))

    sums = ray.get([block_sum.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]]) if sums \
        else np.array([], dtype=np.int64)
    out = [add_shard.remote(r, int(o)) for r, o in zip(refs, offsets)]
    return ray.data.from_arrow_refs(out)
