"""Broadcast dimension lookup — the small-side join pattern.

The dimension table is ``ray.put`` ONCE on the driver; each actor
resolves the ref in ``__init__`` (one object-store read per actor,
zero-copy shared memory on the same node) and per batch does a
vectorized numpy take — no shuffle, nothing re-shipped per batch
(ray_guide: joins & lookups). This is the default join strategy for
dimension tables; ``Dataset.join`` (see __ray_entry__ spans_by_lang)
is the both-sides-large path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..state.broadcast import Broadcast


class BroadcastLookup:
    """map_batches actor: append ``out_col`` = dim[fk] per row.

    ``dim_ref``: broadcast dict {"keys": int64 ndarray (sorted),
    "values": list[str]}; unmatched keys get ``default``.
    """

    def __init__(self, dim_ref, fk_col: str, out_col: str,
                 default: str = ""):
        dim = Broadcast.get(dim_ref)            # once per actor
        self.keys = np.asarray(dim["keys"], dtype=np.int64)
        self.values = np.asarray(dim["values"], dtype=object)
        self.fk_col = fk_col
        self.out_col = out_col
        self.default = default

    def __call__(self, batch: pa.Table) -> pa.Table:
        fk = batch.column(self.fk_col).to_numpy(zero_copy_only=False)
        if not len(self.keys):
            # empty dimension table: every row misses → default (the
            # unguarded clip(idx, 0, -1) indexed an empty array)
            out = np.full(len(fk), self.default, dtype=object)
            return batch.append_column(
                self.out_col, pa.array(out.tolist(), pa.string()))
        idx = np.searchsorted(self.keys, fk)
        idx_clamped = np.clip(idx, 0, len(self.keys) - 1)
        hit = self.keys[idx_clamped] == fk
        out = np.where(hit, self.values[idx_clamped], self.default)
        return batch.append_column(self.out_col,
                                   pa.array(out.tolist(), pa.string()))


def broadcast_dim(table: pa.Table, key_col: str, val_col: str):
    """Driver-side: dimension table → sorted broadcast payload ref."""
    import ray
    keys = np.asarray(table.column(key_col).to_pylist(), dtype=np.int64)
    vals = np.asarray(table.column(val_col).to_pylist(), dtype=object)
    order = np.argsort(keys, kind="stable")
    return ray.put({"keys": keys[order], "values": vals[order]})


class BroadcastMembership:
    """map_batches actor: SEMI / ANTI join against a broadcast key
    set — keep rows whose ``fk_col`` is (semi) or is not (anti) in
    the dimension keys.  Same broadcast discipline as BroadcastLookup
    (one object-store read per actor, vectorized searchsorted per
    batch, no shuffle)."""

    def __init__(self, dim_ref, fk_col: str, mode: str = "semi"):
        if mode not in ("semi", "anti"):
            raise ValueError(f"mode must be 'semi' or 'anti': {mode}")
        dim = Broadcast.get(dim_ref)            # once per actor
        self.keys = np.asarray(dim["keys"], dtype=np.int64)
        self.fk_col = fk_col
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        fk = batch.column(self.fk_col).to_numpy(zero_copy_only=False)
        idx = np.clip(np.searchsorted(self.keys, fk), 0,
                      max(len(self.keys) - 1, 0))
        hit = (self.keys[idx] == fk) if len(self.keys) else \
            np.zeros(len(fk), dtype=bool)
        keep = hit if self.mode == "semi" else ~hit
        return batch.filter(pa.array(keep))


def broadcast_keys(table: pa.Table, key_col: str):
    """Driver-side: key column → sorted broadcast key-set ref (for
    BroadcastMembership)."""
    import ray
    keys = np.unique(np.asarray(table.column(key_col).to_pylist(),
                                dtype=np.int64))
    return ray.put({"keys": keys})
