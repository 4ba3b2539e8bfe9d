"""Broadcast small-side lookups: ``ray.put`` once on the driver, read
(and deserialize) once per actor in ``__init__`` — never re-shipped
per batch and never a shuffle join (ray_guide: joins & lookups).

Usage::

    ref = broadcast(big_lookup_dict)
    class Stage:
        def __init__(self, lookup_ref):
            self.lookup = Broadcast.get(lookup_ref)   # once per actor
        def __call__(self, batch): ...
    ds.map_batches(Stage, fn_constructor_kwargs={"lookup_ref": ref},
                   concurrency=N)
"""

from __future__ import annotations

import ray


def broadcast(obj) -> "ray.ObjectRef":
    """Put a small-side object into the object store once."""
    return ray.put(obj)


class Broadcast:
    @staticmethod
    def get(ref):
        """Resolve a broadcast ref inside an actor (accepts plain
        objects too, so stages stay usable without Ray)."""
        if isinstance(ref, ray.ObjectRef):
            return ray.get(ref)
        return ref
