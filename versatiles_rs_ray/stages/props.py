"""Broadcast property join (the vector_update_properties analogue).

The reference loads a CSV once into a HashMap and merges per-feature
properties during the stream, optionally dropping non-matching
features (semi-join)
(versatiles_pipeline/src/operations/vector/vector_update_properties.rs:51-136).
Here: the small side is broadcast via ``ray.put`` once; each batch
does a vectorized pandas-free lookup. No shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class BroadcastPropsJoin:
    """map_batches callable: join a broadcast attribute table.

    side: dict key -> {col: value} OR an object-store ref of one
    (resolved once per worker). replace=False merges (join columns are
    appended); remove_non_matching=True keeps only matching rows
    (semi-join, `remove_non_matching` semantics).
    """

    def __init__(self, side, key_col: str, remove_non_matching=False, prefix=""):
        import ray

        self.side = ray.get(side) if not isinstance(side, dict) else side
        self.key_col = key_col
        self.remove_non_matching = remove_non_matching
        self.prefix = prefix
        self.attr_cols = sorted({c for v in self.side.values() for c in v})

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch[self.key_col].to_pylist()
        hit = np.asarray([k in self.side for k in keys])
        if self.remove_non_matching:
            batch = batch.filter(pa.array(hit))
            keys = [k for k, h in zip(keys, hit) if h]
        for col in self.attr_cols:
            values = [self.side.get(k, {}).get(col) for k in keys]
            batch = batch.append_column(self.prefix + col, pa.array(values))
        return batch


def props_join(ds, side_dict, key_col, remove_non_matching=False, prefix=""):
    """Broadcast the small side once and join every batch against it."""
    import ray

    ref = ray.put(side_dict)
    return ds.map_batches(
        BroadcastPropsJoin,
        batch_format="pyarrow",
        fn_constructor_kwargs={
            "side": ref,
            "key_col": key_col,
            "remove_non_matching": remove_non_matching,
            "prefix": prefix,
        },
        concurrency=(1, 4),
    )
