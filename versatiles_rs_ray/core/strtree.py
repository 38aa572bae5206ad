"""STR-packed R-tree (Sort-Tile-Recursive bulk load), from the
published algorithm (Leutenegger, Lopez & Edgington 1997) in pure
numpy — the candidate index behind the broadcast point-in-polygon /
rect joins (the reference uses the same structure for its geometry
joins; BASELINE.json's north star names "an STRtree-backed actor
pool"). Build once per actor in ``__init__``; batch queries are fully
vectorized level-by-level frontier expansions, so a million points
probe the tree with ~depth numpy passes and no per-point Python.

Reference analogue: versatiles' tile/bbox pyramid containment checks
(versatiles_core/src/types/tile_bbox_pyramid.rs) generalized to
arbitrary boxes.
"""

from __future__ import annotations

import numpy as np


class STRtree:
    """Static R-tree over N axis-aligned boxes, STR bulk-packed.

    boxes: (N, 4) float64 [x0, y0, x1, y1] (inclusive bounds).
    leaf_cap: max entries per node (leaves and internal alike).

    Levels are stored flat, root last: ``self.levels[l]`` is a dict of
    bounds (M_l, 4) and child ranges [start, end) into level l-1 (or
    into the item permutation for l == 0).
    """

    def __init__(self, boxes, leaf_cap: int = 16):
        b = np.asarray(boxes, dtype=np.float64)
        if b.ndim != 2 or b.shape[1] != 4:
            raise ValueError("boxes must be (N, 4) [x0, y0, x1, y1]")
        if leaf_cap < 2:
            raise ValueError("leaf_cap must be >= 2")
        self.n_items = len(b)
        self.leaf_cap = int(leaf_cap)
        self.item_boxes = b
        if self.n_items == 0:
            self.perm = np.empty(0, dtype=np.int64)
            self.levels = []
            return
        # ---- STR pack of the item level -------------------------------
        self.perm = self._str_order(b, leaf_cap)
        ordered = b[self.perm]
        self.levels = []
        child_bounds = ordered
        while True:
            m = len(child_bounds)
            n_nodes = (m + leaf_cap - 1) // leaf_cap
            starts = np.arange(n_nodes, dtype=np.int64) * leaf_cap
            ends = np.minimum(starts + leaf_cap, m)
            bounds = np.empty((n_nodes, 4), dtype=np.float64)
            # segmented min/max over contiguous child runs
            bounds[:, 0] = np.minimum.reduceat(child_bounds[:, 0], starts)
            bounds[:, 1] = np.minimum.reduceat(child_bounds[:, 1], starts)
            bounds[:, 2] = np.maximum.reduceat(child_bounds[:, 2], starts)
            bounds[:, 3] = np.maximum.reduceat(child_bounds[:, 3], starts)
            if n_nodes > 1:
                # upper levels re-pack the node MBRs by STR as well
                order = self._str_order(bounds, leaf_cap)
                bounds, starts, ends = bounds[order], starts[order], ends[order]
            # bounds as four contiguous 1-D arrays: level-walk gathers
            # are 1-D takes instead of 2-D fancy indexing (~3x faster)
            self.levels.append({
                "x0": np.ascontiguousarray(bounds[:, 0]),
                "y0": np.ascontiguousarray(bounds[:, 1]),
                "x1": np.ascontiguousarray(bounds[:, 2]),
                "y1": np.ascontiguousarray(bounds[:, 3]),
                "start": starts, "end": ends})
            if n_nodes == 1:
                break
            child_bounds = bounds

    @staticmethod
    def _str_order(boxes: np.ndarray, cap: int) -> np.ndarray:
        """STR ordering: slabs by center-x, center-y within a slab."""
        n = len(boxes)
        cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
        cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
        n_leaves = (n + cap - 1) // cap
        n_slabs = int(np.ceil(np.sqrt(n_leaves)))
        per_slab = n_slabs * cap  # items per vertical slab
        by_x = np.lexsort((cy, cx))  # stable, deterministic
        slab = np.arange(n, dtype=np.int64) // max(per_slab, 1)
        # within each slab, re-sort by cy (slab of by_x order)
        key_cy = cy[by_x]
        order = np.lexsort((by_x, key_cy, slab))
        return by_x[order]

    # ---- queries -------------------------------------------------------

    def _descend(self, test_nodes, q_idx_all):
        """Shared frontier walk. ``test_nodes(level_bounds, node_ids,
        q_ids) -> bool mask`` decides which (query, node) pairs
        survive at each level. Returns (q_idx, item_idx) pairs."""
        if not self.levels:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        top = len(self.levels) - 1
        q = q_idx_all
        nodes = np.zeros(len(q), dtype=np.int64)  # root is node 0
        keep = test_nodes(self.levels[top], nodes, q)
        q, nodes = q[keep], nodes[keep]
        for lvl in range(top, -1, -1):
            L = self.levels[lvl]
            starts, ends = L["start"][nodes], L["end"][nodes]
            counts = ends - starts
            if not counts.size or counts.sum() == 0:
                return (np.empty(0, dtype=np.int64),
                        np.empty(0, dtype=np.int64))
            q = np.repeat(q, counts)
            # children are contiguous: start + within-run arange
            offs = np.concatenate(([0], np.cumsum(counts)))[:-1]
            child = (np.repeat(starts, counts)
                     + np.arange(int(counts.sum()), dtype=np.int64)
                     - np.repeat(offs, counts))
            if lvl == 0:
                # children are item POSITIONS in perm order; map back to
                # original indices BEFORE the exact test (item boxes are
                # stored in original order)
                item_idx = self.perm[child]
                keep = test_nodes(None, item_idx, q)
                return q[keep], item_idx[keep]
            keep = test_nodes(self.levels[lvl - 1], child, q)
            q, nodes = q[keep], child[keep]
        raise AssertionError("unreachable")

    def query_points(self, px, py, item_boxes=None):
        """All (point_idx, item_idx) pairs where the item's box
        contains the point (inclusive bounds). ``item_boxes`` defaults
        to the build boxes (pass them to avoid re-permuting)."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        it = self.item_boxes if item_boxes is None else np.asarray(
            item_boxes, dtype=np.float64)
        items = {"x0": np.ascontiguousarray(it[:, 0]),
                 "y0": np.ascontiguousarray(it[:, 1]),
                 "x1": np.ascontiguousarray(it[:, 2]),
                 "y1": np.ascontiguousarray(it[:, 3])}

        def test(level, nodes, qi):
            b = items if level is None else level
            x, y = px[qi], py[qi]
            return ((x >= b["x0"][nodes]) & (x <= b["x1"][nodes])
                    & (y >= b["y0"][nodes]) & (y <= b["y1"][nodes]))

        return self._descend(test, np.arange(len(px), dtype=np.int64))

    def query_boxes(self, qboxes, item_boxes=None):
        """All (query_idx, item_idx) pairs whose boxes overlap
        (inclusive touch counts)."""
        qb = np.asarray(qboxes, dtype=np.float64).reshape(-1, 4)
        it = self.item_boxes if item_boxes is None else np.asarray(
            item_boxes, dtype=np.float64)
        items = {"x0": np.ascontiguousarray(it[:, 0]),
                 "y0": np.ascontiguousarray(it[:, 1]),
                 "x1": np.ascontiguousarray(it[:, 2]),
                 "y1": np.ascontiguousarray(it[:, 3])}
        qx0 = np.ascontiguousarray(qb[:, 0])
        qy0 = np.ascontiguousarray(qb[:, 1])
        qx1 = np.ascontiguousarray(qb[:, 2])
        qy1 = np.ascontiguousarray(qb[:, 3])

        def test(level, nodes, qi):
            b = items if level is None else level
            return ((qx0[qi] <= b["x1"][nodes]) & (qx1[qi] >= b["x0"][nodes])
                    & (qy0[qi] <= b["y1"][nodes]) & (qy1[qi] >= b["y0"][nodes]))

        return self._descend(test, np.arange(len(qb), dtype=np.int64))

