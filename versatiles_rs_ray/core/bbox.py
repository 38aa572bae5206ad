"""Tile bounding boxes and bbox pyramids (the predicate-pushdown structure).

Replicates the semantics of the reference's `TileBBox`
(versatiles_core/src/types/tile_bbox/constructors.rs:64-140, inclusive
max coordinates, y-down) and `TileBBoxPyramid`
(versatiles_core/src/types/tile_bbox_pyramid.rs:19-250).

A pyramid here is also the partition manifest for pipelines: the set of
`(z, x_min, y_min, x_max, y_max)` rows every stage intersects its work
with before reading anything — the Ray-side analogue of the
reference's pushdown (`bbox.intersect_with_pyramid`, filter.rs:89-96).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .coords import MAX_LEVEL, MERCATOR_LAT_MAX, lonlat_to_tile

_EPS = 1e-10  # corner shrink used by TileBBox::from_geo (constructors.rs:262-263)


@dataclass(frozen=True)
class TileBBox:
    """Inclusive rectangular tile range at one zoom level.

    Empty iff ``width == 0 or height == 0`` (mirrors constructors.rs:64-76).
    """

    level: int
    x_min: int = 0
    y_min: int = 0
    width: int = 0
    height: int = 0

    def __post_init__(self):
        if not 0 <= self.level <= MAX_LEVEL:
            raise ValueError(f"level ({self.level}) must be <= {MAX_LEVEL}")
        size = 1 << self.level
        if self.width and (self.x_min + self.width > size or self.y_min + self.height > size):
            raise ValueError(f"bbox exceeds level {self.level} bounds")

    # -- constructors -------------------------------------------------
    @classmethod
    def from_min_and_max(cls, level, x_min, y_min, x_max, y_max):
        return cls(level, x_min, y_min, x_max - x_min + 1, y_max - y_min + 1)

    @classmethod
    def new_full(cls, level):
        size = 1 << level
        return cls(level, 0, 0, size, size)

    @classmethod
    def new_empty(cls, level):
        return cls(level, 0, 0, 0, 0)

    @classmethod
    def from_geo(cls, level, west, south, east, north):
        """Tile range covering a WGS84 bbox, epsilon-shrunk corners.

        Mirrors ``TileBBox::from_geo`` (constructors.rs:258-266):
        min corner from (west+eps, north-eps), max from (east-eps, south+eps).
        """
        x0, y0 = lonlat_to_tile(west + _EPS, min(north - _EPS, 90.0), level)
        x1, y1 = lonlat_to_tile(east - _EPS, max(south + _EPS, -90.0), level)
        return cls.from_min_and_max(level, int(x0), int(y0), int(x1), int(y1))

    # -- queries ------------------------------------------------------
    @property
    def is_empty(self):
        return self.width == 0 or self.height == 0

    @property
    def x_max(self):
        return self.x_min + self.width - 1

    @property
    def y_max(self):
        return self.y_min + self.height - 1

    @property
    def count(self):
        return self.width * self.height

    def contains(self, x, y):
        """Vectorized membership test (tile_bbox/queries.rs:32-41 semantics)."""
        if self.is_empty:
            return np.zeros(np.broadcast(x, y).shape, dtype=bool)
        x = np.asarray(x)
        y = np.asarray(y)
        return (x >= self.x_min) & (x <= self.x_max) & (y >= self.y_min) & (y <= self.y_max)

    # -- mutation (returning new values) -------------------------------
    def intersect(self, other: "TileBBox") -> "TileBBox":
        assert self.level == other.level
        if self.is_empty or other.is_empty:
            return TileBBox.new_empty(self.level)
        x0 = max(self.x_min, other.x_min)
        y0 = max(self.y_min, other.y_min)
        x1 = min(self.x_max, other.x_max)
        y1 = min(self.y_max, other.y_max)
        if x1 < x0 or y1 < y0:
            return TileBBox.new_empty(self.level)
        return TileBBox.from_min_and_max(self.level, x0, y0, x1, y1)

    def expand_by(self, x_min: int, y_min: int, x_max: int, y_max: int) -> "TileBBox":
        """Shift the box outward by per-edge offsets, clamped to level
        bounds; empty boxes stay empty (tile_bbox/mutate.rs:102-114)."""
        if self.is_empty:
            return self
        top = (1 << self.level) - 1
        return TileBBox.from_min_and_max(
            self.level,
            max(self.x_min - x_min, 0),
            max(self.y_min - y_min, 0),
            min(self.x_max + x_max, top),
            min(self.y_max + y_max, top),
        )

    def include(self, other: "TileBBox") -> "TileBBox":
        assert self.level == other.level
        if self.is_empty:
            return other
        if other.is_empty:
            return self
        return TileBBox.from_min_and_max(
            self.level,
            min(self.x_min, other.x_min),
            min(self.y_min, other.y_min),
            max(self.x_max, other.x_max),
            max(self.y_max, other.y_max),
        )

    def include_coord(self, x, y) -> "TileBBox":
        return self.include(TileBBox.from_min_and_max(self.level, x, y, x, y))

    def flip_y(self) -> "TileBBox":
        """XYZ<->TMS flip of the whole box (tile_bbox/mutate.rs:395)."""
        if self.is_empty:
            return self
        size = 1 << self.level
        return TileBBox(self.level, self.x_min, size - self.y_min - self.height, self.width, self.height)

    def swap_xy(self) -> "TileBBox":
        return TileBBox(self.level, self.y_min, self.x_min, self.height, self.width)

    def scale_down(self, levels=1) -> "TileBBox":
        """Parent bbox `levels` zooms up (mutate.rs:270/level_down:331)."""
        if self.is_empty:
            return TileBBox.new_empty(self.level - levels)
        return TileBBox.from_min_and_max(
            self.level - levels,
            self.x_min >> levels,
            self.y_min >> levels,
            self.x_max >> levels,
            self.y_max >> levels,
        )

    def iter_grid(self, size):
        """Split into <=size x size sub-bboxes, row-major.

        The reference's partitioning primitive (tile_bbox/iter.rs:63-90).
        """
        if self.is_empty:
            return
        x_start = (self.x_min // size) * size
        y_start = (self.y_min // size) * size
        for y0 in range(y_start, self.y_max + 1, size):
            for x0 in range(x_start, self.x_max + 1, size):
                sub = self.intersect(
                    TileBBox.from_min_and_max(
                        self.level,
                        max(x0, self.x_min),
                        max(y0, self.y_min),
                        min(x0 + size - 1, self.x_max),
                        min(y0 + size - 1, self.y_max),
                    )
                )
                if not sub.is_empty:
                    yield sub

    def coords(self):
        """All (x, y) in row-major order as int64 arrays (iter.rs:17-40)."""
        if self.is_empty:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        xs = np.arange(self.x_min, self.x_max + 1, dtype=np.int64)
        ys = np.arange(self.y_min, self.y_max + 1, dtype=np.int64)
        gx, gy = np.meshgrid(xs, ys)
        return gx.ravel(), gy.ravel()


class TileBBoxPyramid:
    """One TileBBox per zoom level 0..=31 (tile_bbox_pyramid.rs:19-25)."""

    def __init__(self, levels=None):
        self.level_bbox = {z: TileBBox.new_empty(z) for z in range(MAX_LEVEL + 1)}
        if levels:
            for bb in levels:
                self.level_bbox[bb.level] = bb

    @classmethod
    def new_full(cls, max_level, min_level=0):
        p = cls()
        for z in range(min_level, max_level + 1):
            p.level_bbox[z] = TileBBox.new_full(z)
        return p

    @classmethod
    def from_geo_bbox(cls, west, south, east, north, min_level=0, max_level=MAX_LEVEL):
        """Per-level bbox from a WGS84 bbox (tile_bbox_pyramid.rs:87-93)."""
        p = cls()
        for z in range(min_level, max_level + 1):
            p.level_bbox[z] = TileBBox.from_geo(z, west, south, east, north)
        return p

    # -- queries ------------------------------------------------------
    def get(self, level) -> TileBBox:
        return self.level_bbox[level]

    @property
    def is_empty(self):
        return all(b.is_empty for b in self.level_bbox.values())

    @property
    def zoom_min(self):
        zs = [z for z, b in self.level_bbox.items() if not b.is_empty]
        return min(zs) if zs else None

    @property
    def zoom_max(self):
        zs = [z for z, b in self.level_bbox.items() if not b.is_empty]
        return max(zs) if zs else None

    @property
    def count(self):
        return sum(b.count for b in self.level_bbox.values())

    def contains_coord(self, z, x, y):
        """Vectorized membership over (z, x, y) arrays.

        Semantics of ``TileBBoxPyramid::contains_coord``
        (tile_bbox_pyramid.rs:171-177).
        """
        z = np.atleast_1d(np.asarray(z, dtype=np.int64))
        x = np.atleast_1d(np.asarray(x, dtype=np.int64))
        y = np.atleast_1d(np.asarray(y, dtype=np.int64))
        x, y, z = np.broadcast_arrays(x, y, z)
        out = np.zeros(z.shape, dtype=bool)
        for level in np.unique(z):
            bb = self.level_bbox.get(int(level))
            if bb is None or bb.is_empty:
                continue
            m = z == level
            out[m] = bb.contains(x[m], y[m])
        return out

    # -- mutation ------------------------------------------------------
    def intersect(self, other: "TileBBoxPyramid") -> "TileBBoxPyramid":
        p = TileBBoxPyramid()
        for z in range(MAX_LEVEL + 1):
            p.level_bbox[z] = self.level_bbox[z].intersect(other.level_bbox[z])
        return p

    def include_coord(self, z, x, y):
        self.level_bbox[z] = self.level_bbox[z].include_coord(x, y)

    def add_border(self, x_min: int, y_min: int, x_max: int, y_max: int):
        """Expand every level's box outward (tile_bbox_pyramid.rs:112-117;
        the `convert --bbox-border` surface)."""
        for z in range(MAX_LEVEL + 1):
            self.level_bbox[z] = self.level_bbox[z].expand_by(x_min, y_min, x_max, y_max)

    def set_level_min(self, level):
        """Drop levels below (tile_bbox_pyramid.rs:244-246)."""
        for z in range(level):
            self.level_bbox[z] = TileBBox.new_empty(z)

    def set_level_max(self, level):
        for z in range(level + 1, MAX_LEVEL + 1):
            self.level_bbox[z] = TileBBox.new_empty(z)

    def levels(self):
        return [b for b in self.level_bbox.values() if not b.is_empty]

    def to_rows(self):
        """(z, x_min, y_min, x_max, y_max) rows — serializable manifest form."""
        return [
            {"z": b.level, "x_min": b.x_min, "y_min": b.y_min, "x_max": b.x_max, "y_max": b.y_max}
            for b in self.levels()
        ]

    @classmethod
    def from_rows(cls, rows):
        return cls([TileBBox.from_min_and_max(r["z"], r["x_min"], r["y_min"], r["x_max"], r["y_max"]) for r in rows])

    def __repr__(self):
        return f"TileBBoxPyramid({self.to_rows()!r})"
