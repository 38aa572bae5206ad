"""TileJSON 3.0 metadata carried as a sidecar dict.

Mirrors the reference's TileJSON surface (versatiles_core/src/types/
tilejson/lib.rs): bounds/min-maxzoom/vector_layers, `merge` for
combining sources, `update_from_pyramid` to sync with the reader
parameters (update_from_reader_parameters), and the meta_update op
(versatiles_pipeline/src/operations/general/meta_update.rs:31-84 —
a driver-side metadata rewrite; tiles never move).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from .bbox import TileBBoxPyramid
from .coords import tile_geo_bbox

MUTABLE_FIELDS = ("attribution", "description", "fillzoom", "name", "schema", "version")


@dataclass
class TileJSON:
    tilejson: str = "3.0.0"
    bounds: list | None = None
    minzoom: int | None = None
    maxzoom: int | None = None
    vector_layers: list = field(default_factory=list)
    extra: dict = field(default_factory=dict)

    def update_from_pyramid(self, pyramid: TileBBoxPyramid):
        """Sync bounds + zoom range with a bbox pyramid."""
        if pyramid.is_empty:
            return self
        self.minzoom = pyramid.zoom_min
        self.maxzoom = pyramid.zoom_max
        bb = pyramid.get(pyramid.zoom_max)
        west, _, _, north = tile_geo_bbox(bb.level, bb.x_min, bb.y_min)
        _, south, east, _ = tile_geo_bbox(bb.level, bb.x_max, bb.y_max)
        self.bounds = [west, south, east, north]
        return self

    def meta_update(self, **fields):
        """Rewrite mutable TileJSON fields (meta_update op semantics);
        unknown fields are rejected like the reference's arg parsing."""
        for k, v in fields.items():
            if k not in MUTABLE_FIELDS:
                raise ValueError(f"meta_update: unknown field {k!r}")
            self.extra[k] = v
        return self

    def merge(self, other: "TileJSON") -> "TileJSON":
        """Combine two sources' metadata (TileJSON::merge): union of
        bounds, min/max of zooms, vector layers concatenated by name
        (first occurrence wins — deterministic, unlike HashMap order)."""
        out = TileJSON()
        if self.bounds and other.bounds:
            out.bounds = [
                min(self.bounds[0], other.bounds[0]),
                min(self.bounds[1], other.bounds[1]),
                max(self.bounds[2], other.bounds[2]),
                max(self.bounds[3], other.bounds[3]),
            ]
        else:
            out.bounds = self.bounds or other.bounds
        zmins = [z for z in (self.minzoom, other.minzoom) if z is not None]
        zmaxs = [z for z in (self.maxzoom, other.maxzoom) if z is not None]
        out.minzoom = min(zmins) if zmins else None
        out.maxzoom = max(zmaxs) if zmaxs else None
        seen = {}
        for layer in list(self.vector_layers) + list(other.vector_layers):
            seen.setdefault(layer.get("id"), layer)
        out.vector_layers = [seen[k] for k in sorted(seen, key=str)]
        out.extra = {**other.extra, **self.extra}
        return out

    def to_json(self) -> str:
        doc = {"tilejson": self.tilejson, **self.extra}
        if self.bounds is not None:
            doc["bounds"] = self.bounds
        if self.minzoom is not None:
            doc["minzoom"] = self.minzoom
        if self.maxzoom is not None:
            doc["maxzoom"] = self.maxzoom
        if self.vector_layers:
            doc["vector_layers"] = self.vector_layers
        return json.dumps(doc, sort_keys=True)

    @classmethod
    def from_json(cls, text: str) -> "TileJSON":
        doc = json.loads(text)
        out = cls(
            tilejson=doc.pop("tilejson", "3.0.0"),
            bounds=doc.pop("bounds", None),
            minzoom=doc.pop("minzoom", None),
            maxzoom=doc.pop("maxzoom", None),
            vector_layers=doc.pop("vector_layers", []),
        )
        out.extra = doc
        return out
