"""TileJSON 3.0 metadata carried as a sidecar dict.

Mirrors the reference's full TileJSON surface (versatiles_core/src/
types/tilejson/lib.rs, 901 LoC + vector_layer.rs):

- `merge` (lib.rs:323-364): bounds extended (union), center
  overwritten by other, minzoom/maxzoom min/max, other values
  overwrite, vector layers merged per-layer.
- vector-layer maintenance (vector_layer.rs): layers keyed by id in
  sorted order (BTreeMap parity), per-layer merge = fields overwrite,
  description overwrite, minzoom min / maxzoom max; spec `check`
  (alphanumeric ids/field names <= 255 chars, zooms <= 30, min<=max).
- limit checks: `limit_bbox` intersects (lib.rs:276-282),
  `set_min_zoom` raises / `set_max_zoom` lowers (lib.rs:293-322
  documented semantics).
- validation: `check_basics` / `check_raster` / `check_vector`
  (lib.rs:390-486) incl. the tilejson + version regex patterns.
- `update_from_reader_parameters` (lib.rs:365-388): tile format ->
  type -> schema inference, incl. the OpenMapTiles / Shortbread 1.0
  layer-id fingerprints (vector_layer.rs:111-164).
- the meta_update op (versatiles_pipeline/src/operations/general/
  meta_update.rs:31-84 — a driver-side metadata rewrite; tiles never
  move).

Layers are plain dicts (``{"id", "fields", "description", "minzoom",
"maxzoom"}``) so they serialize 1:1 with the spec's JSON.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from .bbox import TileBBoxPyramid
from .coords import tile_geo_bbox

MUTABLE_FIELDS = ("attribution", "description", "fillzoom", "name", "schema", "version")

_TILEJSON_VERSION_RE = re.compile(r"^[123]\.[012]\.[01]$")
_VERSION_RE = re.compile(r"^\d+\.\d+\.\d+$")

RASTER_FORMATS = ("png", "jpg", "jpeg", "webp", "avif", "rgba-raw")
VECTOR_FORMATS = ("mvt", "pbf")

# layer-id fingerprints for schema inference (vector_layer.rs:111-164)
_OPENMAPTILES_IDS = frozenset((
    "aerodrome_label", "aeroway", "boundary", "building", "housenumber",
    "landcover", "landuse", "mountain_peak", "park", "place", "poi",
    "transportation", "transportation_name", "water", "water_name", "waterway",
))
_SHORTBREAD_IDS = frozenset((
    "addresses", "aerialways", "boundaries", "boundary_labels", "bridges",
    "buildings", "dam_lines", "dam_polygons", "ferries", "land", "ocean",
    "pier_lines", "pier_polygons", "place_labels", "pois", "public_transport",
    "sites", "street_labels_points", "street_labels", "street_polygons",
    "streets_polygons_labels", "streets", "water_lines_labels", "water_lines",
    "water_polygons_labels", "water_polygons",
))


def _layer_ids(layers) -> set:
    return {l.get("id") for l in layers}


def vector_layers_schema(layers) -> str:
    """Infer the tile schema from layer ids (get_tile_schema)."""
    ids = _layer_ids(layers)
    if _OPENMAPTILES_IDS <= ids:
        return "vector-openmaptiles"
    if _SHORTBREAD_IDS <= ids:
        return "vector-shortbread-1.0"
    return "vector-other"


def merge_vector_layer(a: dict, b: dict) -> dict:
    """Per-layer merge (VectorLayer::merge, vector_layer.rs:336-365):
    fields from b overwrite, description overwritten if b has one,
    minzoom = min, maxzoom = max."""
    out = dict(a)
    fields = {**a.get("fields", {}), **b.get("fields", {})}
    if fields or "fields" in a or "fields" in b:
        out["fields"] = fields
    if b.get("description") is not None:
        out["description"] = b["description"]
    for key, pick in (("minzoom", min), ("maxzoom", max)):
        if b.get(key) is not None:
            out[key] = pick(a[key], b[key]) if a.get(key) is not None else b[key]
    return out


def merge_vector_layers(a, b) -> list:
    """VectorLayers::merge (vector_layer.rs:198-211): by-id merge,
    b's new layers inserted; output sorted by id (BTreeMap parity)."""
    by_id = {l.get("id"): dict(l) for l in a}
    for layer in b:
        lid = layer.get("id")
        by_id[lid] = merge_vector_layer(by_id[lid], layer) if lid in by_id else dict(layer)
    return [by_id[k] for k in sorted(by_id, key=str)]


def check_vector_layers(layers):
    """Spec checks (vector_layer.rs:173-196, 302-330): alphanumeric
    ids and field names (<= 255 chars), zooms <= 30, min <= max."""
    for layer in layers:
        lid = layer.get("id", "")
        if not lid:
            raise ValueError("Empty layer id")
        if len(lid) > 255:
            raise ValueError(f"Layer id too long: {lid!r}")
        if not all(c.isascii() and c.isalnum() for c in lid):
            raise ValueError(f"Invalid layer id {lid!r}: must be alphanumeric")
        for key in layer.get("fields", {}) or {}:
            if not key:
                raise ValueError("Empty field name")
            if len(key) > 255:
                raise ValueError(f"Field name too long: {key!r}")
            if not all(c.isascii() and c.isalnum() for c in key):
                raise ValueError(f"Invalid field name {key!r}: must be alphanumeric")
        mz, xz = layer.get("minzoom"), layer.get("maxzoom")
        if mz is not None and mz > 30:
            raise ValueError(f"minzoom too high: {mz}")
        if xz is not None:
            if xz > 30:
                raise ValueError(f"maxzoom too high: {xz}")
            if mz is not None and mz > xz:
                raise ValueError(f"minzoom must be <= maxzoom, found min={mz}, max={xz}")


@dataclass
class TileJSON:
    tilejson: str = "3.0.0"
    bounds: list | None = None
    center: list | None = None
    minzoom: int | None = None
    maxzoom: int | None = None
    vector_layers: list = field(default_factory=list)
    tile_format: str | None = None
    tile_schema: str | None = None
    extra: dict = field(default_factory=dict)

    # ---- pyramid / reader sync ----------------------------------------

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

    def update_from_reader_parameters(self, pyramid: TileBBoxPyramid, tile_format: str):
        """lib.rs:365-388: sync pyramid, set tile format, derive the
        tile type and (when absent/mismatched) infer the schema."""
        self.update_from_pyramid(pyramid)
        self.tile_format = tile_format
        ttype = self.tile_type
        schema_type = (self.tile_schema or "").split("-")[0] or None
        if ttype and schema_type != ttype:
            if ttype == "raster":
                self.tile_schema = "raster-rgb"
            elif ttype == "vector":
                self.tile_schema = vector_layers_schema(self.vector_layers)
            else:
                self.tile_schema = None
        return self

    @property
    def tile_type(self) -> str | None:
        if self.tile_format in RASTER_FORMATS:
            return "raster"
        if self.tile_format in VECTOR_FORMATS:
            return "vector"
        return None if self.tile_format is None else "unknown"

    # ---- limits --------------------------------------------------------

    def limit_bbox(self, bbox):
        """Intersect existing bounds with `bbox` [w,s,e,n], or set it
        (lib.rs:276-282)."""
        b = list(bbox)
        if self.bounds is None:
            self.bounds = b
        else:
            self.bounds = [
                max(self.bounds[0], b[0]), max(self.bounds[1], b[1]),
                min(self.bounds[2], b[2]), min(self.bounds[3], b[3]),
            ]
        return self

    def set_min_zoom(self, z: int):
        """Raise minzoom to z if lower or absent (lib.rs:284-295)."""
        self.minzoom = z if self.minzoom is None else max(self.minzoom, z)
        return self

    def set_max_zoom(self, z: int):
        """Lower maxzoom to z if higher or absent (lib.rs:297-309)."""
        self.maxzoom = z if self.maxzoom is None else min(self.maxzoom, z)
        return self

    # ---- ops -----------------------------------------------------------

    def meta_update(self, **fields):
        """Rewrite mutable TileJSON fields (meta_update op semantics);
        unknown fields are rejected like the reference's arg parsing."""
        for k, v in fields.items():
            if k not in MUTABLE_FIELDS:
                raise ValueError(f"meta_update: unknown field {k!r}")
            self.extra[k] = v
        return self

    def merge(self, other: "TileJSON") -> "TileJSON":
        """TileJSON::merge (lib.rs:323-364): bounds extended (union),
        center overwritten by other when present, minzoom min /
        maxzoom max, other's values overwrite, vector layers merged
        per-layer by id (sorted output — BTreeMap parity)."""
        out = TileJSON(tilejson=self.tilejson)
        if self.bounds and other.bounds:
            out.bounds = [
                min(self.bounds[0], other.bounds[0]),
                min(self.bounds[1], other.bounds[1]),
                max(self.bounds[2], other.bounds[2]),
                max(self.bounds[3], other.bounds[3]),
            ]
        else:
            out.bounds = self.bounds or other.bounds
        out.center = other.center if other.center is not None else self.center
        zmins = [z for z in (self.minzoom, other.minzoom) if z is not None]
        zmaxs = [z for z in (self.maxzoom, other.maxzoom) if z is not None]
        out.minzoom = min(zmins) if zmins else None
        out.maxzoom = max(zmaxs) if zmaxs else None
        out.vector_layers = merge_vector_layers(self.vector_layers, other.vector_layers)
        out.tile_format = other.tile_format or self.tile_format
        out.tile_schema = other.tile_schema or self.tile_schema
        out.extra = {**self.extra, **other.extra}  # other overwrites (rule 4)
        return out

    # ---- validation ----------------------------------------------------

    def check_basics(self):
        """TileJSON 3.0.0 basic field checks (lib.rs:390-456)."""
        if not _TILEJSON_VERSION_RE.match(self.tilejson or ""):
            raise ValueError("Invalid tilejson version")
        for key in ("tiles", "data", "grids"):
            v = self.extra.get(key)
            if v is not None and (
                not isinstance(v, list) or not all(isinstance(s, str) for s in v)
            ):
                raise ValueError(f"Invalid {key}: must be a list of strings")
        for key in ("attribution", "description", "legend", "name", "scheme", "template"):
            v = self.extra.get(key)
            if v is not None and not isinstance(v, str):
                raise ValueError(f"Invalid {key}: must be a string")
        fz = self.extra.get("fillzoom")
        if fz is not None and not (isinstance(fz, int) and 0 <= fz <= 255):
            raise ValueError("Invalid fillzoom: must be a byte")
        for key, v in (("minzoom", self.minzoom), ("maxzoom", self.maxzoom)):
            if v is not None and not (isinstance(v, int) and 0 <= v <= 255):
                raise ValueError(f"Invalid {key}: must be a byte")
        if self.bounds is not None:
            w, s, e, n = self.bounds
            if not (-180 <= w <= e <= 180 and -90 <= s <= n <= 90):
                raise ValueError(f"Invalid bounds {self.bounds}")
        if self.center is not None:
            lon, lat = self.center[0], self.center[1]
            if not (-180 <= lon <= 180 and -90 <= lat <= 90):
                raise ValueError(f"Invalid center {self.center}")
        ver = self.extra.get("version")
        if ver is not None and not _VERSION_RE.match(ver):
            raise ValueError("Invalid version number")
        return self

    def check_raster(self):
        """Raster tilesets must not carry vector_layers (lib.rs:458-470)."""
        self.check_basics()
        if self.vector_layers:
            raise ValueError("Raster tilesets must not have 'vector_layers'")
        return self

    def check_vector(self):
        """Vector tilesets need >= 1 valid vector_layer (lib.rs:472-486)."""
        self.check_basics()
        if not self.vector_layers:
            raise ValueError("Vector tilesets must have 'vector_layers'")
        check_vector_layers(self.vector_layers)
        return self

    # ---- (de)serialization ---------------------------------------------

    def to_json(self) -> str:
        doc = {"tilejson": self.tilejson, **self.extra}
        if self.bounds is not None:
            doc["bounds"] = self.bounds
        if self.center is not None:
            doc["center"] = self.center
        if self.minzoom is not None:
            doc["minzoom"] = self.minzoom
        if self.maxzoom is not None:
            doc["maxzoom"] = self.maxzoom
        if self.vector_layers:
            doc["vector_layers"] = self.vector_layers
        if self.tile_format is not None:
            doc["tile_format"] = self.tile_format
        if self.tile_schema is not None:
            doc["tile_schema"] = self.tile_schema
        return json.dumps(doc, sort_keys=True)

    @classmethod
    def from_json(cls, text: str) -> "TileJSON":
        doc = json.loads(text)
        out = cls(
            tilejson=doc.pop("tilejson", "3.0.0"),
            bounds=doc.pop("bounds", None),
            center=doc.pop("center", None),
            minzoom=doc.pop("minzoom", None),
            maxzoom=doc.pop("maxzoom", None),
            vector_layers=doc.pop("vector_layers", []),
            tile_format=doc.pop("tile_format", None),
            tile_schema=doc.pop("tile_schema", None),
        )
        out.extra = doc
        return out

    @classmethod
    def try_from_text_or_default(cls, text) -> "TileJSON":
        """Parse or fall back to default (lib.rs:498-505)."""
        try:
            return cls.from_json(text)
        except (ValueError, TypeError):
            return cls()
