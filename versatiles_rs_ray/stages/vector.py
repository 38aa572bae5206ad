"""Vector-tile (MVT) operators over (z, x, y, payload) tables.

Reference semantics, exactly:
- vector_filter_layers: retain layer iff ``(name in set) == invert``
  (vector_filter_layers.rs:46) — default drops listed layers;
- vector_filter_properties: retain property iff
  ``regex.match(f"{layer}/{key}") == invert``
  (vector_filter_properties.rs:50-55) — default drops matches;
- vector_update_properties: broadcast id->properties map merged into
  matching features, optional replace / remove_non_matching semi-join
  (vector_update_properties.rs:99-136);
- merge_vector_tiles: n-ary co-group on the tile key concatenating
  same-named layers (from_merged_vector.rs:57-69), layer order sorted
  by name (deterministic where the reference's HashMap is not).

All stages are callable classes (regex / lookup built once per actor,
SURVEY.md §7.2) operating on encoded payloads; MVT decode/encode stays
inside the worker.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..core import mvt
from ..core.coords import mercator_fraction


def _map_tiles(batch: pa.Table, fn, raw_geometry: bool = False) -> pa.Table:
    # raw_geometry=True: features carry verbatim geometry bytes (no
    # command decode/re-encode) — correct for property-only transforms
    # and ~3x cheaper each way (mvt.decode_tile docstring)
    payloads = batch["payload"].to_pylist()
    out = []
    keep = []
    for p in payloads:
        tile = fn(mvt.decode_tile(p, raw_geometry=raw_geometry))
        if tile is None:
            keep.append(False)
            out.append(None)
        else:
            keep.append(True)
            out.append(mvt.encode_tile(tile))
    idx = batch.schema.get_field_index("payload")
    batch = batch.set_column(idx, "payload", pa.array(out, type=pa.binary()))
    return batch.filter(pa.array(keep))


class VectorFilterLayers:
    def __init__(self, names, invert=False):
        self.names = frozenset(names)
        self.invert = invert

    def __call__(self, batch: pa.Table) -> pa.Table:
        # layer-level field surgery, no feature decode (mvt.
        # filter_layers_raw) — the decode->encode round trip this
        # replaces was the round-3 tile-transform hot spot
        out = [mvt.filter_layers_raw(p, self.names, self.invert)
               for p in batch["payload"].to_pylist()]
        idx = batch.schema.get_field_index("payload")
        return batch.set_column(idx, "payload", pa.array(out, type=pa.binary()))


class VectorFilterProperties:
    def __init__(self, pattern, invert=False):
        self.pattern = pattern
        self.invert = invert
        self._regex = None  # compiled lazily once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._regex is None:
            self._regex = re.compile(self.pattern)
        # wire-level tag rewrite (mvt.filter_properties_raw): geometry,
        # ids and value bytes are copied verbatim — no feature decode.
        # The keep decision is per (layer, key), identical to the old
        # per-feature dict filter since the predicate only sees
        # f"{layer}/{key}".
        out = [mvt.filter_properties_raw(p, self._regex.search, self.invert)
               for p in batch["payload"].to_pylist()]
        idx = batch.schema.get_field_index("payload")
        return batch.set_column(idx, "payload", pa.array(out, type=pa.binary()))


class VectorUpdateProperties:
    """Broadcast property join into features (vector_update_properties).

    side: {id_value: {key: value}}; id_field: feature property to match
    on. layer_name (when given) restricts the update to that layer,
    like the reference's `tile.find_layer_mut(layer_name)`
    (vector_update_properties.rs:100-104). replace_properties drops
    existing props of matched features; remove_non_matching drops
    unmatched features (semi-join).

    Partitioning assumption: the side table is broadcast once per
    actor (ray.put ref in fn_constructor_kwargs), matching the
    reference's CSV-file sides — it must fit a worker's heap. A side
    that outgrows memory needs the co-partitioned route instead:
    explode tiles to (tile_key, id) rows, `stages/join.hash_join`
    against the side on id, regroup by tile_key — three exchanges,
    so broadcast stays the default for the reference's actual shape.
    """

    def __init__(self, side, id_field, replace_properties=False,
                 remove_non_matching=False, layer_name=None):
        import ray

        self.side = ray.get(side) if not isinstance(side, dict) else side
        self.id_field = id_field
        self.layer_name = layer_name
        self.replace = replace_properties
        self.remove_non_matching = remove_non_matching

    def __call__(self, batch: pa.Table) -> pa.Table:
        def fn(tile):
            for layer in tile["layers"]:
                if self.layer_name is not None and layer.get("name") != self.layer_name:
                    continue
                kept = []
                for feat in layer["features"]:
                    key = feat["properties"].get(self.id_field)
                    attrs = self.side.get(key)
                    if attrs is None:
                        if not self.remove_non_matching:
                            kept.append(feat)
                        continue
                    if self.replace:
                        feat["properties"] = {self.id_field: key, **attrs}
                    else:
                        feat["properties"] = {**feat["properties"], **attrs}
                    kept.append(feat)
                layer["features"] = kept
            return tile

        return _map_tiles(batch, fn, raw_geometry=True)


def merge_vector_tiles(ds, num_partitions: int = 8):
    """Co-group on (z, x, y): concatenate same-named layers per tile.

    Input: union of N sources' (z, x, y, payload) rows. Uses the hash
    exchange on the packed tile key; the combiner decodes each group's
    tiles and merges them (mvt.merge_tiles).
    """
    from .assign import pack_tkey, unpack_tkey
    from .exchange import hash_exchange

    def add_key(batch: pa.Table) -> pa.Table:
        tkey = pack_tkey(
            np.asarray(batch["z"], dtype=np.int64),
            np.asarray(batch["x"], dtype=np.int64),
            np.asarray(batch["y"], dtype=np.int64),
        )
        return batch.append_column("tkey", pa.array(tkey, type=pa.int64()))

    def combine(table: pa.Table) -> pa.Table:
        tkey = np.asarray(table["tkey"], dtype=np.int64)
        payloads = table["payload"].to_pylist()
        order = np.argsort(tkey, kind="stable")
        zs, xs, ys, ps = [], [], [], []
        i = 0
        while i < len(order):
            j = i
            tiles = []
            while j < len(order) and tkey[order[j]] == tkey[order[i]]:
                # merge concatenates features; geometry passes through raw
                tiles.append(mvt.decode_tile(payloads[order[j]],
                                             raw_geometry=True))
                j += 1
            z, x, y = unpack_tkey(tkey[order[i]])
            zs.append(int(z))
            xs.append(int(x))
            ys.append(int(y))
            ps.append(mvt.encode_tile(mvt.merge_tiles(tiles)))
            i = j
        return pa.table(
            {
                "z": pa.array(zs, type=pa.int64()),
                "x": pa.array(xs, type=pa.int64()),
                "y": pa.array(ys, type=pa.int64()),
                "payload": pa.array(ps, type=pa.binary()),
            }
        )

    keyed = ds.map_batches(add_key, batch_format="pyarrow")
    return hash_exchange(keyed, "tkey", combine, num_partitions=num_partitions)


def docs_to_mvt_tiles(docs_with_tiles, zoom: int, extent: int = 4096, layer_name="docs",
                      num_partitions: int = 8):
    """Materialize docs as MVT point tiles: one feature per doc, point
    quantized to the tile-local extent grid, properties carrying
    doc_id/source/span count. The doc->vector-tile encode path of the
    flagship engine (tile payload = real MVT bytes).
    """
    from .assign import pack_tkey, unpack_tkey
    from .exchange import hash_exchange

    def add_key(batch: pa.Table) -> pa.Table:
        tkey = pack_tkey(
            np.asarray(batch["z"], dtype=np.int64),
            np.asarray(batch["x"], dtype=np.int64),
            np.asarray(batch["y"], dtype=np.int64),
        )
        mx, my = mercator_fraction(
            np.asarray(batch["lon"], dtype=np.float64),
            np.asarray(batch["lat"], dtype=np.float64),
        )
        n = np.float64(1 << zoom)
        px = np.clip(((mx * n) % 1.0) * extent, 0, extent - 1).astype(np.int64)
        py = np.clip(((my * n) % 1.0) * extent, 0, extent - 1).astype(np.int64)
        return pa.table(
            {
                "tkey": pa.array(tkey, type=pa.int64()),
                "doc_id": batch["doc_id"],
                "doc_num": batch["doc_num"],
                "source": batch["source"],
                "px": pa.array(px, type=pa.int64()),
                "py": pa.array(py, type=pa.int64()),
            }
        )

    def combine(table: pa.Table) -> pa.Table:
        tkey = np.asarray(table["tkey"], dtype=np.int64)
        doc_num = np.asarray(table["doc_num"], dtype=np.int64)
        order = np.lexsort((doc_num, tkey))
        doc_ids = table["doc_id"].to_pylist()
        sources = table["source"].to_pylist()
        px = np.asarray(table["px"], dtype=np.int64)
        py = np.asarray(table["py"], dtype=np.int64)
        zs, xs, ys, ps = [], [], [], []
        i = 0
        while i < len(order):
            j = i
            features = []
            while j < len(order) and tkey[order[j]] == tkey[order[i]]:
                idx = order[j]
                features.append(
                    {
                        "id": int(doc_num[idx]),
                        "type": mvt.GEOM_POINT,
                        "properties": {"doc_id": doc_ids[idx], "source": sources[idx]},
                        "geometry": [[(int(px[idx]), int(py[idx]))]],
                    }
                )
                j += 1
            z, x, y = unpack_tkey(tkey[order[i]])
            tile = {"layers": [{"name": layer_name, "version": 2, "extent": extent,
                                "features": features}]}
            zs.append(int(z))
            xs.append(int(x))
            ys.append(int(y))
            ps.append(mvt.encode_tile(tile))
            i = j
        return pa.table(
            {
                "z": pa.array(zs, type=pa.int64()),
                "x": pa.array(xs, type=pa.int64()),
                "y": pa.array(ys, type=pa.int64()),
                "payload": pa.array(ps, type=pa.binary()),
            }
        )

    keyed = docs_with_tiles.map_batches(add_key, batch_format="pyarrow")
    return hash_exchange(keyed, "tkey", combine, num_partitions=num_partitions)


class VectorSimplify:
    """Douglas-Peucker vertex reduction of vector-tile line/polygon
    geometry (core/simplify.py; tolerance in tile-local units, 4096 =
    one tile width). Lines keep their endpoints; rings anchor at their
    seam vertex and never collapse below 3 vertices. Points and
    foreign layers pass through untouched. Graft-new transform (the
    reference has no simplify op; tippecanoe/GDAL `simplify` shape)."""

    def __init__(self, tolerance: float):
        if tolerance < 0:
            raise ValueError("vector_simplify: tolerance must be >= 0")
        self.tol = float(tolerance)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..core.simplify import simplify_line, simplify_ring

        out = []
        for p in batch["payload"].to_pylist():
            tile = mvt.decode_tile(p)
            for layer in tile["layers"]:
                for feat in layer["features"]:
                    t = feat.get("type")
                    if t == mvt.GEOM_LINESTRING:
                        feat["geometry"] = [
                            [tuple(map(int, q)) for q in
                             simplify_line(np.asarray(part, dtype=np.float64),
                                           self.tol)]
                            for part in feat["geometry"]]
                    elif t == mvt.GEOM_POLYGON:
                        feat["geometry"] = [
                            [tuple(map(int, q)) for q in
                             simplify_ring(np.asarray(part, dtype=np.float64),
                                           self.tol)]
                            for part in feat["geometry"]]
            out.append(mvt.encode_tile(tile))
        idx = batch.schema.get_field_index("payload")
        return batch.set_column(idx, "payload", pa.array(out, type=pa.binary()))
