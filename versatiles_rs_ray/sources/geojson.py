"""GeoJSON / NDJSON features and the CSV property-side loader.

Covers the reference's geometry I/O surface:
- NDJSON feature streams (versatiles_geometry/src/geojson/read.rs:21-68
  parallel line parsing) -> `read_ndjson_features` over ray read_text;
- GeoJSON FeatureCollection parse/stringify;
- CSV -> property map (versatiles_pipeline/src/helpers/csv.rs:16-45,
  the cities.csv fixture loader feeding vector_update_properties);
- feature -> MVT-tile conversion (point features quantized into the
  tile-local extent grid, the geojson->vector-tile path).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from ..core import mvt
from ..core.coords import lonlat_to_tile, mercator_fraction


def load_csv_side(path: str, key_col: str) -> dict:
    """CSV -> {key: {col: value}} for broadcast property joins.

    The engine-side analogue of the reference's CSV property loader;
    values keep their parsed types (pyarrow csv inference).
    """
    from pyarrow import csv as pa_csv

    table = pa_csv.read_csv(path)
    keys = table[key_col].to_pylist()
    out = {}
    for i, k in enumerate(keys):
        out[k] = {
            name: table[name][i].as_py()
            for name in table.column_names
            if name != key_col
        }
    return out


def parse_feature(doc: dict):
    """GeoJSON Feature -> flat record (id, geom type, lon, lat, properties).

    Point-centric: non-point geometries carry their first coordinate as
    the anchor (sufficient for the doc-style point pipelines; full
    geometry fidelity lives in the MVT layer representation).
    """
    geom = doc.get("geometry") or {}
    gtype = geom.get("type", "")
    coords = geom.get("coordinates")
    lon = lat = None
    if gtype == "Point":
        lon, lat = coords[0], coords[1]
    elif coords:
        c = coords
        while isinstance(c[0], (list, tuple)):
            c = c[0]
        lon, lat = c[0], c[1]
    return {
        "feature_id": doc.get("id"),
        "geom_type": gtype,
        "lon": lon,
        "lat": lat,
        "properties": json.dumps(doc.get("properties") or {}, sort_keys=True),
    }


def read_ndjson_features(path: str):
    """NDJSON (one GeoJSON feature per line) -> Dataset of flat records."""
    import ray.data as rd

    def parse(batch) -> pa.Table:
        rows = [parse_feature(json.loads(line)) for line in batch["text"] if line.strip()]
        return pa.table(
            {
                "feature_id": pa.array([r["feature_id"] for r in rows]),
                "geom_type": pa.array([r["geom_type"] for r in rows], type=pa.string()),
                "lon": pa.array([r["lon"] for r in rows], type=pa.float64()),
                "lat": pa.array([r["lat"] for r in rows], type=pa.float64()),
                "properties": pa.array([r["properties"] for r in rows], type=pa.string()),
            }
        )

    return rd.read_text(path).map_batches(parse, batch_format="numpy")


def features_to_geojson(records) -> str:
    """Flat records -> GeoJSON FeatureCollection string (stringify path)."""
    features = []
    for r in records:
        features.append(
            {
                "type": "Feature",
                **({"id": r["feature_id"]} if r.get("feature_id") is not None else {}),
                "geometry": {"type": "Point", "coordinates": [r["lon"], r["lat"]]},
                "properties": json.loads(r["properties"]) if isinstance(r.get("properties"), str) else r.get("properties", {}),
            }
        )
    return json.dumps({"type": "FeatureCollection", "features": features}, sort_keys=True)


def features_to_mvt_tiles(features_ds, zoom: int, layer_name="features", extent=4096,
                          num_partitions: int = 8):
    """Point features -> MVT tiles at one zoom (geojson -> vector tiles)."""
    from ..stages.exchange import hash_exchange
    from ..stages.assign import pack_tkey, unpack_tkey

    def add_key(batch: pa.Table) -> pa.Table:
        lon = np.asarray(batch["lon"], dtype=np.float64)
        lat = np.asarray(batch["lat"], dtype=np.float64)
        x, y = lonlat_to_tile(lon, lat, zoom)
        tkey = pack_tkey(np.full(len(x), zoom, dtype=np.int64), x, y)
        mx, my = mercator_fraction(lon, lat)
        n = np.float64(1 << zoom)
        px = np.clip(((mx * n) % 1.0) * extent, 0, extent - 1).astype(np.int64)
        py = np.clip(((my * n) % 1.0) * extent, 0, extent - 1).astype(np.int64)
        return pa.table(
            {
                "tkey": pa.array(tkey, type=pa.int64()),
                "properties": batch["properties"],
                "px": pa.array(px, type=pa.int64()),
                "py": pa.array(py, type=pa.int64()),
            }
        )

    def combine(table: pa.Table) -> pa.Table:
        tkey = np.asarray(table["tkey"], dtype=np.int64)
        order = np.argsort(tkey, kind="stable")
        props = table["properties"].to_pylist()
        px = np.asarray(table["px"], dtype=np.int64)
        py = np.asarray(table["py"], dtype=np.int64)
        zs, xs, ys, ps = [], [], [], []
        i = 0
        while i < len(order):
            j = i
            feats = []
            while j < len(order) and tkey[order[j]] == tkey[order[i]]:
                idx = order[j]
                feats.append(
                    {
                        "type": mvt.GEOM_POINT,
                        "properties": json.loads(props[idx]),
                        "geometry": [[(int(px[idx]), int(py[idx]))]],
                    }
                )
                j += 1
            z, x, y = unpack_tkey(tkey[order[i]])
            zs.append(int(z))
            xs.append(int(x))
            ys.append(int(y))
            ps.append(
                mvt.encode_tile(
                    {"layers": [{"name": layer_name, "version": 2, "extent": extent,
                                 "features": feats}]}
                )
            )
            i = j
        return pa.table(
            {
                "z": pa.array(zs, type=pa.int64()),
                "x": pa.array(xs, type=pa.int64()),
                "y": pa.array(ys, type=pa.int64()),
                "payload": pa.array(ps, type=pa.binary()),
            }
        )

    keyed = features_ds.map_batches(add_key, batch_format="pyarrow")
    return hash_exchange(keyed, "tkey", combine, num_partitions=num_partitions)
