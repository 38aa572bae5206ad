"""MVT codec + vector operators: real-fixture round-trip and
reference-semantics checks."""

import numpy as np
import pyarrow as pa
import pytest

from versatiles_rs_ray.core import mvt

FIXTURE = "/root/reference/testdata/shortbread-tile.pbf"


def _norm(tile):
    return [
        (
            l["name"],
            l["extent"],
            [
                (f["id"], f["type"], sorted(f["properties"].items(), key=str), f["geometry"])
                for f in l["features"]
            ],
        )
        for l in tile["layers"]
    ]


def test_decode_real_shortbread_tile():
    tile = mvt.decode_tile(open(FIXTURE, "rb").read())
    names = [l["name"] for l in tile["layers"]]
    assert "streets" in names and "addresses" in names
    assert len(tile["layers"]) == 13
    streets = next(l for l in tile["layers"] if l["name"] == "streets")
    assert len(streets["features"]) == 4224
    assert all(l["extent"] == 4096 for l in tile["layers"])


def test_roundtrip_real_tile():
    tile = mvt.decode_tile(open(FIXTURE, "rb").read())
    again = mvt.decode_tile(mvt.encode_tile(tile))
    assert _norm(tile) == _norm(again)


def test_geometry_roundtrip():
    for gtype, parts in [
        (mvt.GEOM_POINT, [[(10, 20)]]),
        (mvt.GEOM_LINESTRING, [[(0, 0), (5, 3)], [(9, 9), (1, 1), (2, 8)]]),
        (mvt.GEOM_POLYGON, [[(0, 0), (10, 0), (10, 10), (0, 10)]]),
    ]:
        cmds = mvt.encode_geometry(parts, gtype)
        assert mvt.decode_geometry(cmds, gtype) == parts


def _sample_tile():
    return {
        "layers": [
            {
                "name": "roads",
                "version": 2,
                "extent": 4096,
                "features": [
                    {
                        "id": 1,
                        "type": mvt.GEOM_LINESTRING,
                        "properties": {"kind": "street", "name": "A", "lanes": 2},
                        "geometry": [[(0, 0), (100, 100)]],
                    }
                ],
            },
            {
                "name": "pois",
                "version": 2,
                "extent": 4096,
                "features": [
                    {
                        "id": 2,
                        "type": mvt.GEOM_POINT,
                        "properties": {"kind": "cafe", "name": "B"},
                        "geometry": [[(5, 5)]],
                    }
                ],
            },
        ]
    }


def _tiles_ds(ray_session, tiles):
    import ray.data as rd

    t = pa.table(
        {
            "z": pa.array([t_[0] for t_ in tiles], type=pa.int64()),
            "x": pa.array([t_[1] for t_ in tiles], type=pa.int64()),
            "y": pa.array([t_[2] for t_ in tiles], type=pa.int64()),
            "payload": pa.array([t_[3] for t_ in tiles], type=pa.binary()),
        }
    )
    return rd.from_arrow(t)


def test_vector_filter_layers(ray_session):
    from versatiles_rs_ray.stages.vector import VectorFilterLayers

    ds = _tiles_ds(ray_session, [(1, 0, 0, mvt.encode_tile(_sample_tile()))])
    # default: listed layers are DROPPED (vector_filter_layers.rs:46)
    out = ds.map_batches(VectorFilterLayers(["roads"]), batch_format="pyarrow").to_pandas()
    tile = mvt.decode_tile(out["payload"].iloc[0])
    assert [l["name"] for l in tile["layers"]] == ["pois"]
    # invert: keep only listed
    out = ds.map_batches(
        VectorFilterLayers(["roads"], invert=True), batch_format="pyarrow"
    ).to_pandas()
    tile = mvt.decode_tile(out["payload"].iloc[0])
    assert [l["name"] for l in tile["layers"]] == ["roads"]


def test_vector_filter_properties(ray_session):
    from versatiles_rs_ray.stages.vector import VectorFilterProperties

    ds = _tiles_ds(ray_session, [(1, 0, 0, mvt.encode_tile(_sample_tile()))])
    # default: matching "{layer}/{key}" DROPPED (vector_filter_properties.rs:50)
    out = ds.map_batches(
        VectorFilterProperties(r"roads/name"), batch_format="pyarrow"
    ).to_pandas()
    tile = mvt.decode_tile(out["payload"].iloc[0])
    roads = next(l for l in tile["layers"] if l["name"] == "roads")
    pois = next(l for l in tile["layers"] if l["name"] == "pois")
    assert sorted(roads["features"][0]["properties"]) == ["kind", "lanes"]
    assert sorted(pois["features"][0]["properties"]) == ["kind", "name"]


def test_vector_update_properties(ray_session):
    from versatiles_rs_ray.stages.vector import VectorUpdateProperties

    side = {"street": {"speed": 50}, "cafe": {"speed": 0}}
    ds = _tiles_ds(ray_session, [(1, 0, 0, mvt.encode_tile(_sample_tile()))])
    out = ds.map_batches(
        VectorUpdateProperties,
        batch_format="pyarrow",
        fn_constructor_kwargs={"side": side, "id_field": "kind"},
        concurrency=1,
    ).to_pandas()
    tile = mvt.decode_tile(out["payload"].iloc[0])
    assert tile["layers"][0]["features"][0]["properties"]["speed"] == 50


def test_merge_vector_tiles(ray_session):
    from versatiles_rs_ray.stages.vector import merge_vector_tiles

    t1 = {"layers": [_sample_tile()["layers"][0]]}  # roads
    t2 = {"layers": [_sample_tile()["layers"][1]]}  # pois
    ds = _tiles_ds(
        ray_session,
        [(1, 0, 0, mvt.encode_tile(t1)), (1, 0, 0, mvt.encode_tile(t2))],
    )
    out = merge_vector_tiles(ds, num_partitions=2).to_pandas()
    assert len(out) == 1
    tile = mvt.decode_tile(out["payload"].iloc[0])
    assert [l["name"] for l in tile["layers"]] == ["pois", "roads"]  # sorted


def test_docs_to_mvt(ray_session, sf_dir):
    from versatiles_rs_ray.sources.docs import read_docs
    from versatiles_rs_ray.stages.assign import assign_tiles
    from versatiles_rs_ray.stages.vector import docs_to_mvt_tiles

    docs = assign_tiles(read_docs(sf_dir), 3)
    out = docs_to_mvt_tiles(docs, 3, num_partitions=2).to_pandas()
    n_features = 0
    for _, row in out.iterrows():
        tile = mvt.decode_tile(row["payload"])
        assert [l["name"] for l in tile["layers"]] == ["docs"]
        for f in tile["layers"][0]["features"]:
            assert f["type"] == mvt.GEOM_POINT
            (px, py), = f["geometry"][0]
            assert 0 <= px < 4096 and 0 <= py < 4096
        n_features += len(tile["layers"][0]["features"])
    assert n_features == 500  # every doc lands in exactly one tile


def test_value_variant_preserved_on_reencode():
    """Decode->encode must preserve the wire Value variant: float32
    stays field 2 (not widened to double), int64 stays field 4, sint
    stays field 6 even when positive (reference keeps GeoValue
    variants distinct, versatiles_geometry/src/geo/value.rs:24-40)."""
    import struct

    from versatiles_rs_ray.core.mvt import (
        Float32,
        Int64,
        SInt64,
        _decode_value,
        _encode_value,
    )

    def raw(field, wire, payload):
        out = bytearray()
        out.append((field << 3) | wire)
        if wire == 0:
            v = payload
            while True:
                b = v & 0x7F
                v >>= 7
                if v:
                    out.append(b | 0x80)
                else:
                    out.append(b)
                    break
        else:
            out.extend(payload)
        return bytes(out)

    cases = [
        raw(2, 5, struct.pack("<f", 1.5)),            # float32
        raw(3, 1, struct.pack("<d", 2.25)),           # double
        raw(4, 0, 77),                                # int64 positive
        raw(4, 0, (1 << 64) - 5),                     # int64 negative (-5)
        raw(5, 0, 123),                               # uint64
        raw(6, 0, (44 << 1)),                         # sint64 positive (+44)
        raw(6, 0, (44 << 1) ^ ((-44) >> 63 & 1)),     # sint64
        raw(7, 0, 1),                                 # bool
    ]
    for buf in cases:
        v = _decode_value(buf)
        assert _encode_value(v) == buf, (buf, v, _encode_value(v))

    # variant classes still behave as their base types
    assert Float32(1.5) == 1.5 and Int64(7) == 7 and SInt64(-3) < 0
