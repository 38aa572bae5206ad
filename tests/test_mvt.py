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


# ---- round-4 fast paths: vectorized varints, raw-geometry passthrough,
# ---- wire-level layer/property filters ---------------------------------


def test_varint_codec_roundtrip_small_and_large():
    import random

    rng = random.Random(7)
    cases = [
        [],
        [0],
        [1, 127, 128, 300],
        [2**64 - 1, 2**63, 0, 2**35 + 17],  # canonical 10-byte varints
        [rng.randrange(2**rng.randrange(1, 64)) for _ in range(5000)],
    ]
    for vals in cases:
        buf = mvt.encode_varints(vals)
        # scalar reference encoding must be byte-identical
        ref = bytearray()
        for v in vals:
            mvt._write_varint(ref, int(v))
        assert buf == bytes(ref)
        out = mvt.decode_varints(buf)
        out = out.tolist() if isinstance(out, np.ndarray) else out
        assert [int(v) for v in out] == [int(v) for v in vals]


def test_decode_varints_rejects_truncated():
    buf = mvt.encode_varints(list(range(1000)))
    with pytest.raises(ValueError):
        mvt.decode_varints(buf[:-1] + b"\x80")


def test_geometry_vectorized_matches_scalar():
    import random

    rng = random.Random(11)
    # large multi-part polygon: enough vertices to cross _VEC_MIN
    parts = []
    for _ in range(40):
        n = rng.randrange(3, 30)
        parts.append(
            [(rng.randrange(-(2**20), 2**20), rng.randrange(-(2**20), 2**20))
             for _ in range(n)]
        )
    for gtype in (mvt.GEOM_LINESTRING, mvt.GEOM_POLYGON):
        enc_vec = mvt.encode_geometry(parts, gtype)
        enc_ref = mvt._encode_geometry_scalar(parts, gtype)
        assert [int(v) for v in enc_vec] == [int(v) for v in enc_ref]
        dec_vec = mvt.decode_geometry(np.asarray(enc_ref, dtype=np.uint64),
                                      gtype)
        dec_ref = mvt._decode_geometry_scalar(enc_ref, gtype)
        assert dec_vec == dec_ref == parts


def test_raw_geometry_passthrough_preserves_content():
    data = open(FIXTURE, "rb").read()
    raw = mvt.decode_tile(data, raw_geometry=True)
    for layer in raw["layers"]:
        for f in layer["features"]:
            assert "geometry" not in f and isinstance(f["geometry_raw"], bytes)
    again = mvt.decode_tile(mvt.encode_tile(raw))
    assert _norm(again) == _norm(mvt.decode_tile(data))


def test_filter_layers_raw_matches_decode_path():
    data = open(FIXTURE, "rb").read()
    names = {"streets", "addresses"}
    for invert in (False, True):
        fast = mvt.decode_tile(mvt.filter_layers_raw(data, names, invert))
        slow = mvt.decode_tile(data)
        slow["layers"] = [
            l for l in slow["layers"] if (l["name"] in names) == invert
        ]
        assert _norm(fast) == _norm(slow)


def test_filter_properties_raw_matches_decode_path():
    import re

    data = open(FIXTURE, "rb").read()
    for pattern, invert in [(r"streets/name", False), (r".*/kind", False),
                            (r"streets/", True)]:
        rx = re.compile(pattern)
        fast = mvt.decode_tile(
            mvt.filter_properties_raw(data, rx.search, invert))
        slow = mvt.decode_tile(data)
        for layer in slow["layers"]:
            nm = layer["name"]
            for f in layer["features"]:
                f["properties"] = {
                    k: v for k, v in f["properties"].items()
                    if bool(rx.search(f"{nm}/{k}")) == invert
                }
        assert _norm(fast) == _norm(slow)


def test_filter_properties_raw_handles_unpacked_tags():
    # tags may legally arrive as individual wire-0 varint fields; the
    # rewrite must pair them across occurrences, not copy them verbatim
    # against a compacted key/value table
    lay = bytearray()
    mvt._write_field(lay, 1, 2, b"roads")
    feat = bytearray()
    mvt._write_field(feat, 3, 0, mvt.GEOM_POINT)
    for t in (0, 0, 1, 1):  # kind=street, name=A as 4 unpacked tags
        mvt._write_field(feat, 2, 0, t)
    geom = bytearray()
    for g in mvt.encode_geometry([[(3, 4)]], mvt.GEOM_POINT):
        mvt._write_varint(geom, int(g))
    mvt._write_field(feat, 4, 2, bytes(geom))
    mvt._write_field(lay, 2, 2, bytes(feat))
    mvt._write_field(lay, 3, 2, b"kind")
    mvt._write_field(lay, 3, 2, b"name")
    mvt._write_field(lay, 4, 2, mvt._encode_value("street"))
    mvt._write_field(lay, 4, 2, mvt._encode_value("A"))
    mvt._write_field(lay, 5, 0, 4096)
    tile = bytearray()
    mvt._write_field(tile, 3, 2, bytes(lay))

    import re
    out = mvt.decode_tile(
        mvt.filter_properties_raw(bytes(tile), re.compile("roads/name").search))
    props = out["layers"][0]["features"][0]["properties"]
    assert props == {"kind": "street"}
    assert out["layers"][0]["features"][0]["geometry"] == [[(3, 4)]]
