"""VPL parser, pipeline builder, container registry, TileJSON."""

import pytest

from versatiles_rs_ray.core.tilejson import TileJSON
from versatiles_rs_ray.pipelines import vpl


def test_parse_vpl():
    nodes = vpl.parse_vpl("from_debug zmax=3 | filter bbox=[0,0,40,20] level_min=1 | flip_y")
    assert nodes[0] == ("from_debug", {"zmax": 3})
    assert nodes[1] == ("filter", {"bbox": [0, 0, 40, 20], "level_min": 1})
    assert nodes[2] == ("flip_y", {})


def test_build_pipeline_counts(ray_session):
    ds = vpl.build_pipeline("from_debug zmax=5 | filter bbox=[0,0,40,20]")
    assert ds.count() == 14  # the filter golden (filter.rs:141-156)


def test_build_pipeline_unknown_op():
    with pytest.raises(ValueError, match="unknown read op"):
        vpl.build_pipeline("nope x=1")
    with pytest.raises(ValueError, match="unknown transform"):
        vpl.build_pipeline("from_debug zmax=1 | nope")


def test_custom_op_registration(ray_session):
    @vpl.register_transform_op("take_z0")
    def _take_z0(ds, **_):
        import pyarrow.compute as pc

        return ds.map_batches(
            lambda t: t.filter(pc.equal(t["z"], 0)), batch_format="pyarrow"
        )

    ds = vpl.build_pipeline("from_debug zmax=2 | take_z0")
    assert ds.count() == 1


def test_container_registry_roundtrip(ray_session, tmp_path):
    ds = vpl.build_pipeline("from_debug zmax=2")
    path = str(tmp_path / "t.mbtiles")
    n = vpl.write_container(ds, path)
    assert n == 1 + 4 + 16
    back = vpl.open_container(path)
    assert back.count() == 21


def test_parse_nested_sources():
    nodes = vpl.parse_vpl(
        "from_stacked [from_debug zmax=2 | flip_y, from_debug zmax=1] | filter level_max=1"
    )
    assert nodes[0][0] == "from_stacked"
    subs = nodes[0][1]["sources"]
    assert len(subs) == 2
    assert subs[0] == [("from_debug", {"zmax": 2}), ("flip_y", {})]
    assert subs[1] == [("from_debug", {"zmax": 1})]
    assert nodes[1] == ("filter", {"level_max": 1})
    # scalar brackets still parse as list values
    plain = vpl.parse_vpl("from_debug zmax=3 | filter bbox=[0,0,40,20]")
    assert plain[1][1]["bbox"] == [0, 0, 40, 20]


def test_build_stacked_pipeline(ray_session):
    # two debug pyramids: first-wins keeps one row per tile, z0..2 from
    # source 0 plus nothing extra from source 1 (same coords)
    ds = vpl.build_pipeline("from_stacked [from_debug zmax=2, from_debug zmax=3]")
    df = ds.to_pandas()
    assert len(df) == 1 + 4 + 16 + 64  # union of coords, one row each
    assert (df[df.z <= 2]["src_rank"] == 0).all()  # first source wins
    assert (df[df.z == 3]["src_rank"] == 1).all()  # holes filled by second


def test_tilejson_pyramid_and_merge():
    from versatiles_rs_ray.core.bbox import TileBBoxPyramid

    tj = TileJSON().update_from_pyramid(TileBBoxPyramid.new_full(4, 1))
    assert tj.minzoom == 1 and tj.maxzoom == 4
    assert tj.bounds[0] == -180.0 and tj.bounds[2] == 180.0
    tj.meta_update(name="test", attribution="me")
    with pytest.raises(ValueError):
        tj.meta_update(bogus="x")
    other = TileJSON(minzoom=0, maxzoom=2, bounds=[-10, -10, 10, 10])
    other.vector_layers = [{"id": "roads"}]
    merged = tj.merge(other)
    assert merged.minzoom == 0 and merged.maxzoom == 4
    assert merged.vector_layers == [{"id": "roads"}]
    rt = TileJSON.from_json(merged.to_json())
    assert rt.minzoom == 0 and rt.extra.get("name") == "test"


def test_tilejson_full_surface():
    """Merge / limit / check semantics ported from tilejson/lib.rs and
    vector_layer.rs."""
    from versatiles_rs_ray.core.bbox import TileBBoxPyramid
    from versatiles_rs_ray.core.tilejson import vector_layers_schema

    # per-layer merge: fields overwrite, description overwrite,
    # minzoom min / maxzoom max (vector_layer.rs:336-365)
    a = TileJSON(
        vector_layers=[
            {"id": "roads", "fields": {"name": "String"}, "minzoom": 4, "maxzoom": 10,
             "description": "old"}
        ]
    )
    b = TileJSON(
        vector_layers=[
            {"id": "roads", "fields": {"kind": "String"}, "minzoom": 6, "maxzoom": 14,
             "description": "new"},
            {"id": "water", "fields": {}},
        ]
    )
    merged = a.merge(b)
    roads = merged.vector_layers[0]
    assert [l["id"] for l in merged.vector_layers] == ["roads", "water"]  # sorted
    assert roads["fields"] == {"name": "String", "kind": "String"}
    assert roads["minzoom"] == 4 and roads["maxzoom"] == 14
    assert roads["description"] == "new"
    # rule 4: other's values overwrite
    x = TileJSON(extra={"name": "mine"})
    assert x.merge(TileJSON(extra={"name": "theirs"})).extra["name"] == "theirs"
    # center overwritten when other has one (rule 2)
    assert TileJSON(center=[1, 2, 3]).merge(TileJSON()).center == [1, 2, 3]
    assert TileJSON(center=[1, 2, 3]).merge(TileJSON(center=[9, 9, 1])).center == [9, 9, 1]

    # limit_bbox intersects, set_min/max_zoom raise/lower (lib.rs:276-322)
    tj = TileJSON(bounds=[-20.0, -10.0, 20.0, 10.0], minzoom=3, maxzoom=12)
    tj.limit_bbox([-5.0, -90.0, 90.0, 5.0])
    assert tj.bounds == [-5.0, -10.0, 20.0, 5.0]
    tj.set_min_zoom(5)
    tj.set_min_zoom(2)  # lower -> no-op
    tj.set_max_zoom(10)
    tj.set_max_zoom(14)  # higher -> no-op
    assert tj.minzoom == 5 and tj.maxzoom == 10

    # checks (lib.rs:390-486)
    tj.check_basics()
    with pytest.raises(ValueError, match="tilejson version"):
        TileJSON(tilejson="9.0.0").check_basics()
    with pytest.raises(ValueError, match="version number"):
        TileJSON(extra={"version": "x"}).check_basics()
    with pytest.raises(ValueError, match="vector_layers"):
        TileJSON(vector_layers=[{"id": "x", "fields": {}}]).check_raster()
    with pytest.raises(ValueError, match="vector_layers"):
        TileJSON().check_vector()
    with pytest.raises(ValueError, match="alphanumeric"):
        TileJSON(vector_layers=[{"id": "bad id!", "fields": {}}]).check_vector()
    with pytest.raises(ValueError, match="minzoom must be <="):
        TileJSON(vector_layers=[{"id": "x", "fields": {}, "minzoom": 9, "maxzoom": 3}]).check_vector()
    TileJSON(vector_layers=[{"id": "ok", "fields": {"name": "String"}}]).check_vector()

    # schema inference (vector_layer.rs:111-164) + reader-parameter sync
    assert vector_layers_schema([{"id": "custom"}]) == "vector-other"
    sb = [{"id": i, "fields": {}} for i in (
        "addresses aerialways boundaries boundary_labels bridges buildings "
        "dam_lines dam_polygons ferries land ocean pier_lines pier_polygons "
        "place_labels pois public_transport sites street_labels_points "
        "street_labels street_polygons streets_polygons_labels streets "
        "water_lines_labels water_lines water_polygons_labels water_polygons"
    ).split()]
    assert vector_layers_schema(sb) == "vector-shortbread-1.0"
    tj2 = TileJSON(vector_layers=sb)
    tj2.update_from_reader_parameters(TileBBoxPyramid.new_full(3, 0), "mvt")
    assert tj2.tile_type == "vector" and tj2.tile_schema == "vector-shortbread-1.0"
    assert tj2.minzoom == 0 and tj2.maxzoom == 3
    tj3 = TileJSON().update_from_reader_parameters(TileBBoxPyramid.new_full(2, 0), "png")
    assert tj3.tile_type == "raster" and tj3.tile_schema == "raster-rgb"

    # robust parse fallback (lib.rs:498-505)
    assert TileJSON.try_from_text_or_default("not json").tilejson == "3.0.0"


def test_from_container_vpl(ray_session, tmp_path):
    """from_container reads any registered container as a head node;
    relative filenames resolve against sf_dir (from_container.rs:20)."""
    src = vpl.build_pipeline("from_debug zmax=2")
    path = str(tmp_path / "c.mbtiles")
    vpl.write_container(src, path)
    ds = vpl.build_pipeline(f"from_container filename={path} | filter level_min=1")
    assert ds.count() == 20  # z1 (4) + z2 (16)
    ds2 = vpl.build_pipeline("from_container filename=c.mbtiles", sf_dir=str(tmp_path))
    assert ds2.count() == 21


def test_from_gdal_raster_vpl(ray_session):
    out = vpl.build_pipeline(
        "from_gdal_raster zmax=1 tile_size=16 source_height=64"
    ).to_pandas()
    assert len(out) == 5  # z0 + 4 z1 tiles
    assert (out["width"] == 16).all()


def test_raster_format_and_overview_vpl(ray_session):
    from versatiles_rs_ray.core import png

    out = vpl.build_pipeline(
        "from_gradient zmax=2 size=8 | raster_overview z_from=2 z_to=0 | "
        "raster_format format=png"
    ).to_pandas()
    assert sorted(out["z"].unique()) == [0, 1, 2]
    arr = png.decode_png_rgba(out["payload"].iloc[0])
    assert arr.shape[0] == 8
    assert (out["format"] == "png").all()


def test_vector_update_properties_and_meta_update_vpl(ray_session, tmp_path, monkeypatch):
    import pyarrow as pa

    from versatiles_rs_ray.core import mvt

    tile = {
        "layers": [{
            "name": "pois", "version": 2, "extent": 4096,
            "features": [{"id": 1, "type": mvt.GEOM_POINT,
                          "geometry": [[(5, 5)]],
                          "properties": {"kind": "cafe"}}],
        }]
    }
    (tmp_path / "side.csv").write_text("kind,speed\ncafe,11\nbar,22\n")

    @vpl.register_read_op("one_mvt_tile")
    def _one(sf_dir=None, **_):
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "z": [1], "x": [0], "y": [0],
            "payload": pa.array([mvt.encode_tile(tile)], type=pa.binary()),
        }))

    try:
        out = vpl.build_pipeline(
            f"one_mvt_tile | vector_update_properties "
            f"data_source_path={tmp_path}/side.csv "
            f"id_field_tiles=kind id_field_data=kind | meta_update"
        ).to_pandas()
        got = mvt.decode_tile(out["payload"].iloc[0])
        assert got["layers"][0]["features"][0]["properties"]["speed"] == 11
    finally:
        vpl.READ_OPS.pop("one_mvt_tile", None)
