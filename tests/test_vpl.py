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
