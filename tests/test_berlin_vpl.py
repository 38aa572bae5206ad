"""End-to-end run of the reference's own berlin.vpl pipeline text
(testdata/berlin.vpl verbatim) over a synthetic berlin.mbtiles plus the
REAL cities.csv fixture — parity with the reference's flagship
pipeline example (vector_update_properties.rs semantics: layer-scoped
update, id column dropped from attrs)."""

import shutil

import pyarrow as pa
import pytest

from versatiles_rs_ray.core import mvt

BERLIN_VPL = "/root/reference/testdata/berlin.vpl"
CITIES_CSV = "/root/reference/testdata/cities.csv"


def _city_tile(names, other_layer=True):
    layers = [
        {
            "version": 2,
            "name": "place_labels",
            "extent": 4096,
            "features": [
                {"id": i + 1, "type": 1, "geometry": [[(100 * i, 200)]],
                 "properties": {"name": n, "kind": "city"}}
                for i, n in enumerate(names)
            ],
        }
    ]
    if other_layer:
        layers.append(
            {
                "version": 2,
                "name": "streets",
                "extent": 4096,
                # a street that HAPPENS to carry a matching name: must
                # NOT be updated (layer_name restricts the join)
                "features": [{"id": 9, "type": 2,
                              "geometry": [[(0, 0), (10, 10)]],
                              "properties": {"name": "Berlin"}}],
            }
        )
    return {"layers": layers}


@pytest.fixture()
def berlin_dir(tmp_path, ray_session):
    """tmp dir shaped like the reference testdata dir: synthetic
    berlin.mbtiles + the real cities.csv."""
    import ray.data as rd

    from versatiles_rs_ray.sources.tiles_io import write_mbtiles

    tile = mvt.encode_tile(_city_tile(["Berlin", "Kyiv", "Nowhere"]))
    ds = rd.from_arrow(
        pa.table({"z": pa.array([0], pa.int64()), "x": pa.array([0], pa.int64()),
                  "y": pa.array([0], pa.int64()),
                  "payload": pa.array([tile], pa.binary())}))
    write_mbtiles(ds, str(tmp_path / "berlin.mbtiles"))
    shutil.copy(CITIES_CSV, tmp_path / "cities.csv")
    return tmp_path


def test_reference_berlin_vpl_runs(berlin_dir):
    from versatiles_rs_ray.pipelines.vpl import build_pipeline

    text = open(BERLIN_VPL).read()
    ds = build_pipeline(text, sf_dir=str(berlin_dir))
    rows = ds.take_all()
    assert len(rows) == 1
    tile = mvt.decode_tile(bytes(rows[0]["payload"]))
    layers = {l["name"]: l for l in tile["layers"]}
    place = {f["properties"]["name"]: f["properties"]
             for f in layers["place_labels"]["features"]}
    # matched cities gain population from the REAL cities.csv (and the
    # csv id column city_name is NOT copied in — reference drops it)
    assert place["Berlin"]["city_population"] == 3755251
    assert place["Kyiv"]["city_population"] == 2952301
    assert place["Berlin"]["city_id"] == 1
    assert "city_name" not in place["Berlin"]
    assert place["Berlin"]["kind"] == "city"  # merge, not replace
    # unmatched feature kept untouched (remove_non_matching unset)
    assert place["Nowhere"] == {"name": "Nowhere", "kind": "city"}
    # the streets layer is outside layer_name: untouched even though
    # its feature has a matching name property
    street = layers["streets"]["features"][0]["properties"]
    assert street == {"name": "Berlin"}


def test_berlin_vpl_parses_exactly():
    from versatiles_rs_ray.pipelines.vpl import parse_vpl

    nodes = parse_vpl(open(BERLIN_VPL).read())
    assert [n for n, _ in nodes] == ["from_container", "vector_update_properties"]
    head, vup = nodes[0][1], nodes[1][1]
    assert head == {"filename": "berlin.mbtiles"}
    assert vup == {
        "data_source_path": "cities.csv",
        "layer_name": "place_labels",
        "id_field_tiles": "name",
        "id_field_data": "city_name",
    }


def test_convert_vpl_input(berlin_dir, tmp_path):
    """`convert berlin.vpl out.pmtiles` — a .vpl file as the convert
    INPUT, dispatched by the container registry (the reference's
    tools/convert.rs test_local case 4)."""
    from versatiles_rs_ray.pipelines.vpl import open_container, write_container
    from versatiles_rs_ray.sources.pmtiles import read_pmtiles

    # write the real berlin.vpl text beside its inputs
    (berlin_dir / "berlin.vpl").write_text(open(BERLIN_VPL).read())
    ds = open_container(str(berlin_dir / "berlin.vpl"))
    out = str(tmp_path / "berlin4.pmtiles")
    rows = write_container(ds, out)
    assert rows == 1
    back = read_pmtiles(out).take_all()
    tile = mvt.decode_tile(bytes(back[0]["payload"]))
    place = {f["properties"]["name"]: f["properties"]
             for f in next(l for l in tile["layers"]
                           if l["name"] == "place_labels")["features"]}
    assert place["Berlin"]["city_population"] == 3755251
