"""Probe operators (pyramid inference, histogram, outline) + broadcast
props join + sessionize vs pandas brute force."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from versatiles_rs_ray.core.bbox import TileBBoxPyramid
from versatiles_rs_ray.sources.debug_tiles import json_debug_tiles
from versatiles_rs_ray.stages import probe, props, window


def test_infer_pyramid(ray_session):
    p = TileBBoxPyramid.from_geo_bbox(0, 0, 40, 20, 0, 5)
    ds = json_debug_tiles(p)
    out = probe.infer_pyramid(ds).to_pandas().sort_values("z").reset_index(drop=True)
    z5 = out[out.z == 5].iloc[0]
    assert (z5.x_min, z5.x_max, z5.y_min, z5.y_max, z5.n_tiles) == (16, 19, 14, 15, 8)


def test_tile_size_histogram(ray_session):
    p = TileBBoxPyramid.new_full(4, 4)
    ds = json_debug_tiles(p)
    out = probe.tile_size_histogram(ds, scale_level=2).to_pandas()
    assert out["n_tiles"].sum() == 256
    assert len(out) == 16  # 4x4 cells at the probe level
    # bytes equal the sum of payload lengths
    total = sum(len(f'{{"x":{x},"y":{y},"z":4}}') for x in range(16) for y in range(16))
    assert out["sum_bytes"].sum() == total


def test_coverage_outline(ray_session):
    p = TileBBoxPyramid.from_geo_bbox(0, 0, 40, 20, 5, 5)
    ds = json_debug_tiles(p)
    runs = probe.coverage_runs(ds, 5)
    assert sorted(runs) == [(14, 16, 19), (15, 16, 19)]
    geo = probe.coverage_outline_geojson(ds, 5)
    assert geo["type"] == "MultiPolygon"
    assert len(geo["coordinates"]) == 1  # two identical runs merge into one rect
    ring = geo["coordinates"][0][0]
    assert ring[0] == ring[-1]  # closed
    assert ring[0][0] == 0.0  # west edge of tile x=16 at z5 is lon 0


def test_props_join_merge_and_semi(ray_session):
    import ray.data as rd

    t = pa.table(
        {
            "k": pa.array([1, 2, 3, 4], type=pa.int64()),
            "v": pa.array(["a", "b", "c", "d"]),
        }
    )
    ds = rd.from_arrow(t)
    side = {1: {"attr": "x"}, 3: {"attr": "y"}}
    merged = props.props_join(ds, side, "k").to_pandas().sort_values("k")
    assert merged["attr"].tolist() == ["x", None, "y", None]
    semi = props.props_join(ds, side, "k", remove_non_matching=True).to_pandas()
    assert sorted(semi["k"]) == [1, 3]


def test_sessionize_matches_brute(ray_session, sf_dir):
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])
    got = (
        window.sessionize(ev)
        .to_pandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    df = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    df["ts_us"] = df["ts"].astype("datetime64[us]").astype("int64")
    rows = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"])
        ts = g["ts_us"].to_numpy()
        sid = np.concatenate(([0], (np.diff(ts) > 1800 * 10**6).astype(int))).cumsum() + 1
        for s in np.unique(sid):
            m = sid == s
            rows.append((uid, int(s), int(m.sum()), int(ts[m].min()), int(ts[m].max())))
    brute = pd.DataFrame(
        rows, columns=["user_id", "session_id", "n_events", "start_us", "end_us"]
    ).sort_values(["user_id", "session_id"]).reset_index(drop=True)
    assert got[brute.columns.tolist()].astype("int64").equals(brute.astype("int64"))


def test_coverage_runs_exchange_matches_brute(ray_session):
    """Exchange-merged runs == brute-force per-row runs, including
    cross-batch overlaps and duplicate tiles."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from versatiles_rs_ray.stages.probe import coverage_runs

    rng = np.random.default_rng(11)
    pts = set()
    for _ in range(400):
        pts.add((int(rng.integers(0, 40)), int(rng.integers(0, 12))))
    xs = [p[0] for p in pts] + [p[0] for p in list(pts)[:50]]  # dup rows
    ys = [p[1] for p in pts] + [p[1] for p in list(pts)[:50]]
    t = pa.table(
        {
            "z": pa.array([6] * len(xs), type=pa.int64()),
            "x": pa.array(xs, type=pa.int64()),
            "y": pa.array(ys, type=pa.int64()),
        }
    )
    ds = rd.from_arrow(t).repartition(7)  # force cross-batch splits
    got = coverage_runs(ds, 6, num_partitions=4)
    # brute force
    want = []
    for y in sorted({p[1] for p in pts}):
        row = np.sort(np.asarray([p[0] for p in pts if p[1] == y]))
        brk = np.flatnonzero(np.diff(row) > 1)
        starts = np.concatenate(([0], brk + 1))
        ends = np.concatenate((brk, [len(row) - 1]))
        want += [(y, int(row[s]), int(row[e])) for s, e in zip(starts, ends)]
    assert got == sorted(want)


def test_probe_tile_contents(ray_session):
    """Deep probe: per-zoom format counts + MVT layer feature totals,
    with gzip payloads transparently decoded before the sniff."""
    import gzip

    import ray.data as rd

    from versatiles_rs_ray.core import mvt

    tile = {
        "layers": [
            {
                "name": "roads",
                "version": 2,
                "extent": 4096,
                "features": [
                    {"id": 1, "type": mvt.GEOM_POINT, "geometry": [[(25, 17)]],
                     "properties": {"kind": "a"}},
                    {"id": 2, "type": mvt.GEOM_POINT, "geometry": [[(26, 15)]],
                     "properties": {"kind": "b"}},
                ],
            },
            {
                "name": "water",
                "version": 2,
                "extent": 4096,
                "features": [
                    {"id": 3, "type": mvt.GEOM_POINT, "geometry": [[(1, 1)]],
                     "properties": {}},
                ],
            },
        ]
    }
    blob = mvt.encode_tile(tile)
    rows = [
        {"z": 1, "x": 0, "y": 0, "payload": blob},
        {"z": 1, "x": 1, "y": 0, "payload": gzip.compress(blob, mtime=0)},
        {"z": 2, "x": 0, "y": 0, "payload": b'{"x":0}'},
        {"z": 2, "x": 1, "y": 0, "payload": b"\x00\x01binary"},
    ]
    ds = rd.from_arrow(pa.table({
        "z": [r["z"] for r in rows],
        "x": [r["x"] for r in rows],
        "y": [r["y"] for r in rows],
        "payload": pa.array([r["payload"] for r in rows], type=pa.binary()),
    }))
    out = probe.probe_tile_contents(ds).to_pandas()
    rec = {(r.z, r.kind, r["name"]): (r.n, r["bytes"]) for _, r in out.iterrows()}
    assert rec[(1, "format", "mvt")][0] == 2
    # stored bytes counted as-is (one raw + one gzipped payload)
    assert rec[(1, "format", "mvt")][1] == len(blob) + len(gzip.compress(blob, mtime=0))
    assert rec[(1, "layer", "roads")][0] == 4  # 2 features x 2 tiles
    assert rec[(1, "layer", "water")][0] == 2
    assert rec[(2, "format", "json")] == (1, 7)
    assert rec[(2, "format", "bin")][0] == 1


def test_measure_tile_sizes_image(ray_session):
    """Golden parity with measure_tile_sizes.rs:57-93: grayscale PNG at
    (2^level/scale)^2, pixel = clamp(10*log2(max(sum/scale^2,1)),0,255),
    off-level tiles ignored, empty cells 0."""
    from versatiles_rs_ray.core.png import decode_png_rgba

    p = TileBBoxPyramid.new_full(3)  # z0..z3; only z3 must count
    ds = json_debug_tiles(p)
    png = probe.measure_tile_sizes_image(ds, level=3, scale=2)
    img = decode_png_rgba(png)
    assert img.shape == (4, 4, 4)
    grey = img[..., 0]
    assert (img[..., 0] == img[..., 1]).all() and (img[..., 2] == grey).all()
    want = np.zeros((4, 4))
    for x in range(8):
        for y in range(8):
            want[y // 2, x // 2] += len(f'{{"x":{x},"y":{y},"z":3}}')
    want = np.clip(np.log2(np.maximum(want / 4.0, 1.0)) * 10.0, 0, 255).astype(np.uint8)
    assert np.array_equal(grey, want)


def test_measure_tile_sizes_cli(ray_session, tmp_path):
    import subprocess
    import sys

    from versatiles_rs_ray.sources.tiles_io import write_mbtiles

    p = TileBBoxPyramid.new_full(2, 2)
    mb = tmp_path / "t.mbtiles"
    write_mbtiles(json_debug_tiles(p), str(mb))
    out = tmp_path / "sizes.png"
    r = subprocess.run(
        [sys.executable, "-m", "versatiles_rs_ray", "--num-cpus", "2",
         "dev", "measure-tile-sizes", str(mb), "-o", str(out),
         "--level", "2", "--scale", "2"],
        capture_output=True, text=True, timeout=240)
    assert r.returncode == 0, r.stderr[-2000:]
    from versatiles_rs_ray.core.png import decode_png_rgba

    assert decode_png_rgba(out.read_bytes()).shape == (2, 2, 4)
