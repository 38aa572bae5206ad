"""Spatial join operators vs driver-side brute force (FIXTURES.md F8)."""

import numpy as np
import pyarrow as pa
import pandas as pd
import pyarrow.parquet as pq

from versatiles_rs_ray.core import coords
from versatiles_rs_ray.sources import docs as D
from versatiles_rs_ray.stages import join


def _pts(sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    did = np.asarray(t["doc_id"], dtype=np.int64)
    lon, lat = D.derive_lonlat(did)
    return did, lon, lat


def test_tile_set_pip_matches_assignment(ray_session, sf_dir):
    did, lon, lat = _pts(sf_dir)
    tiles = [(8, 7), (9, 7), (0, 0)]
    ds = D.read_docs(sf_dir).map_batches(
        join.TileSetPIPJoin(4, tiles), batch_format="pyarrow"
    )
    got = ds.select_columns(["doc_num", "x", "y"]).to_pandas().sort_values("doc_num")
    x, y = coords.lonlat_to_tile(lon, lat, 4)
    keep = np.zeros(len(did), dtype=bool)
    for tx, ty in tiles:
        keep |= (x == tx) & (y == ty)
    order = np.argsort(did[keep])
    assert (got["doc_num"].values == np.sort(did[keep])).all()
    assert (got["x"].values == x[keep][order]).all()


def test_rect_join_overlapping(ray_session, sf_dir):
    did, lon, lat = _pts(sf_dir)
    mx, my = coords.mercator_fraction(lon, lat)
    rects = [
        (1, 0.0, 0.0, 0.5, 0.5),
        (2, 0.25, 0.25, 0.75, 0.75),  # overlaps rect 1
        (3, 0.9, 0.9, 1.0, 1.0),
    ]
    ds = D.read_docs(sf_dir).map_batches(join.RectJoin(rects), batch_format="pyarrow")
    got = ds.select_columns(["doc_num", "rect_id"]).to_pandas()
    expected = set()
    for rid, x0, y0, x1, y1 in rects:
        m = (mx >= x0) & (mx < x1) & (my >= y0) & (my < y1)
        expected |= {(int(d), rid) for d in did[m]}
    assert set(map(tuple, got.values)) == expected
    assert len(got) == len(expected)  # one row per (doc, rect) pair


def test_knn_matches_brute(ray_session, sf_dir):
    did, lon, lat = _pts(sf_dir)
    q = did[did % 50 == 0]
    q_lon, q_lat = D.derive_lonlat(q)
    got = (
        join.knn_join(D.read_docs(sf_dir), q, q_lon, q_lat, 4)
        .sort_values(["q_doc", "rank"])
        .reset_index(drop=True)
    )
    rows = []
    for qi, (qd, qx, qy) in enumerate(zip(q, q_lon, q_lat)):
        d2 = (qx - lon) ** 2 + (qy - lat) ** 2
        d2[did == qd] = np.inf
        order = np.lexsort((did, d2))[:4]
        rows += [(qd, did[j], r + 1) for r, j in enumerate(order)]
    brute = pd.DataFrame(rows, columns=["q_doc", "n_doc", "rank"]).sort_values(
        ["q_doc", "rank"]
    ).reset_index(drop=True)
    assert got[["q_doc", "n_doc", "rank"]].equals(brute)


def test_knn_grouped_equals_broadcast_at_z0(ray_session, sf_dir):
    """At zoom 0 the 3x3 window is the whole world, so the grouped
    exchange path must reproduce exact broadcast kNN verbatim."""
    did, lon, lat = _pts(sf_dir)
    q = did[did % 50 == 0]
    q_lon, q_lat = D.derive_lonlat(q)
    exact = (
        join.knn_join(D.read_docs(sf_dir), q, q_lon, q_lat, 4)
        .sort_values(["q_doc", "rank"])
        .reset_index(drop=True)
    )
    docs = D.read_docs(sf_dir)
    queries = docs.map_batches(
        lambda b: b.filter(
            __import__("pyarrow").array(
                np.asarray(b["doc_num"], dtype=np.int64) % 50 == 0
            )
        ),
        batch_format="pyarrow",
    )
    got = (
        join.knn_join_grouped(docs, queries, 4, zoom=0)
        .to_pandas()
        .sort_values(["q_doc", "rank"])
        .reset_index(drop=True)
    )
    assert got[["q_doc", "n_doc", "rank"]].equals(exact)


def test_knn_grouped_windowed_semantics(ray_session, sf_dir):
    """At a real zoom the contract is exact-top-k WITHIN the 3x3 tile
    window: verify against a brute-force windowed reference."""
    z, k = 3, 5
    did, lon, lat = _pts(sf_dir)
    x, y = coords.lonlat_to_tile(lon, lat, z)
    qm = did % 50 == 0
    docs = D.read_docs(sf_dir)
    queries = docs.map_batches(
        lambda b: b.filter(
            __import__("pyarrow").array(
                np.asarray(b["doc_num"], dtype=np.int64) % 50 == 0
            )
        ),
        batch_format="pyarrow",
    )
    got = (
        join.knn_join_grouped(docs, queries, k, zoom=z)
        .to_pandas()
        .sort_values(["q_doc", "rank"])
        .reset_index(drop=True)
    )
    rows = []
    for qd, qx_t, qy_t, qx, qy in zip(did[qm], x[qm], y[qm], lon[qm], lat[qm]):
        win = (np.abs(x - qx_t) <= 1) & (np.abs(y - qy_t) <= 1) & (did != qd)
        d2 = (qx - lon[win]) ** 2 + (qy - lat[win]) ** 2
        order = np.lexsort((did[win], d2))[:k]
        rows += [(qd, did[win][j], r + 1) for r, j in enumerate(order)]
    brute = pd.DataFrame(rows, columns=["q_doc", "n_doc", "rank"]).sort_values(
        ["q_doc", "rank"]
    ).reset_index(drop=True)
    assert got[["q_doc", "n_doc", "rank"]].equals(brute)


def test_asof_join_directions_and_nulls(ray_session):
    import ray.data as rd

    from versatiles_rs_ray.stages.join import asof_join

    left = rd.from_arrow(pa.table({
        "lid": pa.array([1, 2, 3, 4], type=pa.int64()),
        "k": pa.array([10, 10, 10, 99], type=pa.int64()),
        "t": pa.array([5, 15, 24, 7], type=pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([10, 10, 10], type=pa.int64()),
        "rt": pa.array([10, 20, 30], type=pa.int64()),
        "rv": pa.array(["a", "b", "c"]),
    }))
    back = asof_join(left, right, by="k", left_on="t", right_on="rt",
                     num_partitions=4).to_pandas().sort_values("lid")
    # t=5: no rt<=5 -> null; t=15 -> rt10 'a'; t=24 -> rt20 'b'; k=99 -> null
    assert back["rv"].tolist() == [None, "a", "b", None]
    fwd = asof_join(left, right, by="k", left_on="t", right_on="rt",
                    direction="forward", num_partitions=4
                    ).to_pandas().sort_values("lid")
    # t=5 -> rt10; t=15 -> rt20; t=24 -> rt30; k=99 -> null
    assert fwd["rv"].tolist() == ["a", "b", "c", None]


def test_asof_join_equality_inclusive(ray_session):
    import ray.data as rd

    from versatiles_rs_ray.stages.join import asof_join

    left = rd.from_arrow(pa.table({"k": pa.array([1], type=pa.int64()),
                                   "t": pa.array([10], type=pa.int64())}))
    right = rd.from_arrow(pa.table({"k": pa.array([1], type=pa.int64()),
                                    "rt": pa.array([10], type=pa.int64()),
                                    "rv": pa.array([7], type=pa.int64())}))
    out = asof_join(left, right, by="k", left_on="t", right_on="rt",
                    num_partitions=2).to_pandas()
    assert out["rv"].tolist() == [7]  # rt <= t includes equality


def test_range_join_agg_edges(ray_session):
    import ray.data as rd

    from versatiles_rs_ray.stages.join import range_join_agg

    iv = rd.from_arrow(pa.table({
        "iid": pa.array([1, 2, 3], type=pa.int64()),
        "k": pa.array([5, 5, 6], type=pa.int64()),
        "lo": pa.array([10, 100, 10], type=pa.int64()),
        "hi": pa.array([20, 110, 20], type=pa.int64()),
    }))
    pts = rd.from_arrow(pa.table({
        "k": pa.array([5, 5, 5, 6], type=pa.int64()),
        "at": pa.array([10, 20, 21, 15], type=pa.int64()),
        "v": pa.array([1.0, 2.5, 4.0, 8.0]),
    }))
    out = range_join_agg(iv, pts, by="k", lo="lo", hi="hi", at="at",
                         value="v", num_partitions=4
                         ).to_pandas().sort_values("iid")
    # iid1: at=10 (lo edge) + at=20 (hi edge), cents 100+250; at=21 excluded
    # iid2: none; iid3: different key's at=15 only
    assert out["n_points"].tolist() == [2, 0, 1]
    assert out["sum_cents"].tolist() == [350, 0, 800]
    # inverted interval matches nothing (never a negative count)
    bad = rd.from_arrow(pa.table({
        "iid": pa.array([9], type=pa.int64()),
        "k": pa.array([5], type=pa.int64()),
        "lo": pa.array([50], type=pa.int64()),
        "hi": pa.array([10], type=pa.int64()),
    }))
    o2 = range_join_agg(bad, pts, by="k", lo="lo", hi="hi", at="at",
                        value="v", num_partitions=2).to_pandas()
    assert o2["n_points"].tolist() == [0] and o2["sum_cents"].tolist() == [0]
