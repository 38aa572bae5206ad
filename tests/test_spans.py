"""Derived interleaved-docs table: numpy derivation == DuckDB SQL,
span-sequence invariants (FIXTURES.md F1)."""

import duckdb
import numpy as np
import pyarrow.parquet as pq

from versatiles_rs_ray.sources import docs as D


def _table(sf_dir):
    return pq.read_table(f"{sf_dir}/documents.parquet")


def test_lonlat_matches_sql(sf_dir):
    t = _table(sf_dir)
    did = np.asarray(t["doc_id"], dtype=np.int64)
    lon, lat = D.derive_lonlat(did)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    odf = con.execute(
        f"SELECT doc_id, {D.SQL_LON} AS lon, {D.SQL_LAT} AS lat FROM documents ORDER BY doc_id"
    ).fetchdf()
    order = np.argsort(did)
    assert (lon[order] == odf["lon"].values).all()
    assert (lat[order] == odf["lat"].values).all()
    assert (lat > -85.06).all() and (lat < 85.06).all()


def test_span_invariants(sf_dir):
    out = D.derive_docs_batch(_table(sf_dir))
    for did, sp in zip(out["doc_num"].to_pylist(), out["spans"].to_pylist()):
        assert len(sp) == 1 + did % 4
        offsets = [s["offset"] for s in sp]
        assert offsets == sorted(offsets) and len(set(offsets)) == len(offsets)
        for s in sp:
            if s["kind"] == "text":
                assert s["media_ref"] == ""
            else:
                assert s["text"] == "" and s["media_ref"].startswith("media://")


def test_spans_match_sql(sf_dir):
    out = D.derive_docs_batch(_table(sf_dir))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    i = "e.span_idx"
    odf = con.execute(
        f"SELECT {D.SQL_DOC_ID_STR} AS doc_id, e.span_idx, "
        f"{D.SQL_SPAN_KIND.format(i=i)} AS kind, {D.SQL_SPAN_TEXT.format(i=i)} AS text, "
        f"{D.SQL_SPAN_MEDIA.format(i=i)} AS media_ref, {D.SQL_SPAN_OFFSET.format(i=i)} AS off "
        f"FROM {D.SQL_SPANS_EXPLODED} e ORDER BY doc_id, span_idx"
    ).fetchdf()
    rows = []
    for d_, sp in zip(out["doc_id"].to_pylist(), out["spans"].to_pylist()):
        for j, s in enumerate(sp):
            rows.append((d_, j, s["kind"], s["text"], s["media_ref"], s["offset"]))
    rows.sort()
    assert len(rows) == len(odf)
    for got, (_, want) in zip(rows, odf.iterrows()):
        assert got == (
            want["doc_id"], want["span_idx"], want["kind"], want["text"],
            want["media_ref"], want["off"],
        )


def test_column_pruned_derivation(ray_session, sf_dir):
    # prune-at-the-read: requesting only light columns must not build
    # spans or doc_id strings, and must match the full derivation
    full = D.read_docs(sf_dir).to_pandas().sort_values("doc_num").reset_index(drop=True)
    light = (
        D.read_docs(sf_dir, columns=["doc_num", "lon", "lat", "n_spans"])
        .to_pandas()
        .sort_values("doc_num")
        .reset_index(drop=True)
    )
    assert list(light.columns) == ["doc_num", "lon", "lat", "n_spans"]
    assert (light["lon"].values == full["lon"].values).all()
    assert (light["n_spans"].values == full["spans"].map(len).values).all()


def test_replicated_ids_disjoint(sf_dir):
    t = _table(sf_dir)
    did = np.asarray(t["doc_id"], dtype=np.int64)
    assert did.max() < D.REPLICA_STRIDE
    shifted = did + D.REPLICA_STRIDE
    lon0, _ = D.derive_lonlat(did)
    lon1, _ = D.derive_lonlat(shifted)
    assert not np.array_equal(lon0, lon1)  # replicas land elsewhere


def test_tile_spans_payload_exact(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from versatiles_rs_ray.sources.docs import SPANS_TYPE
    from versatiles_rs_ray.stages.pyramid import tile_spans

    def spans(*triples):
        return [
            {"kind": k, "text": t, "media_ref": m, "offset": i * 16}
            for i, (k, t, m) in enumerate(triples)
        ]

    t = pa.table(
        {
            "z": pa.array([3, 3, 3], type=pa.int64()),
            "x": pa.array([1, 1, 5], type=pa.int64()),
            "y": pa.array([2, 2, 6], type=pa.int64()),
            # doc 20 < 10? no: ordering must be by doc_num: 10 then 20
            "doc_num": pa.array([20, 10, 7], type=pa.int64()),
            "spans": pa.array(
                [
                    spans(("text", "BBB", ""), ("image", "", "media://20/1")),
                    spans(("audio", "", "media://10/0")),
                    spans(("text", "CC", "")),
                ],
                type=SPANS_TYPE,
            ),
        }
    )
    out = tile_spans(rd.from_arrow(t), num_buckets=2).to_pandas()
    out = out.sort_values(["x", "y"]).reset_index(drop=True)
    assert len(out) == 2
    # tile (1,2): docs 10 then 20 (doc order), spans in offset order
    assert out.loc[0, "payload"] == "audio:0:media://10/0#text:0:BBB|image:16:media://20/1"
    assert int(out.loc[0, "n_docs"]) == 2
    assert out.loc[1, "payload"] == "text:0:CC"


def test_tile_spans_empty_buckets_schema(ray_session):
    """More hash buckets than occupied tiles: empty partitions must
    still emit the post-combine schema (z,x,y,n_docs,payload)."""
    import pyarrow as pa
    import ray.data as rd

    from versatiles_rs_ray.sources.docs import SPANS_TYPE
    from versatiles_rs_ray.stages.pyramid import tile_spans

    t = pa.table(
        {
            "z": pa.array([2], type=pa.int64()),
            "x": pa.array([1], type=pa.int64()),
            "y": pa.array([1], type=pa.int64()),
            "doc_num": pa.array([5], type=pa.int64()),
            "spans": pa.array(
                [[{"kind": "text", "text": "hi", "media_ref": "", "offset": 0}]],
                type=SPANS_TYPE,
            ),
        }
    )
    out = tile_spans(rd.from_arrow(t), num_buckets=16).select_columns(
        ["z", "x", "y", "n_docs", "payload"]
    )
    df = out.to_pandas()
    assert len(df) == 1 and df.loc[0, "payload"] == "text:0:hi"


def test_tile_spans_pyramid_hierarchical_equals_direct(ray_session, sf_dir):
    """The hierarchical cap derivation must equal capping directly at
    each level (min-doc monotonicity), and z0 must stay cap-bounded."""
    from versatiles_rs_ray.sources.docs import read_docs
    from versatiles_rs_ray.stages import assign
    from versatiles_rs_ray.stages.pyramid import tile_spans, tile_spans_pyramid

    cap, zb = 3, 4
    ds = assign.assign_tiles(read_docs(sf_dir), zb)
    got = (
        tile_spans_pyramid(ds, zb, 0, cap=cap, num_buckets=4)
        .to_pandas()
        .sort_values(["z", "x", "y"])
        .reset_index(drop=True)
    )
    assert sorted(got["z"].unique()) == [0, 1, 2, 3, 4]
    assert (got["n_docs"] <= cap).all()
    # z0: exactly one tile, cap docs, payload = '#'-join of the cap
    # lowest doc fps over the whole corpus
    z0 = got[got.z == 0]
    assert len(z0) == 1 and int(z0["n_docs"].iloc[0]) == cap
    # direct check per level: payload equals full tile_spans payload
    # truncated to its first `cap` doc fps
    for z in range(5):
        direct = (
            tile_spans(assign.assign_tiles(read_docs(sf_dir), z), num_buckets=4)
            .to_pandas()
            .sort_values(["x", "y"])
            .reset_index(drop=True)
        )
        lvl = got[got.z == z].sort_values(["x", "y"]).reset_index(drop=True)
        assert len(lvl) == len(direct)
        for (_, a), (_, b) in zip(lvl.iterrows(), direct.iterrows()):
            assert (a["x"], a["y"]) == (b["x"], b["y"])
            want = "#".join(b["payload"].split("#")[:cap])
            assert a["payload"] == want
