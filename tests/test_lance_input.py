"""Lance input gate (BASELINE.json input_hint: a Lance table of
interleaved docs). The `lance` package is absent in this sandbox, so
the IO path is gated (read_docs_lance raises with guidance) while the
hint-schema -> docs-surface ADAPTER is real and tested here against
in-memory hint-shaped tables; the read-through-tile_assign test runs
whenever `lance` is importable."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from versatiles_rs_ray.sources import docs as D


def _hint_table(sf_dir):
    """documents.parquet -> a table of EXACTLY the input_hint shape
    (doc_id:string, spans:list<struct<kind,text,media_ref,offset>>),
    via the derive path (single source of truth for the fixture)."""
    base = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    derived = D.derive_docs_batch(base)
    return derived.select(["doc_id", "spans"]), derived


def test_adapter_recovers_docs_surface(sf_dir):
    hint, derived = _hint_table(sf_dir)
    out = D.adapt_interleaved_batch(hint)
    assert out["doc_num"].to_pylist() == derived["doc_num"].to_pylist()
    assert out["lon"].to_pylist() == derived["lon"].to_pylist()
    assert out["lat"].to_pylist() == derived["lat"].to_pylist()
    assert out["spans"].to_pylist() == derived["spans"].to_pylist()
    # text == concatenation of text-kind span texts in span order; for
    # docs whose spans cover a text prefix this equals a text prefix
    for got, spans in zip(out["text"].to_pylist(), derived["spans"].to_pylist()):
        assert got == "".join(s["text"] for s in spans if s["kind"] == "text")
    # column pruning honors derived members
    slim = D.adapt_interleaved_batch(hint, columns=["doc_num", "n_spans"])
    assert slim.column_names == ["doc_num", "n_spans"]
    assert slim["n_spans"].to_pylist() == [len(s) for s in derived["spans"].to_pylist()]


def test_adapter_passthrough_lonlat(sf_dir):
    hint, derived = _hint_table(sf_dir)
    lon = np.linspace(-10, 10, hint.num_rows)
    lat = np.linspace(-5, 5, hint.num_rows)
    ht = hint.append_column("lon", pa.array(lon)).append_column("lat", pa.array(lat))
    out = D.adapt_interleaved_batch(ht, columns=["doc_num", "lon", "lat"])
    np.testing.assert_allclose(np.asarray(out["lon"]), lon)
    np.testing.assert_allclose(np.asarray(out["lat"]), lat)


def test_gate_message_without_lance():
    if D.have_lance():
        pytest.skip("lance present; gate not applicable")
    with pytest.raises(ImportError, match="pylance"):
        D.read_docs_lance("/tmp/nonexistent.lance")


@pytest.mark.skipif(not D.have_lance(), reason="`lance` not installed (gated)")
def test_read_lance_through_tile_assign(ray_session, sf_dir, tmp_path):
    import lance

    from versatiles_rs_ray.stages import assign

    hint, _ = _hint_table(sf_dir)
    path = str(tmp_path / "docs.lance")
    lance.write_dataset(hint, path)
    ds = D.read_docs_lance(path, columns=["doc_num", "lon", "lat"])
    got = assign.assign_tiles(ds, 6).to_pandas().sort_values("doc_num")
    want = assign.assign_tiles(
        D.read_docs(sf_dir, columns=["doc_num", "lon", "lat"]), 6
    ).to_pandas().sort_values("doc_num")
    assert got[["doc_num", "z", "x", "y"]].values.tolist() == \
        want[["doc_num", "z", "x", "y"]].values.tolist()
