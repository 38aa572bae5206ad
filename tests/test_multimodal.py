"""Multimodal plumbing: span explosion, media filtering, decode pool
schema (decode itself is a documented stub)."""

import pyarrow as pa

from versatiles_rs_ray.sources import docs as D
from versatiles_rs_ray.stages import multimodal as M


def test_explode_spans_preserves_order(ray_session, sf_dir):
    got = M.explode_spans(D.read_docs(sf_dir)).to_pandas()
    # per doc: span_idx dense 0..n-1, offsets strictly increasing
    for doc_id, g in got.groupby("doc_id"):
        g = g.sort_values("span_idx")
        assert list(g["span_idx"]) == list(range(len(g)))
        offs = list(g["offset"])
        assert offs == sorted(offs)


def test_media_spans_only_nontext(ray_session, sf_dir):
    got = M.media_spans(D.read_docs(sf_dir)).to_pandas()
    assert set(got["kind"]) <= {"image", "audio"}
    assert (got["media_ref"].str.startswith("media://")).all()


def test_decode_media_schema_and_determinism(ray_session, sf_dir):
    a = M.decode_media(D.read_docs(sf_dir), concurrency=2, batch_size=128).to_pandas()
    assert set(a.columns) == {
        "doc_id", "span_idx", "kind", "media_ref", "payload", "width", "height", "n_bytes"
    }
    assert (a["n_bytes"] == 64).all()
    b = M.decode_media(D.read_docs(sf_dir), concurrency=2, batch_size=128).to_pandas()
    key = ["doc_id", "span_idx"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert (a["payload"] == b["payload"]).all()  # fake decode is deterministic
    img = a[a.kind == "image"]
    assert (img["width"] > 0).all() and (img["height"] > 0).all()
