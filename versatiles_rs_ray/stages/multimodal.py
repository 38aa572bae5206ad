"""Multimodal span handling: media extraction + decode plumbing.

Media payloads are opaque `binary` columns with typed metadata
(kind, media_ref) — the decode itself is STUBBED (no image/audio
codecs in this container; cf. the reference's real codec surface,
versatiles_image/src/format/all.rs:32-54). What IS real and tested:
the Ray-side plumbing — span explosion, media_ref parsing, the
actor-pool decode stage signature, batch sizing, and output schema.
Swap `FakeMediaDecoder` for a Pillow/libav-backed class at deploy.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MEDIA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_idx", pa.int64()),
        ("kind", pa.string()),
        ("media_ref", pa.string()),
        ("payload", pa.binary()),
        ("width", pa.int64()),
        ("height", pa.int64()),
        ("n_bytes", pa.int64()),
    ]
)


def explode_spans_batch(batch: pa.Table) -> pa.Table:
    """Docs -> one row per span (doc_id, span_idx, kind, text, media_ref, offset)."""
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    lengths = np.asarray(pc.list_value_length(spans), dtype=np.int64)
    row_index = np.repeat(np.arange(len(batch), dtype=np.int64), lengths)
    starts = np.zeros(len(batch), dtype=np.int64)
    starts[1:] = np.cumsum(lengths)[:-1]
    span_idx = np.arange(int(lengths.sum()), dtype=np.int64) - np.repeat(starts, lengths)
    flat = spans.flatten()
    doc_id = batch["doc_id"].take(pa.array(row_index))
    return pa.table(
        {
            "doc_id": doc_id,
            "span_idx": pa.array(span_idx, type=pa.int64()),
            "kind": flat.field("kind"),
            "text": flat.field("text"),
            "media_ref": flat.field("media_ref"),
            "offset": flat.field("offset").cast(pa.int64()),
        }
    )


def explode_spans(docs_ds):
    return docs_ds.map_batches(explode_spans_batch, batch_format="pyarrow")


def media_spans(docs_ds):
    """Only non-text spans (the media stream)."""
    exploded = explode_spans(docs_ds)
    return exploded.map_batches(
        lambda t: t.filter(pc.not_equal(t["kind"], pa.scalar("text"))),
        batch_format="pyarrow",
    )


class FakeMediaDecoder:
    """Actor-pool decode stage (STUB — deterministic fake decode).

    Real deployments replace `_decode` with Pillow / pyav and pass the
    object-store / fs client handle to __init__ (built once per actor,
    like the reference's pooled GDAL instances,
    versatiles_pipeline/src/operations/read/from_gdal/raster_source.rs:36-112).
    The fake emits payload bytes + dimensions as a pure function of the
    media_ref so tests are reproducible.
    """

    def __init__(self, payload_bytes: int = 64):
        self.payload_bytes = payload_bytes

    def _decode(self, media_ref: str, kind: str):
        seed = abs(hash_stable(media_ref)) % (1 << 31)
        rng = np.random.default_rng(seed)
        payload = rng.integers(0, 256, size=self.payload_bytes, dtype=np.uint8).tobytes()
        width = 16 + seed % 64 if kind == "image" else 0
        height = 16 + (seed // 64) % 64 if kind == "image" else 0
        return payload, width, height

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        kinds = batch["kind"].to_pylist()
        payloads, widths, heights = [], [], []
        for ref, kind in zip(refs, kinds):
            p, w, h = self._decode(ref, kind)
            payloads.append(p)
            widths.append(w)
            heights.append(h)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "span_idx": batch["span_idx"],
                "kind": batch["kind"],
                "media_ref": batch["media_ref"],
                "payload": pa.array(payloads, type=pa.binary()),
                "width": pa.array(widths, type=pa.int64()),
                "height": pa.array(heights, type=pa.int64()),
                "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
            }
        )


def hash_stable(s: str) -> int:
    """Process-stable string hash (PYTHONHASHSEED-independent FNV-1a)."""
    h = 14695981039346656037
    for ch in s.encode():
        h = ((h ^ ch) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h & 0x7FFFFFFFFFFFFFFF


def decode_media(docs_ds, concurrency=4, batch_size=1024):
    """The multimodal decode pipeline: explode -> filter media -> decode pool.

    Small batch_size because decoded payloads are wide (binary) rows —
    the batch x concurrency product must fit worker heaps (SURVEY.md
    §7.4 hard part 4).
    """
    return media_spans(docs_ds).map_batches(
        FakeMediaDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
