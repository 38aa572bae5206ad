"""Externally-supplied media input: a directory (or file list) of
encoded image/audio/video payloads -> the multimodal pipeline's
(media_ref, kind, payload) schema.

This is the real-bytes counterpart of the synthetic fetcher in
stages/multimodal.py: `ray.data.read_binary_files` streams each file
as one opaque binary row (Ray plans one read task per file group, so
a 100 TB media lake shards across the cluster without a driver-side
listing loop), `media_ref` is the file path and `kind` is inferred
from the extension. Feed the result straight to
`stages.multimodal.decode_media_bytes` — the decode pool sniffs magic
bytes, so a mislabeled extension degrades to a passthrough row, never
a wrong decode. Mirrors the reference's per-file raster ingestion
(raster_source.rs:36-112) re-expressed as a Dataset source.
"""

from __future__ import annotations

import pyarrow as pa

_IMAGE_EXT = {"png", "jpg", "jpeg", "webp", "avif", "gif", "bmp", "tif",
              "tiff"}
_AUDIO_EXT = {"mp3", "wav", "flac", "ogg", "opus", "m4a"}
_VIDEO_EXT = {"mp4", "mkv", "webm", "avi", "mov"}


def kind_of(path: str) -> str:
    ext = path.rsplit(".", 1)[-1].lower() if "." in path else ""
    if ext in _IMAGE_EXT:
        return "image"
    if ext in _AUDIO_EXT:
        return "audio"
    if ext in _VIDEO_EXT:
        return "video"
    return "binary"


def _to_media_schema(batch: pa.Table) -> pa.Table:
    paths = batch["path"].to_pylist()
    return pa.table(
        {
            "media_ref": pa.array(paths, type=pa.string()),
            "kind": pa.array([kind_of(p) for p in paths], type=pa.string()),
            "payload": batch["bytes"].cast(pa.binary()),
        }
    )


def read_media_dir(paths, **read_kwargs):
    """Directory / file-list of media payloads -> Dataset of
    (media_ref, kind, payload). Extra kwargs pass to
    ray.data.read_binary_files (e.g. file_extensions=[...])."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True, **read_kwargs)
    return ds.map_batches(_to_media_schema, batch_format="pyarrow")
