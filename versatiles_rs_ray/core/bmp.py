"""Pure-stdlib BMP decoder — media-lake decode breadth for the inline
media pool (stages/multimodal.py).

Windows BITMAPINFOHEADER (and the larger V4/V5 headers, which extend
it compatibly) with BI_RGB 8-bit palette / 24-bit / 32-bit rows,
bottom-up and top-down, 4-byte row padding — the classes that appear
in scraped corpora. Compressed BMPs (RLE4/RLE8/bitfields) raise
NotImplementedError naming the capability (the repo's gating
convention)."""

from __future__ import annotations

import struct

import numpy as np


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes -> (H, W, 4) RGBA."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP stream")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError(
            f"BMP header size {hdr_size} (OS/2 BITMAPCOREHEADER) not "
            "supported; BITMAPINFOHEADER and later only")
    w, h_raw = struct.unpack_from("<iI", data, 18)
    h_signed = struct.unpack_from("<i", data, 22)[0]
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression not in (0, 3) or (compression == 3 and bpp not in (32,)):
        raise NotImplementedError(
            f"BMP compression {compression} not supported (BI_RGB and "
            "32-bit BI_BITFIELDS only)")
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"BMP bit depth {bpp} not supported "
                                  "(8/24/32)")
    top_down = h_signed < 0
    h = abs(h_signed)
    if w <= 0 or h == 0:
        raise ValueError("BMP with non-positive dimensions")
    palette = None
    if bpp == 8:
        n_colors = struct.unpack_from("<I", data, 46)[0] or 256
        pal_off = 14 + hdr_size
        palette = np.frombuffer(
            data, dtype=np.uint8, count=4 * n_colors,
            offset=pal_off).reshape(n_colors, 4)  # BGRX
    stride = ((w * bpp + 31) // 32) * 4
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * h, offset=pixel_off
    ).reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    out = np.empty((h, w, 4), dtype=np.uint8)
    if bpp == 8:
        idx = rows[:, :w].astype(np.int64)
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("BMP palette index out of range")
        out[..., 0] = palette[idx][..., 2]  # palette is BGRX
        out[..., 1] = palette[idx][..., 1]
        out[..., 2] = palette[idx][..., 0]
        out[..., 3] = 255
    elif bpp == 24:
        px = rows[:, : w * 3].reshape(h, w, 3)  # BGR
        out[..., 0] = px[..., 2]
        out[..., 1] = px[..., 1]
        out[..., 2] = px[..., 0]
        out[..., 3] = 255
    else:  # 32-bit BGRA (alpha meaningful only in V4/V5; treat 0s as
        # the common "unused" convention -> opaque when ALL zero)
        px = rows[:, : w * 4].reshape(h, w, 4)
        out[..., 0] = px[..., 2]
        out[..., 1] = px[..., 1]
        out[..., 2] = px[..., 0]
        alpha = px[..., 3]
        out[..., 3] = alpha if alpha.any() else 255
    return out
