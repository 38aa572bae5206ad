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
    # BI_BITFIELDS: HONOR the channel masks (real encoders emit RGBA
    # byte order too); only byte-aligned 0xFF lanes are supported
    lanes = (2, 1, 0, 3)  # default BGRA byte lanes (BI_RGB)
    if compression == 3:
        # masks sit at file offset 54 both when they follow a plain
        # BITMAPINFOHEADER and when the V2+/V4/V5 header embeds them;
        # an alpha mask exists only from V3 (hdr_size >= 56) on
        off = 54
        r_m, g_m, b_m = struct.unpack_from("<III", data, off)
        a_m = (struct.unpack_from("<I", data, off + 12)[0]
               if hdr_size >= 56 else 0)

        def _lane(mask, name):
            if mask == 0:
                return None
            shift = (mask.bit_length() - 8)
            if shift % 8 or mask != (0xFF << shift):
                raise NotImplementedError(
                    f"BMP bitfields {name} mask 0x{mask:08x} is not a "
                    "byte-aligned 8-bit lane")
            return shift // 8

        lanes = (_lane(r_m, "red"), _lane(g_m, "green"),
                 _lane(b_m, "blue"), _lane(a_m, "alpha"))
        if None in lanes[:3]:
            raise ValueError("BMP bitfields with a zero color mask")
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
    else:  # 32-bit: lanes from the bitfield masks (default BGRA);
        # an absent/all-zero alpha lane means "unused" -> opaque
        px = rows[:, : w * 4].reshape(h, w, 4)
        out[..., 0] = px[..., lanes[0]]
        out[..., 1] = px[..., lanes[1]]
        out[..., 2] = px[..., lanes[2]]
        if lanes[3] is None:
            out[..., 3] = 255
        else:
            alpha = px[..., lanes[3]]
            out[..., 3] = alpha if alpha.any() else 255
    return out
