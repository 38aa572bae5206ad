"""GIF and BMP decoders (core/gif.py, core/bmp.py) — media-lake
decode breadth. Fixtures are hand-packed per the public specs with an
independent in-test LZW bit-writer (literal codes + CLEAR resets, the
'uncompressed GIF' technique), plus one hand-derived compressed
stream exercising the KwKwK rule."""

import struct

import numpy as np
import pytest

from versatiles_rs_ray.core.bmp import decode_bmp
from versatiles_rs_ray.core.formats import sniff_format
from versatiles_rs_ray.core.gif import decode_gif


class _BitWriter:
    """LSB-first GIF code packer."""

    def __init__(self):
        self.acc = 0
        self.n = 0
        self.out = bytearray()

    def put(self, code, width):
        self.acc |= code << self.n
        self.n += width
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def done(self):
        if self.n:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_literals(pixels, min_code):
    """Independent encoder: literal codes with CLEAR before the
    dictionary would force a width bump — decoders must honor it."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    bw = _BitWriter()
    bw.put(clear, width)
    next_code = eoi + 1
    for p in pixels:
        if next_code >= (1 << width) - 1:  # keep width fixed
            bw.put(clear, width)
            next_code = eoi + 1
        bw.put(int(p), width)
        next_code += 1
    bw.put(eoi, width)
    return bw.done()


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


def _gif(pixels, w, h, palette, *, interlace=False, transparent=None,
         min_code=2, lzw=None):
    flags = 0x80 | (max((len(palette) - 1).bit_length(), 1) - 1)
    hdr = b"GIF89a" + struct.pack("<HHBBB", w, h, flags, 0, 0)
    pal = bytearray()
    size = 2 << (flags & 7)
    for rgb in palette:
        pal.extend(rgb)
    pal.extend(b"\x00" * (3 * size - len(pal)))
    gce = b""
    if transparent is not None:
        gce = b"\x21\xf9\x04\x01\x00\x00" + bytes([transparent, 0])
    idesc = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h,
                                  0x40 if interlace else 0)
    body = lzw if lzw is not None else _lzw_literals(pixels, min_code)
    return (hdr + bytes(pal) + gce + idesc + bytes([min_code])
            + _sub_blocks(body) + b"\x3b")


PAL = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 8, 7)]


def test_gif_literal_stream_and_palette():
    pix = np.array([[0, 1, 2, 3], [3, 2, 1, 0], [1, 1, 2, 2]], np.uint8)
    data = _gif(pix.reshape(-1), 4, 3, PAL)
    assert sniff_format(data) == "gif"
    arr = decode_gif(data)
    assert arr.shape == (3, 4, 4) and (arr[..., 3] == 255).all()
    assert np.array_equal(arr[..., :3],
                          np.asarray(PAL, np.uint8)[pix])


def test_gif_transparency_and_interlace():
    pix = np.arange(32, dtype=np.uint8) % 4
    grid = pix.reshape(8, 4)
    data = _gif(grid.reshape(-1), 4, 8, PAL, transparent=2)
    arr = decode_gif(data)
    assert np.array_equal(arr[..., 3] == 0, grid == 2)
    # interlaced: rows are STORED in pass order; the decoder must
    # scatter them back — build the stored order independently
    order = ([r for r in range(0, 8, 8)] + [r for r in range(4, 8, 8)]
             + [r for r in range(2, 8, 4)] + [r for r in range(1, 8, 2)])
    stored = grid[order]
    data = _gif(stored.reshape(-1), 4, 8, PAL, interlace=True)
    arr = decode_gif(data)
    assert np.array_equal(arr[..., :3], np.asarray(PAL, np.uint8)[grid])


def test_gif_kwkwk_hand_stream():
    """[1,1,1,1] encodes (spec LZW) as CLEAR,1,6,1,EOI where 6 is the
    not-yet-defined next code — the KwKwK rule."""
    bw = _BitWriter()
    for code in (4, 1, 6, 1, 5):
        bw.put(code, 3)
    data = _gif(None, 4, 1, PAL, lzw=bw.done())
    arr = decode_gif(data)
    assert np.array_equal(arr[..., :3].reshape(4, 3),
                          np.tile(np.asarray(PAL[1], np.uint8), (4, 1)))


def test_gif_gates_and_truncation():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"GIF00" + bytes(20))
    # truncated LZW decodes best-effort (padded), never raises
    full = _gif(np.zeros(16, np.uint8), 4, 4, PAL)
    arr = decode_gif(full[:-6] + b"\x3b")
    assert arr.shape == (4, 4, 4)


def _bmp(px_rows: bytes, w, h, bpp, palette=b"", top_down=False,
         compression=0):
    hdr_size = 40
    pixel_off = 14 + hdr_size + len(palette)
    body = px_rows
    file_hdr = b"BM" + struct.pack("<IHHI", pixel_off + len(body), 0, 0,
                                   pixel_off)
    info = struct.pack("<IiiHHIIiiII", hdr_size, w,
                       -h if top_down else h, 1, bpp, compression,
                       len(body), 2835, 2835, len(palette) // 4, 0)
    return file_hdr + info + palette + body


def test_bmp_24_and_32_and_palette():
    # 24-bit 2x2 bottom-up, stride padded to 8: stored bottom row first
    rows = (bytes([255, 0, 0]) + bytes([0, 255, 0]) + b"\x00\x00"   # bottom
            + bytes([0, 0, 255]) + bytes([9, 8, 7]) + b"\x00\x00")  # top
    data = _bmp(rows, 2, 2, 24)
    assert sniff_format(data) == "bmp"
    arr = decode_bmp(data)
    assert arr[1, 0].tolist() == [0, 0, 255, 255]  # BGR -> RGB
    assert arr[0, 0].tolist() == [255, 0, 0, 255]
    assert arr[0, 1].tolist() == [7, 8, 9, 255]
    # top-down flips storage
    arr2 = decode_bmp(_bmp(rows, 2, 2, 24, top_down=True))
    assert np.array_equal(arr2, arr[::-1])
    # 32-bit with all-zero alpha -> opaque convention
    rows32 = bytes([1, 2, 3, 0, 4, 5, 6, 0])
    arr = decode_bmp(_bmp(rows32, 2, 1, 32))
    assert arr[0, 0].tolist() == [3, 2, 1, 255]
    # 8-bit palette (BGRX entries)
    pal = bytes([10, 20, 30, 0, 200, 100, 50, 0])
    arr = decode_bmp(_bmp(bytes([0, 1, 1, 0]), 4, 1, 8, palette=pal))
    assert arr[0, 0].tolist() == [30, 20, 10, 255]
    assert arr[0, 1].tolist() == [50, 100, 200, 255]


def test_bmp_gates():
    with pytest.raises(NotImplementedError, match="compression"):
        decode_bmp(_bmp(b"\x00" * 8, 2, 1, 8, palette=b"\x00" * 8,
                        compression=1))  # RLE8
    with pytest.raises(NotImplementedError, match="bit depth"):
        decode_bmp(_bmp(b"\x00" * 8, 2, 1, 4))
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"XX" + bytes(64))


def test_media_pool_decodes_gif_bmp_and_survives_corruption(ray_session):
    import pyarrow as pa
    import ray.data

    from versatiles_rs_ray.stages.multimodal import MediaBytesDecoder

    gif_bytes = _gif(np.zeros(16, np.uint8), 4, 4, PAL)
    rows24 = bytes([255, 0, 0, 0, 255, 0, 0, 0])
    bmp_bytes = _bmp(rows24, 2, 1, 24)
    corrupt = b"GIF89a" + bytes(10)  # sniffs gif, fails decode
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "span_idx": pa.array([0, 0, 0], type=pa.int64()),
        "kind": pa.array(["image"] * 3, type=pa.string()),
        "media_ref": pa.array(["a", "b", "c"], type=pa.string()),
        "payload": pa.array([gif_bytes, bmp_bytes, corrupt],
                            type=pa.binary()),
    })
    out = (ray.data.from_arrow(t)
           .map_batches(MediaBytesDecoder, concurrency=(1, 1),
                        batch_format="pyarrow")
           .to_pandas().sort_values("doc_id"))
    assert out["width"].tolist() == [4, 2, 0]
    assert out["height"].tolist() == [4, 1, 0]
    assert bytes(out.iloc[2]["payload"]) == corrupt  # passthrough


def test_gif_dimension_bomb_rejected():
    """A ~40-byte crafted header claiming 65535x65535 must be
    rejected BEFORE any allocation (media-lake decompression bomb)."""
    data = _gif(np.zeros(4, np.uint8), 2, 2, PAL)
    bomb = bytearray(data)
    struct.pack_into("<HH", bomb, 6, 65535, 65535)       # screen
    with pytest.raises(ValueError, match="exceeds"):
        decode_gif(bytes(bomb))
    bomb = bytearray(data)
    # frame descriptor dims (after 13-byte header + 12-byte GCT)
    idesc = bytes(bomb).index(b"\x2c")
    struct.pack_into("<HH", bomb, idesc + 5, 65535, 65535)
    with pytest.raises(ValueError, match="exceeds"):
        decode_gif(bytes(bomb))


def test_bmp_bitfields_masks_honored():
    """BI_BITFIELDS with RGBA byte-order masks (real encoders emit
    this) must decode with the right channels, not silently swapped;
    non-byte-aligned masks gate."""
    # V3-size header (56) embedding 4 masks: R=0xFF G=0xFF00
    # B=0xFF0000 A=0xFF000000 (RGBA byte order)
    hdr_size = 56
    pixel_off = 14 + hdr_size
    raw = bytes([10, 20, 30, 200])  # R=10 G=20 B=30 A=200
    file_hdr = b"BM" + struct.pack("<IHHI", pixel_off + len(raw), 0, 0,
                                   pixel_off)
    info = struct.pack("<IiiHHIIiiII", hdr_size, 1, 1, 1, 32, 3,
                       len(raw), 2835, 2835, 0, 0)
    info += struct.pack("<IIII", 0xFF, 0xFF00, 0xFF0000, 0xFF000000)
    arr = decode_bmp(file_hdr + info + raw)
    assert arr[0, 0].tolist() == [10, 20, 30, 200]
    # standard BGRA masks keep the default lanes
    info2 = struct.pack("<IiiHHIIiiII", hdr_size, 1, 1, 1, 32, 3,
                        len(raw), 2835, 2835, 0, 0)
    info2 += struct.pack("<IIII", 0xFF0000, 0xFF00, 0xFF, 0xFF000000)
    arr = decode_bmp(file_hdr + info2 + raw)
    assert arr[0, 0].tolist() == [30, 20, 10, 200]
    # 5-6-5 style packed masks are not byte lanes -> honest gate
    info3 = struct.pack("<IiiHHIIiiII", hdr_size, 1, 1, 1, 32, 3,
                        len(raw), 2835, 2835, 0, 0)
    info3 += struct.pack("<IIII", 0xF800, 0x07E0, 0x001F, 0)
    with pytest.raises(NotImplementedError, match="byte-aligned"):
        decode_bmp(file_hdr + info3 + raw)
