"""Pure-stdlib GIF decoder (GIF87a/GIF89a, first frame) — media-lake
decode breadth for the inline media pool (stages/multimodal.py).

The reference's tile formats don't include GIF, but scraped media
corpora are full of them; this module implements the subset a
training-data pipeline needs — decode the FIRST frame to the engine's
RGBA interchange — from the public GIF89a specification: logical
screen + global/local color tables, graphic control extension
(transparency index, frame disposal ignored — single frame), image
descriptor with interlace, and variable-code-width LZW (clear/EOI
codes, 12-bit cap). Animation is out of scope by design: frame
sampling is a separate pipeline stage and no downstream consumer
takes multi-frame payloads.
"""

from __future__ import annotations

import struct

import numpy as np


def _color_table(data: bytes, pos: int, size: int):
    tbl = np.frombuffer(data, dtype=np.uint8, count=3 * size,
                        offset=pos).reshape(size, 3)
    return tbl, pos + 3 * size


def _lzw_decode(blob: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF variable-width LZW (spec appendix F): code width grows
    after the dictionary fills a power of two, clear code resets."""
    clear = 1 << min_code_size
    eoi = clear + 1
    # dictionary as (prefix_code, last_byte) arrays — appending to two
    # Python lists beats building byte strings per entry
    prefix = [-1] * 4096
    last = [0] * 4096
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    # 24-bit window reader over plain-int bytes (codes are <= 12 bits,
    # +7 alignment < 24) — the per-bit numpy scalar loop this replaces
    # was the media-pool hot spot, same class as the PNG unfilter fix
    by = list(blob) + [0, 0, 0]
    nbits = len(blob) * 8
    bitpos = 0

    def read_code(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            return eoi  # truncated stream: stop cleanly
        i = bitpos >> 3
        window = by[i] | (by[i + 1] << 8) | (by[i + 2] << 16)
        v = (window >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        return v

    width = min_code_size + 1
    next_code = eoi + 1
    prev = -1
    # decode an entry by walking the prefix chain (reversed)
    stack = bytearray()
    while n_out < n_pixels:
        code = read_code(width)
        if code == clear:
            width = min_code_size + 1
            next_code = eoi + 1
            prev = -1
            continue
        if code == eoi:
            break
        if code < clear:
            entry_first = code
            if n_out < n_pixels:
                out[n_out] = code
                n_out += 1
        elif code < next_code or (code == next_code and prev != -1):
            # walk chain; the code==next_code case is the KwKwK rule:
            # entry = prev chain + first byte of prev chain
            stack.clear()
            c = prev if code == next_code else code
            while c >= clear:
                stack.append(last[c])
                c = prefix[c]
            stack.append(c)
            entry_first = c
            if code == next_code:
                stack.insert(0, entry_first)
            k = len(stack)
            take = min(k, n_pixels - n_out)
            out[n_out : n_out + take] = np.frombuffer(
                bytes(stack[::-1][:take]), dtype=np.uint8)
            n_out += take
        else:
            raise ValueError("GIF LZW: code out of range")
        if prev != -1 and next_code < 4096:
            prefix[next_code] = prev
            last[next_code] = entry_first
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    return out[:n_out]


_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))  # GIF 4-pass row order

# allocation bound for untrusted dimensions (~16.7M px = 67 MB RGBA;
# far above real-world GIFs, far below an OOM)
_MAX_PIXELS = 1 << 24


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes -> (H, W, 4) RGBA of the first frame, composed onto
    the logical screen (background transparent where uncovered)."""
    if data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF stream")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    # untrusted header dims drive allocations: bound them BEFORE any
    # buffer is sized, or a 40-byte crafted file forces multi-GB
    # allocations in the media actor pool (decompression bomb)
    if sw * sh > _MAX_PIXELS:
        raise ValueError(
            f"GIF logical screen {sw}x{sh} exceeds the decoder limit "
            f"({_MAX_PIXELS} pixels)")
    pos = 13
    gct = None
    if flags & 0x80:
        gct, pos = _color_table(data, pos, 2 << (flags & 0x07))
    transparent = -1
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-blocks
            label = data[pos]
            pos += 1
            if label == 0xF9 and pos + 4 < len(data) and data[pos] >= 4:
                gflags = data[pos + 1]  # graphic control
                if gflags & 0x01:
                    transparent = data[pos + 4]
            while pos < len(data) and data[pos]:  # skip sub-blocks
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor: the first frame
            left, top, w, h, iflags = struct.unpack_from("<HHHHB", data, pos)
            pos += 9
            if w * h > _MAX_PIXELS:
                raise ValueError(
                    f"GIF frame {w}x{h} exceeds the decoder limit")
            table = gct
            if iflags & 0x80:
                table, pos = _color_table(data, pos, 2 << (iflags & 0x07))
            if table is None:
                raise ValueError("GIF frame has no color table")
            min_code = data[pos]
            pos += 1
            chunks = []
            # stop at buffer end: truncated files decode best-effort
            while pos < len(data) and data[pos]:
                n = data[pos]
                chunks.append(data[pos + 1 : pos + 1 + n])
                pos += 1 + n
            pos += 1
            idx = _lzw_decode(b"".join(chunks), min_code, w * h)
            if idx.size < w * h:  # truncated: pad with background
                idx = np.concatenate(
                    [idx, np.zeros(w * h - idx.size, np.uint8)])
            grid = idx.reshape(h, w)
            if iflags & 0x40:  # interlaced: reorder rows per spec
                de = np.empty_like(grid)
                r = 0
                for start, step in _INTERLACE:
                    rows = range(start, h, step)
                    for rr in rows:
                        de[rr] = grid[r]
                        r += 1
                grid = de
            if int(grid.max(initial=0)) >= len(table):
                raise ValueError("GIF palette index out of range")
            rgba = np.zeros((sh, sw, 4), dtype=np.uint8)
            frame = np.empty((h, w, 4), dtype=np.uint8)
            frame[..., :3] = table[grid]
            frame[..., 3] = 255
            if 0 <= transparent < len(table):
                frame[..., 3] = np.where(grid == transparent, 0, 255)
            rgba[top : top + h, left : left + w] = frame[: sh - top, : sw - left]
            return rgba
        elif block == 0x3B:  # trailer before any frame
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF stream carries no image frame")
