"""Pure-stdlib GIF codec (GIF87a/GIF89a) — media-lake decode breadth
for the inline media pool (stages/multimodal.py) and the REAL video
leg (frame sampling over animations).

The reference's tile formats don't include GIF, but scraped media
corpora are full of them; this module implements what a training-data
pipeline needs from the public GIF89a specification:

- ``decode_gif``: first frame -> (H, W, 4) RGBA (image spans).
- ``decode_gif_frames``: FULL animation decode — logical-screen
  composition with per-frame graphic-control disposal (leave /
  restore-to-background / restore-to-previous), local color tables,
  transparency, interlace, per-frame delays — the input the video
  frame sampler needs.
- ``encode_gif``: GIF89a writer (global palette, full-rect frames
  rendered independently via disposal=2, NETSCAPE loop block) with a
  real variable-code-width LZW encoder; fixture source for the video
  pipeline and round-trip tests.

LZW is the spec's variable-width flavor (appendix F): LSB-first
packing, code width grows as the dictionary fills, 12-bit cap with a
frozen dictionary (deferred clear), clear/EOI codes.
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


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF variable-width LZW encoder — exact mirror of the decoder's
    dictionary bookkeeping. The width-growth check uses
    ``(1 << width) + 1`` because the decoder learns each new entry one
    code LATER than the encoder creates it (GIF is NOT early-change;
    that is TIFF's flavor). At 4096 the dictionary freezes (deferred
    clear) — both sides stop adding, so the one-code offset is moot."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict = {}
    next_code = eoi + 1
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nacc = 0

    def emit(code: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += width
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    emit(clear)
    prev = -1
    for b in indices.astype(np.uint8).tolist():
        if prev == -1:
            prev = b
            continue
        code = table.get((prev, b))
        if code is not None:
            prev = code
            continue
        emit(prev)
        if next_code < 4096:
            table[(prev, b)] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        prev = b
    if prev != -1:
        emit(prev)
    emit(eoi)
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))  # GIF 4-pass row order

# allocation bound for untrusted dimensions (~16.7M px = 67 MB RGBA;
# far above real-world GIFs, far below an OOM)
_MAX_PIXELS = 1 << 24
# total decoded pixels across an animation (the per-frame bound alone
# would let a 10k-frame bomb through the video sampler)
_MAX_TOTAL_PIXELS = 1 << 26


def _decode_frame_grid(data: bytes, pos: int):
    """Parse one image descriptor at ``pos`` (past the 0x2C byte):
    returns (left, top, palette-index grid, local table or None,
    new pos)."""
    left, top, w, h, iflags = struct.unpack_from("<HHHHB", data, pos)
    pos += 9
    if w * h > _MAX_PIXELS:
        raise ValueError(f"GIF frame {w}x{h} exceeds the decoder limit")
    table = None
    if iflags & 0x80:
        table, pos = _color_table(data, pos, 2 << (iflags & 0x07))
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
        idx = np.concatenate([idx, np.zeros(w * h - idx.size, np.uint8)])
    grid = idx.reshape(h, w)
    if iflags & 0x40:  # interlaced: reorder rows per spec
        de = np.empty_like(grid)
        r = 0
        for start, step in _INTERLACE:
            for rr in range(start, h, step):
                de[rr] = grid[r]
                r += 1
        grid = de
    return left, top, grid, table, pos


def decode_gif_frames(data: bytes, max_frames: int | None = None):
    """GIF bytes -> (frames, delays_cs): full animation decode.

    Each frame is the COMPOSED logical screen as (H, W, 4) RGBA —
    what a viewer shows at that point in time — with the per-frame
    graphic-control semantics applied: transparent pixels leave the
    canvas unchanged, disposal 0/1 leaves the rendered frame, 2
    restores the frame rect to (transparent) background, 3 restores
    the canvas to its pre-frame state. ``delays_cs`` is the per-frame
    delay in centiseconds (0 when the file carries none). Stops after
    ``max_frames`` composed frames when given — the video sampler's
    cap — without decoding the rest of the stream."""
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
    canvas = np.zeros((sh, sw, 4), dtype=np.uint8)
    frames: list[np.ndarray] = []
    delays: list[int] = []
    # pending graphic-control state (applies to the NEXT frame only)
    transparent = -1
    disposal = 0
    delay = 0
    budget = _MAX_TOTAL_PIXELS
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-blocks
            label = data[pos]
            pos += 1
            if label == 0xF9 and pos + 4 < len(data) and data[pos] >= 4:
                gflags = data[pos + 1]  # graphic control
                disposal = (gflags >> 2) & 0x07
                delay = struct.unpack_from("<H", data, pos + 2)[0]
                transparent = data[pos + 4] if gflags & 0x01 else -1
            while pos < len(data) and data[pos]:  # skip sub-blocks
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            left, top, grid, local, pos = _decode_frame_grid(data, pos)
            budget -= grid.size
            if budget < 0:
                raise ValueError(
                    "GIF animation exceeds the total pixel budget")
            table = local if local is not None else gct
            if table is None:
                raise ValueError("GIF frame has no color table")
            if int(grid.max(initial=0)) >= len(table):
                raise ValueError("GIF palette index out of range")
            # clip to the logical screen (malformed offsets included)
            grid = grid[: max(sh - top, 0), : max(sw - left, 0)]
            h, w = grid.shape
            saved = canvas[top : top + h, left : left + w].copy() \
                if disposal == 3 else None
            region = canvas[top : top + h, left : left + w]
            if 0 <= transparent < len(table):
                opaque = grid != transparent
            else:
                opaque = np.ones(grid.shape, dtype=bool)
            region[opaque, :3] = table[grid[opaque]]
            region[opaque, 3] = 255
            frames.append(canvas.copy())
            delays.append(delay)
            if disposal == 2:  # restore to background = transparent
                canvas[top : top + h, left : left + w] = 0
            elif disposal == 3 and saved is not None:
                canvas[top : top + h, left : left + w] = saved
            # graphic-control state is one-shot per spec
            transparent = -1
            disposal = 0
            delay = 0
            if max_frames is not None and len(frames) >= max_frames:
                break
        elif block == 0x3B:  # trailer
            break
        elif block == 0x00:  # stray padding byte: tolerate
            continue
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    if not frames:
        raise ValueError("GIF stream carries no image frame")
    return frames, delays


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes -> (H, W, 4) RGBA of the first frame, composed onto
    the logical screen (background transparent where uncovered)."""
    frames, _ = decode_gif_frames(data, max_frames=1)
    return frames[0]


def encode_gif(frames, delays_cs=None, loop: int | None = 0) -> bytes:
    """Encode (H, W, 4) RGBA frame(s) -> GIF89a bytes.

    Every frame is written full-rect with disposal=2 (restore to
    background), so each composed frame is exactly the input frame
    with alpha binarized at 128 — the layout ``decode_gif_frames``
    round-trips losslessly. One GLOBAL palette is built from the
    opaque colors of all frames; > 255 distinct colors is an honest
    gate (this is a fixture/tile writer, not a quantizer). ``loop``
    writes the NETSCAPE2.0 loop-count block (0 = forever; None =
    no block, single play)."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("encode_gif needs at least one frame")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape != (h, w, 4):
            raise ValueError("all GIF frames must be (H, W, 4) RGBA "
                             "of one size")
    if delays_cs is None:
        delays_cs = [0] * len(frames)
    if len(delays_cs) != len(frames):
        raise ValueError("one delay per frame")

    any_transparent = any(bool((f[..., 3] < 128).any()) for f in frames)
    # palette: unique opaque RGB across all frames (+ slot 0 reserved
    # for transparency when needed)
    rgb = np.concatenate([
        f[f[..., 3] >= 128][:, :3].reshape(-1, 3) for f in frames
    ]) if any(len(f) for f in frames) else np.zeros((0, 3), np.uint8)
    palette = np.unique(rgb.reshape(-1, 3), axis=0) if rgb.size else \
        np.zeros((1, 3), np.uint8)
    limit = 255 if any_transparent else 256
    if len(palette) > limit:
        raise ValueError(
            f"encode_gif: {len(palette)} distinct colors exceed the "
            f"{limit}-entry GIF palette (quantize upstream)")
    offset = 1 if any_transparent else 0
    n_entries = len(palette) + offset
    # GCT size is 2 << n: round up, min 2 entries
    gct_bits = max(1, int(np.ceil(np.log2(max(n_entries, 2)))))
    gct_size = 1 << gct_bits
    gct = np.zeros((gct_size, 3), np.uint8)
    gct[offset : offset + len(palette)] = palette

    # color -> index lookup via a packed-int sort
    packed = (palette[:, 0].astype(np.int64) << 16) | \
             (palette[:, 1].astype(np.int64) << 8) | palette[:, 2]
    order = np.argsort(packed)
    packed_sorted = packed[order]

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((gct_bits - 1) & 7) << 4
                       | (gct_bits - 1), 0, 0)
    out += gct.tobytes()
    if loop is not None and len(frames) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01" + \
            struct.pack("<H", loop) + b"\x00"
    min_code = max(2, gct_bits)
    for f, delay in zip(frames, delays_cs):
        opaque = f[..., 3] >= 128
        pix = (f[..., 0].astype(np.int64) << 16) | \
              (f[..., 1].astype(np.int64) << 8) | f[..., 2].astype(np.int64)
        idx = np.zeros((h, w), np.uint8)
        if opaque.any():
            pos_in_sorted = np.searchsorted(packed_sorted, pix[opaque])
            idx[opaque] = (order[pos_in_sorted] + offset).astype(np.uint8)
        # graphic control: disposal=2, transparency index 0 when used
        gflags = (2 << 2) | (1 if any_transparent else 0)
        out += b"\x21\xf9\x04" + bytes([gflags]) + \
            struct.pack("<H", int(delay)) + bytes([0, 0])
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += bytes([min_code])
        blob = _lzw_encode(idx.reshape(-1), min_code)
        for i in range(0, len(blob), 255):
            chunk = blob[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
