"""Pure-stdlib PNG codec (zlib) — encodes 8-bit L / LA / RGB / RGBA;
decodes additionally palette (PLTE/tRNS), 1/2/4-bit grey+palette and
16-bit (high-byte fold) foreign files.

Un-gates the raster surface in this sandbox: the reference encodes
PNG via the `png` crate (versatiles_image/src/format/png.rs, used by
`raster_format`, all.rs:32-54); no image libraries ship in this
container, so this module implements the subset the reference uses —
8-bit greyscale/alpha/truecolor, non-interlaced — from the public PNG
specification (RFC 2083 / ISO 15948) on numpy + zlib only.

Determinism contract: fixed zlib level, per-row filter chosen by the
standard minimum-sum-of-absolute-differences heuristic restricted to
filters {None, Sub, Up} (all three vectorize on decode as well), so
output bytes are identical across workers and runs. The decoder
accepts ALL five filter types (Average/Paeth appear in foreign files;
they take a per-row pixel loop — correct, just not our hot path).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_LEVEL = 6  # fixed zlib level -> deterministic bytes

# color type <-> channel count (8-bit only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 3: 2, 2: 4, 4: 6}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, compress_level: int = _LEVEL) -> bytes:
    """numpy (H, W) or (H, W, C) uint8 -> PNG bytes.

    C in {1: L, 2: LA, 3: RGB, 4: RGBA}. Per-row adaptive filtering
    over {0 None, 1 Sub, 2 Up} by the minimum-absolute-sum heuristic,
    computed for the whole image vectorized.
    """
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {c}")
    color_type = _COLOR_TYPE[c]
    flat = arr.reshape(h, w * c)

    # candidate filters, whole-image vectorized
    f0 = flat
    f1 = flat.copy()
    f1[:, c:] = flat[:, c:] - flat[:, :-c]  # uint8 wrap == mod 256
    f2 = flat.copy()
    f2[1:] = flat[1:] - flat[:-1]
    # heuristic score: sum of |signed byte| per row
    def score(x):
        return np.abs(x.astype(np.int8).astype(np.int32)).sum(axis=1)

    scores = np.stack([score(f0), score(f1), score(f2)])  # (3, H)
    choice = np.argmin(scores, axis=0).astype(np.uint8)  # first minimum -> deterministic
    stacked = np.stack([f0, f1, f2])  # (3, H, W*C)
    filtered = stacked[choice, np.arange(h)]  # (H, W*C)
    raw = np.concatenate([choice[:, None], filtered], axis=1)  # filter byte + row

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(raw.tobytes(), compress_level)
    return _SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


# Adam7 pass grid: (x_start, y_start, x_step, y_step) per the PNG
# spec §8.2 — each pass is an independent sub-image with its own
# filtered scanlines; empty passes contribute no bytes at all.
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _unfilter(rows: np.ndarray, stride: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering for one (sub-)image.

    `rows` is (h, stride+1) — filter byte + filtered bytes per line.
    All five filters supported ({0,1,2} vectorized; 3/4 per-pixel for
    foreign files); filtering is byte-level per the spec, so this one
    loop serves every depth.
    """
    h = rows.shape[0]
    filters = rows[:, 0]
    out = np.empty((h, stride), dtype=np.uint8)
    for r in range(h):
        f = filters[r]
        line = rows[r, 1:].copy()
        prev = out[r - 1] if r else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            out[r] = line
        elif f == 1:  # Sub: prefix sum per byte lane (mod 256)
            lanes = line.reshape(stride // bpp, bpp)
            out[r] = (
                np.cumsum(lanes.astype(np.uint64), axis=0)
                .astype(np.uint8)
                .reshape(stride)
            )
        elif f == 2:  # Up
            out[r] = line + prev
        elif f == 3:  # Average (sequential in x: plain-int lists beat
            # numpy scalar indexing ~10x here; foreign encoders emit
            # these filters — ours never does)
            ln, pr = line.tolist(), prev.tolist()
            rec = [0] * stride
            for i in range(bpp):
                rec[i] = (ln[i] + (pr[i] >> 1)) & 0xFF
            for i in range(bpp, stride):
                rec[i] = (ln[i] + ((rec[i - bpp] + pr[i]) >> 1)) & 0xFF
            out[r] = rec
        elif f == 4:  # Paeth (same treatment, predictor inlined)
            ln, pr = line.tolist(), prev.tolist()
            rec = [0] * stride
            for i in range(bpp):
                rec[i] = (ln[i] + pr[i]) & 0xFF  # paeth(0, up, 0) == up
            for i in range(bpp, stride):
                a, b, cc = rec[i - bpp], pr[i], pr[i - bpp]
                p = a + b - cc
                pa = p - a if p >= a else a - p
                pb = p - b if p >= b else b - p
                pc = p - cc if p >= cc else cc - p
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = cc
                rec[i] = (ln[i] + pred) & 0xFF
            out[r] = rec
        else:
            raise ValueError(f"bad filter byte {f}")
    return out


def _bytes_to_samples(out, ph, pw, spp, bit_depth):
    """Unfiltered scanline bytes -> (ph, pw, spp) uint8 sample codes
    (sub-8-bit values NOT yet range-expanded; 16-bit folded to the
    high byte — the engine's defined 16->8 fold)."""
    if bit_depth < 8:
        bits = np.unpackbits(out, axis=1)[:, : pw * bit_depth]
        weights = (1 << np.arange(bit_depth - 1, -1, -1)).astype(np.uint8)
        vals = (bits.reshape(ph, pw, bit_depth) * weights).sum(axis=2)
        return vals.astype(np.uint8)[:, :, None]
    if bit_depth == 16:
        arr16 = out.reshape(ph, pw, spp, 2)
        return np.ascontiguousarray(arr16[..., 0])
    return out.reshape(ph, pw, spp)


def decode_png(data: bytes) -> tuple:
    """PNG bytes -> (array (H, W, C) uint8, color_type).

    Color types 0/2/3/4/6 at bit depths 1/2/4 (grey + palette), 8 and
    16 (high byte kept — 8-bit is the engine's interchange), both
    sequential and Adam7-interlaced (foreign files; the encoder never
    emits interlace). Palette rows come back expanded to RGB (RGBA
    when a tRNS chunk is present) with the original color_type 3 so
    callers can still see the source class.
    """
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    w = h = None
    color_type = None
    bit_depth = 8
    interlace = 0
    palette = None
    trns = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if color_type not in (0, 2, 3, 4, 6):
                raise ValueError(f"unsupported color type {color_type}")
            if bit_depth not in (1, 2, 4, 8, 16) or (
                bit_depth < 8 and color_type not in (0, 3)
            ) or (bit_depth == 16 and color_type == 3):
                raise ValueError(
                    f"unsupported depth {bit_depth} for color type {color_type}")
            if interlace not in (0, 1):
                raise ValueError(f"unknown interlace method {interlace}")
        elif tag == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(body, dtype=np.uint8)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    # samples per pixel in the coded stream (palette codes 1 index)
    spp = 1 if color_type == 3 else _CHANNELS[color_type]
    bpp = max(1, (spp * bit_depth) // 8)     # filter offset, per spec
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if interlace == 0:
        stride = (w * spp * bit_depth + 7) // 8  # scanline bytes
        out = _unfilter(raw.reshape(h, stride + 1), stride, bpp)
        full = _bytes_to_samples(out, h, w, spp, bit_depth)
    else:  # Adam7: 7 independently-filtered sub-images, scattered
        # back onto the pass grid (spec §8.2)
        full = np.empty((h, w, spp), dtype=np.uint8)
        off = 0
        for xs, ys, xstep, ystep in _ADAM7:
            pw = (w - xs + xstep - 1) // xstep
            ph = (h - ys + ystep - 1) // ystep
            if pw <= 0 or ph <= 0:
                continue
            stride = (pw * spp * bit_depth + 7) // 8
            nbytes = ph * (stride + 1)
            rows = raw[off : off + nbytes].reshape(ph, stride + 1)
            off += nbytes
            out = _unfilter(rows, stride, bpp)
            full[ys::ystep, xs::xstep] = _bytes_to_samples(
                out, ph, pw, spp, bit_depth)
    if bit_depth < 8:
        if color_type == 3:
            samples = full[..., 0]
        else:  # grey: expand the sample range to full 8 bits
            scale = np.uint16(255 // ((1 << bit_depth) - 1))
            return (full * scale).astype(np.uint8), color_type
    elif color_type != 3:
        return full, color_type
    else:
        samples = full[..., 0]
    # palette expansion (color_type 3): PLTE rgb + optional tRNS alpha
    if palette is None:
        raise ValueError("palette PNG missing PLTE chunk")
    idx = samples.astype(np.int64)
    if idx.max() >= len(palette):
        raise ValueError("palette index out of range")
    rgb = palette[idx]
    if trns is None:
        return rgb, color_type
    alpha = np.full(len(palette), 255, dtype=np.uint8)
    alpha[: len(trns)] = trns
    return np.concatenate([rgb, alpha[idx][..., None]], axis=2), color_type


def decode_png_rgba(data: bytes, native: bool = True) -> np.ndarray:
    """PNG bytes -> (H, W, 4) RGBA (greyscale/opaque expanded).

    Fast path: the compiled libpng shim (core/imgshim.py), verified
    BIT-EXACT against this decoder at probe time (PNG is lossless and
    the shim's transforms mirror our conventions: high-byte 16-bit
    fold, bit-replication grey expansion). Falls back to the pure
    path when the shim is absent or rejects the stream; native=False
    forces pure (the shim's own verify does, to avoid recursion)."""
    if native:
        from .imgshim import decode_png_rgba_native

        out = decode_png_rgba_native(data)
        if out is not None:
            return out
    arr, color_type = decode_png(data)
    h, w, c = arr.shape
    out = np.empty((h, w, 4), dtype=np.uint8)
    if c == 1:  # L
        out[..., :3] = arr
        out[..., 3] = 255
    elif c == 2:  # LA
        out[..., :3] = arr[..., :1]
        out[..., 3] = arr[..., 1]
    elif c == 3:  # RGB
        out[..., :3] = arr
        out[..., 3] = 255
    else:
        out[:] = arr
    return out


def encode_png_auto(arr: np.ndarray, compress_level: int = _LEVEL) -> bytes:
    """Encode RGBA with automatic mode narrowing: drop the alpha
    channel when fully opaque and collapse to greyscale when R=G=B —
    the smallest exact representation (same policy as the reference's
    `best` simplification in versatiles_image convert.rs:23-43)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        return encode_png(arr, compress_level)
    h, w, c = arr.shape
    if c == 4:
        opaque = bool((arr[..., 3] == 255).all())
        grey = bool(
            (arr[..., 0] == arr[..., 1]).all() and (arr[..., 1] == arr[..., 2]).all()
        )
        if opaque and grey:
            return encode_png(arr[..., 0], compress_level)
        if opaque:
            return encode_png(arr[..., :3], compress_level)
        if grey:
            return encode_png(arr[..., [0, 3]], compress_level)
    return encode_png(arr, compress_level)
