"""Pure-stdlib AVI (RIFF) container parser + minimal writer — the REAL
video leg of the media pipeline (stages/multimodal.py).

Scraped video corpora are dominated by container formats the sandbox
has no codecs for, but MJPEG-in-AVI — every frame an independent
baseline JPEG — is decodable end-to-end with this engine's own JPEG
codec (core/jpeg.py + the libjpeg shim), and uncompressed DIB frames
are plain bottom-up BGR rows. From the public AVI RIFF specification
(msdn 'AVI RIFF File Reference'):

- ``parse_avi``: RIFF('AVI ') walk — LIST hdrl (avih MainAVIHeader,
  strl/strh/strf per stream), LIST movi frame chunks ('##dc'/'##db'
  for the video stream), idx1 ignored (the movi scan is
  self-sufficient and survives files with absent/stale indexes).
- ``decode_avi_frame``: one frame -> (H, W, 4) RGBA. MJPG frames pass
  through ``ensure_jpeg_dht`` first: MJPEG streams conventionally OMIT
  the Huffman tables (OpenDML spec: decoders must supply the ITU-T
  T.81 Annex K defaults), so the standard tables are spliced in before
  the SOS marker when the frame carries no DHT.
- ``encode_avi``: minimal single-video-stream writer (MJPG via the
  engine's JPEG encoder, or raw DIB) with a well-formed idx1 — the
  fixture source; readers are additionally validated against a
  hand-packed byte fixture in tests (same independence rule as the
  NetCDF reader).

Frame extraction is LAZY: ``parse_avi`` records (offset, size) spans
only, so the video frame sampler decodes just the sampled frames —
the property that makes uniform sampling over long clips cheap.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import (
    _AC_CHROMA_BITS,
    _AC_CHROMA_VALS,
    _AC_LUMA_BITS,
    _AC_LUMA_VALS,
    _DC_CHROMA_BITS,
    _DC_CHROMA_VALS,
    _DC_LUMA_BITS,
    _DC_LUMA_VALS,
    decode_jpeg,
    encode_jpeg,
)

# pixel bound for untrusted header dims (same class as the GIF guard)
_MAX_PIXELS = 1 << 24


def _std_dht() -> bytes:
    """The four ITU-T T.81 Annex K Huffman tables as DHT segments —
    what an MJPEG decoder must supply when a frame omits them."""
    segs = []
    for tc_th, bits, vals in (
        (0x00, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS),
        (0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ):
        body = bytes([tc_th] + bits + vals)
        segs.append(struct.pack(">BBH", 0xFF, 0xC4, len(body) + 2) + body)
    return b"".join(segs)


_STD_DHT = _std_dht()


def ensure_jpeg_dht(frame: bytes) -> bytes:
    """Splice the standard Annex K DHT segments before SOS when an
    (M)JPEG frame carries no Huffman tables. Frames that already have
    DHT pass through untouched."""
    if frame[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG frame (missing SOI)")
    i = 2
    n = len(frame)
    while i + 4 <= n:
        if frame[i] != 0xFF:
            i += 1
            continue
        marker = frame[i + 1]
        if marker == 0xFF:  # T.81 B.1.1.2 fill byte, not a marker
            i += 1
            continue
        if marker == 0xC4:
            return frame  # has its own tables
        if marker == 0xDA:  # SOS: no DHT seen — inject
            return frame[:i] + _STD_DHT + frame[i:]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        ln = struct.unpack_from(">H", frame, i + 2)[0]
        i += 2 + ln
    return frame  # malformed: let the decoder produce the real error


class AviInfo:
    """Parsed container metadata + lazy frame spans."""

    __slots__ = ("width", "height", "fps", "fourcc", "bit_count",
                 "frames", "n_frames", "top_down")

    def __init__(self, width, height, fps, fourcc, bit_count, frames,
                 top_down=False):
        self.width = width
        self.height = height
        self.fps = fps
        self.fourcc = fourcc
        self.bit_count = bit_count
        self.frames = frames  # list[(offset, size)] into the raw bytes
        self.n_frames = len(frames)
        self.top_down = top_down  # negative biHeight: rows top-first


def _chunks(data: bytes, pos: int, end: int):
    """Iterate RIFF chunks (fourcc, body_start, body_size) in
    [pos, end); bodies are word-aligned (odd sizes pad one byte)."""
    while pos + 8 <= end:
        cc = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = pos + 8
        if body + size > end:
            break  # truncated file: stop cleanly
        yield cc, body, size
        pos = body + size + (size & 1)


def parse_avi(data: bytes) -> AviInfo:
    """AVI bytes -> AviInfo. Only the FIRST video ('vids') stream is
    mapped; audio and extra streams are skipped (this is a frame
    sampler's input, not a demuxer)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI stream")
    riff_size = struct.unpack_from("<I", data, 4)[0]
    end = min(len(data), 8 + riff_size)

    width = height = 0
    fps = 0.0
    fourcc = b"\x00\x00\x00\x00"
    bit_count = 24
    top_down = False
    video_stream = -1
    frames: list[tuple[int, int]] = []
    micro_per_frame = 0

    def walk_hdrl(pos, hend):
        nonlocal width, height, fps, fourcc, bit_count, video_stream, \
            micro_per_frame, top_down
        stream_no = 0
        for cc, body, size in _chunks(data, pos, hend):
            if cc == b"avih" and size >= 40:
                micro_per_frame, = struct.unpack_from("<I", data, body)
                w, h = struct.unpack_from("<II", data, body + 32)
                width, height = width or w, height or h
            elif cc == b"LIST" and data[body : body + 4] == b"strl":
                fcc_type = handler = None
                scale = rate = 0
                for scc, sbody, ssize in _chunks(data, body + 4, body + size):
                    if scc == b"strh" and ssize >= 36:
                        fcc_type = data[sbody : sbody + 4]
                        handler = data[sbody + 4 : sbody + 8]
                        scale, rate = struct.unpack_from(
                            "<II", data, sbody + 20)
                    elif scc == b"strf" and ssize >= 36 and \
                            fcc_type == b"vids":
                        (_bisize, bw, bh, _planes, bc) = struct.unpack_from(
                            "<IiiHH", data, sbody)
                        comp = data[sbody + 16 : sbody + 20]
                        if video_stream < 0:
                            video_stream = stream_no
                            width, height = abs(bw), abs(bh)
                            top_down = bh < 0
                            bit_count = bc
                            fourcc = comp if comp.strip(b"\x00") else handler
                            if rate and scale:
                                fps = rate / scale
                stream_no += 1

    for cc, body, size in _chunks(data, 12, end):
        if cc != b"LIST":
            continue
        kind = data[body : body + 4]
        if kind == b"hdrl":
            walk_hdrl(body + 4, body + size)
        elif kind == b"movi":
            sid = (b"%02d" % video_stream) if video_stream >= 0 else b"00"
            for mcc, mbody, msize in _chunks(data, body + 4, body + size):
                if mcc == b"LIST":  # 'rec ' grouping: descend one level
                    for rcc, rbody, rsize in _chunks(
                            data, mbody + 4, mbody + msize):
                        if rcc[:2] == sid and rcc[2:4] in (b"dc", b"db"):
                            frames.append((rbody, rsize))
                elif mcc[:2] == sid and mcc[2:4] in (b"dc", b"db"):
                    frames.append((mbody, msize))

    if video_stream < 0:
        raise ValueError("AVI carries no video stream")
    if width * height > _MAX_PIXELS:
        raise ValueError(
            f"AVI frame {width}x{height} exceeds the decoder limit")
    if not fps and micro_per_frame:
        fps = 1e6 / micro_per_frame
    fcc = fourcc.decode("ascii", "replace").strip("\x00 ").upper()
    return AviInfo(width, height, fps, fcc, bit_count, frames,
                   top_down=top_down)


def decode_avi_frame(data: bytes, info: AviInfo, i: int) -> np.ndarray:
    """Decode frame ``i`` -> (H, W, 4) RGBA. MJPG via the engine JPEG
    decoder (DHT injected when omitted); empty/raw DIB fourcc as
    bottom-up BGR rows padded to 32-bit boundaries (24/32-bit)."""
    off, size = info.frames[i]
    raw = data[off : off + size]
    if info.fourcc in ("MJPG", "JPEG"):
        return decode_jpeg(ensure_jpeg_dht(raw))
    if info.fourcc in ("", "DIB", "RGB"):
        w, h = info.width, info.height
        if info.bit_count not in (24, 32):
            raise ValueError(
                f"raw AVI frames with biBitCount={info.bit_count} are "
                "not supported (24/32-bit DIB only)")
        nb = info.bit_count // 8
        stride = (w * nb + 3) & ~3
        if len(raw) < stride * h:
            raise ValueError("raw AVI frame shorter than its geometry")
        rows = np.frombuffer(raw, np.uint8, count=stride * h)
        rows = rows.reshape(h, stride)[:, : w * nb].reshape(h, w, nb)
        if not info.top_down:  # bottom-up (positive biHeight) flips
            rows = rows[::-1]
        rgba = np.empty((h, w, 4), np.uint8)
        rgba[..., 0] = rows[..., 2]
        rgba[..., 1] = rows[..., 1]
        rgba[..., 2] = rows[..., 0]
        # BI_RGB 32-bit: the 4th byte is reserved padding, NOT alpha
        # (decoding it as alpha turns every frame fully transparent)
        rgba[..., 3] = 255
        return rgba
    raise ValueError(
        f"AVI codec {info.fourcc!r} has no decoder in this sandbox "
        "(MJPG and raw DIB are supported)")


def encode_avi(frames, fps: float = 10.0, codec: str = "mjpeg",
               quality: int = 90) -> bytes:
    """(H, W, 4) RGBA frames -> single-video-stream AVI bytes.

    ``codec='mjpeg'`` writes each frame as an independent baseline
    JPEG ('00dc' chunks, alpha dropped — JPEG has none);
    ``codec='dib'`` writes uncompressed bottom-up BGR24. A
    spec-shaped idx1 index is appended (players want it; our own
    parser deliberately ignores it)."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("encode_avi needs at least one frame")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape != (h, w, 4):
            raise ValueError("all AVI frames must be (H, W, 4) RGBA "
                             "of one size")
    if codec == "mjpeg":
        handler = comp = b"MJPG"
        bit_count = 24
        payloads = [encode_jpeg(f[..., :3], quality=quality)
                    for f in frames]
    elif codec == "dib":
        handler = b"DIB "
        comp = b"\x00\x00\x00\x00"  # BI_RGB
        bit_count = 24
        stride = (w * 3 + 3) & ~3
        payloads = []
        for f in frames:
            rows = np.zeros((h, stride), np.uint8)
            bgr = f[::-1, :, [2, 1, 0]]
            rows[:, : w * 3] = bgr.reshape(h, w * 3)
            payloads.append(rows.tobytes())
    else:
        raise ValueError(f"unknown AVI codec {codec!r}")

    def chunk(cc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cc + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    scale, rate = 1000, int(round(fps * 1000))
    max_bytes = max(len(p) for p in payloads)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        int(round(1e6 / fps)) if fps else 0, 0, 0,
        0x10,  # AVIF_HASINDEX
        len(frames), 0, 1, max_bytes, w, h, 0, 0, 0, 0)
    strh = (b"vids" + handler +
            struct.pack("<IHHIIIIIIIIhhhh", 0, 0, 0, 0, scale, rate, 0,
                        len(frames), max_bytes, 0xFFFFFFFF & -1, 0,
                        0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, bit_count, comp,
                       len(payloads[0]) if codec == "dib" else 0,
                       0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) +
               lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = bytearray()
    idx = bytearray()
    for p in payloads:
        # idx1 offsets are relative to the 'movi' fourcc
        idx += b"00dc" + struct.pack("<III", 0x10, 4 + len(movi_body),
                                     len(p))
        movi_body += chunk(b"00dc", p)
    movi = lst(b"movi", bytes(movi_body))
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body
