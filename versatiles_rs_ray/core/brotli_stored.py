"""Minimal brotli support without the brotli library: STORED mode.

RFC 7932 allows meta-blocks to be stored uncompressed; a stream of
such meta-blocks is valid brotli that ANY conforming decoder (the
reference's rust brotli included) can read. That is exactly enough to
write spec-compliant `.versatiles` containers in this sandbox — the
format hardwires brotli for its block/tile indices
(versatiles_container/src/container/versatiles/types/block_index.rs:113,
tile_index.rs:98) — at the cost of index compression only (indices
are small).

- `compress(data)`: real brotli when the library is importable, else
  the stored-mode encoding (valid brotli either way).
- `decompress(data)`: real brotli when importable; otherwise parses
  ONLY stored-mode streams (i.e. files this engine wrote) and raises
  NotImplementedError for entropy-coded streams, naming the gate.

Bit layout implemented from the public RFC 7932 (LSB-first bit order;
WBITS=16 is the single bit '0'; each stored block is ISLAST=0,
MNIBBLES, MLEN-1, ISUNCOMPRESSED=1, byte-align, raw bytes; the stream
ends with an empty last block ISLAST=1 ISLASTEMPTY=1).
"""

from __future__ import annotations

try:  # pragma: no cover - absent in sandbox
    import brotli as _brotli
except ImportError:
    _brotli = None

_MAX_MLEN = 1 << 24  # largest length a 6-nibble MLEN can carry


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.bit = 0  # bits used in the last byte

    def write(self, value: int, nbits: int):
        for i in range(nbits):
            if self.bit == 0:
                self.buf.append(0)
            if (value >> i) & 1:
                self.buf[-1] |= 1 << self.bit
            self.bit = (self.bit + 1) & 7

    def align(self):
        self.bit = 0

    def raw(self, data: bytes):
        self.align()
        self.buf.extend(data)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, nbits: int) -> int:
        v = 0
        for i in range(nbits):
            byte = self.data[self.pos >> 3]
            v |= ((byte >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v

    def align(self):
        self.pos = (self.pos + 7) & ~7

    def raw(self, n: int) -> bytes:
        self.align()
        start = self.pos >> 3
        self.pos += n * 8
        return self.data[start : start + n]


def compress_stored(data: bytes) -> bytes:
    """data -> valid brotli stream of uncompressed meta-blocks."""
    w = _BitWriter()
    w.write(0, 1)  # WBITS = 16
    pos = 0
    while pos < len(data):
        chunk = data[pos : pos + _MAX_MLEN]
        pos += len(chunk)
        w.write(0, 1)  # ISLAST = 0
        mlen1 = len(chunk) - 1
        nibbles = 4 if mlen1 < (1 << 16) else (5 if mlen1 < (1 << 20) else 6)
        w.write(nibbles - 4, 2)  # MNIBBLES code
        w.write(mlen1, nibbles * 4)
        w.write(1, 1)  # ISUNCOMPRESSED
        w.raw(bytes(chunk))
    w.write(1, 1)  # ISLAST
    w.write(1, 1)  # ISLASTEMPTY
    return bytes(w.buf)


def decompress_stored(data: bytes) -> bytes:
    """Inverse of compress_stored; raises NotImplementedError on
    entropy-coded brotli (needs the real library)."""
    r = _BitReader(data)
    if r.read(1) != 0:
        raise NotImplementedError(
            "entropy-coded brotli stream (WBITS != 16 short form): install "
            "the brotli library to read foreign .versatiles files"
        )
    out = bytearray()
    while True:
        islast = r.read(1)
        if islast:
            if r.read(1):  # ISLASTEMPTY
                return bytes(out)
            raise NotImplementedError(
                "entropy-coded final brotli meta-block: install the brotli "
                "library to read foreign .versatiles files"
            )
        code = r.read(2)
        if code == 3:
            raise NotImplementedError("brotli metadata meta-block unsupported")
        nibbles = 4 + code
        mlen = r.read(nibbles * 4) + 1
        if r.read(1) != 1:  # ISUNCOMPRESSED
            raise NotImplementedError(
                "entropy-coded brotli meta-block: install the brotli library "
                "to read foreign .versatiles files"
            )
        out.extend(r.raw(mlen))


def _native():
    # deferred import: native.py probes shared libraries at import time
    from . import native

    return native if native.HAVE_BROTLI else None


def compress(data: bytes) -> bytes:
    """Real (entropy-coded) brotli when any implementation is present:
    the python package, else the system libbrotlienc via ctypes
    (core/native.py); stored-mode only as the last resort."""
    if _brotli is not None:  # pragma: no cover
        return _brotli.compress(data)
    n = _native()
    if n is not None:
        return n.brotli_compress(data)
    return compress_stored(data)


def decompress(data: bytes) -> bytes:
    if _brotli is not None:  # pragma: no cover
        return _brotli.decompress(data)
    n = _native()
    if n is not None:
        return n.brotli_decompress(data)
    return decompress_stored(data)
