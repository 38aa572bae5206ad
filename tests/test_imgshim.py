"""Compiled libjpeg decode shim (core/imgshim.py) — the fast path of
decode_jpeg and the engine's progressive-JPEG coverage. Skips cleanly
on hosts without gcc/libjpeg-dev (the shim then never activates and
decode_jpeg serves pure-Python, covered by test_raster)."""

import numpy as np
import pyarrow as pa
import pytest

from versatiles_rs_ray.core import jpeg as pyjpeg
from versatiles_rs_ray.core import imgshim

pytestmark = pytest.mark.skipif(
    not imgshim.have_native_jpeg(),
    reason="libjpeg shim unavailable (no gcc/headers) — pure-Python "
           "decoder covers this host")


def test_native_decode_parity_with_pure_python():
    """On a stream OUR encoder produced (4:4:4), shim and pure-Python
    decodes may differ only by IDCT/color-convert rounding."""
    rng = np.random.default_rng(5)
    for shape in ((64, 96, 3), (33, 47, 3)):  # non-MCU-aligned too
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        payload = pyjpeg.encode_jpeg(img, quality=90)
        a = imgshim.decode_jpeg_native(payload)
        b = pyjpeg.decode_jpeg(payload, native=False)
        assert a.shape == b.shape
        d = np.abs(a[..., :3].astype(int) - b[..., :3].astype(int))
        # T.81-conformant decoders differ by a few counts on noise
        assert d.max() <= 12 and d.mean() < 1.0
        assert (a[..., 3] == 255).all()


def test_progressive_sof2_decodes_native_gates_pure():
    """Real media lakes are full of progressive JPEGs: the native
    path decodes them; the pure-Python decoder keeps its honest gate.
    Progressive and baseline streams of the SAME pixels carry the
    same quantized coefficients, so the decodes must agree to IDCT
    rounding."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    prog = imgshim.encode_jpeg_native(img, quality=92, progressive=True)
    base = imgshim.encode_jpeg_native(img, quality=92, progressive=False)
    assert b"\xff\xc2" in prog and b"\xff\xc2" not in base
    with pytest.raises(NotImplementedError, match="baseline"):
        pyjpeg.decode_jpeg(prog, native=False)
    a = pyjpeg.decode_jpeg(prog)  # default routes through the shim
    b = pyjpeg.decode_jpeg(base)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 2
    # grayscale progressive expands to opaque RGBA like every decode
    g = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    ga = pyjpeg.decode_jpeg(
        imgshim.encode_jpeg_native(g, quality=92, progressive=True))
    assert ga.shape == (32, 32, 4) and (ga[..., 3] == 255).all()
    assert (ga[..., 0] == ga[..., 1]).all()


def test_corrupt_stream_falls_back_not_crash():
    """The setjmp error path: header-corrupt streams return None from
    the shim (no process abort, no exit()); entropy-truncated streams
    decode best-effort at the right dimensions (libjpeg's documented
    warning-and-gray-fill recovery — preferable to passthrough in a
    media lake)."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    payload = pyjpeg.encode_jpeg(img, quality=90)
    truncated = payload[: len(payload) // 2]
    best_effort = imgshim.decode_jpeg_native(truncated)
    assert best_effort is not None and best_effort.shape == (32, 32, 4)
    with pytest.raises((ValueError, IndexError)):  # pure path errors
        pyjpeg.decode_jpeg(truncated, native=False)
    garbage = b"\xff\xd8" + bytes(100)  # SOI then no valid marker
    assert imgshim.decode_jpeg_native(garbage) is None
    assert imgshim.decode_jpeg_native(payload[:8]) is None  # header cut


def test_raster_format_codec_native(ray_session):
    """raster_format(codec='native') emits real JPEG tiles through
    the shim; the default stays byte-identical pure-Python."""
    from versatiles_rs_ray.core import raster as R
    from versatiles_rs_ray.core.tilejson import TileBBoxPyramid
    from versatiles_rs_ray.sources.debug_tiles import gradient_tiles
    from versatiles_rs_ray.stages.raster import raster_format

    pyramid = TileBBoxPyramid.new_full(1, 1)
    src = gradient_tiles(pyramid, size=16)
    out = raster_format(src, "jpg", codec="native").to_pandas()
    assert (out["format"] == "jpg").all()
    ref = raster_format(gradient_tiles(pyramid, size=16),
                        "jpg").to_pandas()
    for (_, a), (_, b) in zip(out.sort_values(["x", "y"]).iterrows(),
                              ref.sort_values(["x", "y"]).iterrows()):
        pa_ = pyjpeg.decode_jpeg(a["payload"], native=False)
        pb = pyjpeg.decode_jpeg(b["payload"], native=False)
        assert np.abs(pa_.astype(int) - pb.astype(int)).max() <= 6
        assert R.decode(a["payload"], "jpg").shape == (16, 16, 4)


def test_native_encode_roundtrip_and_speed_contract():
    """Native encode is the opt-in throughput path: its output must
    decode (both decoders) back to within JPEG loss of the source."""
    rng = np.random.default_rng(11)
    img = (rng.integers(0, 64, (48, 48, 3)) * 4).astype(np.uint8)
    smooth = np.zeros((48, 48, 3), np.uint8)
    smooth[...] = np.linspace(0, 255, 48, dtype=np.uint8)[None, :, None]
    for src in (smooth,):
        payload = imgshim.encode_jpeg_native(src, quality=95)
        for arr in (imgshim.decode_jpeg_native(payload),
                    pyjpeg.decode_jpeg(payload, native=False)):
            d = np.abs(arr[..., :3].astype(int) - src.astype(int))
            assert d.max() <= 12 and d.mean() < 3.0


def test_png_native_bit_exact_and_interlaced():
    """PNG native path must be BIT-EXACT with the pure decoder (the
    probe-time verify enforces it; this re-checks the public route)
    across mode-narrowed encodes, 16-bit fold, palette, and Adam7."""
    import struct
    import zlib

    from versatiles_rs_ray.core import imgshim
    from versatiles_rs_ray.core import png as pypng

    if not imgshim.have_native_png():
        pytest.skip("libpng shim unavailable")
    rng = np.random.default_rng(21)
    rgba = rng.integers(0, 256, (33, 47, 4), dtype=np.uint8)
    for enc in (pypng.encode_png(rgba), pypng.encode_png_auto(rgba)):
        assert np.array_equal(pypng.decode_png_rgba(enc),
                              pypng.decode_png_rgba(enc, native=False))
    # 16-bit grey: the high-byte fold convention must survive libpng
    g16 = rng.integers(0, 65536, (16, 16), dtype=np.uint16)
    ihdr = struct.pack(">IIBBBBB", 16, 16, 16, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + g16[r].astype(">u2").tobytes()
                   for r in range(16))
    data = (b"\x89PNG\r\n\x1a\n" + pypng._chunk(b"IHDR", ihdr)
            + pypng._chunk(b"IDAT", zlib.compress(raw))
            + pypng._chunk(b"IEND", b""))
    a = pypng.decode_png_rgba(data)
    assert np.array_equal(a, pypng.decode_png_rgba(data, native=False))
    assert np.array_equal(a[..., 0], (g16 >> 8).astype(np.uint8))
    # palette + tRNS (foreign class)
    plte = pypng._chunk(b"PLTE", bytes([10, 20, 30, 200, 100, 0]))
    trns = pypng._chunk(b"tRNS", bytes([255, 7]))
    ihdr = struct.pack(">IIBBBBB", 10, 2, 1, 3, 0, 0, 0)
    rows = [bytes([0b10110011, 0b01000000]), bytes([0, 0b11000000])]
    data = (b"\x89PNG\r\n\x1a\n" + pypng._chunk(b"IHDR", ihdr) + plte
            + trns + pypng._chunk(
                b"IDAT", zlib.compress(b"".join(b"\x00" + r for r in rows)))
            + pypng._chunk(b"IEND", b""))
    assert np.array_equal(pypng.decode_png_rgba(data),
                          pypng.decode_png_rgba(data, native=False))
    # corrupt stream: native rejects, pure raises its own error
    assert imgshim.decode_png_rgba_native(data[:40]) is None


def test_codec_auto_default(ray_session):
    """raster_format's default codec is now 'auto': with the verified
    shim present, JPEG bytes equal the codec='native' output; with the
    shim gone, auto degrades to exactly the pure encoder. PNG stays
    bit-identical under every codec setting."""
    import ray.data as rd

    from versatiles_rs_ray.core import imgshim, raster
    from versatiles_rs_ray.stages.raster import raster_format

    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, (16, 16, 4), dtype=np.uint8)
    arr[..., 3] = 255
    ds = rd.from_arrow(pa.table({
        "z": pa.array([0], type=pa.int64()),
        "x": pa.array([0], type=pa.int64()),
        "y": pa.array([0], type=pa.int64()),
        "payload": pa.array([raster.from_array(arr)], type=pa.binary()),
        "width": pa.array([16], type=pa.int64()),
        "height": pa.array([16], type=pa.int64()),
    }))

    def payload(codec):
        return raster_format(ds, "jpg", codec=codec).take_all()[0]["payload"]

    auto, native, pure = payload("auto"), payload("native"), payload("pure")
    if imgshim.have_native_jpeg():
        assert auto == native
    else:
        assert auto == pure
    # in-process: auto falls back to pure bytes when the shim refuses
    assert raster.encode(arr, "jpg", codec="pure") == pure
    # PNG ignores the codec knob entirely (always pure, bit-identical)
    p1 = raster.encode(arr, "png", codec="auto")
    p2 = raster.encode(arr, "png", codec="pure")
    assert p1 == p2
