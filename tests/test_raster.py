"""Raster kernels: reference goldens for levels (raster_levels.rs:108-120),
quality-schedule parser, overview/overscale arithmetic on gradients."""

import numpy as np
import pytest

from versatiles_rs_ray.core import raster
from versatiles_rs_ray.core.bbox import TileBBoxPyramid
from versatiles_rs_ray.sources.debug_tiles import gradient_array, gradient_tiles
from versatiles_rs_ray.stages import raster as R


@pytest.mark.parametrize(
    "color_in,brightness,contrast,gamma,color_out",
    [
        ([102], 0.0, 1.0, 1.0, [102]),
        ([102, 119], 0.0, 1.0, 1.0, [102, 119]),
        ([102, 119, 136, 153], 0.0, 1.0, 1.0, [102, 119, 136, 153]),
        ([102, 119, 136, 153], 20.0, 1.1, 0.9, [129, 147, 165, 153]),
        ([51, 119, 170, 255], -100.0, 1.0, 1.0, [0, 19, 70, 255]),
        ([51, 119, 170, 255], 100.0, 1.0, 1.0, [151, 219, 255, 255]),
        ([51, 119, 170, 255], 0.0, 0.5, 1.0, [89, 123, 149, 255]),
        ([51, 119, 170, 255], 0.0, 2.0, 1.0, [0, 111, 213, 255]),
        ([51, 119, 170, 255], 0.0, 1.0, 0.5, [114, 174, 208, 255]),
        ([51, 119, 170, 255], 0.0, 1.0, 2.0, [10, 56, 113, 255]),
    ],
)
def test_levels_reference_goldens(color_in, brightness, contrast, gamma, color_out):
    # pad 1-3 channel cases to RGBA (alpha=255 default; last channel of
    # the 4-case IS the alpha and must pass through untouched)
    rgba_in = (color_in + [255] * 4)[:4]
    if len(color_in) < 4:
        # channels beyond the original are "don't care" except alpha
        pass
    arr = np.tile(np.asarray(rgba_in, dtype=np.uint8), (2, 2, 1))
    out = raster.levels(arr, brightness, contrast, gamma)
    got = out[0, 0].tolist()
    for i, expected in enumerate(color_out[:3] if len(color_out) >= 3 else color_out):
        assert got[i] == expected, f"channel {i}: {got} vs {color_out}"
    if len(color_in) == 4:
        assert got[3] == color_in[3]  # alpha untouched


@pytest.mark.parametrize(
    "text,probe",
    [
        ("80,70", {0: 80, 1: 70, 5: 70, 31: 70}),
        ("80,70,14:50", {0: 80, 1: 70, 2: 70, 13: 70, 14: 50, 31: 50}),
        (None, {0: None, 31: None}),
        ("3:90", {0: None, 2: None, 3: 90, 31: 90}),
    ],
)
def test_quality_schedule(text, probe):
    # exact port of parse_quality (raster_format.rs:115-137)
    sched = raster.parse_quality_schedule(text)
    for z, want in probe.items():
        assert sched[z] == want, f"z={z}"


def test_flatten_and_overlay():
    translucent = np.full((4, 4, 4), [100, 100, 100, 128], dtype=np.uint8)
    flat = raster.flatten_onto(translucent, bg=(255, 255, 255))
    assert (flat[..., 3] == 255).all()
    assert abs(int(flat[0, 0, 0]) - 177) <= 1  # 100*0.502 + 255*0.498
    base = np.full((4, 4, 4), [0, 0, 0, 255], dtype=np.uint8)
    top = np.full((4, 4, 4), [200, 0, 0, 255], dtype=np.uint8)
    assert (raster.overlay(base, top) == top).all()  # opaque top wins


def test_scale_down_and_mosaic():
    arr = gradient_array(3, 1, 2, 32)
    half = raster.scale_down_half(arr)
    assert half.shape == (16, 16, 4)
    children = {(dx, dy): gradient_array(3, dx, dy, 32) for dx in (0, 1) for dy in (0, 1)}
    parent = raster.mosaic_2x2(children, 32)
    assert parent.shape == (32, 32, 4)
    # each quadrant equals the half-scaled child
    assert (parent[:16, :16] == raster.scale_down_half(children[(0, 0)])).all()
    assert (parent[16:, 16:] == raster.scale_down_half(children[(1, 1)])).all()


def test_extract_upsample_roundtrip_avg():
    arr = gradient_array(2, 0, 0, 32)
    # the 4 children of a tile, reassembled, preserve average color ~exactly
    subs = [raster.extract_upsample(arr, x, y, 1) for x in (0, 1) for y in (0, 1)]
    avg_children = np.mean([raster.average_color(s) for s in subs], axis=0)
    avg_parent = raster.average_color(arr)
    assert np.abs(avg_children - avg_parent).max() < 1.0


def test_overview_stage_matches_local(ray_session):
    pyramid = TileBBoxPyramid.new_full(2, 2)
    ds = gradient_tiles(pyramid, size=16)
    out = R.raster_overview_level(ds, num_partitions=2).to_pandas()
    assert len(out) == 4  # z1 has 4 tiles
    row = out[(out.x == 0) & (out.y == 0)].iloc[0]
    children = {
        (dx, dy): gradient_array(2, dx, dy, 16) for dx in (0, 1) for dy in (0, 1)
    }
    expected = raster.mosaic_2x2(children, 16)
    got = raster.to_array(row["payload"], 16, 16)
    assert (got == expected).all()


def test_overscale_stage(ray_session):
    pyramid = TileBBoxPyramid.new_full(1, 1)
    ds = gradient_tiles(pyramid, size=16)
    out = R.raster_overscale(ds, delta=1).to_pandas()
    assert len(out) == 16  # 4 tiles -> 16 children
    assert set(out["z"]) == {2}
    row = out[(out.x == 0) & (out.y == 0)].iloc[0]
    parent = gradient_array(1, 0, 0, 16)
    expected = raster.extract_upsample(parent, 0, 0, 1)
    assert (raster.to_array(row["payload"], 16, 16) == expected).all()


def test_stacked_raster(ray_session):
    import pyarrow as pa
    import ray.data as rd

    def tiles_ds(color, alpha, coords):
        rows = []
        for z, x, y in coords:
            arr = np.full((8, 8, 4), list(color) + [alpha], dtype=np.uint8)
            rows.append((z, x, y, raster.from_array(arr)))
        t = pa.table(
            {
                "z": pa.array([r[0] for r in rows], type=pa.int64()),
                "x": pa.array([r[1] for r in rows], type=pa.int64()),
                "y": pa.array([r[2] for r in rows], type=pa.int64()),
                "payload": pa.array([r[3] for r in rows], type=pa.binary()),
                "width": pa.array([8] * len(rows), type=pa.int64()),
                "height": pa.array([8] * len(rows), type=pa.int64()),
            }
        )
        return rd.from_arrow(t)

    # top source: translucent red on (1,0,0); bottom: opaque blue everywhere
    top = tiles_ds((200, 0, 0), 128, [(1, 0, 0)])
    bottom = tiles_ds((0, 0, 200), 255, [(1, 0, 0), (1, 1, 0)])
    out = R.stacked_raster([top, bottom], num_partitions=2).to_pandas()
    assert len(out) == 2
    blended = out[(out.x == 0)].iloc[0]
    arr = raster.to_array(blended["payload"], 8, 8)
    assert arr[0, 0, 3] == 255  # opaque after compositing onto opaque
    assert arr[0, 0, 0] > 80 and arr[0, 0, 2] > 80  # red over blue mix
    solo = out[(out.x == 1)].iloc[0]
    arr2 = raster.to_array(solo["payload"], 8, 8)
    assert (arr2[..., 2] == 200).all()  # hole filled by lower source only


def test_levels_stage_roundtrip(ray_session):
    pyramid = TileBBoxPyramid.new_full(1, 1)
    ds = gradient_tiles(pyramid, size=8)
    out = R.raster_levels(ds, brightness=0.0, contrast=1.0, gamma=1.0).to_pandas()
    src = gradient_array(1, 0, 0, 8)
    row = out[(out.x == 0) & (out.y == 0)].iloc[0]
    assert (raster.to_array(row["payload"], 8, 8) == src).all()  # identity params


def test_png_codec_roundtrips():
    """Pure-stdlib PNG codec: exact round-trips for every mode, with
    automatic mode narrowing and deterministic bytes."""
    import numpy as np

    from versatiles_rs_ray.core import png

    rng = np.random.default_rng(3)
    rgba = rng.integers(0, 256, (32, 24, 4), dtype=np.uint8)
    assert np.array_equal(png.decode_png_rgba(png.encode_png(rgba)), rgba)
    assert png.encode_png(rgba) == png.encode_png(rgba)  # deterministic

    # opaque -> RGB (color type 2), grey+opaque -> L (0), grey+alpha -> LA (4)
    opaque = rgba.copy()
    opaque[..., 3] = 255
    arr, ct = png.decode_png(png.encode_png_auto(opaque))
    assert ct == 2 and np.array_equal(png.decode_png_rgba(png.encode_png_auto(opaque)), opaque)
    grey = np.zeros((8, 8, 4), np.uint8)
    grey[..., :3] = rng.integers(0, 256, (8, 8, 1), dtype=np.uint8)
    grey[..., 3] = 255
    _, ct = png.decode_png(png.encode_png_auto(grey))
    assert ct == 0
    la = grey.copy()
    la[..., 3] = rng.integers(0, 255, (8, 8), dtype=np.uint8)
    _, ct = png.decode_png(png.encode_png_auto(la))
    assert ct == 4
    assert np.array_equal(png.decode_png_rgba(png.encode_png_auto(la)), la)


def test_jpeg_codec_roundtrips():
    """Pure-stdlib baseline JPEG codec: near-lossless on smooth
    content at q95, deterministic bytes, reference-parity rejections
    (alpha, quality>=100 — versatiles_image/src/format/jpeg.rs)."""
    import numpy as np

    from versatiles_rs_ray.core import jpeg

    h, w = 40, 56
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            (xx * 255 // (w - 1)).astype(np.uint8),
            (yy * 255 // (h - 1)).astype(np.uint8),
            ((xx + yy) % 200).astype(np.uint8),
        ],
        axis=-1,
    )
    blob = jpeg.encode_jpeg(img, 95)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    out = jpeg.decode_jpeg(blob)
    assert out.shape == (h, w, 4) and (out[..., 3] == 255).all()
    assert np.abs(out[..., :3].astype(float) - img).max() <= 3
    assert jpeg.encode_jpeg(img, 95) == blob  # deterministic
    # lower quality -> smaller file, still approximately right
    small = jpeg.encode_jpeg(img, 40)
    assert len(small) < len(blob)
    assert np.abs(jpeg.decode_jpeg(small)[..., :3].astype(float) - img).mean() < 8
    # grayscale single-component stream
    grey = (yy * 255 // (h - 1)).astype(np.uint8)
    gout = jpeg.decode_jpeg(jpeg.encode_jpeg(grey, 90))
    assert np.abs(gout[..., 0].astype(float) - grey).max() <= 2
    assert np.array_equal(gout[..., 0], gout[..., 1])
    # non-multiple-of-8 dims crop back exactly
    assert jpeg.decode_jpeg(jpeg.encode_jpeg(img[: h - 3, : w - 5], 90)).shape == (
        h - 3,
        w - 5,
        4,
    )
    # 4:2:0 subsampled + restart-interval streams (the common foreign
    # photo layout) decode through the general MCU path
    b420 = jpeg.encode_jpeg(img, 90, subsample=True)
    assert len(b420) < len(jpeg.encode_jpeg(img, 90))
    assert np.abs(jpeg.decode_jpeg(b420)[..., :3].astype(float) - img).max() <= 8
    brst = jpeg.encode_jpeg(img, 90, subsample=True, restart_interval=2)
    assert b"\xff\xdd" in brst and b"\xff\xd0" in brst
    assert np.array_equal(jpeg.decode_jpeg(brst), jpeg.decode_jpeg(b420))
    with pytest.raises(ValueError):
        jpeg.encode_jpeg(np.zeros((8, 8, 4), np.uint8), 90)  # alpha
    with pytest.raises(ValueError):
        jpeg.encode_jpeg(img, 100)  # no lossless mode
    # engine encode() strips fully-opaque alpha, rejects translucent
    rgba = np.concatenate([img, np.full((h, w, 1), 255, np.uint8)], axis=-1)
    assert raster.encode(rgba, "jpg", 90) == jpeg.encode_jpeg(img, 90)
    translucent = rgba.copy()
    translucent[0, 0, 3] = 7
    with pytest.raises(ValueError):
        raster.encode(translucent, "jpg", 90)
    assert np.array_equal(raster.decode(raster.encode(rgba, "jpg", 95), "jpg"), out)


def test_raster_format_emits_real_jpeg(ray_session):
    """raster_format(fmt='jpg') emits decodable JPEG tiles and the
    per-zoom quality schedule changes the encoded bytes."""
    import numpy as np

    from versatiles_rs_ray.core import jpeg

    pyramid = TileBBoxPyramid.new_full(1, 1)
    out = (
        R.raster_format(gradient_tiles(pyramid, size=8), "jpg", quality_schedule="0:90")
        .to_pandas()
        .sort_values(["x", "y"])
    )
    for _, row in out.iterrows():
        arr = jpeg.decode_jpeg(row["payload"])
        src = gradient_array(1, int(row["x"]), int(row["y"]), 8)
        assert np.abs(arr[..., :3].astype(float) - src[..., :3]).max() <= 16
    lo = (
        R.raster_format(gradient_tiles(pyramid, size=8), "jpg", quality_schedule="0:30")
        .to_pandas()
        .sort_values(["x", "y"])
    )
    assert list(out["payload"]) != list(lo["payload"])


def test_raster_format_emits_real_png(ray_session):
    """raster_format(fmt='png') produces decodable, bit-deterministic
    PNG tiles whose pixels equal the raw source."""
    import numpy as np

    from versatiles_rs_ray.core import png

    pyramid = TileBBoxPyramid.new_full(1, 1)
    ds = gradient_tiles(pyramid, size=8)
    out = R.raster_format(ds, "png").to_pandas().sort_values(["x", "y"])
    assert (out["format"] == "png").all() if "format" in out.columns else True
    for _, row in out.iterrows():
        arr = png.decode_png_rgba(row["payload"])
        src = gradient_array(1, int(row["x"]), int(row["y"]), 8)
        assert np.array_equal(arr, src)
    # determinism across a second run
    out2 = R.raster_format(gradient_tiles(pyramid, size=8), "png").to_pandas().sort_values(["x", "y"])
    assert list(out["payload"]) == list(out2["payload"])


def test_webp_codec_roundtrips():
    """Native libwebp binding: lossless round-trips exactly; lossy
    decodes to the right shape; opaque alpha is dropped (reference
    webp.rs semantics: quality >= 100 -> lossless)."""
    import numpy as np

    from versatiles_rs_ray.core import native, raster

    if not native.HAVE_WEBP:  # pragma: no cover - present in CI image
        import pytest

        pytest.skip("libwebp absent")
    rng = np.random.default_rng(7)
    rgba = rng.integers(0, 255, (32, 32, 4), dtype=np.uint8)
    rgba[..., 3] = 255
    lossless = raster.encode(rgba, "webp", quality=100)
    back = raster.decode(lossless, "webp")
    assert (back[..., :3] == rgba[..., :3]).all() and (back[..., 3] == 255).all()
    lossy = raster.encode(rgba, "webp", quality=75)
    assert raster.decode(lossy, "webp").shape == (32, 32, 4)
    assert len(lossy) < len(lossless)
    # translucent pixels keep their alpha through lossless
    rgba[0, 0, 3] = 9
    assert (raster.decode(raster.encode(rgba, "webp", quality=100), "webp") == rgba).all()
    # determinism
    assert raster.encode(rgba, "webp", quality=100) == raster.encode(rgba, "webp", quality=100)


def test_avif_encode_quality_and_rejections():
    """Native libavif binding: valid ftypavif bytes, quality drives
    size, lossless rejected (avif.rs is write-only by design)."""
    import numpy as np

    from versatiles_rs_ray.core import native, raster

    if not native.HAVE_AVIF:  # pragma: no cover
        import pytest

        pytest.skip("libavif absent")
    rng = np.random.default_rng(7)
    rgba = rng.integers(0, 255, (32, 32, 4), dtype=np.uint8)
    rgba[..., 3] = 255
    hi = raster.encode(rgba, "avif", quality=90)
    lo = raster.encode(rgba, "avif", quality=20)
    assert hi[4:12] == b"ftypavif" and lo[4:12] == b"ftypavif"
    assert len(lo) < len(hi)
    try:
        raster.encode(rgba, "avif", quality=100)
        raise AssertionError("lossless avif must be rejected")
    except ValueError:
        pass


def test_raster_format_webp_stage(ray_session):
    """raster_format(fmt='webp') emits real decodable webp tiles."""
    import numpy as np

    from versatiles_rs_ray.core import native, raster

    if not native.HAVE_WEBP:  # pragma: no cover
        import pytest

        pytest.skip("libwebp absent")
    pyramid = TileBBoxPyramid.new_full(1, 1)
    out = (
        R.raster_format(gradient_tiles(pyramid, size=8), "webp", quality_schedule="0:100")
        .to_pandas()
        .sort_values(["x", "y"])
    )
    for _, row in out.iterrows():
        arr = raster.decode(row["payload"], "webp")
        src = gradient_array(1, int(row["x"]), int(row["y"]), 8)
        assert np.array_equal(arr[..., :3], src[..., :3])


def test_decode_png_foreign_depths_and_palette():
    """Hand-built spec-conformant PNGs: palette 1/4-bit (+tRNS), 2-bit
    grey, 16-bit RGB — the foreign-file classes encode_png never emits
    (decode breadth landed for real read_binary_files corpora)."""
    import struct
    import zlib

    import numpy as np

    from versatiles_rs_ray.core import png as P

    def build(w, h, depth, ctype, scanlines, extra=b""):
        ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
        raw = b"".join(b"\x00" + s for s in scanlines)  # filter 0 rows
        return (
            b"\x89PNG\r\n\x1a\n"
            + P._chunk(b"IHDR", ihdr)
            + extra
            + P._chunk(b"IDAT", zlib.compress(raw))
            + P._chunk(b"IEND", b"")
        )

    # 1-bit palette, 2 entries, 10px wide (bit-packing crosses a byte)
    plte = P._chunk(b"PLTE", bytes([10, 20, 30, 200, 100, 0]))
    rows = [bytes([0b10110011, 0b01000000]), bytes([0b00000000, 0b11000000])]
    arr, ct = P.decode_png(build(10, 2, 1, 3, rows, plte))
    assert ct == 3 and arr.shape == (2, 10, 3)
    idx = (arr[..., 0] == 200).astype(int)
    assert idx[0].tolist() == [1, 0, 1, 1, 0, 0, 1, 1, 0, 1]
    assert idx[1].tolist() == [0] * 8 + [1, 1]

    # + tRNS -> RGBA with per-entry alpha
    trns = P._chunk(b"tRNS", bytes([255, 7]))
    arr, _ = P.decode_png(build(10, 2, 1, 3, rows, plte + trns))
    assert arr.shape == (2, 10, 4)
    assert arr[0, 0].tolist() == [200, 100, 0, 7]
    assert arr[0, 1].tolist() == [10, 20, 30, 255]

    # 4-bit palette, 3px wide (odd width -> padded low nibble)
    plte16 = P._chunk(
        b"PLTE", bytes([i for e in range(16) for i in (e * 16, e, 255 - e)])
    )
    arr, _ = P.decode_png(build(3, 1, 4, 3, [bytes([0x5A, 0xF0])], plte16))
    assert arr[0, :, 1].tolist() == [5, 10, 15]

    # 2-bit greyscale: samples 0..3 -> 0, 85, 170, 255
    arr, ct = P.decode_png(build(4, 1, 2, 0, [bytes([0b00011011])]))
    assert ct == 0 and arr.shape == (1, 4, 1)
    assert arr[0, :, 0].tolist() == [0, 85, 170, 255]

    # 16-bit RGB: high byte kept
    px = struct.pack(">HHH", 0xABCD, 0x1234, 0xFF00)
    arr, ct = P.decode_png(build(1, 1, 16, 2, [px]))
    assert ct == 2 and arr[0, 0].tolist() == [0xAB, 0x12, 0xFF]

    # 16-bit with Sub filter (bpp=6): second pixel is delta-coded
    line = b"\x01" + px + struct.pack(">HHH", 0x0100, 0x0100, 0x0100)
    ihdr = struct.pack(">IIBBBBB", 2, 1, 16, 2, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n" + P._chunk(b"IHDR", ihdr)
        + P._chunk(b"IDAT", zlib.compress(line)) + P._chunk(b"IEND", b"")
    )
    arr, _ = P.decode_png(data)
    assert arr[0, 1].tolist() == [0xAC, 0x13, 0x00]

    # reference's own 1-bit palette mock tile: solid (170, 211, 223)
    mock = open(
        "/root/reference/versatiles_container/src/container/mock/"
        "mock_tiles/mock.png", "rb").read()
    rgba = P.decode_png_rgba(mock)
    assert rgba.shape == (256, 256, 4)
    assert np.unique(rgba.reshape(-1, 4), axis=0).tolist() == [[170, 211, 223, 255]]


def test_jpeg_vectorized_entropy_matches_scalar_walk():
    """The no-restart path uses the vectorized entropy encoder; the
    RSTn path keeps the per-block walk. Forcing restart_interval high
    enough that no RSTn is emitted yields the same entropy stream
    minus the DRI segment — byte equality after stripping it proves
    the two implementations encode identically."""
    from versatiles_rs_ray.core import jpeg

    rng = np.random.default_rng(5)
    for arr in (rng.integers(0, 256, (40, 56, 3), dtype=np.uint8),
                rng.integers(0, 256, (24, 24), dtype=np.uint8),
                np.zeros((16, 16, 3), np.uint8)):
        fast = jpeg.encode_jpeg(arr, 80)
        slow = jpeg.encode_jpeg(arr, 80, restart_interval=60000)
        # strip the 6-byte DRI segment (FF DD 00 04 interval)
        i = slow.find(b"\xff\xdd")
        assert i > 0
        assert fast == slow[:i] + slow[i + 6:]


def test_decode_png_foreign_average_paeth_filters():
    """Foreign encoders (libpng adaptive) emit Average/Paeth rows our
    encoder never writes; build whole-image filter-3 and filter-4
    streams with an independent reference filterer and require exact
    reconstruction."""
    import struct
    import zlib

    from versatiles_rs_ray.core import png as P

    def paeth(a, b, cc):
        p = a + b - cc
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else cc)

    h, w, c = 40, 30, 4
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
    flat = img.reshape(h, w * c).astype(np.int32)
    for ftype in (3, 4):
        raw = bytearray()
        prev = np.zeros(w * c, np.int32)
        for r in range(h):
            raw.append(ftype)
            rec = flat[r]
            for i in range(w * c):
                left = int(rec[i - c]) if i >= c else 0
                ul = int(prev[i - c]) if i >= c else 0
                pred = (paeth(left, int(prev[i]), ul) if ftype == 4
                        else (left + int(prev[i])) >> 1)
                raw.append((int(rec[i]) - pred) & 0xFF)
            prev = rec
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
        data = (b"\x89PNG\r\n\x1a\n" + P._chunk(b"IHDR", ihdr)
                + P._chunk(b"IDAT", zlib.compress(bytes(raw)))
                + P._chunk(b"IEND", b""))
        arr, ct = P.decode_png(data)
        assert ct == 6 and np.array_equal(arr, img), ftype


def test_decode_png_adam7_interlaced():
    """Adam7-interlaced foreign PNGs: an independent in-test
    interlacer (pass extraction per spec §8.2, per-pass Sub/Up/none
    filtering with per-pass prev-row reset) must decode identically
    to the source pixels across color types and depths, including
    images small enough that several passes are empty."""
    import struct
    import zlib

    import numpy as np

    from versatiles_rs_ray.core import png as P

    PASSES = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

    def interlace_bytes(img, depth, filt_cycle):
        """img: (h, w) int sample codes (spp folded into the last axis
        for depth>=8). Returns the concatenated filtered pass bytes."""
        h, w = img.shape[:2]
        spp = 1 if img.ndim == 2 else img.shape[2]
        bpp = max(1, (spp * depth) // 8)
        raw = bytearray()
        fi = 0
        for xs, ys, xst, yst in PASSES:
            sub = img[ys::yst, xs::xst]
            ph, pw = sub.shape[:2]
            if ph == 0 or pw == 0:
                continue
            # serialize one pass scanline to bytes
            lines = []
            for r in range(ph):
                row = sub[r]
                if depth < 8:
                    bits = np.zeros(pw * depth, np.uint8)
                    for i, v in enumerate(row.reshape(-1).tolist()):
                        for b in range(depth):
                            bits[i * depth + b] = (v >> (depth - 1 - b)) & 1
                    lines.append(np.packbits(bits).tobytes())
                elif depth == 16:
                    lines.append(b"".join(
                        struct.pack(">H", int(v))
                        for v in row.reshape(-1).tolist()))
                else:
                    lines.append(np.asarray(row, np.uint8).tobytes())
            prev = bytes(len(lines[0]))
            for ln in lines:
                f = filt_cycle[fi % len(filt_cycle)]
                fi += 1
                cur = np.frombuffer(ln, np.uint8).astype(np.int32)
                pv = np.frombuffer(prev, np.uint8).astype(np.int32)
                if f == 0:
                    enc = cur
                elif f == 1:  # Sub
                    left = np.concatenate([np.zeros(bpp, np.int32),
                                           cur[:-bpp]]) if len(cur) > bpp \
                        else np.zeros_like(cur)
                    enc = cur - left
                else:  # Up
                    enc = cur - pv
                raw.append(f)
                raw.extend((enc & 0xFF).astype(np.uint8).tobytes())
                prev = ln
        return bytes(raw)

    def build(w, h, depth, ctype, raw, extra=b""):
        ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 1)
        return (b"\x89PNG\r\n\x1a\n" + P._chunk(b"IHDR", ihdr) + extra
                + P._chunk(b"IDAT", zlib.compress(raw))
                + P._chunk(b"IEND", b""))

    rng = np.random.default_rng(7)

    # 8-bit RGBA, 13x11 (odd dims -> ragged pass widths), mixed filters
    img = rng.integers(0, 256, (11, 13, 4), dtype=np.uint8)
    data = build(13, 11, 8, 6, interlace_bytes(img, 8, (0, 1, 2)))
    arr, ct = P.decode_png(data)
    assert ct == 6 and np.array_equal(arr, img)

    # tiny 3x2 RGB: passes 1-4 contribute <=1 pixel, several empty
    img = rng.integers(0, 256, (2, 3, 3), dtype=np.uint8)
    arr, ct = P.decode_png(build(3, 2, 8, 2, interlace_bytes(img, 8, (0,))))
    assert ct == 2 and np.array_equal(arr, img)

    # 1x1: only pass 1 exists
    img = np.array([[[9, 8, 7]]], dtype=np.uint8)
    arr, _ = P.decode_png(build(1, 1, 8, 2, interlace_bytes(img, 8, (0,))))
    assert np.array_equal(arr, img)

    # 1-bit palette, 9x5 (bit packing differs per pass width)
    codes = rng.integers(0, 2, (5, 9), dtype=np.uint8)
    plte = P._chunk(b"PLTE", bytes([10, 20, 30, 200, 100, 0]))
    arr, ct = P.decode_png(
        build(9, 5, 1, 3, interlace_bytes(codes, 1, (0,)), plte))
    assert ct == 3 and arr.shape == (5, 9, 3)
    assert np.array_equal((arr[..., 0] == 200).astype(np.uint8), codes)

    # 16-bit greyscale: high-byte fold after deinterlace
    img16 = rng.integers(0, 65536, (6, 7), dtype=np.uint16)
    arr, ct = P.decode_png(build(7, 6, 16, 0,
                                 interlace_bytes(img16, 16, (0, 2))))
    assert ct == 0 and np.array_equal(arr[..., 0], (img16 >> 8).astype(np.uint8))

    # 2-bit grey interlaced: range expansion intact
    codes = rng.integers(0, 4, (5, 5), dtype=np.uint8)
    arr, ct = P.decode_png(build(5, 5, 2, 0, interlace_bytes(codes, 2, (0,))))
    assert ct == 0 and np.array_equal(arr[..., 0], codes * 85)


# ---------------------------------------------------------------- algebra

def _alg_tiles(coords, seed, size=8):
    """Tile rows with random RGBA payloads; returns (Dataset, {tile: arr})."""
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.default_rng(seed)
    arrs = {c: rng.integers(0, 256, (size, size, 4), dtype=np.uint8)
            for c in coords}
    t = pa.table({
        "z": pa.array([c[0] for c in coords], type=pa.int64()),
        "x": pa.array([c[1] for c in coords], type=pa.int64()),
        "y": pa.array([c[2] for c in coords], type=pa.int64()),
        "payload": pa.array([raster.from_array(arrs[c]) for c in coords],
                            type=pa.binary()),
        "width": pa.array([size] * len(coords), type=pa.int64()),
        "height": pa.array([size] * len(coords), type=pa.int64()),
    })
    return rd.from_arrow(t), arrs


def _alg_ref(op, a, b):
    ai, bi = a[..., :3].astype(np.int64), b[..., :3].astype(np.int64)
    if op == "absdiff":
        rgb = np.abs(ai - bi)
    elif op == "add":
        rgb = np.minimum(ai + bi, 255)
    elif op == "min":
        rgb = np.minimum(ai, bi)
    elif op == "max":
        rgb = np.maximum(ai, bi)
    else:
        rgb = (ai > bi) * 255
    out = np.empty_like(a)
    out[..., :3] = rgb.astype(np.uint8)
    out[..., 3] = 255
    return out


@pytest.mark.parametrize("op", sorted(R.ALGEBRA_OPS))
def test_raster_algebra_matches_reference(ray_session, op):
    coords = [(2, x, y) for x in range(4) for y in range(3)]
    a_ds, a_arr = _alg_tiles(coords, seed=1)
    b_ds, b_arr = _alg_tiles(coords, seed=2)
    got = R.raster_algebra(a_ds, b_ds, op).to_pandas()
    assert len(got) == len(coords)
    for _, row in got.iterrows():
        c = (row["z"], row["x"], row["y"])
        arr = raster.to_array(row["payload"], row["width"], row["height"])
        np.testing.assert_array_equal(arr, _alg_ref(op, a_arr[c], b_arr[c]))


def test_raster_algebra_inner_join_drops_unmatched(ray_session):
    a_ds, _ = _alg_tiles([(1, 0, 0), (1, 1, 0)], seed=3)
    b_ds, _ = _alg_tiles([(1, 1, 0), (1, 0, 1)], seed=4)
    got = R.raster_algebra(a_ds, b_ds, "min").to_pandas()
    assert [(r["z"], r["x"], r["y"]) for _, r in got.iterrows()] == [(1, 1, 0)]


def test_raster_algebra_size_mismatch_raises(ray_session):
    a_ds, _ = _alg_tiles([(1, 0, 0)], seed=5, size=8)
    b_ds, _ = _alg_tiles([(1, 0, 0)], seed=6, size=16)
    with pytest.raises(Exception, match="size mismatch"):
        R.raster_algebra(a_ds, b_ds, "max").to_pandas()


def test_raster_algebra_validation():
    with pytest.raises(ValueError, match="op"):
        R.raster_algebra(None, None, "nope")


# ---------------------------------------------------------------- focal

def _focal_ref(arrs, coords, z, radius, size):
    """Scalar focal-mean reference over the assembled sparse level:
    per output pixel, sum//count of PRESENT pixels in the window."""
    present = set(coords)
    out = {}
    for (tz, tx, ty) in coords:
        res = np.zeros((size, size, 4), dtype=np.uint8)
        for rr in range(size):
            for cc in range(size):
                tot = np.zeros(3, dtype=np.int64)
                n = 0
                for dy in range(-radius, radius + 1):
                    for dx in range(-radius, radius + 1):
                        gr, gc = rr + dy, cc + dx
                        ntx, nty = tx, ty
                        lr, lc = gr, gc
                        if lr < 0:
                            nty, lr = nty - 1, lr + size
                        elif lr >= size:
                            nty, lr = nty + 1, lr - size
                        if lc < 0:
                            ntx, lc = ntx - 1, lc + size
                        elif lc >= size:
                            ntx, lc = ntx + 1, lc - size
                        if (tz, ntx, nty) in present:
                            tot += arrs[(tz, ntx, nty)][lr, lc, :3]
                            n += 1
                res[rr, cc, :3] = (tot // n).astype(np.uint8)
                res[rr, cc, 3] = 255
        out[(tz, tx, ty)] = res
    return out


@pytest.mark.parametrize("radius,coords", [
    (1, [(2, x, y) for x in range(3) for y in range(3)]),
    (2, [(2, x, y) for x in range(3) for y in range(3)]),
    # sparse level: a missing middle tile exercises absent-halo counts
    (1, [(2, x, y) for x in range(3) for y in range(3)
         if (x, y) != (1, 1)]),
])
def test_focal_mean_matches_scalar(ray_session, radius, coords):
    import pyarrow as pa
    import ray.data as rd

    size = 8
    rng = np.random.default_rng(41 + radius)
    arrs = {c: rng.integers(0, 256, (size, size, 4), dtype=np.uint8)
            for c in coords}
    t = pa.table({
        "z": pa.array([c[0] for c in coords], type=pa.int64()),
        "x": pa.array([c[1] for c in coords], type=pa.int64()),
        "y": pa.array([c[2] for c in coords], type=pa.int64()),
        "payload": pa.array([raster.from_array(arrs[c]) for c in coords],
                            type=pa.binary()),
        "width": pa.array([size] * len(coords), type=pa.int64()),
        "height": pa.array([size] * len(coords), type=pa.int64()),
    })
    got = R.focal_mean_tiles(rd.from_arrow(t).repartition(4),
                             radius=radius).to_pandas()
    want = _focal_ref(arrs, coords, 2, radius, size)
    assert len(got) == len(coords)
    for _, row in got.iterrows():
        c = (row["z"], row["x"], row["y"])
        arr = raster.to_array(row["payload"], row["width"], row["height"])
        np.testing.assert_array_equal(arr, want[c], err_msg=str(c))


def test_focal_mean_validation():
    with pytest.raises(ValueError, match="radius"):
        R.focal_mean_tiles(None, radius=0)


def test_focal_mean_radius_exceeds_tile_raises(ray_session):
    import ray.data as rd

    a_ds, _ = _alg_tiles([(1, 0, 0)], seed=7, size=8)
    with pytest.raises(Exception, match="exceeds tile size"):
        R.focal_mean_tiles(a_ds, radius=9).to_pandas()


def test_focal_mean_duplicate_tile_raises(ray_session):
    import pyarrow as pa
    import ray.data as rd

    a_ds, arrs = _alg_tiles([(1, 0, 0), (1, 0, 0)], seed=8, size=8)
    with pytest.raises(Exception, match="duplicate tile"):
        R.focal_mean_tiles(a_ds, radius=1).to_pandas()
