"""Raster tile kernels on numpy RGBA arrays.

The reference's image ops (versatiles_image/src/traits/operation.rs:29-84)
re-expressed as vectorized numpy over raw RGBA byte payloads. PNG
(core/png.py) and JPEG (core/jpeg.py) have pure-stdlib codecs, and
WEBP binds the system libwebp through ctypes (core/native.py), so
`encode`/`decode` produce REAL files in-sandbox; AVIF remains
gated behind a Pillow try-import. The engine's native interchange
format is ``rgba-raw`` (w*h*4 bytes + width/height columns) — every
other kernel is format-agnostic.

Exact-formula ports (golden-tested):
- levels:  v' = round(clamp(((v-127.5)*(contrast/255) + 0.5 +
  brightness/255)^gamma * 255, 0, 255)), alpha untouched
  (raster_levels.rs:66-71, goldens :108-120)
- quality schedule parser "80,70,14:50" (raster_format.rs:115-137)
"""

from __future__ import annotations

import numpy as np

try:  # pragma: no cover - Pillow absent in sandbox
    from PIL import Image as _PILImage
except ImportError:
    _PILImage = None

RAW_FORMAT = "rgba-raw"


def to_array(payload: bytes, width: int, height: int) -> np.ndarray:
    return np.frombuffer(payload, dtype=np.uint8).reshape(height, width, 4)


def from_array(arr: np.ndarray) -> bytes:
    return np.ascontiguousarray(arr, dtype=np.uint8).tobytes()


def levels(arr: np.ndarray, brightness=0.0, contrast=1.0, gamma=1.0) -> np.ndarray:
    """Per-pixel brightness/contrast/gamma (raster_levels.rs:66-71).

    float32 math to match the reference's f32 exactly; the alpha
    channel (last of 2 or 4) is untouched.
    """
    out = arr.astype(np.float32)
    rgb = out[..., :3]
    v = ((rgb - np.float32(127.5)) * np.float32(contrast / 255.0)
         + np.float32(0.5) + np.float32(brightness / 255.0))
    with np.errstate(invalid="ignore"):
        v = np.power(v, np.float32(gamma), dtype=np.float32) * np.float32(255.0)
    v = np.nan_to_num(v, nan=0.0)
    out[..., :3] = v
    # Rust f32::round is half-away-from-zero; np.round is half-to-even.
    # floor(v + 0.5) matches for every value that survives the clamp.
    res = np.clip(np.floor(out + np.float32(0.5)), 0, 255).astype(np.uint8)
    res[..., 3] = arr[..., 3]
    return res


def flatten_onto(arr: np.ndarray, bg=(255, 255, 255)) -> np.ndarray:
    """Composite onto an opaque background (into_flattened,
    versatiles_image/src/traits/operation.rs:128 semantics)."""
    a = arr[..., 3:4].astype(np.float64) / 255.0
    rgb = arr[..., :3].astype(np.float64) * a + np.asarray(bg, dtype=np.float64) * (1.0 - a)
    out = np.empty_like(arr)
    out[..., :3] = np.round(rgb).astype(np.uint8)
    out[..., 3] = 255
    return out


def overlay(base: np.ndarray, top: np.ndarray) -> np.ndarray:
    """Source-over compositing: top over base (overlay op)."""
    ta = top[..., 3:4].astype(np.float64) / 255.0
    ba = base[..., 3:4].astype(np.float64) / 255.0
    out_a = ta + ba * (1.0 - ta)
    safe = np.where(out_a == 0.0, 1.0, out_a)
    rgb = (
        top[..., :3].astype(np.float64) * ta
        + base[..., :3].astype(np.float64) * ba * (1.0 - ta)
    ) / safe
    out = np.empty_like(base)
    out[..., :3] = np.round(rgb).astype(np.uint8)
    out[..., 3] = np.round(out_a[..., 0] * 255.0).astype(np.uint8)
    return out


def is_opaque(arr: np.ndarray) -> bool:
    return bool((arr[..., 3] == 255).all())


def ensure_rgba(arr: np.ndarray) -> np.ndarray:
    """Promote L / LA / RGB layouts to RGBA (opaque where no alpha)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    c = arr.shape[2]
    if c == 4:
        return arr
    h, w = arr.shape[:2]
    out = np.empty((h, w, 4), dtype=np.uint8)
    if c == 1:
        out[..., :3] = arr
        out[..., 3] = 255
    elif c == 2:
        out[..., :3] = arr[..., :1]
        out[..., 3] = arr[..., 1]
    elif c == 3:
        out[..., :3] = arr
        out[..., 3] = 255
    else:
        raise ValueError(f"unsupported channel count {c}")
    return out


def scale_down_half(arr: np.ndarray) -> np.ndarray:
    """2x2 box average -> half resolution (scale-down op)."""
    h, w, c = arr.shape
    v = arr.astype(np.uint16).reshape(h // 2, 2, w // 2, 2, c)
    return ((v.sum(axis=(1, 3)) + 2) // 4).astype(np.uint8)


def mosaic_2x2(children: dict, size: int) -> np.ndarray:
    """Assemble a parent tile from up to 4 half-scaled children.

    children: {(dx, dy): array} with dx/dy in {0,1} (child x&1, y&1).
    Missing quadrants stay transparent (raster_overview.rs semantics).
    """
    out = np.zeros((size, size, 4), dtype=np.uint8)
    half = size // 2
    for (dx, dy), arr in children.items():
        small = scale_down_half(arr)
        out[dy * half : (dy + 1) * half, dx * half : (dx + 1) * half] = small
    return out


def extract_upsample(arr: np.ndarray, x: int, y: int, delta: int) -> np.ndarray:
    """Overscale: crop the sub-window for child (x, y) at z+delta and
    upsample back to full size (raster_overscale.rs:80-124 get_extract).

    Nearest-neighbor upsampling here (no resampling libs in the
    sandbox); the resampler is pluggable at deploy.
    """
    size = arr.shape[0]
    sub = size >> delta
    ox = (x & ((1 << delta) - 1)) * sub
    oy = (y & ((1 << delta) - 1)) * sub
    window = arr[oy : oy + sub, ox : ox + sub]
    factor = 1 << delta
    return np.repeat(np.repeat(window, factor, axis=0), factor, axis=1)


def average_color(arr: np.ndarray) -> np.ndarray:
    return arr.reshape(-1, arr.shape[-1]).mean(axis=0)


def parse_quality_schedule(text) -> list:
    """Per-zoom quality schedule, exact port of parse_quality
    (raster_format.rs:115-137): comma-separated entries advance the
    zoom by one; ``z:q`` jumps to zoom z; each value propagates to all
    higher zooms until overridden. Returns [Optional[int]; 32].
    """
    result = [None] * 32
    if not text:
        return result
    zoom = -1
    for part in text.split(","):
        part = part.strip()
        zoom += 1
        if not part:
            continue
        if ":" in part:
            z_str, part = part.split(":", 1)
            zoom = int(z_str.strip())
            if zoom > 31:
                raise ValueError("Zoom level must be between 0 and 31")
        q = int(part.strip())
        if q > 100:
            raise ValueError("Quality value must be between 0 and 100")
        for z in range(zoom, 32):
            result[z] = q
    return result


def encode(arr: np.ndarray, fmt: str, quality=None, codec: str = "pure"):
    """Encode RGBA -> bytes.

    'png' is always available (pure-stdlib codec, core/png.py; PNG is
    lossless so `quality` is ignored — reference parity:
    versatiles_image/src/format/png.rs takes no quality either).
    'jpg'/'jpeg' is always available (pure-stdlib baseline codec,
    core/jpeg.py; quality drives the quant tables, default 95 as in
    versatiles_image/src/format/jpeg.rs). JPEG has no alpha: a fully
    opaque RGBA input has its alpha stripped; translucent input is
    rejected like the reference. 'webp' uses the system libwebp via
    ctypes (reference quality semantics: None -> 95 lossy, >= 100 ->
    lossless, opaque alpha dropped). 'rgba-raw' is the zero-cost
    interchange; AVIF remains Pillow-gated."""
    if fmt == RAW_FORMAT:
        return from_array(arr)
    if fmt == "png":
        from . import png as _png

        return _png.encode_png_auto(arr)
    if fmt in ("jpg", "jpeg"):
        from . import jpeg as _jpeg

        if arr.ndim == 3 and arr.shape[2] == 4:
            if not is_opaque(arr):
                raise ValueError(
                    "JPEG only supports Grey or RGB images without alpha channel"
                )
            arr = arr[:, :, :3]
        if quality is not None and int(quality) >= 100:
            # reference parity (jpeg.rs): JPEG has no lossless mode —
            # validated BEFORE the codec split so codec=native cannot
            # accept what codec=pure rejects
            raise ValueError("JPEG quality must be below 100 (no "
                             "lossless JPEG)")
        if codec in ("native", "auto") and (
                arr.ndim == 2 or arr.shape[2] in (1, 3)):
            # throughput path (~40x): system libjpeg via the compiled
            # shim, taken ONLY when the shim's probe-time self-check
            # against the pure decoder passed (encode_jpeg_native
            # returns None otherwise and we fall back). Deterministic
            # per host+lib version but NOT the engine's
            # byte-determinism contract — byte-golden callers pass
            # codec="pure" explicitly.
            from . import imgshim as _shim

            out = _shim.encode_jpeg_native(
                arr, quality=95 if quality is None else int(quality))
            if out is not None:
                return out
        return _jpeg.encode_jpeg(arr, quality)
    if fmt == "webp":
        from . import native as _native

        if _native.HAVE_WEBP:
            # reference semantics (versatiles_image/src/format/webp.rs):
            # 8-bit RGB/RGBA only (greyscale rejected by design);
            # quality None -> 95 lossy, q >= 100 -> lossless; a fully
            # opaque alpha channel is dropped before encoding.
            if arr.ndim != 3 or arr.shape[2] not in (3, 4):
                raise ValueError("webp only supports RGB or RGBA images")
            if arr.shape[2] == 4 and is_opaque(arr):
                arr = arr[:, :, :3]
            q = 95 if quality is None else int(quality)
            arr = np.ascontiguousarray(arr, dtype=np.uint8)
            return _native.webp_encode(
                arr.tobytes(), arr.shape[1], arr.shape[0], arr.shape[2],
                quality=None if q >= 100 else float(q),
            )
    if fmt == "avif":
        from . import native as _native

        if _native.HAVE_AVIF:
            # reference semantics (versatiles_image/src/format/avif.rs):
            # quality None -> 90; lossless (>= 100) unsupported; write-
            # only format (decode intentionally absent, as in the
            # reference). speed fixed at the reference default (10).
            q = 90 if quality is None else int(quality)
            if q >= 100:
                raise ValueError(
                    "Lossless AVIF encoding is not supported, quality must be less than 100"
                )
            rgba = ensure_rgba(arr)
            return _native.avif_encode(
                np.ascontiguousarray(rgba, dtype=np.uint8).tobytes(),
                rgba.shape[1], rgba.shape[0], quality=q,
            )
    if _PILImage is None:  # pragma: no cover
        raise NotImplementedError(f"encoding {fmt!r} needs Pillow (not in sandbox)")
    import io

    buf = io.BytesIO()
    kwargs = {"quality": quality} if quality is not None else {}
    _PILImage.fromarray(arr).save(buf, format=fmt.upper(), **kwargs)
    return buf.getvalue()


def decode(payload: bytes, fmt: str, width=None, height=None) -> np.ndarray:
    if fmt == RAW_FORMAT:
        return to_array(payload, width, height)
    if fmt == "png":
        from . import png as _png

        return _png.decode_png_rgba(payload)
    if fmt in ("jpg", "jpeg"):
        from . import jpeg as _jpeg

        return _jpeg.decode_jpeg(payload)
    if fmt == "webp":
        from . import native as _native

        if _native.HAVE_WEBP:
            rgba, w, h = _native.webp_decode_rgba(payload)
            return np.frombuffer(rgba, dtype=np.uint8).reshape(h, w, 4)
    if fmt == "gif":
        from . import gif as _gif

        return _gif.decode_gif(payload)
    if fmt == "bmp":
        from . import bmp as _bmp

        return _bmp.decode_bmp(payload)
    if _PILImage is None:  # pragma: no cover
        raise NotImplementedError(f"decoding {fmt!r} needs Pillow (not in sandbox)")
    import io

    return np.asarray(_PILImage.open(io.BytesIO(payload)).convert("RGBA"))
