"""Pure-stdlib RIFF/WAVE codec — the audio leg of the media pool.

Scraped corpora carry PCM WAV alongside images; unlike compressed
audio (mp3/aac stay honestly opaque — no codecs in the sandbox), PCM
needs nothing beyond struct + numpy. Decode parses the RIFF chunk
list (fmt/data, unknown chunks skipped per spec), supports PCM
(format 1: unsigned 8-bit, signed 16/24/32-bit little-endian) and
IEEE float (format 3: f32/f64), any channel count; returns float32
samples normalized to [-1, 1] — the interchange the feature stage
consumes. Encode writes 16-bit PCM for fixtures and the synthetic
media fetcher."""

from __future__ import annotations

import struct

import numpy as np


def decode_wav(data: bytes):
    """WAV bytes -> (samples float32 (n, channels) in [-1, 1],
    sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV stream")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
        if tag == b"fmt ":
            if len(body) < 16:
                raise ValueError("WAV fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            raw = body
            if fmt is not None:
                break  # common layout: fmt before data
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, channels, rate, _brate, _align, bits = fmt
    if audio_format == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE
        raise NotImplementedError(
            "WAV extensible format not supported (PCM/IEEE-float only)")
    if channels < 1:
        raise ValueError("WAV with zero channels")
    if audio_format == 1:  # integer PCM
        if bits == 8:  # 8-bit WAV is UNSIGNED per spec
            s = np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
            s = (s - 128.0) / 128.0
        elif bits == 16:
            s = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            b = np.frombuffer(raw[: len(raw) - len(raw) % 3], np.uint8)
            b = b.reshape(-1, 3).astype(np.int32)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            v = np.where(v >= (1 << 23), v - (1 << 24), v)
            s = v.astype(np.float32) / float(1 << 23)
        elif bits == 32:
            s = np.frombuffer(raw, dtype="<i4").astype(np.float32) / float(1 << 31)
        else:
            raise NotImplementedError(f"WAV PCM bit depth {bits}")
    elif audio_format == 3:  # IEEE float
        dt = "<f4" if bits == 32 else "<f8" if bits == 64 else None
        if dt is None:
            raise NotImplementedError(f"WAV float bit depth {bits}")
        s = np.frombuffer(raw, dtype=dt).astype(np.float32)
    else:
        raise NotImplementedError(
            f"WAV audio format {audio_format} not supported (PCM=1, "
            "IEEE float=3); compressed audio stays opaque")
    n = (s.size // channels) * channels
    return s[:n].reshape(-1, channels), int(rate)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n, channels) float in [-1, 1] (or 1-D mono) -> 16-bit PCM WAV."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    channels = s.shape[1]
    pcm = np.clip(np.rint(s * 32767.0), -32768, 32767).astype("<i2")
    raw = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, int(sample_rate),
                      int(sample_rate) * channels * 2, channels * 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)
    return b"RIFF" + struct.pack("<I", len(body)) + body
