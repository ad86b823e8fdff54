"""Pure-stdlib WAV (RIFF/PCM) codec — the audio counterpart of
functions/png.py. Implements canonical 16-bit little-endian PCM
WAVE encode/decode with struct only, so the multimodal AUDIO decode
stage runs a real container parser in this environment (where
ffmpeg/soundfile are absent).

Layout (public spec): "RIFF" size "WAVE" + "fmt " chunk
(PCM format tag, channels, sample rate, byte rate, block align,
bits per sample) + "data" chunk (interleaved samples).
"""

from __future__ import annotations

import struct

__all__ = ["encode_wav", "decode_wav"]


def encode_wav(samples: list[int], sample_rate: int = 8000, channels: int = 1) -> bytes:
    """Encode 16-bit signed PCM samples (interleaved if channels > 1)."""
    if channels < 1:
        raise ValueError("channels must be >= 1")
    if len(samples) % channels:
        raise ValueError("sample count must be a multiple of channels")
    data = struct.pack(f"<{len(samples)}h", *samples)
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """Decode a 16-bit PCM WAV. Returns (sample_rate, channels,
    samples). Raises ValueError on non-PCM / non-16-bit / malformed
    input — loud failure, never a silent wrong answer."""
    data = bytes(data)
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos = 12
    rate = channels = None
    samples: list[int] | None = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated WAV chunk")
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt_tag, channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt_tag != 1 or bits != 16:
                raise ValueError("unsupported WAV variant (need 16-bit PCM)")
        elif tag == b"data":
            if len(body) % 2:
                raise ValueError("corrupt WAV: odd data length")
            samples = list(struct.unpack(f"<{len(body) // 2}h", body))
    if rate is None or samples is None:
        raise ValueError("truncated WAV: missing fmt/data chunk")
    return rate, channels, samples
