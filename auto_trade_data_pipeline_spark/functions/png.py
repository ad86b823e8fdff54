"""Pure-stdlib PNG codec (zlib + struct only — no Pillow/libpng).

Implements the subset of ISO/IEC 15948 needed for real in-engine
image processing in this environment: 8-bit greyscale/RGB/RGBA,
non-interlaced, all five scanline filters (None/Sub/Up/Average/
Paeth). This turns the multimodal *decode* stage from a documented
stand-in into a real codec path: the encoder delta-filters scanlines
(filter 1) and zlib-compresses them, so a decoder bug — header
parse, inflate, unfilter arithmetic — corrupts the recovered pixels
and breaks the cross-engine oracle on the pixel statistics.

Reference layout (public spec): 8-byte signature; IHDR (width,
height, bit depth, color type); IDAT = zlib(scanlines), each
scanline prefixed by its filter byte; IEND.
"""

from __future__ import annotations

import struct
import zlib

__all__ = ["encode_png", "decode_png", "CHANNELS_OF_COLOR_TYPE"]

_SIG = b"\x89PNG\r\n\x1a\n"

CHANNELS_OF_COLOR_TYPE = {0: 1, 2: 3, 6: 4}
_COLOR_TYPE_OF_CHANNELS = {1: 0, 3: 2, 4: 6}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: bytes, width: int, height: int, channels: int = 3) -> bytes:
    """Encode raw 8-bit pixel bytes (row-major, `width*height*channels`
    long) as a PNG. Scanlines use filter 1 (Sub) — a real delta
    filter, so decoding exercises genuine unfilter arithmetic."""
    if channels not in _COLOR_TYPE_OF_CHANNELS:
        raise ValueError(f"channels must be one of {sorted(_COLOR_TYPE_OF_CHANNELS)}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(f"need {stride * height} pixel bytes, got {len(pixels)}")
    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, _COLOR_TYPE_OF_CHANNELS[channels], 0, 0, 0
    )
    raw = bytearray()
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        raw.append(1)  # filter: Sub
        prev = bytes(channels)
        for i in range(0, stride, channels):
            px = row[i : i + channels]
            raw.extend((px[c] - prev[c]) & 0xFF for c in range(channels))
            prev = px
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG produced by any conformant encoder (8-bit depth,
    color types 0/2/6, non-interlaced). Returns (width, height,
    channels, pixel bytes). Raises ValueError on anything else —
    loud failure, never a silent wrong answer."""
    if bytes(data[:8]) != _SIG:
        raise ValueError("not a PNG: bad signature")
    pos, width = 8, None
    idat = bytearray()
    height = channels = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = bytes(data[pos + 4 : pos + 8])
        body = bytes(data[pos + 8 : pos + 8 + length])
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or interlace != 0 or comp != 0 or filt != 0:
                raise ValueError("unsupported PNG variant (need 8-bit, non-interlaced)")
            if color_type not in CHANNELS_OF_COLOR_TYPE:
                raise ValueError(f"unsupported color type {color_type}")
            channels = CHANNELS_OF_COLOR_TYPE[color_type]
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG: missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("corrupt PNG: scanline payload size mismatch")
    out = bytearray()
    prev_row = bytes(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev_row[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + (left + prev_row[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                ul = prev_row[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev_row[i], ul)) & 0xFF
        else:
            raise ValueError(f"corrupt PNG: unknown filter {ftype}")
        out.extend(line)
        prev_row = bytes(line)
    return width, height, channels, bytes(out)
