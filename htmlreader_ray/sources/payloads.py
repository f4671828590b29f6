"""Deterministic minimal image payloads (pure stdlib: struct + zlib).

These make the media-decode branch REAL without any codec library: the
builders emit structurally valid PNG / GIF / JPEG headers whose
dimensions the decode stage recovers by parsing the actual bytes
(stages/media.py parse_image_header) — no fake metadata on this path.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def make_png(width: int, height: int) -> bytes:
    """Minimal truecolor PNG: signature + IHDR + 1-byte IDAT + IEND, with
    real CRCs."""
    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"\x00" * (1 + 3 * width))  # one filtered row
    return (PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


def make_gif(width: int, height: int) -> bytes:
    """GIF89a header + logical screen descriptor + trailer."""
    return (b"GIF89a" + struct.pack("<HH", width, height)
            + b"\x70\x00\x00" + b"\x3b")


def make_jpeg(width: int, height: int) -> bytes:
    """SOI + APP0(JFIF) + SOF0 carrying the dimensions + EOI."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" \
        + b"\x00" + struct.pack(">HH", 72, 72) + b"\x00\x00"
    sof0 = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" \
        + struct.pack(">HH", height, width) + b"\x03" \
        + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def make_bmp(width: int, height: int) -> bytes:
    """BITMAPFILEHEADER + BITMAPINFOHEADER (40-byte), no pixel data."""
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, 0,
                       2835, 2835, 0, 0)
    file_hdr = b"BM" + struct.pack("<IHHI", 14 + 40, 0, 0, 14 + 40)
    return file_hdr + info


def make_webp(width: int, height: int) -> bytes:
    """RIFF/WEBP container with a VP8L (lossless) chunk header: the
    14-bit width-1/height-1 bitfield the header parser reads."""
    bits = (width - 1) | ((height - 1) << 14)
    vp8l = b"\x2f" + struct.pack("<I", bits)
    chunk = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def make_wav(duration_ms: int, sample_rate: int = 8000) -> bytes:
    """Minimal PCM WAV: RIFF/WAVE + fmt chunk + silent data chunk sized
    for the requested duration (1 channel, 8-bit)."""
    byte_rate = sample_rate  # 1 channel x 1 byte
    n = duration_ms * byte_rate // 1000
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate, 1, 8)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", n) + b"\x80" * n)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


_BUILDERS = {"png": make_png, "gif": make_gif, "jpeg": make_jpeg,
             "bmp": make_bmp, "webp": make_webp}


def make_image(fmt: str, width: int, height: int) -> bytes:
    return _BUILDERS[fmt](width, height)
