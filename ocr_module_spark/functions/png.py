"""Minimal stdlib-only PNG codec (zlib + struct + binascii.crc32).

The S5 image-region seam must emit REAL decodable image bytes — the
reference's crop produces PNG via pymupdf's pixmap writer
(pymupdf_image_extractor.py:15-50) — but this sandbox has no raster
libraries. A valid 8-bit RGB PNG needs nothing beyond the stdlib: the
container is length-prefixed CRC'd chunks and the pixel stream is
zlib-compressed rows with a per-row filter byte. ~60 lines buys
byte-level determinism AND downstream decodability (any viewer /
PIL.Image.open can read the output).

``decode_png`` is the matching round-trip reader for the engine's own
output (filter type 0, 8-bit RGB, single IDAT split tolerated) — used by
tests to prove the emitted bytes are a faithful pixel container, not
just a plausible header.
"""

from __future__ import annotations

import struct
import zlib
from binascii import crc32

SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", crc32(ctype + data) & 0xFFFFFFFF))


def encode_png(width: int, height: int, rgb: bytes,
               text: dict[str, str] | None = None) -> bytes:
    """8-bit RGB PNG from a packed ``rgb`` byte stream (w*h*3 bytes),
    filter type 0 on every row, optional tEXt metadata chunks."""
    if width <= 0 or height <= 0:
        raise ValueError("png dims must be positive")
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} rgb bytes, "
                         f"got {len(rgb)}")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    stride = width * 3
    raw = b"".join(b"\x00" + rgb[y * stride:(y + 1) * stride]
                   for y in range(height))
    out = [SIGNATURE, _chunk(b"IHDR", ihdr)]
    for key, val in (text or {}).items():
        out.append(_chunk(b"tEXt",
                          key.encode("latin-1") + b"\x00"
                          + val.encode("latin-1")))
    out.append(_chunk(b"IDAT", zlib.compress(raw, 6)))
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)


def decode_png(data: bytes):
    """Parse a PNG produced by :func:`encode_png` back to
    ``(width, height, rgb_bytes, text_dict)``. Supports what the encoder
    emits (8-bit RGB, filter 0, no interlace) and rejects anything else
    loudly — this is the engine's round-trip verifier, not a general
    viewer."""
    if data[:8] != SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    idat = bytearray()
    text: dict[str, str] = {}
    while pos < len(data):
        if pos + 12 > len(data):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        if pos + 12 + length > len(data):
            raise ValueError("truncated chunk body")
        body = data[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length:pos + 12 + length])
        if crc != (crc32(ctype + body) & 0xFFFFFFFF):
            raise ValueError(f"bad CRC in {ctype!r}")
        if ctype == b"IHDR":
            width, height, depth, ctype_c, comp, filt, inter = \
                struct.unpack(">IIBBBBB", body)
            if (depth, ctype_c, comp, filt, inter) != (8, 2, 0, 0, 0):
                raise ValueError("unsupported PNG flavor "
                                 f"{(depth, ctype_c, comp, filt, inter)}")
            if width == 0 or height == 0:
                # a crafted zero-dim IHDR passes signature/CRC checks but
                # has no pixels — downstream mean-pixel math would divide
                # by zero (ADVICE r3); reject like any unsupported flavor
                raise ValueError("zero-dimension IHDR")
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"tEXt":
            key, _, val = body.partition(b"\x00")
            text[key.decode("latin-1")] = val.decode("latin-1")
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("no IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * 3
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT length mismatch")
    rows = []
    for y in range(height):
        off = y * (stride + 1)
        if raw[off] != 0:
            raise ValueError(f"unsupported filter type {raw[off]} "
                             f"(encoder emits 0 only)")
        rows.append(raw[off + 1:off + 1 + stride])
    return width, height, b"".join(rows), text
