"""Pure-Python image container codecs: Netpbm PPM (P6 binary / P3
ASCII) and Windows BMP (24-bit uncompressed BI_RGB).

Written from the public format specifications — the same from-spec
approach ``sources/avro_py.py`` takes for Avro — because this
container ships no codec libraries (no PIL/opencv):

- Netpbm PPM: http://netpbm.sourceforge.net/doc/ppm.html — magic
  ``P6``/``P3``, header tokens (width, height, maxval) separated by
  whitespace with ``#`` comments allowed, then a single whitespace
  byte and raw (P6) or ASCII-decimal (P3) RGB samples, row-major,
  top-down.
- BMP: the Windows BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER
  (40 bytes) layout, 24 bpp, ``BI_RGB`` (no compression); pixel rows
  are BGR byte triples padded to 4-byte multiples, stored bottom-up
  when ``biHeight > 0`` and top-down when negative.

Decoders normalize both formats to the same logical value: top-down,
row-major, RGB byte order — so a decode(encode(x)) round trip is the
identity on raw pixels regardless of the container's storage quirks
(BMP's row flip, channel swap, and row padding; PPM's header
whitespace forms). That identity is what the ``multimodal_decode``
registry query pins against its DuckDB oracle.

These run inside Arrow-batched ``mapInPandas`` workers (see
operators/multimodal.py) — per-asset Python is the honest cost of a
codec; the plumbing around it stays JVM-side.

Reference parity note: the reference has no image path at all (its
media handling stops at opaque byte columns); this module is part of
the training-data-pipeline extension surface (SURVEY.md §2.9).
"""

from __future__ import annotations

import struct

_WS = b" \t\r\n\x0b\x0c"


class ImageFormatError(ValueError):
    """Raised for malformed or unsupported image containers."""


# ---------------------------------------------------------------- PPM


def encode_ppm(width: int, height: int, pixels: bytes, maxval: int = 255) -> bytes:
    """Encode top-down RGB bytes as a binary PPM (P6) container."""
    _check_dims(width, height, pixels)
    if not 0 < maxval < 256:
        raise ImageFormatError(f"maxval {maxval} outside 1..255")
    return b"P6\n%d %d\n%d\n" % (width, height, maxval) + pixels


def encode_ppm_ascii(width: int, height: int, pixels: bytes, maxval: int = 255) -> bytes:
    """Encode as ASCII PPM (P3) — one decimal sample per token."""
    _check_dims(width, height, pixels)
    body = "\n".join(
        " ".join(str(b) for b in pixels[i : i + 3 * width])
        for i in range(0, len(pixels), 3 * width)
    )
    return b"P3\n%d %d\n%d\n" % (width, height, maxval) + body.encode("ascii") + b"\n"


def _ppm_header_tokens(data: bytes, start: int, n: int) -> tuple[list[int], int]:
    """Read `n` whitespace-separated decimal header tokens starting at
    `start`, skipping `#` comments (which run to end-of-line), per the
    Netpbm header grammar. Returns (tokens, offset past the single
    whitespace byte that terminates the last token)."""
    toks: list[int] = []
    i = start
    while len(toks) < n:
        while i < len(data) and data[i : i + 1] in (b"#",) + tuple(
            bytes([c]) for c in _WS
        ):
            if data[i : i + 1] == b"#":
                nl = data.find(b"\n", i)
                if nl == -1:
                    raise ImageFormatError("unterminated PPM comment")
                i = nl + 1
            else:
                i += 1
        j = i
        while j < len(data) and data[j : j + 1].isdigit():
            j += 1
        if j == i:
            raise ImageFormatError(f"expected decimal header token at byte {i}")
        toks.append(int(data[i:j]))
        i = j
    # exactly ONE whitespace byte separates the maxval from raster data
    if i >= len(data) or data[i : i + 1] not in tuple(bytes([c]) for c in _WS):
        raise ImageFormatError("missing whitespace after PPM header")
    return toks, i + 1


def decode_ppm(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode P6 (binary) or P3 (ASCII) PPM → (width, height, maxval,
    top-down RGB bytes)."""
    magic = data[:2]
    if magic not in (b"P6", b"P3"):
        raise ImageFormatError(f"not a PPM: magic {magic!r}")
    (w, h, maxval), off = _ppm_header_tokens(data, 2, 3)
    if w <= 0 or h <= 0 or not 0 < maxval < 256:
        raise ImageFormatError(f"bad PPM dimensions/maxval {(w, h, maxval)}")
    n = w * h * 3
    if magic == b"P6":
        body = data[off : off + n]
        if len(body) < n:
            raise ImageFormatError(f"PPM truncated: {len(body)} of {n} raster bytes")
        return w, h, maxval, bytes(body)
    samples = data[off:].split()
    if len(samples) < n:
        raise ImageFormatError(f"P3 truncated: {len(samples)} of {n} samples")
    try:
        ints = [int(s) for s in samples[:n]]
    except ValueError as ex:
        raise ImageFormatError(f"non-decimal P3 sample: {ex}") from ex
    if any(not 0 <= v <= maxval for v in ints):
        raise ImageFormatError("P3 sample outside 0..maxval")
    return w, h, maxval, bytes(ints)


# ---------------------------------------------------------------- BMP

_BMP_FILE_HDR = struct.Struct("<2sIHHI")  # magic, size, res1, res2, data offset
_BMP_INFO_HDR = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER


def encode_bmp24(width: int, height: int, pixels: bytes) -> bytes:
    """Encode top-down RGB bytes as a 24 bpp BI_RGB BMP (bottom-up
    storage, BGR channel order, rows padded to 4-byte multiples —
    the format's canonical layout)."""
    _check_dims(width, height, pixels)
    row_bytes = width * 3
    pad = (-row_bytes) % 4
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray(pixels[y * row_bytes : (y + 1) * row_bytes])
        row[0::3], row[2::3] = row[2::3], row[0::3]  # RGB -> BGR
        rows.append(bytes(row) + b"\x00" * pad)
    raster = b"".join(rows)
    data_off = _BMP_FILE_HDR.size + _BMP_INFO_HDR.size
    info = _BMP_INFO_HDR.pack(
        _BMP_INFO_HDR.size, width, height, 1, 24, 0, len(raster), 2835, 2835, 0, 0
    )
    file_hdr = _BMP_FILE_HDR.pack(b"BM", data_off + len(raster), 0, 0, data_off)
    return file_hdr + info + raster


def decode_bmp24(data: bytes) -> tuple[int, int, bytes]:
    """Decode a 24 bpp BI_RGB BMP → (width, height, top-down RGB
    bytes). Handles both bottom-up (height > 0) and top-down
    (height < 0) storage."""
    if data[:2] != b"BM":
        raise ImageFormatError(f"not a BMP: magic {data[:2]!r}")
    if len(data) < _BMP_FILE_HDR.size + _BMP_INFO_HDR.size:
        raise ImageFormatError("BMP truncated before headers")
    _, _, _, _, data_off = _BMP_FILE_HDR.unpack_from(data, 0)
    (hdr_size, width, height, planes, bpp, compression, *_rest) = _BMP_INFO_HDR.unpack_from(
        data, _BMP_FILE_HDR.size
    )
    if hdr_size < _BMP_INFO_HDR.size:
        raise ImageFormatError(f"unsupported BMP header size {hdr_size}")
    if planes != 1 or bpp != 24 or compression != 0:
        raise ImageFormatError(
            f"unsupported BMP variant: planes={planes} bpp={bpp} compression={compression}"
        )
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise ImageFormatError(f"bad BMP dimensions {(width, height)}")
    row_bytes = width * 3
    stride = row_bytes + ((-row_bytes) % 4)
    if len(data) < data_off + stride * height:
        raise ImageFormatError("BMP truncated raster")
    out = bytearray(row_bytes * height)
    for y in range(height):
        src_y = y if top_down else height - 1 - y
        row = bytearray(data[data_off + src_y * stride :][:row_bytes])
        row[0::3], row[2::3] = row[2::3], row[0::3]  # BGR -> RGB
        out[y * row_bytes : (y + 1) * row_bytes] = row
    return width, height, bytes(out)


# ------------------------------------------------------------ dispatch


def decode_image(data: bytes) -> tuple[str, int, int, bytes]:
    """Sniff the container by magic and decode → (format, width,
    height, top-down RGB bytes). The entry point `operators/
    multimodal.decode_image` (formerly the env-gated stub) routes
    here."""
    if data[:2] in (b"P6", b"P3"):
        w, h, _maxval, px = decode_ppm(data)
        return "ppm", w, h, px
    if data[:2] == b"BM":
        w, h, px = decode_bmp24(data)
        return "bmp", w, h, px
    raise ImageFormatError(f"unrecognized image magic {data[:4]!r}")


def _check_dims(width: int, height: int, pixels: bytes) -> None:
    if width <= 0 or height <= 0:
        raise ImageFormatError(f"bad dimensions {(width, height)}")
    if len(pixels) != width * height * 3:
        raise ImageFormatError(
            f"pixel buffer {len(pixels)} != {width}x{height}x3"
        )
