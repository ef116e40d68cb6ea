"""From-spec PPM/BMP codec tests: hand-built golden containers with
known pixel values (so the decoder is checked against the *format
spec*, not against our own encoder), encode→decode round-trip
properties, and malformed-input rejection."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_mp_transactions_spark.operators import imagecodec as ic

# 2x2 test image, top-down RGB: red, green / blue, white
PX = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])


def test_decode_golden_ppm_p6():
    # hand-assembled per the Netpbm spec: comment lines + mixed
    # whitespace in the header must be tolerated
    data = b"P6\n# a comment\n2 2\n# another\n255\n" + PX
    w, h, maxval, px = ic.decode_ppm(data)
    assert (w, h, maxval, px) == (2, 2, 255, PX)


def test_decode_golden_ppm_p3():
    body = b"255 0 0  0 255 0\n0 0 255  255 255 255\n"
    data = b"P3 2 2 255\n" + body
    w, h, maxval, px = ic.decode_ppm(data)
    assert (w, h, maxval, px) == (2, 2, 255, PX)


def test_decode_golden_bmp_bottom_up():
    # hand-assembled 2x2 24bpp BI_RGB: rows stored bottom-up in BGR
    # with 2 pad bytes per row (2*3=6 -> stride 8)
    row_bottom = bytes([255, 0, 0, 255, 255, 255]) + b"\x00\x00"  # blue, white
    row_top = bytes([0, 0, 255, 0, 255, 0]) + b"\x00\x00"  # red, green
    raster = row_bottom + row_top
    import struct

    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(raster), 0, 0, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
    w, h, px = ic.decode_bmp24(hdr + info + raster)
    assert (w, h, px) == (2, 2, PX)


def test_decode_golden_bmp_top_down():
    # negative height = top-down storage, same logical image
    row_top = bytes([0, 0, 255, 0, 255, 0]) + b"\x00\x00"
    row_bottom = bytes([255, 0, 0, 255, 255, 255]) + b"\x00\x00"
    raster = row_top + row_bottom
    import struct

    info = struct.pack("<IiiHHIIiiII", 40, 2, -2, 1, 24, 0, len(raster), 0, 0, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
    w, h, px = ic.decode_bmp24(hdr + info + raster)
    assert (w, h, px) == (2, 2, PX)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 9),
    h=st.integers(1, 7),
    data=st.data(),
)
def test_roundtrip_identity(w, h, data):
    px = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3))
    )
    assert ic.decode_image(ic.encode_ppm(w, h, px)) == ("ppm", w, h, px)
    assert ic.decode_image(ic.encode_ppm_ascii(w, h, px)) == ("ppm", w, h, px)
    assert ic.decode_image(ic.encode_bmp24(w, h, px)) == ("bmp", w, h, px)


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"JUNKJUNK",
        b"P6\n2 2\n255",  # header only, no raster separator/data
        b"P6\n2 2\n255\n" + b"\x00" * 5,  # truncated raster
        b"P3\n1 1\n255\n300 0 0\n",  # sample exceeds maxval
        b"P6\n0 2\n255\n",  # zero width
        b"BM" + b"\x00" * 10,  # truncated BMP header
    ],
)
def test_malformed_rejected(data):
    with pytest.raises(ic.ImageFormatError):
        ic.decode_image(data)


def test_unsupported_bmp_variant_rejected():
    import struct

    # 8bpp (palette) BMP must be rejected, not mis-decoded
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, 16, 0, 0, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 54 + 16, 0, 0, 54)
    with pytest.raises(ic.ImageFormatError):
        ic.decode_bmp24(hdr + info + b"\x00" * 16)


def test_bmp_row_padding_and_order_matter():
    # 3x1 image: stride 12 (9 + 3 pad) — decoder must strip the pad
    px = bytes(range(9))
    enc = ic.encode_bmp24(3, 1, px)
    assert len(enc) - 54 == 12
    assert ic.decode_bmp24(enc) == (3, 1, px)


def test_spark_encode_decode_operator(spark):
    from etl_mp_transactions_spark.operators.multimodal import encode_decode_images

    raw = bytes(range(36))  # 4x3x3
    df = spark.createDataFrame(
        [(1, "ppm", 4, 3, bytearray(raw)), (2, "bmp", 4, 3, bytearray(raw))],
        "asset_id long, fmt string, width int, height int, raw binary",
    )
    rows = {r["asset_id"]: r for r in encode_decode_images(df).collect()}
    for k, fmt in ((1, "ppm"), (2, "bmp")):
        assert rows[k]["fmt"] == fmt
        assert (rows[k]["width"], rows[k]["height"]) == (4, 3)
        assert rows[k]["n_bytes"] == 36
        assert rows[k]["pixel_hex"] == raw.hex().upper()
