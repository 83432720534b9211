"""Vendored PNG decoder (functions/png.py): golden round-trips against
independently assembled streams, every filter type, palette/alpha
variants, Adam7 interlace, and loud rejections.

The fixtures never use PIL: each test FILTERS the known pixel array
itself (applying the spec arithmetic forward, per chosen filter type),
deflates it, frames chunks with CRCs, and requires decode_png to give
back exactly the source pixels — so the decoder's un-filtering is
checked against an independent forward implementation, the same
methodology as the JPEG goldens' independent IDCT."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from fintech_etl_spark.functions.png import (
    UnsupportedPngError,
    decode_png,
)

SIG = b"\x89PNG\r\n\x1a\n"


def chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def ihdr(w, h, depth=8, ctype=2, interlace=0) -> bytes:
    return chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    )


def paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def filter_scanlines(img: np.ndarray, ftypes) -> bytes:
    """Forward-apply the spec filters (the encoder side, implemented
    here independently of the decoder) — img is (h, w, c) uint8."""
    h, w, c = img.shape
    flat = img.reshape(h, w * c).astype(np.int32)
    out = bytearray()
    for y in range(h):
        ft = ftypes[y % len(ftypes)]
        out.append(ft)
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(w * c, np.int32)
        for x in range(w * c):
            left = cur[x - c] if x >= c else 0
            upleft = prev[x - c] if x >= c else 0
            if ft == 0:
                v = cur[x]
            elif ft == 1:
                v = cur[x] - left
            elif ft == 2:
                v = cur[x] - prev[x]
            elif ft == 3:
                v = cur[x] - ((left + prev[x]) >> 1)
            else:
                v = cur[x] - paeth(int(left), int(prev[x]), int(upleft))
            out.append(v & 0xFF)
    return bytes(out)


def make_png(img: np.ndarray, ctype: int, ftypes=(0,), extra=b"") -> bytes:
    h, w, c = img.shape
    raw = filter_scanlines(img, ftypes)
    return (
        SIG
        + ihdr(w, h, ctype=ctype)
        + extra
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def rng_img(h, w, c, seed=0):
    return np.random.RandomState(seed).randint(0, 256, (h, w, c), np.uint8)


def test_rgb_every_filter_type():
    """One image, scanlines cycling through ALL five filters — the
    decoder must invert each against the independent forward pass."""
    img = rng_img(10, 7, 3)
    w, h, ch, px = decode_png(make_png(img, 2, ftypes=(0, 1, 2, 3, 4)))
    assert (w, h, ch) == (7, 10, 3)
    assert np.array_equal(px, img)


def test_grayscale_and_gray_alpha():
    g = rng_img(5, 9, 1, seed=1)
    w, h, ch, px = decode_png(make_png(g, 0, ftypes=(4, 3)))
    assert (w, h, ch) == (9, 5, 1) and np.array_equal(px, g)
    ga = rng_img(6, 4, 2, seed=2)
    w, h, ch, px = decode_png(make_png(ga, 4, ftypes=(1, 2)))
    assert (w, h, ch) == (4, 6, 2) and np.array_equal(px, ga)


def test_rgba():
    img = rng_img(8, 8, 4, seed=3)
    w, h, ch, px = decode_png(make_png(img, 6, ftypes=(2, 4)))
    assert ch == 4 and np.array_equal(px, img)


def test_palette_with_and_without_trns():
    pal = rng_img(1, 16, 3, seed=4).reshape(16, 3)
    idx = np.random.RandomState(5).randint(0, 16, (7, 5, 1), np.uint8)
    plte = chunk(b"PLTE", pal.tobytes())
    png = make_png(idx, 3, ftypes=(0, 1), extra=plte)
    w, h, ch, px = decode_png(png)
    assert ch == 3 and np.array_equal(px, pal[idx[:, :, 0]])

    alpha = np.arange(16, dtype=np.uint8) * 17
    png_a = make_png(idx, 3, ftypes=(0, 1), extra=plte + chunk(b"tRNS", alpha.tobytes()))
    w, h, ch, px = decode_png(png_a)
    assert ch == 4
    assert np.array_equal(px[:, :, :3], pal[idx[:, :, 0]])
    assert np.array_equal(px[:, :, 3], alpha[idx[:, :, 0]])


def test_adam7_interlaced_matches_progressive_layout():
    """Adam7: build the 7 passes by hand on the spec grid (each pass
    filtered independently) and require the merged decode to equal the
    source — odd dims exercise empty/partial passes."""
    img = rng_img(11, 13, 3, seed=6)
    grid = (
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    )
    raw = bytearray()
    for xo, yo, xs, ys in grid:
        sub = img[yo::ys, xo::xs]
        if sub.size == 0:
            continue
        raw.extend(filter_scanlines(sub, (0, 1, 2, 3, 4)))
    png = (
        SIG
        + ihdr(13, 11, ctype=2, interlace=1)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    w, h, ch, px = decode_png(png)
    assert (w, h) == (13, 11)
    assert np.array_equal(px, img)


def test_multiple_idat_chunks_concatenate():
    img = rng_img(4, 4, 3, seed=7)
    raw = zlib.compress(filter_scanlines(img, (0,)))
    png = (
        SIG
        + ihdr(4, 4, ctype=2)
        + chunk(b"IDAT", raw[:10])
        + chunk(b"IDAT", raw[10:])
        + chunk(b"IEND", b"")
    )
    _, _, _, px = decode_png(png)
    assert np.array_equal(px, img)


def test_loud_rejections():
    img = rng_img(3, 3, 3, seed=8)
    ok = make_png(img, 2)

    with pytest.raises(ValueError, match="signature"):
        decode_png(b"notapng" + ok)
    # flip one IDAT byte → CRC must catch it
    idat_at = ok.index(b"IDAT")
    corrupt = bytearray(ok)
    corrupt[idat_at + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupt))
    # sub-byte depth: valid PNG, outside the vendored subset (16-bit
    # joined the supported set in r8 — tested below)
    png1 = SIG + ihdr(3, 3, depth=1, ctype=0) + chunk(
        b"IDAT", zlib.compress(b"\x00\x00" * 3)
    ) + chunk(b"IEND", b"")
    with pytest.raises(UnsupportedPngError, match="bit depth 1"):
        decode_png(png1)
    # 16-bit PALETTE is spec-invalid, not merely unsupported
    png16p = SIG + ihdr(3, 3, depth=16, ctype=3) + chunk(
        b"PLTE", b"\x00" * 6
    ) + chunk(
        b"IDAT", zlib.compress(b"\x00" * (3 * (3 * 2 + 1)))
    ) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="16-bit"):
        decode_png(png16p)
    # unknown filter type inside the stream
    bad = SIG + ihdr(3, 3, ctype=2) + chunk(
        b"IDAT", zlib.compress(b"\x07" + b"\x00" * 9 + b"\x00" * 20)
    ) + chunk(b"IEND", b"")
    with pytest.raises((UnsupportedPngError, ValueError)):
        decode_png(bad)
    # truncated stream (missing scanlines)
    short = SIG + ihdr(3, 3, ctype=2) + chunk(
        b"IDAT", zlib.compress(b"\x00" + b"\x00" * 9)
    ) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="IDAT stream"):
        decode_png(short)
    # palette image without PLTE
    nopal = make_png(rng_img(2, 2, 1, seed=9), 3)
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(nopal)


def test_decode_image_routes_png():
    """operators.multimodal.decode_image recognizes the PNG signature
    without PIL and reports spec width/height/mode."""
    from fintech_etl_spark.operators.multimodal import decode_image

    img = rng_img(6, 10, 3, seed=10)
    assert decode_image(make_png(img, 2), "png") == (10, 6, "RGB")
    ga = rng_img(3, 4, 2, seed=11)
    assert decode_image(make_png(ga, 4), "png") == (4, 3, "LA")


def test_adam7_grid_is_exact_partition():
    """Decoder-independent spec property: the 7 passes tile every
    (x, y) exactly once — a wrong grid round-trips against itself
    (encoder and decoder sharing the bug) but cannot pass this."""
    from fintech_etl_spark.functions.png import _ADAM7

    for w, h in ((8, 8), (13, 11), (1, 1), (5, 2)):
        seen = np.zeros((h, w), dtype=np.int32)
        for xo, yo, xs, ys in _ADAM7:
            seen[yo::ys, xo::xs] += 1
        assert (seen == 1).all(), (w, h)


from hypothesis import given, settings, strategies as st


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    ctype=st.sampled_from([0, 2, 4, 6]),
    ft=st.integers(0, 4),
    seed=st.integers(0, 2**16),
)
def test_png_roundtrip_property(w, h, ctype, ft, seed):
    """Any dims × any non-palette color type × any single filter:
    forward-filter + deflate + decode must reproduce the pixels."""
    c = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    img = np.random.RandomState(seed).randint(0, 256, (h, w, c), np.uint8)
    got_w, got_h, got_c, px = decode_png(make_png(img, ctype, ftypes=(ft,)))
    assert (got_w, got_h, got_c) == (w, h, c)
    assert np.array_equal(px, img)


def test_16bit_grayscale_hand_golden():
    """Decoder-independent 16-bit golden: a 2×2 gray-16 image with
    known big-endian sample bytes, filter None on row 0 and Up on
    row 1 (byte-wise per spec 9.2). Values >255 prove byte order."""
    # pixels: [[256, 1], [511, 258]]
    row0 = b"\x00" + bytes([0x01, 0x00, 0x00, 0x01])  # 0x0100, 0x0001
    # row1 raw bytes are 0x01FF, 0x0102; Up filter stores cur−prev
    row1 = b"\x02" + bytes(
        [(0x01 - 0x01) & 0xFF, (0xFF - 0x00) & 0xFF,
         (0x01 - 0x00) & 0xFF, (0x02 - 0x01) & 0xFF]
    )
    png = SIG + ihdr(2, 2, depth=16, ctype=0) + chunk(
        b"IDAT", zlib.compress(row0 + row1)
    ) + chunk(b"IEND", b"")
    w, h, c, px = decode_png(png)
    assert (w, h, c) == (2, 2, 1)
    assert px.dtype == np.uint16
    assert px[:, :, 0].tolist() == [[256, 1], [511, 258]]


def test_16bit_roundtrip_all_color_types_and_interlace():
    from fintech_etl_spark.functions.png import encode_png

    rng = np.random.RandomState(77)
    for c in (1, 2, 3, 4):
        for interlace in (0, 1):
            img = rng.randint(0, 65536, (9, 5, c)).astype(np.uint16)
            w, h, ch, px = decode_png(
                encode_png(img, filter_start=3, interlace=interlace)
            )
            assert (w, h, ch) == (5, 9, c)
            assert px.dtype == np.uint16
            assert np.array_equal(px, img)
