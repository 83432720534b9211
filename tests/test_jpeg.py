"""Goldens for the vendored baseline-JPEG decoder (functions/jpeg.py).

The fixtures are hand-assembled byte-exact JPEG streams (segment
builder below) whose entropy bits were derived on paper from the T.81
Huffman/EXTEND procedure, so the test pins the REAL decode path —
marker parsing, canonical Huffman, dequant, zigzag, IDCT, level shift,
YCbCr→RGB — against independently computed pixel expectations (the
expected IDCT is re-implemented locally, not imported from the module
under test)."""

from __future__ import annotations

import numpy as np
import pytest

from fintech_etl_spark.functions.jpeg import (
    UnsupportedJpegError,
    decode_baseline_jpeg,
)


def seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def dht(tc: int, th: int, by_length: dict[int, list[int]]) -> bytes:
    counts = bytes(len(by_length.get(n, [])) for n in range(1, 17))
    values = bytes(v for n in range(1, 17) for v in by_length.get(n, []))
    return seg(0xC4, bytes([(tc << 4) | th]) + counts + values)


UNIT_DQT = seg(0xDB, b"\x00" + bytes([1] * 64))  # table 0, all-ones


def gray_header(w: int = 8, h: int = 8) -> bytes:
    sof = seg(
        0xC0,
        b"\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x01\x01\x11\x00",
    )
    return b"\xff\xd8" + UNIT_DQT + sof


SOS_1 = seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")  # comp 1 → DC0/AC0


def local_idct(block: np.ndarray) -> np.ndarray:
    """Independent orthonormal 2-D IDCT (textbook formula, no reuse)."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = np.sqrt(0.125) if u == 0 else np.sqrt(0.25)
                    cv = np.sqrt(0.125) if v == 0 else np.sqrt(0.25)
                    s += (
                        cu * cv * block[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[x, y] = s
    return out


def test_constant_gray_block():
    """All-zero coefficients → flat 128 after level shift."""
    jpg = (
        gray_header()
        + dht(0, 0, {1: [0x00]})  # DC cat 0 = '0'
        + dht(1, 0, {1: [0x00]})  # AC EOB = '0'
        + SOS_1
        + bytes([0b00111111])  # DC '0', EOB '0', 1-padding
        + b"\xff\xd9"
    )
    w, h, ncomp, px = decode_baseline_jpeg(jpg)
    assert (w, h, ncomp) == (8, 8, 1)
    assert px.shape == (8, 8)
    assert (px == 128).all()


def test_dc_and_ac_coefficients_golden():
    """DC=3 (cat 2, bits '11') and AC zigzag[1]=2 (rs 0x02, bits '10'):
    stream '10 11 10 10 0' → 0xBA 0x7F. Pixels must match a local
    IDCT of the dequantized block."""
    jpg = (
        gray_header()
        + dht(0, 0, {1: [0x00], 2: [0x02]})  # '0'→cat0, '10'→cat2
        + dht(1, 0, {1: [0x00], 2: [0x02]})  # '0'→EOB, '10'→(0,2)
        + SOS_1
        + bytes([0xBA, 0x7F])
        + b"\xff\xd9"
    )
    w, h, ncomp, px = decode_baseline_jpeg(jpg)
    assert (w, h, ncomp) == (8, 8, 1)
    block = np.zeros((8, 8))
    block[0, 0] = 3  # DC
    block[0, 1] = 2  # zigzag index 1
    want = np.clip(np.round(local_idct(block) + 128.0), 0, 255).astype(np.uint8)
    assert (px == want).all()


def test_color_444_constant_golden():
    """3-component 4:4:4, DC-only: Y=16, Cb=0, Cr=40 → one flat BT.601
    color; bits '10 10000 0 | 0 0 | 110 101000 0' → A0 35 0F."""
    sof = seg(
        0xC0,
        b"\x08" + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
        + b"\x03" + b"\x01\x11\x00" + b"\x02\x11\x00" + b"\x03\x11\x00",
    )
    sos = seg(0xDA, b"\x03" + b"\x01\x00\x02\x00\x03\x00" + b"\x00\x3f\x00")
    jpg = (
        b"\xff\xd8" + UNIT_DQT + sof
        + dht(0, 0, {1: [0x00], 2: [0x05], 3: [0x06]})
        + dht(1, 0, {1: [0x00]})
        + sos
        + bytes([0xA0, 0x35, 0x0F])
        + b"\xff\xd9"
    )
    w, h, ncomp, px = decode_baseline_jpeg(jpg)
    assert (w, h, ncomp) == (8, 8, 3)
    y, cb, cr = 16 / 8 + 128, 128.0, 40 / 8 + 128
    want = np.clip(
        np.round(
            np.array(
                [
                    y + 1.402 * (cr - 128),
                    y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128),
                    y + 1.772 * (cb - 128),
                ]
            )
        ),
        0,
        255,
    ).astype(np.uint8)
    assert (px == want.reshape(1, 1, 3)).all()


def test_progressive_rejected_loudly():
    sof2 = seg(0xC2, b"\x08" + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
               + b"\x01\x01\x11\x00")
    jpg = b"\xff\xd8" + UNIT_DQT + sof2 + b"\xff\xd9"
    with pytest.raises(UnsupportedJpegError, match="non-baseline"):
        decode_baseline_jpeg(jpg)


def test_subsampled_chroma_rejected_loudly():
    sof = seg(
        0xC0,
        b"\x08" + (16).to_bytes(2, "big") + (16).to_bytes(2, "big")
        + b"\x03" + b"\x01\x22\x00" + b"\x02\x11\x00" + b"\x03\x11\x00",
    )
    with pytest.raises(UnsupportedJpegError, match="subsampling"):
        decode_baseline_jpeg(b"\xff\xd8" + UNIT_DQT + sof + b"\xff\xd9")


def test_decode_image_falls_back_to_vendored_jpeg():
    """operators.multimodal.decode_image must decode a real JPEG even
    without PIL (this container), and stay loud for other formats."""
    from fintech_etl_spark.operators.multimodal import decode_image

    jpg = (
        gray_header()
        + dht(0, 0, {1: [0x00]})
        + dht(1, 0, {1: [0x00]})
        + SOS_1
        + bytes([0b00111111])
        + b"\xff\xd9"
    )
    assert decode_image(jpg, "jpeg") == (8, 8, "L")
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16, "png")


def test_dc_prediction_across_blocks():
    """16x8 grayscale, two MCUs: DC diffs +3 then -1 — the second
    block's absolute DC must be the running prediction 3 + (-1) = 2.
    Stream '10 11 0 | 110 0 0' → 0xB6 0x3F."""
    jpg = (
        gray_header(w=16, h=8)
        + dht(0, 0, {1: [0x00], 2: [0x02], 3: [0x01]})
        + dht(1, 0, {1: [0x00]})
        + SOS_1
        + bytes([0xB6, 0x3F])
        + b"\xff\xd9"
    )
    w, h, ncomp, px = decode_baseline_jpeg(jpg)
    assert (w, h, ncomp) == (16, 8, 1)
    b1 = np.zeros((8, 8)); b1[0, 0] = 3
    b2 = np.zeros((8, 8)); b2[0, 0] = 2
    want = np.clip(
        np.round(np.hstack([local_idct(b1), local_idct(b2)]) + 128.0), 0, 255
    ).astype(np.uint8)
    assert (px == want).all()
