"""Goldens for the vendored JPEG decoder (functions/jpeg.py).

The fixtures are hand-assembled byte-exact JPEG streams (segment
builder below) whose entropy bits were derived on paper from the T.81
Huffman/EXTEND procedure — baseline AND progressive (G.1.2: DC
first/refinement, AC spectral selection with EOB runs, AC successive-
approximation refinement) — so the tests pin the REAL decode path
against independently computed pixel expectations (the expected IDCT
is re-implemented locally, not imported from the module under test).
The progressive 4:2:0 fixture must reproduce the baseline 4:2:0
golden byte-for-byte: same image, different scan script."""

from __future__ import annotations

import numpy as np
import pytest

from fintech_etl_spark.functions.jpeg import (
    UnsupportedJpegError,
    decode_baseline_jpeg,
    decode_jpeg,
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


def test_arithmetic_and_lossless_rejected_loudly():
    for marker in (0xC9, 0xC3):  # arithmetic progressive / lossless
        sof = seg(marker, b"\x08" + (8).to_bytes(2, "big")
                  + (8).to_bytes(2, "big") + b"\x01\x01\x11\x00")
        jpg = b"\xff\xd8" + UNIT_DQT + sof + b"\xff\xd9"
        with pytest.raises(UnsupportedJpegError, match="unsupported frame"):
            decode_jpeg(jpg)


def bits_to_bytes(bitstring: str) -> bytes:
    """Pack a '0'/'1' string into bytes, 1-padded (T.81 F.1.2.3)."""
    s = bitstring.replace(" ", "")
    s += "1" * (-len(s) % 8)
    return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


# Shared 4:2:0 fixture: one MCU = 4 Y blocks (2x2) + Cb + Cr, DC-only.
# DC DHT {2:[0,4,5], 3:[6]}: '00'→cat0, '01'→cat4, '10'→cat5,
# '110'→cat6. Y DCs 16,24,8,32 (diffs +16,+8,-16,+24 — distinct per
# block, so the assert pins the v-then-u block ORDER inside the MCU
# and the DC prediction chain across it); Cb diff 0; Cr diff 40.
# EXTEND: +16→'10000', +8→'1000', -16→(-16+31)=15→'01111',
# +24→'11000', +40→'101000'; AC '0' = EOB after every block.
_BITS_420 = (
    "10 10000 0"  # Y(0,0): DC cat5 +16, EOB
    "01 1000 0"   # Y(0,1): DC cat4 +8  → 24
    "10 01111 0"  # Y(1,0): DC cat5 -16 → 8
    "10 11000 0"  # Y(1,1): DC cat5 +24 → 32
    "00 0"        # Cb: cat0 (0), EOB
    "110 101000 0"  # Cr: cat6 +40, EOB
)
_DC_DHT_420 = {2: [0x00, 0x04, 0x05], 3: [0x06]}
_Y_DCS = np.array([[16, 24], [8, 32]])


def _jpg_420(w: int, h: int) -> bytes:
    sof = seg(
        0xC0,
        b"\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + b"\x03" + b"\x01\x22\x00" + b"\x02\x11\x00" + b"\x03\x11\x00",
    )
    sos = seg(0xDA, b"\x03" + b"\x01\x00\x02\x00\x03\x00" + b"\x00\x3f\x00")
    return (
        b"\xff\xd8" + UNIT_DQT + sof
        + dht(0, 0, _DC_DHT_420)
        + dht(1, 0, {1: [0x00]})
        + sos
        + bits_to_bytes(_BITS_420)
        + b"\xff\xd9"
    )


def _expected_420(w: int, h: int) -> np.ndarray:
    """Independent reconstruction: local IDCT per block, replication
    upsampling of the chroma planes, BT.601 — no reuse of the module
    under test."""
    yplane = np.zeros((16, 16))
    for bv in range(2):
        for bu in range(2):
            blk = np.zeros((8, 8))
            blk[0, 0] = _Y_DCS[bv, bu]
            yplane[bv * 8 : bv * 8 + 8, bu * 8 : bu * 8 + 8] = (
                local_idct(blk) + 128.0
            )
    cb_blk = np.zeros((8, 8))
    cr_blk = np.zeros((8, 8))
    cr_blk[0, 0] = 40
    cb = np.repeat(np.repeat(local_idct(cb_blk) + 128.0, 2, 0), 2, 1)
    cr = np.repeat(np.repeat(local_idct(cr_blk) + 128.0, 2, 0), 2, 1)
    y, cbm, crm = yplane[:h, :w], cb[:h, :w] - 128.0, cr[:h, :w] - 128.0
    rgb = np.stack(
        [y + 1.402 * crm, y - 0.344136 * cbm - 0.714136 * crm, y + 1.772 * cbm],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def test_color_420_golden():
    """16x16 4:2:0: one interleaved MCU carrying 4 Y data units (2x2)
    then Cb then Cr; four distinct Y DC values pin the in-MCU block
    order and the cross-block DC prediction; chroma replicates 2x2."""
    w, h, ncomp, px = decode_baseline_jpeg(_jpg_420(16, 16))
    assert (w, h, ncomp) == (16, 16, 3)
    assert px.shape == (16, 16, 3)
    assert (px == _expected_420(16, 16)).all()
    # spot-check the quadrant structure really came through: Y DC/8
    # offsets 2,3,1,4 over 128 survive the color transform ordering
    g = px[:, :, 1].astype(int)
    assert g[0, 0] < g[0, 15] and g[15, 0] < g[0, 0] and g[15, 15] > g[0, 15]


def test_color_420_odd_dims_cropped():
    """11x13 with the same single-MCU stream: the padded 16x16 decode
    grid is cropped to the declared frame size, byte-exact."""
    w, h, ncomp, px = decode_baseline_jpeg(_jpg_420(11, 13))
    assert (w, h, ncomp) == (11, 13, 3)
    assert px.shape == (13, 11, 3)
    assert (px == _expected_420(11, 13)).all()


def test_color_422_golden():
    """16x8 4:2:2 (2x1 luma): MCU = Y,Y,Cb,Cr; chroma replicates
    horizontally only."""
    sof = seg(
        0xC0,
        b"\x08" + (8).to_bytes(2, "big") + (16).to_bytes(2, "big")
        + b"\x03" + b"\x01\x21\x00" + b"\x02\x11\x00" + b"\x03\x11\x00",
    )
    sos = seg(0xDA, b"\x03" + b"\x01\x00\x02\x00\x03\x00" + b"\x00\x3f\x00")
    bits = (
        "10 10000 0"  # Y left: +16
        "01 1000 0"   # Y right: +8 → 24
        "00 0"        # Cb 0
        "110 101000 0"  # Cr +40
    )
    jpg = (
        b"\xff\xd8" + UNIT_DQT + sof
        + dht(0, 0, _DC_DHT_420)
        + dht(1, 0, {1: [0x00]})
        + sos
        + bits_to_bytes(bits)
        + b"\xff\xd9"
    )
    w, h, ncomp, px = decode_baseline_jpeg(jpg)
    assert (w, h, ncomp) == (16, 8, 3)
    yplane = np.zeros((8, 16))
    for bu, dc in enumerate((16, 24)):
        blk = np.zeros((8, 8))
        blk[0, 0] = dc
        yplane[:, bu * 8 : bu * 8 + 8] = local_idct(blk) + 128.0
    crb = np.zeros((8, 8))
    crb[0, 0] = 40
    cr = np.repeat(local_idct(crb) + 128.0, 2, axis=1) - 128.0
    cbm = np.repeat(local_idct(np.zeros((8, 8))) + 128.0, 2, axis=1) - 128.0
    want = np.clip(
        np.round(
            np.stack(
                [
                    yplane + 1.402 * cr,
                    yplane - 0.344136 * cbm - 0.714136 * cr,
                    yplane + 1.772 * cbm,
                ],
                axis=-1,
            )
        ),
        0,
        255,
    ).astype(np.uint8)
    assert (px == want).all()


def test_nonintegral_sampling_ratio_rejected():
    """3x3 luma over 2x2 chroma: T.81-legal but needs a fractional
    upsample — out of the vendored subset, rejected loudly."""
    sof = seg(
        0xC0,
        b"\x08" + (16).to_bytes(2, "big") + (16).to_bytes(2, "big")
        + b"\x03" + b"\x01\x33\x00" + b"\x02\x22\x00" + b"\x03\x11\x00",
    )
    with pytest.raises(UnsupportedJpegError, match="non-integer sampling"):
        decode_baseline_jpeg(b"\xff\xd8" + UNIT_DQT + sof + b"\xff\xd9")


def sos_scan(comps: list[tuple[int, int, int]], ss: int, se: int,
             ah: int, al: int) -> bytes:
    """SOS header: [(comp_id, dc_table, ac_table)], band, approx bits."""
    body = bytes([len(comps)])
    for cid, dc, ac in comps:
        body += bytes([cid, (dc << 4) | ac])
    return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))


def test_baseline_noninterleaved_multiscan_444():
    """Baseline with one full-band scan PER component (non-interleaved
    multi-scan): must decode to the same flat color as the single-scan
    4:4:4 golden. Y DC 16 → '10 10000 0', Cb 0 → '0 0', Cr 40 →
    '110 101000 0'."""
    sof = seg(
        0xC0,
        b"\x08" + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
        + b"\x03" + b"\x01\x11\x00" + b"\x02\x11\x00" + b"\x03\x11\x00",
    )
    jpg = (
        b"\xff\xd8" + UNIT_DQT + sof
        + dht(0, 0, {1: [0x00], 2: [0x05], 3: [0x06]})
        + dht(1, 0, {1: [0x00]})
        + sos_scan([(1, 0, 0)], 0, 63, 0, 0)
        + bits_to_bytes("10 10000 0")
        + sos_scan([(2, 0, 0)], 0, 63, 0, 0)
        + bits_to_bytes("0 0")
        + sos_scan([(3, 0, 0)], 0, 63, 0, 0)
        + bits_to_bytes("110 101000 0")
        + b"\xff\xd9"
    )
    w, h, ncomp, px = decode_jpeg(jpg)
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


def test_baseline_noninterleaved_multiscan_420():
    """Baseline 4:2:0 as three scans: the Y scan rasters its own 2x2
    block grid (non-interleaved — no MCU padding), chroma scans are one
    block each; result must equal the interleaved 4:2:0 golden
    byte-for-byte. DC prediction restarts per scan, so Cr's diff is
    the absolute 40 again."""
    sof = seg(
        0xC0,
        b"\x08" + (16).to_bytes(2, "big") + (16).to_bytes(2, "big")
        + b"\x03" + b"\x01\x22\x00" + b"\x02\x11\x00" + b"\x03\x11\x00",
    )
    jpg = (
        b"\xff\xd8" + UNIT_DQT + sof
        + dht(0, 0, _DC_DHT_420)
        + dht(1, 0, {1: [0x00]})
        + sos_scan([(1, 0, 0)], 0, 63, 0, 0)
        + bits_to_bytes("10 10000 0 01 1000 0 10 01111 0 10 11000 0")
        + sos_scan([(2, 0, 0)], 0, 63, 0, 0)
        + bits_to_bytes("00 0")
        + sos_scan([(3, 0, 0)], 0, 63, 0, 0)
        + bits_to_bytes("110 101000 0")
        + b"\xff\xd9"
    )
    w, h, ncomp, px = decode_jpeg(jpg)
    assert (w, h, ncomp) == (16, 16, 3)
    assert (px == _expected_420(16, 16)).all()


def test_truncated_entropy_stream_raises_valueerror():
    """A stream cut mid-entropy surfaces ValueError('truncated
    stream'), not IndexError."""
    full = _jpg_420(16, 16)
    cut = full[: full.index(bits_to_bytes(_BITS_420)) + 1]  # 1 entropy byte
    with pytest.raises(ValueError, match="truncated stream"):
        decode_baseline_jpeg(cut)


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
    # PNG now has its own vendored fallback (functions/png.py): a
    # PNG-signed but garbage body is a framing error from that
    # decoder, not a missing-PIL error
    with pytest.raises(ValueError, match="chunk"):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16, "png")
    # GIF now has its own vendored fallback (functions/gif.py): a
    # GIF-signed but garbage body is a framing error from that
    # decoder, not a missing-PIL error; a real payload decodes
    with pytest.raises(ValueError, match="GIF"):
        decode_image(b"GIF89a" + b"\x00" * 16, "gif")
    import numpy as np

    from fintech_etl_spark.functions.gif import encode_gif

    pal = np.zeros((2, 3), dtype=np.uint8)
    gif = encode_gif(np.zeros((3, 2), dtype=np.uint8), pal)
    assert decode_image(gif, "gif") == (2, 3, "RGB")
    # formats with no vendored path stay loud about PIL
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(b"RIFF....WEBP" + b"\x00" * 16, "webp")


def ecs(bitstring: str) -> bytes:
    """Entropy-coded segment: pack bits (1-padded) AND byte-stuff any
    0xFF the packing produced (T.81 F.1.2.3 — encoders must emit
    FF 00 so the decoder never mistakes data for a marker)."""
    return bits_to_bytes(bitstring).replace(b"\xff", b"\xff\x00")


def gray_prog_header(w: int = 8, h: int = 8) -> bytes:
    sof = seg(
        0xC2,
        b"\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x01\x01\x11\x00",
    )
    return b"\xff\xd8" + UNIT_DQT + sof


def test_progressive_dc_first_refine_and_ac_scan():
    """Grayscale SOF2, three scans: DC first at Al=1 (5>>1 = 2: cat2
    '10', raw '10'), DC refinement at Al=0 (bit0 of 5 = '1'), then the
    AC band 1..63 at Al=0 (zigzag[1]=2: rs 0x02 '10', raw '10', EOB0
    '0'). Final coefficients DC=5, zz1=2 — checked against the local
    IDCT."""
    jpg = (
        gray_prog_header()
        + dht(0, 0, {1: [0x00], 2: [0x02]})
        + dht(1, 0, {1: [0x00], 2: [0x02]})
        + sos_scan([(1, 0, 0)], 0, 0, 0, 1)
        + ecs("10 10")
        + sos_scan([(1, 0, 0)], 0, 0, 1, 0)
        + ecs("1")
        + sos_scan([(1, 0, 0)], 1, 63, 0, 0)
        + ecs("10 10 0")
        + b"\xff\xd9"
    )
    w, h, ncomp, px = decode_jpeg(jpg)
    assert (w, h, ncomp) == (8, 8, 1)
    block = np.zeros((8, 8))
    block[0, 0] = 5
    block[0, 1] = 2
    want = np.clip(np.round(local_idct(block) + 128.0), 0, 255).astype(np.uint8)
    assert (px == want).all()


def test_progressive_ac_eobrun_spans_blocks():
    """16x8 grayscale, AC scan: block 1 carries zz1=+1 (rs 0x01 '0',
    raw '1') then EOB1 with appended bit 0 ('10 0') — an EOB run of 2
    that finishes block 1 AND silences block 2 entirely. DC scan first
    sets both DCs to 0."""
    jpg = (
        gray_prog_header(w=16, h=8)
        + dht(0, 0, {1: [0x00]})
        + dht(1, 0, {1: [0x01], 2: [0x10]})
        + sos_scan([(1, 0, 0)], 0, 0, 0, 0)
        + ecs("0 0")
        + sos_scan([(1, 0, 0)], 1, 63, 0, 0)
        + ecs("0 1 10 0")
        + b"\xff\xd9"
    )
    w, h, ncomp, px = decode_jpeg(jpg)
    assert (w, h, ncomp) == (16, 8, 1)
    b1 = np.zeros((8, 8))
    b1[0, 1] = 1
    want = np.clip(
        np.round(
            np.hstack([local_idct(b1), local_idct(np.zeros((8, 8)))]) + 128.0
        ),
        0,
        255,
    ).astype(np.uint8)
    assert (px == want).all()


def test_progressive_ac_successive_approximation_refinement():
    """The G.1.2.3 correction-bit path. True coefficients zz1=3,
    zz4=-1. AC first at Al=1 deposits zz1 → 1<<1 = 2 (zz4 truncates
    to 0). The refinement scan at Al=0 reads: rs 0x21 ('0': run 2,
    size 1), sign bit '0' → new value -1; walking the run it passes
    the nonzero-history zz1 and its correction bit '1' lifts 2 → 3;
    two zero-history slots consume the run; -1 lands at zz4; EOB0
    ('10') covers the rest of the band (no further bits — no other
    nonzero history). zigzag[4] = block (1,1)."""
    jpg = (
        gray_prog_header()
        + dht(0, 0, {1: [0x00]})
        + dht(1, 0, {1: [0x01], 2: [0x00]})   # AC table 0: first scan
        + dht(1, 1, {1: [0x21], 2: [0x00]})   # AC table 1: refinement
        + sos_scan([(1, 0, 0)], 0, 0, 0, 0)
        + ecs("0")
        + sos_scan([(1, 0, 0)], 1, 63, 0, 1)
        + ecs("0 1 10")
        + sos_scan([(1, 0, 1)], 1, 63, 1, 0)
        + ecs("0 0 1 10")
        + b"\xff\xd9"
    )
    w, h, ncomp, px = decode_jpeg(jpg)
    assert (w, h, ncomp) == (8, 8, 1)
    block = np.zeros((8, 8))
    block[0, 1] = 3
    block[1, 1] = -1
    want = np.clip(np.round(local_idct(block) + 128.0), 0, 255).astype(np.uint8)
    assert (px == want).all()


def _jpg_420_progressive(w: int, h: int) -> bytes:
    """The SAME 4:2:0 image as _jpg_420, as a five-scan progressive
    stream: interleaved DC first at Al=1 (Y diffs of v>>1: +8,+4,-8,
    +12; Cb 0; Cr +20), interleaved DC refinement (all six LSBs are 0),
    then one AC scan per component. The Y AC scan addresses Y's OWN
    2x2 block grid (non-interleaved) and is all-zero: EOB2 + appended
    '00' = an EOB run of exactly 4. DC DHT: '00'→cat0, '01'→cat3,
    '10'→cat4, '110'→cat5."""
    sof = seg(
        0xC2,
        b"\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + b"\x03" + b"\x01\x22\x00" + b"\x02\x11\x00" + b"\x03\x11\x00",
    )
    return (
        b"\xff\xd8" + UNIT_DQT + sof
        + dht(0, 0, {2: [0x00, 0x03, 0x04], 3: [0x05]})
        + dht(1, 0, {1: [0x00], 2: [0x20]})  # '0'→EOB0, '10'→EOB2
        + sos_scan([(1, 0, 0), (2, 0, 0), (3, 0, 0)], 0, 0, 0, 1)
        + ecs("10 1000 01 100 10 0111 10 1100 00 110 10100")
        + sos_scan([(1, 0, 0), (2, 0, 0), (3, 0, 0)], 0, 0, 1, 0)
        + ecs("000000")
        + sos_scan([(1, 0, 0)], 1, 63, 0, 0)
        + ecs("10 00")
        + sos_scan([(2, 0, 0)], 1, 63, 0, 0)
        + ecs("0")
        + sos_scan([(3, 0, 0)], 1, 63, 0, 0)
        + ecs("0")
        + b"\xff\xd9"
    )


def test_progressive_420_matches_baseline_golden():
    """The five-scan progressive 4:2:0 stream decodes byte-identically
    to the single-scan baseline golden of the same image — scan script
    must not change pixels. Also pins interleaved DC scans over a 2x2
    luma grid and a non-interleaved AC scan over a subsampled frame."""
    w, h, ncomp, px = decode_jpeg(_jpg_420_progressive(16, 16))
    assert (w, h, ncomp) == (16, 16, 3)
    assert (px == _expected_420(16, 16)).all()
    base = decode_jpeg(_jpg_420(16, 16))[3]
    assert (px == base).all()


def test_progressive_420_odd_dims_cropped():
    """11x13 progressive: identical scans (block grids are unchanged
    at these sizes), padded decode grid cropped to the declared frame
    size."""
    w, h, ncomp, px = decode_jpeg(_jpg_420_progressive(11, 13))
    assert (w, h, ncomp) == (11, 13, 3)
    assert (px == _expected_420(11, 13)).all()


def test_progressive_interleaved_ac_scan_rejected():
    """T.81 G.1: progressive AC scans must be non-interleaved; an SOS
    naming 3 components with Ss>0 is malformed."""
    sof = seg(
        0xC2,
        b"\x08" + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
        + b"\x03" + b"\x01\x11\x00" + b"\x02\x11\x00" + b"\x03\x11\x00",
    )
    jpg = (
        b"\xff\xd8" + UNIT_DQT + sof
        + dht(1, 0, {1: [0x00]})
        + sos_scan([(1, 0, 0), (2, 0, 0), (3, 0, 0)], 1, 63, 0, 0)
        + b"\x00\xff\xd9"
    )
    with pytest.raises(ValueError, match="non-interleaved"):
        decode_jpeg(jpg)


def test_progressive_truncated_stream():
    """Progressive stream cut inside the third scan's entropy data →
    ValueError('truncated stream'), not IndexError."""
    full = _jpg_420_progressive(16, 16)
    cut = full[: full.rindex(b"\xff\xd9") - 1]
    with pytest.raises(ValueError, match="truncated stream"):
        decode_jpeg(cut)


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
