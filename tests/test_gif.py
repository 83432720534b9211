"""Vendored GIF codec (functions/gif.py).

The load-bearing tests are DECODER-INDEPENDENT goldens: the GIF bytes
are assembled by hand (header, color table, image descriptor) with the
LZW code stream worked out on paper from the spec's algorithm — a
convention bug shared by encode_gif/decode_gif cannot cancel out here.
Round-trip properties then widen coverage across dims, palettes,
interlace, and transparency."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from fintech_etl_spark.functions.gif import (
    decode_gif,
    encode_gif,
    gif_frame_count,
    _lzw_decode,
    _lzw_encode,
)

_BW = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)


def _hand_gif(w, h, packed_img, lzw_block):
    """Assemble a 2-color GIF by hand around a given LZW data block."""
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80, 0, 0)  # GCT, 2 entries
    out += bytes([0, 0, 0, 255, 255, 255])
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, packed_img)
    out += bytes([2])  # LZW min code size
    out += bytes([len(lzw_block)]) + lzw_block + b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_hand_assembled_golden_non_interlaced():
    """3×2 image, indices [1,1,1,1,1,0]. LZW worked by hand:
    codes (clear=4)(1)(6)(6)(0@4bit)(end=5@4bit) → bytes 8C 0D 05."""
    data = _hand_gif(3, 2, 0x00, bytes([0x8C, 0x0D, 0x05]))
    w, h, c, px = decode_gif(data)
    assert (w, h, c) == (3, 2, 3)
    want = _BW[np.array([[1, 1, 1], [1, 1, 0]])]
    assert np.array_equal(px, want)


def test_hand_assembled_golden_interlaced():
    """1×5 column [0,1,0,1,0]; 4-pass interlace stores rows 0,4,2,1,3
    → sequence [0,0,0,1,1]; hand LZW → bytes 84 13 05."""
    data = _hand_gif(1, 5, 0x40, bytes([0x84, 0x13, 0x05]))
    w, h, c, px = decode_gif(data)
    assert (w, h, c) == (1, 5, 3)
    want = _BW[np.array([[0], [1], [0], [1], [0]])]
    assert np.array_equal(px, want)


def test_lzw_kwkwk_case():
    """The code-equals-next-table-entry case (cScSc pattern): encode
    [1,1,1] → clear, 1, 6(=KwK) and make sure decode rebuilds it."""
    assert _lzw_decode(2, _lzw_encode(2, [1, 1, 1]), 3) == [1, 1, 1]


def test_roundtrip_basic_and_interlaced():
    rng = np.random.default_rng(11)
    for interlace in (False, True):
        for (h, w) in ((1, 1), (5, 1), (4, 7), (16, 9), (33, 2)):
            idx = rng.integers(0, 256, (h, w)).astype(np.uint8)
            pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
            gw, gh, c, px = decode_gif(
                encode_gif(idx, pal, interlace=interlace)
            )
            assert (gw, gh, c) == (w, h, 3)
            assert np.array_equal(px, pal[idx])


def test_transparency_becomes_alpha():
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    w, h, c, px = decode_gif(encode_gif(idx, _BW, transparent=1))
    assert c == 4
    assert np.array_equal(px[..., 3], np.where(idx == 1, 0, 255))
    assert np.array_equal(px[..., :3], _BW[idx])


def test_frame_count_walks_framing_only():
    one = encode_gif(np.zeros((2, 2), np.uint8), _BW)
    assert gif_frame_count(one) == 1
    # splice a second image block in before the trailer
    body, trailer = one[:-1], one[-1:]
    second = one[13 + 6 : -1]  # image descriptor..sub-block terminator
    assert gif_frame_count(body + second + trailer) == 2


def test_error_paths_fail_loudly():
    good = encode_gif(np.zeros((2, 2), np.uint8), _BW)
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTGIF" + good[6:])
    with pytest.raises(ValueError, match="truncated|sub-block"):
        decode_gif(good[:-6])
    with pytest.raises(ValueError, match="no image"):
        decode_gif(good[: 13 + 6] + b"\x3b")
    # pixel index outside a 2-entry palette
    bad_idx = np.array([[3]], dtype=np.uint8)
    lzw = _lzw_encode(2, bad_idx.reshape(-1))
    data = _hand_gif(1, 1, 0x00, lzw)
    with pytest.raises(ValueError, match="color table"):
        decode_gif(data)


def test_frame_count_truncation_is_valueerror_not_indexerror():
    good = encode_gif(np.zeros((2, 2), np.uint8), _BW)
    # valid 6-byte signature but shorter than the 13-byte header
    with pytest.raises(ValueError, match="truncated"):
        gif_frame_count(good[:10])
    # framing walk reaches an image descriptor cut short of 9 bytes
    img_at = good.index(b"\x2c", 13)
    with pytest.raises(ValueError, match="truncated"):
        gif_frame_count(good[: img_at + 4])
    # every prefix of a valid GIF must raise ValueError, never IndexError
    for cut in range(6, len(good)):
        try:
            gif_frame_count(good[:cut])
        except ValueError:
            pass


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    nbits=st.integers(1, 8),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31),
)
def test_roundtrip_property(h, w, nbits, interlace, seed):
    rng = np.random.default_rng(seed)
    n = 1 << nbits
    idx = rng.integers(0, n, (h, w)).astype(np.uint8)
    pal = rng.integers(0, 256, (n, 3)).astype(np.uint8)
    gw, gh, c, px = decode_gif(encode_gif(idx, pal, interlace=interlace))
    assert (gw, gh, c) == (w, h, 3)
    assert np.array_equal(px, pal[idx])


def test_animation_composites_transparent_over_previous():
    """Frame 2's transparent pixels must leave frame 1 visible (the
    GIF89a animation model) — not paint the transparent index."""
    from fintech_etl_spark.functions.gif import decode_gif_frames, encode_gif_frames

    pal = np.array(
        [[10, 10, 10], [200, 0, 0], [0, 200, 0], [0, 0, 200]], dtype=np.uint8
    )
    f1 = np.array([[1, 1], [1, 1]], dtype=np.uint8)
    f2 = np.array([[0, 2], [2, 0]], dtype=np.uint8)  # 0 = transparent here
    data = encode_gif_frames([f1, f2], pal, transparents=[None, 0])
    frames = decode_gif_frames(data)
    assert len(frames) == 2
    assert np.array_equal(frames[0], pal[f1])
    want2 = pal[np.array([[1, 2], [2, 1]])]  # red shows through holes
    assert np.array_equal(frames[1], want2)


def test_animation_offsets_and_disposal_restore_bg():
    """A sub-rectangle frame renders at its offset; disposal 2 clears
    ONLY that region back to the background color before frame 3."""
    from fintech_etl_spark.functions.gif import decode_gif_frames, encode_gif_frames

    pal = np.array(
        [[9, 9, 9], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
    )
    base = np.full((3, 3), 1, dtype=np.uint8)
    patch = np.full((1, 1), 2, dtype=np.uint8)
    tail = np.full((1, 1), 3, dtype=np.uint8)
    data = encode_gif_frames(
        [base, patch, tail],
        pal,
        screen=(3, 3),
        offsets=[(0, 0), (1, 1), (2, 2)],
        disposals=[0, 2, 0],
    )
    f = decode_gif_frames(data)
    assert len(f) == 3
    assert np.array_equal(f[0], pal[base])
    # frame 2: green patch at (1,1) over red base
    want1 = pal[base].copy()
    want1[1, 1] = pal[2]
    assert np.array_equal(f[1], want1)
    # frame 3: the patch region restored to BACKGROUND (index 0 color),
    # not to the red underneath — that is what disposal 2 means
    want2 = pal[base].copy()
    want2[1, 1] = pal[0]
    want2[2, 2] = pal[3]
    assert np.array_equal(f[2], want2)


def test_animation_frame_count_and_disposal3_loud():
    from fintech_etl_spark.functions.gif import (
        decode_gif_frames,
        encode_gif_frames,
        gif_frame_count,
    )

    pal = _BW
    frames = [np.zeros((2, 2), np.uint8) for _ in range(4)]
    data = encode_gif_frames(frames, pal)
    assert gif_frame_count(data) == 4
    assert len(decode_gif_frames(data)) == 4
    # disposal 3 = restore-previous: loud, not silently wrong
    d3 = encode_gif_frames(frames[:2], pal, disposals=[3, 0])
    with pytest.raises(ValueError, match="disposal method 3"):
        decode_gif_frames(d3)


def test_first_frame_matches_single_frame_decoder():
    from fintech_etl_spark.functions.gif import decode_gif_frames

    rng = np.random.default_rng(5)
    idx = rng.integers(0, 256, (6, 4)).astype(np.uint8)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    data = encode_gif(idx, pal)
    _, _, _, px = decode_gif(data)
    assert np.array_equal(decode_gif_frames(data)[0], px)
