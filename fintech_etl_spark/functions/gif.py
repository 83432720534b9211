"""Vendored GIF decoder — stdlib-only, no PIL.

Completes the vendored-codec trio (functions/jpeg.py, functions/png.py)
so ``decode_image`` covers the three formats that dominate real web
corpora. Implements the GIF87a/GIF89a specification (CompuServe, 1990;
the W3C-hosted public spec):

- logical screen descriptor + global color table;
- image descriptors with local color tables, offsets, and the spec's
  4-pass row interlace;
- the full variable-width LZW decompressor (clear/end codes, 12-bit
  cap, deferred-clear tolerant) over 255-byte data sub-blocks;
- Graphic Control Extension transparency (decoded as an alpha
  channel); other extensions (comment, application, plain text) are
  framing-skipped per spec;
- loud ``ValueError`` on framing damage (bad signature, truncated
  stream, LZW code out of range, missing color table).

``decode_gif`` renders the FIRST frame onto the logical screen
(background-filled when the frame is smaller); ``gif_frame_count``
walks the framing without inflating to count images. The companion
``encode_gif`` exists so tests and the synthetic corpus can build real
payloads with chosen palettes/interlace — spec compliance is pinned by
decoder-independent goldens in tests/test_gif.py, not by round-trip
alone.

The reference has no image path at all (its pipeline is CSV-only —
/root/reference/stream/processor.py); this is north-star multimodal
surface, not reference parity.
"""

from __future__ import annotations

import struct

import numpy as np

#: 4-pass row interlace: (first row, row step)
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))

_MAX_CODE_WIDTH = 12


def _lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> list[int]:
    """GIF-variant LZW: LSB-first bit packing, variable code width from
    min_code_size+1 up to 12 bits, CLEAR resets the table, END stops.
    ``max_pixels`` bounds the output so a malicious stream can't blow
    up memory past the declared image size."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    base = [(i,) for i in range(clear)] + [(), ()]  # clear/end placeholders

    table = list(base)
    width = min_code_size + 1
    prev: tuple[int, ...] | None = None
    out: list[int] = []

    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                # spec says END is required, but real encoders omit it
                # when the sub-blocks end exactly at a code boundary
                return out
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return out
        if prev is None:
            if code >= len(table):
                raise ValueError(f"LZW code {code} before any table entry")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            # the KwKwK case: code refers to the entry being defined
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} out of range {len(table)}")
        if len(table) == (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1
        out.extend(entry)
        if len(out) > max_pixels:
            raise ValueError(
                f"LZW stream decodes past the declared pixel count "
                f"({len(out)} > {max_pixels})"
            )
        prev = entry


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at ``pos``; returns (bytes,
    position after the 0x00 terminator)."""
    parts = []
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF: unterminated sub-blocks")
        size = data[pos]
        pos += 1
        if size == 0:
            return b"".join(parts), pos
        if pos + size > len(data):
            raise ValueError("truncated GIF: short sub-block")
        parts.append(data[pos : pos + size])
        pos += size


def _color_table(data: bytes, pos: int, n: int) -> tuple[np.ndarray, int]:
    end = pos + 3 * n
    if end > len(data):
        raise ValueError("truncated GIF: short color table")
    return (
        np.frombuffer(data[pos:end], dtype=np.uint8).reshape(n, 3).copy(),
        end,
    )


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for first, step in _INTERLACE:
        for y in range(first, h, step):
            out[y] = rows[src]
            src += 1
    return out


def decode_gif(data: bytes):
    """Decode the first frame → (width, height, channels, pixels) with
    the logical-screen dimensions; channels is 3 (RGB) or 4 (RGBA when
    the frame's Graphic Control Extension declares a transparent
    index). pixels is uint8 (h, w, channels)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF: bad signature")
    if len(data) < 13:
        raise ValueError("truncated GIF: short logical screen descriptor")
    sw, sh, packed, bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        gct, pos = _color_table(data, pos, 2 << (packed & 0x07))

    transparent: int | None = None
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            raise ValueError("GIF contains no image data")
        if block == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("truncated GIF: bare extension introducer")
            label = data[pos]
            pos += 1
            body, pos = _sub_blocks(data, pos)
            if label == 0xF9 and len(body) >= 4:  # Graphic Control
                flags, _delay, tidx = struct.unpack("<BHB", body[:4])
                transparent = tidx if flags & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        # image descriptor
        if pos + 9 > len(data):
            raise ValueError("truncated GIF: short image descriptor")
        left, top, iw, ih, ipacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        table = gct
        if ipacked & 0x80:
            table, pos = _color_table(data, pos, 2 << (ipacked & 0x07))
        if table is None:
            raise ValueError("GIF image has neither local nor global color table")
        if pos >= len(data):
            raise ValueError("truncated GIF: missing LZW code size")
        mcs = data[pos]
        pos += 1
        lzw, pos = _sub_blocks(data, pos)
        idx = _lzw_decode(mcs, lzw, iw * ih)
        if len(idx) < iw * ih:
            raise ValueError(
                f"LZW stream ended early: {len(idx)} of {iw * ih} pixels"
            )
        frame = np.array(idx[: iw * ih], dtype=np.uint8).reshape(ih, iw)
        if ipacked & 0x40:
            frame = _deinterlace(frame)
        if np.any(frame >= len(table)):
            raise ValueError("pixel index outside the color table")

        channels = 4 if transparent is not None else 3
        # render onto the logical screen: background color (or fully
        # transparent when RGBA), frame placed at its (left, top)
        if left + iw > sw or top + ih > sh:
            raise ValueError("GIF frame exceeds the logical screen")
        screen = np.zeros((sh, sw, channels), dtype=np.uint8)
        if channels == 3 and gct is not None and bg < len(gct):
            screen[:, :] = gct[bg]
        rgb = table[frame]
        if channels == 4:
            alpha = np.where(frame == transparent, 0, 255).astype(np.uint8)
            rgb = np.dstack([rgb, alpha])
        screen[top : top + ih, left : left + iw] = rgb
        return sw, sh, channels, screen
    raise ValueError("truncated GIF: no trailer, no image")


def decode_gif_frames(data: bytes) -> list[np.ndarray]:
    """Decode EVERY frame, composited per the GIF89a animation model,
    → list of (h, w, 3) uint8 RGB arrays on the logical screen.

    Compositing: transparent pixels of a frame leave the underlying
    content visible (they do NOT overwrite); after a frame renders,
    disposal 0/1 leaves the canvas, disposal 2 restores its region to
    the background color. Disposal 3 (restore-previous) is rare and
    loudly unsupported rather than silently wrong."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF: bad signature")
    if len(data) < 13:
        raise ValueError("truncated GIF: short logical screen descriptor")
    sw, sh, packed, bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        gct, pos = _color_table(data, pos, 2 << (packed & 0x07))

    bg_rgb = (
        gct[bg] if gct is not None and bg < len(gct) else np.zeros(3, np.uint8)
    )
    canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    canvas[:, :] = bg_rgb
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:
            if not frames:
                raise ValueError("GIF contains no image data")
            return frames
        if block == 0x21:
            if pos >= len(data):
                raise ValueError("truncated GIF: bare extension introducer")
            label = data[pos]
            pos += 1
            body, pos = _sub_blocks(data, pos)
            if label == 0xF9 and len(body) >= 4:
                flags, _delay, tidx = struct.unpack("<BHB", body[:4])
                transparent = tidx if flags & 0x01 else None
                disposal = (flags >> 2) & 0x07
                if disposal == 3:
                    raise ValueError(
                        "GIF disposal method 3 (restore previous) not supported"
                    )
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("truncated GIF: short image descriptor")
        left, top, iw, ih, ipacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        table = gct
        if ipacked & 0x80:
            table, pos = _color_table(data, pos, 2 << (ipacked & 0x07))
        if table is None:
            raise ValueError("GIF image has neither local nor global color table")
        if pos >= len(data):
            raise ValueError("truncated GIF: missing LZW code size")
        mcs = data[pos]
        pos += 1
        lzw, pos = _sub_blocks(data, pos)
        idx = _lzw_decode(mcs, lzw, iw * ih)
        if len(idx) < iw * ih:
            raise ValueError(
                f"LZW stream ended early: {len(idx)} of {iw * ih} pixels"
            )
        frame = np.array(idx[: iw * ih], dtype=np.uint8).reshape(ih, iw)
        if ipacked & 0x40:
            frame = _deinterlace(frame)
        if np.any(frame >= len(table)):
            raise ValueError("pixel index outside the color table")
        if left + iw > sw or top + ih > sh:
            raise ValueError("GIF frame exceeds the logical screen")
        region = canvas[top : top + ih, left : left + iw]
        rgb = table[frame]
        if transparent is not None:
            opaque = frame != transparent
            region[opaque] = rgb[opaque]
        else:
            region[:, :] = rgb
        frames.append(canvas.copy())
        if disposal == 2:
            canvas[top : top + ih, left : left + iw] = bg_rgb
        transparent = None
        disposal = 0
    raise ValueError("truncated GIF: missing trailer")


def gif_frame_count(data: bytes) -> int:
    """Number of image blocks, by framing walk only (no LZW inflate)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF: bad signature")
    if len(data) < 13:
        raise ValueError("truncated GIF: header shorter than 13 bytes")
    packed = data[10]
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    count = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:
            return count
        if block == 0x21:
            pos += 1
            _, pos = _sub_blocks(data, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("truncated GIF: short image descriptor")
        ipacked = data[pos + 8]
        pos += 9
        if ipacked & 0x80:
            pos += 3 * (2 << (ipacked & 0x07))
        pos += 1  # LZW min code size
        _, pos = _sub_blocks(data, pos)
        count += 1
    raise ValueError("truncated GIF: missing trailer")


# ---------------------------------------------------------------------------
# Encoder (test/synthesis side — lets goldens build real payloads with
# chosen palettes, interlace, and transparency)
# ---------------------------------------------------------------------------


def _lzw_encode(min_code_size: int, indices) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    codes: list[tuple[int, int]] = []  # (code, width at write time)

    table = {(i,): i for i in range(clear)}
    next_code = clear + 2
    width = min_code_size + 1
    codes.append((clear, width))
    w: tuple[int, ...] = ()
    for k in indices:
        k = int(k)
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        codes.append((table[w], width))
        table[wk] = next_code
        next_code += 1
        # decoder widens when ITS table (== next_code - 1) fills 2^width
        if next_code - 1 == (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1
        if next_code > (1 << _MAX_CODE_WIDTH):
            codes.append((clear, width))
            table = {(i,): i for i in range(clear)}
            next_code = clear + 2
            width = min_code_size + 1
        w = (k,)
    if w:
        codes.append((table[w], width))
    codes.append((end, width))

    acc = 0
    nbits = 0
    out = bytearray()
    for code, cw in codes:
        acc |= code << nbits
        nbits += cw
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _image_block(
    indices: np.ndarray,
    n_colors: int,
    *,
    left: int = 0,
    top: int = 0,
    interlace: bool = False,
) -> bytes:
    h, w = indices.shape
    out = bytearray(
        b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0x40 if interlace else 0)
    )
    rows = indices
    if interlace:
        order = [y for first, step in _INTERLACE for y in range(first, h, step)]
        rows = indices[order]
    mcs = max(2, n_colors.bit_length() - 1)
    out.append(mcs)
    lzw = _lzw_encode(mcs, rows.reshape(-1))
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00"
    return bytes(out)


def _gce(transparent: int | None, disposal: int = 0) -> bytes:
    flags = (disposal & 0x07) << 2 | (0x01 if transparent is not None else 0)
    return (
        b"\x21\xf9\x04"
        + struct.pack("<BHB", flags, 0, transparent or 0)
        + b"\x00"
    )


def encode_gif(
    indices: np.ndarray,
    palette: np.ndarray,
    *,
    interlace: bool = False,
    transparent: int | None = None,
) -> bytes:
    """Encode one frame of palette indices (h, w) with an (n, 3) uint8
    palette → GIF89a bytes. n must be a power of two ≥ 2."""
    indices = np.asarray(indices, dtype=np.uint8)
    h, w = indices.shape
    return encode_gif_frames(
        [indices],
        palette,
        screen=(w, h),
        interlace=interlace,
        transparents=[transparent],
    )


def encode_gif_frames(
    frames,
    palette: np.ndarray,
    *,
    screen: tuple[int, int] | None = None,
    offsets=None,
    disposals=None,
    transparents=None,
    interlace: bool = False,
) -> bytes:
    """Encode an animation: each frame is an (h, w) index array placed
    at its (left, top) offset on the logical screen, with optional
    per-frame disposal (0/1 leave, 2 restore-bg) and transparent
    index. One shared global palette (power of two ≥ 2)."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("need at least one frame")
    palette = np.asarray(palette, dtype=np.uint8)
    n = len(palette)
    if n & (n - 1) or n < 2:
        raise ValueError("palette size must be a power of two ≥ 2")
    offsets = offsets or [(0, 0)] * len(frames)
    disposals = disposals or [0] * len(frames)
    transparents = transparents or [None] * len(frames)
    if screen is None:
        sw = max(o[0] + f.shape[1] for f, o in zip(frames, offsets))
        sh = max(o[1] + f.shape[0] for f, o in zip(frames, offsets))
    else:
        sw, sh = screen
    size_field = n.bit_length() - 2  # 2 << size_field == n
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | size_field, 0, 0)
    out += palette.tobytes()
    for f, (left, top), disp, trans in zip(
        frames, offsets, disposals, transparents
    ):
        if trans is not None or disp:
            out += _gce(trans, disp)
        out += _image_block(f, n, left=left, top=top, interlace=interlace)
    out += b"\x3b"
    return bytes(out)
