"""Vendored PNG decoder — stdlib-only (zlib), no PIL.

Companion to the vendored JPEG decoder (functions/jpeg.py): together
they cover the two image formats that dominate real web corpora, so
the multimodal pipeline decodes actual bytes in this container instead
of stubbing. Implements the PNG specification (RFC 2083 / ISO 15948):

- chunk framing with CRC-32 verification (corrupt streams fail loudly,
  never decode garbage);
- IHDR color types 0 (grayscale), 2 (RGB), 3 (palette + optional tRNS
  alpha), 4 (gray+alpha), 6 (RGBA) at bit depth 8, plus bit depth 16
  for the non-palette types (r8 — big-endian samples; filters run on
  the byte plane with bpp = channels × 2 per spec 9.2);
- all five scanline filters (None/Sub/Up/Average/Paeth) with the
  spec's exact unsigned-byte arithmetic;
- Adam7 interlacing (7 sub-image passes, each filtered independently,
  merged on the spec's offset/stride grid);
- loud ``UnsupportedPngError`` for sub-byte bit depths (1/2/4) and
  unknown filter/interlace/color values; ``ValueError`` for framing
  damage (bad signature, CRC mismatch, truncated or oversized IDAT).

The reference has no image path at all (its pipeline is CSV-only), so
this is north-star surface for the multimodal corpus operators, not
reference parity. Decoded output is golden-tested against pixel arrays
the tests assemble independently (they build the PNG bytes chunk by
chunk with explicit filter choices and compare to the source pixels).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: channels per color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

#: Adam7 pass grid: (x offset, y offset, x stride, y stride)
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


class UnsupportedPngError(ValueError):
    """Valid PNG, but outside the vendored subset (sub-byte depths,
    private interlace methods). Distinct from ValueError so callers
    can separate 'extend the decoder' from 'corrupt file'."""


def _chunks(data: bytes):
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk body")
        crc_bytes = data[pos + 8 + length : pos + 12 + length]
        if len(crc_bytes) != 4:
            raise ValueError("truncated chunk CRC")
        (crc,) = struct.unpack(">I", crc_bytes)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        yield ctype, body
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("no IEND chunk")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, w: int, h: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filtering → (h, w*bpp) uint8. ``raw`` is the
    decompressed stream: h scanlines of 1 filter byte + w*bpp data."""
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"IDAT stream is {len(raw)} bytes; expected {h * (stride + 1)}"
        )
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        line = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        ftype = line[0]
        cur = np.frombuffer(line[1:], dtype=np.uint8).astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            rec = cur
        elif ftype == 2:  # Up
            rec = (cur + prev) & 0xFF
        elif ftype == 1:  # Sub — sequential in x
            rec = cur.copy()
            for x in range(bpp, stride):
                rec[x] = (rec[x] + rec[x - bpp]) & 0xFF
        elif ftype == 3:  # Average
            rec = cur.copy()
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            rec = cur.copy()
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                upleft = int(prev[x - bpp]) if x >= bpp else 0
                rec[x] = (rec[x] + _paeth(left, int(prev[x]), upleft)) & 0xFF
        else:
            raise UnsupportedPngError(f"unknown filter type {ftype}")
        out[y] = rec.astype(np.uint8)
    return out


def decode_png(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a PNG → ``(width, height, channels, pixels)`` with
    ``pixels`` an (h, w, channels) uint8 array — uint16 for 16-bit
    images. Palette images expand to RGB (RGBA when a tRNS chunk
    supplies alpha)."""
    ihdr = None
    plte = None
    trns = None
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"tRNS":
            trns = body
        elif ctype == b"IDAT":
            idat.extend(body)
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, ctype_v, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if w == 0 or h == 0:
        raise ValueError("zero-dimension image")
    if depth not in (8, 16):
        raise UnsupportedPngError(
            f"bit depth {depth} (8 and 16 vendored; sub-byte depths not)"
        )
    if ctype_v not in _CHANNELS:
        raise UnsupportedPngError(f"color type {ctype_v}")
    if depth == 16 and ctype_v == 3:
        raise ValueError("palette images cannot be 16-bit (spec 11.2.2)")
    if comp != 0 or filt != 0:
        raise UnsupportedPngError(
            f"compression/filter method {comp}/{filt}"
        )
    if interlace not in (0, 1):
        raise UnsupportedPngError(f"interlace method {interlace}")
    # filters operate on BYTES: bpp is channels × bytes-per-sample
    # (spec 9.2 — for 16-bit, `left` is the byte two samples back)
    nch = _CHANNELS[ctype_v]
    bpp = nch * (depth // 8)
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as ex:
        raise ValueError(f"IDAT inflate failed: {ex}") from ex

    if interlace == 0:
        img = _unfilter(raw, w, h, bpp).reshape(h, w, bpp)
    else:  # Adam7: each pass is an independently filtered sub-image
        img = np.zeros((h, w, bpp), dtype=np.uint8)
        pos = 0
        for xo, yo, xs, ys in _ADAM7:
            pw = (w - xo + xs - 1) // xs
            ph = (h - yo + ys - 1) // ys
            if pw == 0 or ph == 0:
                continue
            nbytes = ph * (pw * bpp + 1)
            sub = _unfilter(raw[pos : pos + nbytes], pw, ph, bpp)
            pos += nbytes
            img[yo::ys, xo::xs] = sub.reshape(ph, pw, bpp)
        if pos != len(raw):
            raise ValueError("trailing bytes after final Adam7 pass")
    if depth == 16:
        # network byte order per spec: the unfiltered byte plane views
        # directly as big-endian uint16 samples
        img = (
            np.ascontiguousarray(img)
            .view(">u2")
            .astype(np.uint16)
            .reshape(h, w, nch)
        )
        return w, h, nch, img

    if ctype_v == 3:  # palette → RGB(A)
        if plte is None or len(plte) % 3:
            raise ValueError("palette image without a valid PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = img[:, :, 0]
        if idx.max() >= len(pal):
            raise ValueError("palette index out of range")
        rgb = pal[idx]
        if trns is not None:
            alpha = np.full(len(pal), 255, dtype=np.uint8)
            alpha[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
            return w, h, 4, np.dstack([rgb, alpha[idx]])
        return w, h, 3, rgb
    return w, h, bpp, img


# ---------------------------------------------------------------------------
# Encoder (synthesis side)
# ---------------------------------------------------------------------------


def _filter_scanlines(img: np.ndarray, start: int) -> bytes:
    """Forward-apply the spec filters, scanline y using filter
    ``(start + y) % 5`` — every payload exercises all five types."""
    h, w, c = img.shape
    flat = img.reshape(h, w * c).astype(np.int32)
    out = bytearray()
    for y in range(h):
        ft = (start + y) % 5
        out.append(ft)
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(w * c, np.int32)
        for x in range(w * c):
            left = int(cur[x - c]) if x >= c else 0
            upleft = int(prev[x - c]) if x >= c else 0
            if ft == 0:
                v = cur[x]
            elif ft == 1:
                v = cur[x] - left
            elif ft == 2:
                v = cur[x] - prev[x]
            elif ft == 3:
                v = cur[x] - ((left + int(prev[x])) >> 1)
            else:
                v = cur[x] - _paeth(left, int(prev[x]), upleft)
            out.append(v & 0xFF)
    return bytes(out)


def encode_png(
    img: np.ndarray, *, filter_start: int = 0, interlace: int = 0
) -> bytes:
    """Encode an (h, w, c) uint8 — or uint16 for a 16-bit PNG — array
    as a valid PNG (c ∈ {1, 2, 3, 4} → color types 0/4/2/6), cycling
    through all five scanline filters, optionally Adam7-interlaced.
    Synthesis side of the media fixtures; spec compliance of the
    filter/interlace math is pinned by the DECODER's independent
    goldens in tests/test_png.py (the tests implement their own
    forward pass), so encode→decode drift cannot hide a shared
    convention bug from the gate alone."""
    h, w, c = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    depth = 16 if img.dtype == np.uint16 else 8
    if depth == 16:
        # filters run on the byte plane: expand each big-endian sample
        # to two "channels" so the left-neighbor offset is bpp = 2c
        img = (
            np.ascontiguousarray(img)
            .astype(">u2")
            .view(np.uint8)
            .reshape(h, w, 2 * c)
        )
    if interlace == 0:
        raw = _filter_scanlines(img, filter_start)
    else:
        parts = bytearray()
        for xo, yo, xs, ys in _ADAM7:
            sub = img[yo::ys, xo::xs]
            if sub.size == 0:
                continue
            parts.extend(_filter_scanlines(np.ascontiguousarray(sub), filter_start))
        raw = bytes(parts)

    def _chunk(ct: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ct
            + body
            + struct.pack(">I", zlib.crc32(ct + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
