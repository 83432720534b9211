"""Minimal baseline-JPEG decoder (dependency-free, NumPy only).

The engine's production image path uses PIL (``decode_image`` in
operators/multimodal.py), but this container ships without it — and a
decode guard that can never run is untestable. This module implements
the subset of ITU-T T.81 needed to REALLY decode a baseline JPEG:

- baseline sequential DCT (SOF0), 8-bit precision;
- grayscale (1 component) and YCbCr color (3 components) at ANY
  integer sampling-factor combination with H,V in 1..4 — which covers
  4:4:4, 4:2:2 (2x1), 4:4:0 (1x2), and 4:2:0 (2x2, the default
  output of libjpeg/mozjpeg/phone encoders); interleaved MCUs carry
  Hi×Vi data units per component (T.81 A.2.3) and subsampled planes
  are reconstructed by sample replication (nearest neighbor — the
  standard leaves the upsampling filter to the decoder);
- Huffman entropy decoding with byte-stuffing (FF 00) and restart
  markers (DRI/RSTn);
- dequantization, zigzag de-ordering, float IDCT, level shift, and
  BT.601 YCbCr→RGB.

Progressive (SOF2), arithmetic coding, 12-bit precision, non-integer
sampling ratios (e.g. 3x2 against a 2x2 luma), and non-interleaved
multi-scan streams raise ``UnsupportedJpegError`` LOUDLY — the caller
(``decode_image``) surfaces that as "install PIL", never a silent
wrong answer. Pure-python bit twiddling is fine here because the
kernel runs Arrow-batched inside mapInPandas and the fixture-scale
images it exists for are small; a PIL wheel replaces it wholesale in
production images.

Public-knowledge implementation: the format layout, Huffman procedure,
and IDCT follow the published JPEG standard (ITU-T T.81 / ISO 10918-1).
"""

from __future__ import annotations

import numpy as np

__all__ = ["decode_baseline_jpeg", "UnsupportedJpegError"]


class UnsupportedJpegError(ValueError):
    """Valid JPEG, but outside the vendored baseline subset."""


#: zigzag index -> (row, col) in the 8x8 block, per T.81 Figure A.6
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)


def _idct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-III basis (the IDCT of T.81 A.3.3)."""
    n = 8
    m = np.zeros((n, n))
    for k in range(n):
        c = np.sqrt(1.0 / n) if k == 0 else np.sqrt(2.0 / n)
        for x in range(n):
            m[x, k] = c * np.cos((2 * x + 1) * k * np.pi / (2 * n))
    return m


_IDCT_M = _idct_matrix()


def _idct2(block: np.ndarray) -> np.ndarray:
    return _IDCT_M @ block @ _IDCT_M.T


class _Huffman:
    """Canonical Huffman table from a DHT segment's (bits, values)."""

    def __init__(self, counts: list[int], values: bytes) -> None:
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, reader: "_BitReader") -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.bit()
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")


class _BitReader:
    """Entropy-coded segment reader: un-stuffs FF 00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.cur = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated stream")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError("marker inside entropy segment")
            self.cur = b
            self.nbits = 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> int:
        """Skip to the next marker (used at restart intervals)."""
        self.nbits = 0
        while (
            self.pos + 1 < len(self.data)
            and (self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00)
        ):
            self.pos += 1
        if self.pos + 1 >= len(self.data):
            raise ValueError("truncated stream")
        marker = self.data[self.pos + 1]
        self.pos += 2
        return marker


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map ``size`` raw bits to a signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_baseline_jpeg(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a baseline JPEG → ``(width, height, n_components, pixels)``.

    ``pixels`` is uint8 with shape (h, w) for grayscale or (h, w, 3)
    RGB for YCbCr color at any supported sampling (4:4:4, 4:2:2,
    4:2:0, ...; subsampled chroma is replicated to full resolution).
    Raises ``UnsupportedJpegError`` for anything outside the vendored
    subset and ``ValueError`` for malformed streams.
    """
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huffman] = {}
    huff_ac: dict[int, _Huffman] = {}
    frame = None  # (h, w, [(comp_id, tq, dc_sel, ac_sel)])
    restart_interval = 0

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("EOI before SOS — no image data")
        if marker in (0x01, *range(0xD0, 0xD8)):  # TEM/RSTn: no payload
            continue
        seglen = (data[pos] << 8) | data[pos + 1]
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                if pq != 0:
                    raise UnsupportedJpegError("16-bit quant tables")
                qtables[tq] = np.frombuffer(
                    body[off + 1 : off + 65], dtype=np.uint8
                ).astype(np.int32)
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                counts = list(body[off + 1 : off + 17])
                nvals = sum(counts)
                vals = body[off + 17 : off + 17 + nvals]
                (huff_dc if tc == 0 else huff_ac)[th] = _Huffman(counts, vals)
                off += 17 + nvals
        elif marker == 0xC0:  # SOF0 baseline
            if body[0] != 8:
                raise UnsupportedJpegError("only 8-bit precision")
            h = (body[1] << 8) | body[2]
            w = (body[3] << 8) | body[4]
            ncomp = body[5]
            comps = []
            for i in range(ncomp):
                cid = body[6 + 3 * i]
                hv = body[7 + 3 * i]
                hi, vi = hv >> 4, hv & 0x0F
                if ncomp == 1:
                    # a single-component scan is non-interleaved: the
                    # MCU is one data unit and declared factors are
                    # irrelevant (T.81 A.2.2) — normalize them away
                    hi = vi = 1
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(f"sampling factors {hi}x{vi} out of range")
                comps.append([cid, body[8 + 3 * i], None, None, hi, vi])
            if ncomp not in (1, 3):
                raise UnsupportedJpegError(f"{ncomp}-component frame")
            hmax = max(c[4] for c in comps)
            vmax = max(c[5] for c in comps)
            if any(hmax % c[4] or vmax % c[5] for c in comps):
                # replication upsampling needs integer ratios; T.81
                # permits e.g. 3:2 grids but no mainstream encoder
                # emits them
                raise UnsupportedJpegError(
                    "non-integer sampling ratio "
                    + "/".join(f"{c[4]}x{c[5]}" for c in comps)
                )
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedJpegError(
                f"non-baseline frame type SOF{marker & 0x0F}"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = (body[0] << 8) | body[1]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            sel = {body[1 + 2 * i]: body[2 + 2 * i] for i in range(ns)}
            for comp in frame[2]:
                if comp[0] in sel:
                    comp[2] = sel[comp[0]] >> 4
                    comp[3] = sel[comp[0]] & 0x0F
            if any(comp[2] is None for comp in frame[2]):
                # a scan covering fewer components than the frame is a
                # multi-scan (non-interleaved) stream — out of scope
                raise UnsupportedJpegError(
                    "non-interleaved multi-scan stream "
                    f"(SOS covers {ns} of {len(frame[2])} components)"
                )
            pos += seglen
            return _decode_scan(
                data, pos, frame, qtables, huff_dc, huff_ac, restart_interval
            )
        # APPn / COM / anything else: skip
        pos += seglen
    raise ValueError("no SOS marker found")


def _decode_block(reader, huff_dc, huff_ac, qtable, pred):
    """One 8×8 data unit: Huffman DC delta + AC run/size, dequant,
    zigzag de-order, IDCT, level shift. Returns (pixels, new_pred)."""
    zz = np.zeros(64, dtype=np.int32)
    size = huff_dc.decode(reader)
    pred = pred + _extend(reader.bits(size), size)
    zz[0] = pred
    k = 1
    while k < 64:
        rs = huff_ac.decode(reader)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(reader.bits(size), size)
        k += 1
    block = np.zeros(64, dtype=np.float64)
    block[_ZIGZAG] = zz * qtable
    return _idct2(block.reshape(8, 8)) + 128.0, pred


def _decode_scan(data, pos, frame, qtables, huff_dc, huff_ac, restart_interval):
    h, w, comps = frame
    ncomp = len(comps)
    hmax = max(c[4] for c in comps)
    vmax = max(c[5] for c in comps)
    # interleaved MCU grid: each MCU carries hi×vi data units per
    # component (T.81 A.2.3); for 4:4:4 and grayscale this degenerates
    # to the one-block-per-component case
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * c[5] * 8, mcux * c[4] * 8), dtype=np.float64)
        for c in comps
    ]
    reader = _BitReader(data, pos)
    pred = [0] * ncomp
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            m = reader.align_to_marker()
            if not 0xD0 <= m <= 0xD7:
                raise ValueError("expected RSTn at restart interval")
            pred = [0] * ncomp
        my, mx = divmod(mcu, mcux)
        for ci, (_cid, tq, dc_sel, ac_sel, hi, vi) in enumerate(comps):
            for v in range(vi):
                for u in range(hi):
                    px, pred[ci] = _decode_block(
                        reader, huff_dc[dc_sel], huff_ac[ac_sel],
                        qtables[tq], pred[ci],
                    )
                    by, bx = my * vi + v, mx * hi + u
                    planes[ci][
                        by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                    ] = px
    if ncomp == 1:
        gray = planes[0][:h, :w]
        return w, h, 1, np.clip(np.round(gray), 0, 255).astype(np.uint8)
    # upsample subsampled components to the full-resolution grid by
    # sample replication (nearest neighbor — T.81 leaves the
    # reconstruction filter to the decoder), then crop to (h, w)
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c[5], hmax // c[4]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    # BT.601 YCbCr -> RGB (T.871)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return w, h, 3, np.clip(np.round(rgb), 0, 255).astype(np.uint8)
