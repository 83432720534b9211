"""Minimal JPEG decoder (dependency-free, NumPy only).

The engine's production image path uses PIL (``decode_image`` in
operators/multimodal.py), but this container ships without it — and a
decode guard that can never run is untestable. This module implements
the subset of ITU-T T.81 needed to REALLY decode the JPEGs found in a
web-scale corpus:

- baseline sequential DCT (SOF0, and SOF1 extended-sequential at
  8-bit precision — entropy-identical), interleaved or non-interleaved
  multi-scan;
- progressive DCT (SOF2): DC first/refinement scans (interleaved or
  not), non-interleaved AC spectral-selection scans with EOB runs, and
  AC successive-approximation refinement scans (T.81 G.1.2), any scan
  script order the standard allows;
- grayscale (1 component) and YCbCr color (3 components) at ANY
  integer sampling-factor combination with H,V in 1..4 — which covers
  4:4:4, 4:2:2 (2x1), 4:4:0 (1x2), and 4:2:0 (2x2, the default
  output of libjpeg/mozjpeg/phone encoders); interleaved MCUs carry
  Hi×Vi data units per component (T.81 A.2.3) and subsampled planes
  are reconstructed by sample replication (nearest neighbor — the
  standard leaves the upsampling filter to the decoder);
- Huffman entropy decoding with byte-stuffing (FF 00) and restart
  markers (DRI/RSTn) in every scan type;
- dequantization, zigzag de-ordering, float IDCT, level shift, and
  BT.601 YCbCr→RGB.

Architecture: every scan decodes into per-component COEFFICIENT
arrays (zigzag order, int32); dequant + IDCT + upsample + color run
once at end-of-image. That single shape serves baseline one-scan,
baseline multi-scan, and progressive streams alike — progressive
scans just deposit successively better approximations of the same
coefficients.

Arithmetic coding (SOF9/13), 12-bit precision, hierarchical (SOF5-7,
DHP), lossless, and non-integer sampling ratios (e.g. 3x3 against a
2x2 chroma) raise ``UnsupportedJpegError`` LOUDLY — the caller
(``decode_image``) surfaces that as "install PIL", never a silent
wrong answer. Pure-python bit twiddling is fine here because the
kernel runs Arrow-batched inside mapInPandas and the fixture-scale
images it exists for are small; a PIL wheel replaces it wholesale in
production images.

Public-knowledge implementation: the format layout, Huffman procedure,
progressive successive-approximation control, and IDCT follow the
published JPEG standard (ITU-T T.81 / ISO 10918-1, esp. F.2 and G.1.2).
"""

from __future__ import annotations

import numpy as np

__all__ = ["decode_jpeg", "decode_baseline_jpeg", "UnsupportedJpegError"]


class UnsupportedJpegError(ValueError):
    """Valid JPEG, but outside the vendored subset."""


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


class _Component:
    """Per-component frame state: geometry + the coefficient store.

    ``coef`` holds one int32[64] row per 8×8 data unit, in ZIGZAG
    order, at the MCU-PADDED grid size (``bwp`` × ``bhp``) so
    interleaved scans can deposit their padding blocks; non-interleaved
    scans address only the first ``bw`` × ``bh`` (ceil of the
    component's sample dimensions — T.81 A.2.2 prescribes the smaller
    grid for single-component scans)."""

    __slots__ = ("cid", "tq", "hi", "vi", "bw", "bh", "bwp", "bhp", "coef")

    def __init__(self, cid: int, tq: int, hi: int, vi: int) -> None:
        self.cid = cid
        self.tq = tq
        self.hi = hi
        self.vi = vi

    def alloc(self, w: int, h: int, hmax: int, vmax: int,
              mcux: int, mcuy: int) -> None:
        cw = -(-(w * self.hi) // hmax)  # ceil(w*hi/hmax)
        ch = -(-(h * self.vi) // vmax)
        self.bw = -(-cw // 8)
        self.bh = -(-ch // 8)
        self.bwp = mcux * self.hi
        self.bhp = mcuy * self.vi
        self.coef = np.zeros((self.bhp * self.bwp, 64), dtype=np.int32)


def decode_jpeg(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a JPEG → ``(width, height, n_components, pixels)``.

    Handles baseline/extended-sequential (SOF0/SOF1, single- or
    multi-scan) and progressive (SOF2) streams; see the module
    docstring for the exact subset. ``pixels`` is uint8 with shape
    (h, w) for grayscale or (h, w, 3) RGB for YCbCr color (subsampled
    chroma replicated to full resolution). Raises
    ``UnsupportedJpegError`` outside the subset and ``ValueError`` for
    malformed streams.
    """
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huffman] = {}
    huff_ac: dict[int, _Huffman] = {}
    frame = None  # (h, w, [_Component], progressive, hmax, vmax, mcux, mcuy)
    restart_interval = 0
    saw_scan = False

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):  # TEM/RSTn: no payload
            continue
        if pos + 2 > len(data):
            raise ValueError("truncated stream")
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0 / SOF1 / SOF2
            if frame is not None:
                raise ValueError("multiple SOF markers")
            progressive = marker == 0xC2
            if body[0] != 8:
                raise UnsupportedJpegError("only 8-bit precision")
            h = (body[1] << 8) | body[2]
            w = (body[3] << 8) | body[4]
            ncomp = body[5]
            if ncomp not in (1, 3):
                raise UnsupportedJpegError(f"{ncomp}-component frame")
            comps = []
            for i in range(ncomp):
                cid = body[6 + 3 * i]
                hv = body[7 + 3 * i]
                hi, vi = hv >> 4, hv & 0x0F
                if ncomp == 1:
                    # a single-component frame is decoded non-
                    # interleaved: the MCU is one data unit and
                    # declared factors are irrelevant (T.81 A.2.2) —
                    # normalize them away
                    hi = vi = 1
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(f"sampling factors {hi}x{vi} out of range")
                comps.append(_Component(cid, body[8 + 3 * i], hi, vi))
            hmax = max(c.hi for c in comps)
            vmax = max(c.vi for c in comps)
            if any(hmax % c.hi or vmax % c.vi for c in comps):
                # replication upsampling needs integer ratios; T.81
                # permits e.g. 3:2 grids but no mainstream encoder
                # emits them
                raise UnsupportedJpegError(
                    "non-integer sampling ratio "
                    + "/".join(f"{c.hi}x{c.vi}" for c in comps)
                )
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for c in comps:
                c.alloc(w, h, hmax, vmax, mcux, mcuy)
            frame = (h, w, comps, progressive, hmax, vmax, mcux, mcuy)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF, 0xDE):
            raise UnsupportedJpegError(
                f"unsupported frame type marker FF{marker:02X} "
                "(lossless/arithmetic/hierarchical)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = (body[0] << 8) | body[1]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            pos = _decode_scan(
                data, pos + seglen, body, frame, huff_dc, huff_ac,
                restart_interval,
            )
            saw_scan = True
            continue
        # APPn / COM / DNL / anything else: skip
        pos += seglen

    if frame is None or not saw_scan:
        raise ValueError("no SOS marker found")
    return _reconstruct(frame, qtables)


#: Back-compat alias — the original public name predates progressive
#: support; ``decode_image`` (operators/multimodal.py) calls it.
decode_baseline_jpeg = decode_jpeg


# ---------------------------------------------------------------------------
# Scan decoding (baseline full-band and progressive partial-band)
# ---------------------------------------------------------------------------


def _decode_scan(data, pos, sos_body, frame, huff_dc, huff_ac,
                 restart_interval) -> int:
    """Decode ONE entropy-coded scan into the frame's coefficient
    stores; returns the byte offset of the next marker after the scan.
    Dispatches on the scan header: baseline scans are full-band
    (Ss=0, Se=63, Ah=Al=0); progressive scans carry a spectral band +
    successive-approximation bit position (T.81 B.2.3)."""
    h, w, comps, progressive, hmax, vmax, mcux, mcuy = frame
    ns = sos_body[0]
    by_id = {c.cid: c for c in comps}
    scan = []  # (component, dc_table_id, ac_table_id)
    for i in range(ns):
        cid = sos_body[1 + 2 * i]
        if cid not in by_id:
            raise ValueError(f"SOS selects unknown component {cid}")
        scan.append((by_id[cid], sos_body[2 + 2 * i] >> 4,
                     sos_body[2 + 2 * i] & 0x0F))
    ss, se = sos_body[1 + 2 * ns], sos_body[2 + 2 * ns]
    ahal = sos_body[3 + 2 * ns]
    ah, al = ahal >> 4, ahal & 0x0F

    if not progressive:
        if (ss, se, ah, al) != (0, 63, 0, 0):
            raise ValueError("sequential scan must cover band 0..63 at Ah=Al=0")
    else:
        if ss == 0 and se != 0:
            raise ValueError("progressive scan mixes DC and AC bands")
        if ss > 0 and (se < ss or se > 63):
            raise ValueError("bad spectral band")
        if ss > 0 and ns != 1:
            raise ValueError("progressive AC scan must be non-interleaved")
        if ah not in range(14) or al not in range(14) or (ah and ah != al + 1):
            raise ValueError("bad successive-approximation bit positions")

    reader = _BitReader(data, pos)
    state = {"pred": [0] * ns, "eobrun": 0}

    def reset():
        state["pred"] = [0] * ns
        state["eobrun"] = 0

    def decode_unit(si: int, block_idx: int):
        comp, dc_id, ac_id = scan[si]
        coef = comp.coef[block_idx]
        if not progressive:
            _block_sequential(reader, huff_dc[dc_id], huff_ac[ac_id],
                              coef, state, si)
        elif ss == 0 and ah == 0:
            _block_dc_first(reader, huff_dc[dc_id], coef, state, si, al)
        elif ss == 0:
            coef[0] |= reader.bit() << al  # DC refinement: one raw bit
        elif ah == 0:
            _block_ac_first(reader, huff_ac[ac_id], coef, state, ss, se, al)
        else:
            _block_ac_refine(reader, huff_ac[ac_id], coef, state, ss, se, al)

    if ns == 1:
        # non-interleaved: MCU = one data unit, raster over the
        # component's own (unpadded) block grid
        comp = scan[0][0]
        n_units = comp.bw * comp.bh
        for mcu in range(n_units):
            if restart_interval and mcu and mcu % restart_interval == 0:
                m = reader.align_to_marker()
                if not 0xD0 <= m <= 0xD7:
                    raise ValueError("expected RSTn at restart interval")
                reset()
            by, bx = divmod(mcu, comp.bw)
            decode_unit(0, by * comp.bwp + bx)
    else:
        for mcu in range(mcux * mcuy):
            if restart_interval and mcu and mcu % restart_interval == 0:
                m = reader.align_to_marker()
                if not 0xD0 <= m <= 0xD7:
                    raise ValueError("expected RSTn at restart interval")
                reset()
            my, mx = divmod(mcu, mcux)
            for si, (comp, _d, _a) in enumerate(scan):
                for v in range(comp.vi):
                    for u in range(comp.hi):
                        by, bx = my * comp.vi + v, mx * comp.hi + u
                        decode_unit(si, by * comp.bwp + bx)

    # skip to the next marker after the entropy data (trailing RSTn
    # bytes belong to the scan; FF00 stuffing is not a marker)
    p = reader.pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] != 0x00:
            if 0xD0 <= data[p + 1] <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    raise ValueError("truncated stream")


def _block_sequential(reader, hdc, hac, coef, state, si):
    """Full-band data unit (T.81 F.2.2): DC delta + AC run/size."""
    size = hdc.decode(reader)
    state["pred"][si] += _extend(reader.bits(size), size)
    coef[0] = state["pred"][si]
    k = 1
    while k < 64:
        rs = hac.decode(reader)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        coef[k] = _extend(reader.bits(size), size)
        k += 1


def _block_dc_first(reader, hdc, coef, state, si, al):
    """Progressive DC, first pass (T.81 G.1.2.1): the sequential DC
    procedure with the point transform ``<< Al`` on output."""
    size = hdc.decode(reader)
    state["pred"][si] += _extend(reader.bits(size), size)
    coef[0] = state["pred"][si] << al


def _block_ac_first(reader, hac, coef, state, ss, se, al):
    """Progressive AC, first pass (T.81 G.1.2.2): run/size within the
    spectral band, EOBn codes carry a run of all-zero bands."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = hac.decode(reader)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run != 15:
                # EOBn: run length 2^run + appended bits, including
                # this (now finished) block
                state["eobrun"] = (1 << run) - 1
                if run:
                    state["eobrun"] += reader.bits(run)
                return
            k += 16  # ZRL
            continue
        k += run
        if k > se:
            raise ValueError("AC run past end of spectral band")
        coef[k] = _extend(reader.bits(size), size) << al
        k += 1


def _block_ac_refine(reader, hac, coef, state, ss, se, al):
    """Progressive AC refinement (T.81 G.1.2.3): each already-nonzero
    coefficient in the band receives a correction bit as it is passed;
    newly nonzero coefficients appear as ±2^Al after a zero-history
    run; EOBn switches the rest of the band (and the next
    eobrun-1 blocks) to corrections-only."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = hac.decode(reader)
            run, size = rs >> 4, rs & 0x0F
            if size == 0:
                if run != 15:
                    state["eobrun"] = 1 << run
                    if run:
                        state["eobrun"] += reader.bits(run)
                    break  # rest of band handled below
                newval = 0  # ZRL: skip 16 zero-history coefficients
            else:
                if size != 1:
                    raise ValueError("refinement magnitude must be 1 bit")
                newval = p1 if reader.bit() else m1
            # advance past `run` zero-history coefficients, emitting a
            # correction bit for every nonzero-history one en route
            while k <= se:
                if coef[k] != 0:
                    if reader.bit() and (coef[k] & p1) == 0:
                        coef[k] += p1 if coef[k] > 0 else m1
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if newval and k <= se:
                coef[k] = newval
            k += 1
    if state["eobrun"] > 0:
        # this block is inside an EOB run: correction bits only
        while k <= se:
            if coef[k] != 0 and reader.bit() and (coef[k] & p1) == 0:
                coef[k] += p1 if coef[k] > 0 else m1
            k += 1
        state["eobrun"] -= 1


# ---------------------------------------------------------------------------
# Reconstruction (dequant + IDCT + upsample + color), once per image
# ---------------------------------------------------------------------------


def _reconstruct(frame, qtables) -> tuple[int, int, int, np.ndarray]:
    h, w, comps, _prog, hmax, vmax, _mx, _my = frame
    planes = []
    for c in comps:
        if c.tq not in qtables:
            raise ValueError(f"missing quantization table {c.tq}")
        q = qtables[c.tq]
        plane = np.zeros((c.bhp * 8, c.bwp * 8), dtype=np.float64)
        for idx in range(c.coef.shape[0]):
            by, bx = divmod(idx, c.bwp)
            block = np.zeros(64, dtype=np.float64)
            block[_ZIGZAG] = c.coef[idx] * q
            plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                _idct2(block.reshape(8, 8)) + 128.0
            )
        planes.append(plane)
    if len(comps) == 1:
        gray = planes[0][:h, :w]
        return w, h, 1, np.clip(np.round(gray), 0, 255).astype(np.uint8)
    # upsample subsampled components to the full-resolution grid by
    # sample replication (nearest neighbor — T.81 leaves the
    # reconstruction filter to the decoder), then crop to (h, w)
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c.vi, hmax // c.hi
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
