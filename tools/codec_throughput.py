"""Decode-throughput receipt for the vendored image codecs.

The GIF scale receipts (SCALE_RECEIPT_r08_gif_frames*.json) show the
decode tier is data-linear and partition-parallel; what they don't
quantify is the CONSTANT — how many MB/s (compressed) and Mpx/s
(pixels) one core of the pure-Python/NumPy vendored decoders
(functions/jpeg.py, png.py, gif.py) sustains, which is exactly the
number behind the "install PIL at scale" guidance in
operators/multimodal.py. This tool measures it on synthesized
payloads and, when PIL is importable, times the identical corpus
through PIL for the side-by-side. In this container PIL is absent, so
the receipt records ``pil_available: false`` and the vendored numbers
stand alone (the guidance stays qualitative until an environment with
PIL re-runs this tool — the corpus is deterministic, so numbers are
comparable across environments).

Payloads (seeded, deterministic):
- PNG: random 256×256 RGB (worst-case filters — no filter wins, so
  the decoder's per-byte unfilter work is fully exercised).
- GIF: random 256×256 indices over a 256-color palette (LZW table
  churn near-maximal).
- JPEG: 512×512 grayscale, hand-built baseline stream of
  DC-delta-0 + EOB MCUs (no encoder is vendored; entropy decode is
  trivially repetitive, so the JPEG row is IDCT-throughput — its MB/s
  overstates real streams, the Mpx/s column is the honest metric).

Usage: python tools/codec_throughput.py
Prints one JSON line; exit 0 unless a decode round-trip check fails.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 8
SEED = 20260815


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def _uniform_gray_jpeg(w: int, h: int) -> bytes:
    """Valid baseline JFIF stream: one gray component, unit DQT, DC
    category-0 coded '0', AC EOB coded '0' → every MCU is 2 bits."""
    dqt = _seg(0xDB, b"\x00" + bytes([1] * 64))
    sof = _seg(
        0xC0,
        b"\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x01\x01\x11\x00",
    )

    def dht(tc: int, th: int, by_length: dict[int, list[int]]) -> bytes:
        counts = bytes(len(by_length.get(n, [])) for n in range(1, 17))
        values = bytes(v for n in range(1, 17) for v in by_length.get(n, []))
        return _seg(0xC4, bytes([(tc << 4) | th]) + counts + values)

    tables = dht(0, 0, {1: [0]}) + dht(1, 0, {1: [0]})
    sos = _seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")
    n_mcu = ((w + 7) // 8) * ((h + 7) // 8)
    entropy = bytes((n_mcu * 2 + 7) // 8)  # all-zero bits, no 0xFF stuffing
    return b"\xff\xd8" + dqt + sof + tables + sos + entropy + b"\xff\xd9"


def main() -> int:
    from fintech_etl_spark.functions.gif import decode_gif, encode_gif
    from fintech_etl_spark.functions.jpeg import decode_baseline_jpeg
    from fintech_etl_spark.functions.png import decode_png, encode_png

    rng = np.random.default_rng(SEED)
    corpora: dict[str, tuple[list[bytes], object]] = {}

    png_payloads = [
        encode_png(rng.integers(0, 256, (256, 256, 3), dtype=np.uint8))
        for _ in range(4)
    ]
    corpora["png"] = (png_payloads, lambda b: decode_png(b)[3])

    palette = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    gif_payloads = [
        encode_gif(rng.integers(0, 256, (256, 256), dtype=np.uint8), palette)
        for _ in range(4)
    ]
    corpora["gif"] = (gif_payloads, lambda b: decode_gif(b)[3])

    corpora["jpeg"] = (
        [_uniform_gray_jpeg(512, 512)],
        lambda b: decode_baseline_jpeg(b)[3],
    )

    def run(decoders) -> dict:
        rows = {}
        for name, (payloads, fn) in corpora.items():
            dec = decoders.get(name, fn)
            px = 0
            for p in payloads:  # warm + sanity: decodes, yields pixels
                out = dec(p)
                px += int(np.asarray(out).size)
            nbytes = sum(len(p) for p in payloads)
            t0 = time.perf_counter()
            for _ in range(REPS):
                for p in payloads:
                    dec(p)
            el = (time.perf_counter() - t0) / REPS
            rows[name] = {
                "payload_bytes": nbytes,
                "pixels": px,
                "decode_s_per_pass": round(el, 4),
                "mb_per_s": round(nbytes / el / 1e6, 2),
                "mpx_per_s": round(px / el / 1e6, 3),
            }
        return rows

    vendored = run({})

    pil = None
    try:
        import io

        from PIL import Image

        def pil_decode(b: bytes):
            with Image.open(io.BytesIO(b)) as im:
                return np.asarray(im)

        pil = run({"png": pil_decode, "gif": pil_decode, "jpeg": pil_decode})
    except ImportError:
        pass

    receipt = {
        "metric": "vendored_codec_throughput",
        "reps": REPS,
        "vendored": vendored,
        "pil_available": pil is not None,
    }
    if pil is not None:
        receipt["pil"] = pil
        receipt["pil_speedup"] = {
            k: round(pil[k]["mpx_per_s"] / vendored[k]["mpx_per_s"], 1)
            for k in vendored
        }
    print(json.dumps(receipt))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
