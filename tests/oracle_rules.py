"""Plain-Python oracle for the business rules, written from the spec in
SURVEY.md §2.3 (itself derived from /root/reference/rules/*.py). Used by
property tests: Spark column expression == this, ∀ rows.

Deliberately reimplemented from the documented semantics — not a copy —
so a transcription error in either implementation shows up as a diff.
"""

from __future__ import annotations

import datetime as dt
import math

BEER_SPECIAL_PACKS = {4, 6, 12, 24}


def safe_num(v, default=0.0) -> float:
    try:
        f = float(v)
    except (TypeError, ValueError):
        return default
    return default if math.isnan(f) else f


def norm_text(v) -> str:
    return "" if v is None else str(v).strip().upper()


def product_category(gl, product_class) -> str:
    g = norm_text(gl)
    if "BEER" in g:
        return "BEER"
    if "WINE" in g:
        return "WINE"
    if "SPIRIT" in g:
        return "SPIRITS"
    if "NONALCOHOL" in g:
        return (
            "MISCELLANEOUS"
            if "MISCELLANEOUS" in norm_text(product_class)
            else "NON-ALCOHOLIC"
        )
    return "MISCELLANEOUS"


def norm_uom(v) -> str:
    if v is None or str(v) in ("", "nan"):
        return "unit"
    s = str(v).lower()
    if "oz" in s:
        return "oz"
    if "ct" in s or "count" in s:
        return "ct"
    if "pack" in s:
        return "pack"
    if s == "ca" or "case" in s:
        return "case"
    if s == "bo" or "bottle" in s:
        return "bottle"
    if s == "ea" or "each" in s:
        return "each"
    return "unit"


def packs_per_case(v) -> int:
    return int(safe_num(v, 1.0)) or 1


def units_per_pack(v) -> int:
    return int(safe_num(v, 1.0)) or 1


def calc_quantity(quantity, uom, gl, product_class, packs, units) -> int:
    qty = safe_num(quantity, 0.0)
    p = packs_per_case(packs)
    u = units_per_pack(units)
    if norm_uom(uom) == "bottle":
        return int(qty)
    cat = product_category(gl, product_class)
    if cat == "BEER":
        return int(qty * p * u) if p in BEER_SPECIAL_PACKS else int(qty * p)
    if cat == "WINE":
        return int(qty * p * u)
    return int(qty * p)


def _upc14(v):
    if v is None:
        return None
    s = str(v).strip()
    if not s:
        return None
    return s.zfill(14)[:14]


def extract_upc(pack, clean, case):
    for v in (pack, clean, case):
        r = _upc14(v)
        if r is not None:
            return r
    return None


def format_sku(case):
    return _upc14(case)


def parse_invoice_date(v, run_date: dt.date) -> dt.date:
    if v is None:
        return run_date
    s = str(v).strip()
    if not s or s == "nan":
        return run_date
    try:
        return dt.datetime.strptime(s, "%m/%d/%Y").date()
    except ValueError:
        return run_date


def notes(discount, deposit, misc, delivery):
    parts = []
    for label, v in (
        ("Discount", discount),
        ("Deposit", deposit),
        ("Misc", misc),
        ("Delivery", delivery),
    ):
        f = safe_num(v, 0.0)
        if f != 0:
            parts.append(f"{label}: {f}")
    return "; ".join(parts) or None
