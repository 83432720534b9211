"""Hypothesis property tests: randomized rule inputs, batched so each
example set is ONE Spark job (a job per example would be minutes)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

import tests.oracle_rules as O
from fintech_etl_spark.functions import rules as R

# Value pool mixing realistic and adversarial cell contents
cell = st.one_of(
    st.none(),
    st.just(""),
    st.just("nan"),
    st.integers(-1000, 1000).map(str),
    st.floats(-1e6, 1e6, allow_nan=False).map(lambda f: f"{f:.3f}"),
    st.text(
        alphabet="abcXYZ0123456789 .-/", min_size=0, max_size=12
    ),
    st.sampled_from(["CA", "BO", "EA", "6 Pack", "12ct", "case", "oz"]),
    st.sampled_from(["BEER-1", "WINE", "SPIRITS9", "NONALCOHOL", "misc"]),
)

row = st.tuples(cell, cell, cell, cell, cell, cell)


@settings(max_examples=5, deadline=None)
@given(st.lists(row, min_size=1, max_size=150))
def test_calc_quantity_property(spark, rows):
    df = spark.createDataFrame(
        rows, "q string, uom string, gl string, pc string, packs string, units string"
    )
    got = df.select(
        R.calc_quantity("q", "uom", "gl", "pc", "packs", "units").alias("qty"),
        R.norm_uom("uom").alias("u"),
        R.product_category("gl", "pc").alias("c"),
        R.packs_per_case("packs").alias("p"),
        R.units_per_pack("units").alias("un"),
    ).collect()
    for (q, uom, gl, pc, packs, units), r in zip(rows, got):
        assert r.qty == O.calc_quantity(q, uom, gl, pc, packs, units), (
            q, uom, gl, pc, packs, units,
        )
        assert r.u == O.norm_uom(uom)
        assert r.c == O.product_category(gl, pc)
        assert r.p == O.packs_per_case(packs)
        assert r.un == O.units_per_pack(units)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(cell, cell, cell), min_size=1, max_size=150))
def test_upc_property(spark, rows):
    df = spark.createDataFrame(rows, "a string, b string, c string")
    got = df.select(
        R.extract_upc("a", "b", "c").alias("upc"),
        R.format_sku("c").alias("sku"),
    ).collect()
    for (a, b, c), r in zip(rows, got):
        assert r.upc == O.extract_upc(a, b, c), (a, b, c)
        assert r.sku == O.format_sku(c), c


# Money-like amounts: two decimals, |v| ≥ 0.01 or exactly zero. Tiny
# magnitudes (< 1e-3) are excluded deliberately — Spark renders them in
# scientific notation ('1.0E-4') while Python str() stays decimal; the
# reference only ever sees money columns, where the formats agree.
amount = st.one_of(
    st.none(),
    st.just(""),
    st.just("junk"),
    st.just("0"),
    st.just("0.00"),
    st.integers(-100000, 100000).map(str),
    st.floats(-1e5, 1e5, allow_nan=False).map(lambda f: f"{f:.2f}"),
)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(amount, amount, amount, amount), min_size=1, max_size=150))
def test_notes_property(spark, rows):
    df = spark.createDataFrame(rows, "di string, de string, mi string, dl string")
    got = df.select(R.notes("di", "de", "mi", "dl").alias("n")).collect()
    for (di, de, mi, dl), r in zip(rows, got):
        assert r.n == O.notes(di, de, mi, dl), (di, de, mi, dl)


# Date-ish pool: well-formed M/d/yyyy (4-digit years — 2-digit years
# resolve differently between strptime %Y and Java yyyy), plus garbage
# that fails both parsers.
datestr = st.one_of(
    st.none(),
    st.just(""),
    st.just("nan"),
    st.just("not a date"),
    st.just("2024-06-01"),  # ISO: rejected by BOTH (strict M/d/yyyy)
    st.just("13/40/2024"),  # out of range: rejected by both
    st.tuples(
        st.integers(1, 12), st.integers(1, 28), st.integers(1900, 2100)
    ).map(lambda t: f"{t[0]}/{t[1]}/{t[2]}"),
    st.tuples(
        st.integers(1, 12), st.integers(1, 28), st.integers(1900, 2100)
    ).map(lambda t: f"{t[0]:02d}/{t[1]:02d}/{t[2]}"),
)


@settings(max_examples=5, deadline=None)
@given(st.lists(datestr, min_size=1, max_size=150))
def test_parse_invoice_date_property(spark, rows):
    import datetime as dt

    run_date = dt.date(2024, 6, 1)
    df = spark.createDataFrame([(v,) for v in rows], "d string")
    got = df.select(R.parse_invoice_date("d", run_date).alias("p")).collect()
    for v, r in zip(rows, got):
        assert r.p == O.parse_invoice_date(v, run_date), v
