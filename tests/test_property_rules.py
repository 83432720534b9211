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
