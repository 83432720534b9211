"""Generate driver-schema-compatible star-schema data at larger scale.

The driver ships read-only testdata up to sf0.1 (600k lineitem rows).
Demonstrating the 100×-scale posture needs a bigger corpus, so this
generator produces the SAME ten tables — schemas, value domains, key
ratios, and date ranges copied from the sf0.1 parquet — at any scale
factor, deterministically (numpy PCG64, fixed seed). It exists for
scaling measurements (tools/bench_scale.py), NOT for correctness
gates: those always run against the driver's own data.

`events.ts` is intentionally written as parquet TIMESTAMP(NANOS, not
adjusted to UTC) via pyarrow — the same physical type the driver
writes — so the nanosAsLong read path is exercised at scale too.

Usage:
    python tools/gen_scale_data.py 1 /root/repo/.scale/sf1
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
# match the driver's n_name domain exactly: nation-keyed filters
# (q7 NATION_3, q11 NATION_5, q20 NATION_7, ...) must select real rows
# on generated data or scaling receipts measure empty pipelines
NATIONS = [f"NATION_{i}" for i in range(25)]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "F", "P"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
LANGS = ["en", "de", "es", "fr", "zh"]
PTYPES = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
# bounded name vocabulary (8 adj × 8 noun = 64 names), mirroring the
# driver's data model: entity-resolution ops run label propagation on
# the name VOCABULARY, which must NOT scale with row count
PART_ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
PART_NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
DOC_VOCAB = (
    "spark table column row key value data query scan filter group agg "
    "join sort hash merge window stream batch part order line fast slow "
    "big small a the"
).split()

DAY_NS = 86_400_000_000_000


def _day_ts(rng, n, lo_day, hi_day):
    """Random midnight timestamps (µs) in [lo_day, hi_day] days from epoch."""
    days = rng.integers(lo_day, hi_day + 1, n)
    return (days * 86_400_000_000).astype("int64")


def _write(path, name, table, row_group_size=512 * 1024):
    pq.write_table(table, os.path.join(path, f"{name}.parquet"),
                   row_group_size=row_group_size, compression="snappy")
    print(f"  {name}: {table.num_rows} rows")


def generate(sf: float, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_orders = int(1_500_000 * sf)
    n_events = int(1_000_000 * sf)
    n_docs = int(50_000 * sf)
    n_vecs = int(20_000 * sf)

    # region / nation: fixed dims at every sf
    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": NATIONS,
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))

    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supp), 2),
    }))

    adj = np.array(PART_ADJ)[rng.integers(0, len(PART_ADJ), n_part)]
    noun = np.array(PART_NOUN)[rng.integers(0, len(PART_NOUN), n_part)]
    retail = np.round(900.0 + (np.arange(n_part) % 1000) / 10.0
                      + rng.uniform(0, 100, n_part), 2)
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [f"{a} {b}" for a, b in zip(adj, noun)],
        "p_brand": pa.array([f"Brand#{b}" for b in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, len(PTYPES), n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": retail,
    }))

    # orders: dates 1995-01-01 .. 2001-08-01 (matches driver data)
    lo_day = (np.datetime64("1995-01-01") - np.datetime64("1970-01-01")).astype(int)
    hi_day = (np.datetime64("2001-08-01") - np.datetime64("1970-01-01")).astype(int)
    o_date_us = _day_ts(rng, n_orders, lo_day, hi_day)
    o_total = np.round(np.minimum(
        1000.0 + rng.gamma(2.0, 60_000.0, n_orders), 499_999.99), 2)
    o_status = np.where(
        o_date_us > (np.datetime64("1999-06-01") - np.datetime64("1970-01-01"))
        .astype("timedelta64[D]").astype(int) * 86_400_000_000,
        "O", "F").astype(object)
    p_mask = rng.random(n_orders) < 0.03
    o_status[p_mask] = "P"
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_orders), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_orders), pa.int64()),
        "o_orderstatus": pa.array(o_status, pa.string()),
        "o_totalprice": o_total,
        "o_orderdate": pa.array(o_date_us, pa.timestamp("us")),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_orders)]),
    }))

    # lineitem: 1..7 lines per order, ~4 avg → ~6M at sf1
    lines_per = rng.integers(1, 8, n_orders)
    l_orderkey = np.repeat(np.arange(n_orders), lines_per)
    n_li = len(l_orderkey)
    l_linenumber = np.concatenate([np.arange(1, k + 1) for k in lines_per]) \
        if n_orders else np.array([], dtype=np.int64)
    qty = rng.integers(1, 51, n_li).astype(np.float64)
    price_each = 900.0 + rng.uniform(0, 1200.0, n_li)
    ext = np.round(np.minimum(qty * price_each, 104_999.99), 2)
    disc = np.round(rng.integers(0, 11, n_li) / 100.0, 2)
    tax = np.round(rng.integers(0, 9, n_li) / 100.0, 2)
    ship_us = np.repeat(o_date_us, lines_per) + rng.integers(1, 95, n_li) \
        * 86_400_000_000
    rflag = np.where(rng.random(n_li) < 0.5, "N",
                     np.where(rng.random(n_li) < 0.5, "A", "R"))
    lstat = np.where(rng.random(n_li) < 0.5, "O", "F")
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(l_linenumber, pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": ext,
        "l_discount": disc,
        "l_tax": tax,
        "l_returnflag": pa.array(rflag, pa.string()),
        "l_linestatus": pa.array(lstat, pa.string()),
        "l_shipdate": pa.array(ship_us, pa.timestamp("us")),
    }))

    # events: one month, TIMESTAMP(NANOS) like the driver's file.
    # ~67 events/user (driver ratio); zipf-ish activity so user keys
    # are non-uniform without being degenerate.
    n_users = max(1, n_events // 67)
    start_ns = np.datetime64("2024-01-01", "ns").astype(np.int64)
    ts_ns = np.sort(start_ns + rng.integers(0, 30 * DAY_NS, n_events))
    user_w = 1.0 / np.arange(1, n_users + 1) ** 0.5
    user_w /= user_w.sum()
    etype = np.array(EVENT_TYPES)[
        rng.choice(5, n_events, p=[0.45, 0.30, 0.10, 0.05, 0.10])]
    value = np.where(etype == "purchase",
                     np.round(rng.gamma(2.0, 40.0, n_events), 2), 0.0)
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_events), pa.int64()),
        "ts": pa.array(ts_ns, pa.timestamp("ns")),
        "user_id": pa.array(rng.choice(np.arange(n_users), n_events,
                                       p=user_w), pa.int64()),
        "event_type": pa.array(etype, pa.string()),
        "value": value,
        "props": pa.array([json.dumps({"k": int(k)})
                           for k in rng.integers(0, 100, n_events)]),
    }))

    # documents: word-salad texts; ~8% exact dups + ~4% near-dups so
    # the dedup family has real work at scale
    lengths = rng.integers(10, 60, n_docs)
    texts = [" ".join(np.array(DOC_VOCAB)[rng.integers(0, len(DOC_VOCAB), k)])
             for k in lengths]
    dup_src = rng.integers(0, n_docs, n_docs)
    for i in range(n_docs):
        r = (i * 2654435761) % 100
        if r < 8:
            texts[i] = texts[dup_src[i]]
        elif r < 12:
            texts[i] = texts[dup_src[i]] + " extra"
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[
            rng.choice(5, n_docs, p=[0.5, 0.15, 0.15, 0.1, 0.1])]),
        "source": pa.array([f"src{s}" for s in rng.integers(0, 20, n_docs)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: 8 gaussian clusters in 64-d, labels = cluster id
    k, dim = 8, 64
    centers = rng.normal(0, 1, (k, dim))
    labels = rng.integers(0, k, n_vecs)
    vecs = (centers[labels] + rng.normal(0, 0.35, (n_vecs, dim))).astype(np.float32)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_vecs), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f"/root/repo/.scale/sf{sys.argv[1]}"
    print(f"generating sf={sf} → {out}")
    generate(sf, out)
