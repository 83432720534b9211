"""Plan-quality regression tests: the 100 TB posture, pinned.

Correctness says the answer is right; these say the PLAN is the one
that survives a 1000-executor cluster — filters reach the scan,
dimensions broadcast, top-k never globally sorts, bucketing removes
the join shuffle, partition pruning reaches the directory layout.
"""

from __future__ import annotations

import io
import contextlib

import pytest

from pyspark.sql import functions as F

from fintech_etl_spark.registry import all_specs
from tests.conftest import SF_SMOKE


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def tree_of(plan: str) -> str:
    """Just the operator tree (formatted mode repeats every operator in
    the numbered detail section below the tree)."""
    return plan.split("\n\n(")[0]


@pytest.fixture(scope="module")
def specs():
    return all_specs()


def test_q1_filter_pushed_and_pruned(spark, specs):
    plan = plan_of(specs["q1_pricing_summary"].fn(spark, SF_SMOKE))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: only the 7 needed columns in the scan schema
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in read and "l_partkey" not in read
    # two-level scaled-integer accumulation (long partials per input
    # partition, DECIMAL(38,0) merge): partial+final hash agg around an
    # exchange at EACH level — the second level moves only
    # groups×partitions rows, so the extra exchange is ~free while the
    # per-row hot path stays in long arithmetic
    tree = tree_of(plan)
    assert tree.count("HashAggregate") == 4
    assert tree.count("- Exchange") == 2


def test_q5_star_join_broadcasts_all_dims(spark, specs):
    plan = plan_of(specs["q5_region_revenue"].fn(spark, SF_SMOKE))
    tree = tree_of(plan)
    assert tree.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan
    # the fact table never shuffles before aggregation (BroadcastExchange
    # moves only the tiny dims; shuffle Exchanges render as "- Exchange")
    assert tree.count("- Exchange") <= 1


def test_topk_uses_take_ordered_not_global_sort(spark, specs):
    plan = plan_of(specs["topk_orders_global"].fn(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no full sort operator


def test_semi_anti_join_shapes(spark, specs):
    semi = plan_of(specs["semi_join_big_spenders"].fn(spark, SF_SMOKE))
    anti = plan_of(specs["anti_join_no_big_order"].fn(spark, SF_SMOKE))
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti
    # o_totalprice filter is below the join, at the orders scan
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice" in semi


def test_q19_disjunction_partially_pushed(spark, specs):
    plan = plan_of(specs["q19_disjunctive_predicates"].fn(spark, SF_SMOKE))
    # Catalyst derives per-side residuals from the OR-of-ANDs and pushes
    # them into BOTH scans (lineitem quantity bounds, part size bounds)
    assert "GreaterThanOrEqual(l_quantity,25.0)" in plan and "LessThanOrEqual(l_quantity,5.0)" in plan
    assert "LessThanOrEqual(p_size,10)" in plan and "GreaterThanOrEqual(p_size,40)" in plan


def test_q6_all_predicates_reach_scan(spark, specs):
    plan = plan_of(specs["q6_forecast_revenue"].fn(spark, SF_SMOKE))
    # every predicate (date range, discount band, quantity bound) is in
    # PushedFilters — zero raw rows cross an exchange
    pushed = next(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed
    tree = tree_of(plan)
    assert tree.count("HashAggregate") == 2 and tree.count("- Exchange") == 1


def test_q8_seven_way_join_no_sort_merge_at_dim_scale(spark, specs):
    plan = plan_of(specs["q8_market_share"].fn(spark, SF_SMOKE))
    tree = tree_of(plan)
    # part/supplier/region/nation(×2) are forced broadcasts; at smoke
    # scale orders/customer also fit under the threshold, so the whole
    # 7-join pipeline stays broadcast with a single agg exchange
    assert tree.count("BroadcastHashJoin") == 7
    assert "SortMergeJoin" not in tree
    assert tree.count("- Exchange") == 1


def test_q2_rank1_uses_window_group_limit(spark, specs):
    plan = plan_of(specs["q2_min_cost_supplier"].fn(spark, SF_SMOKE))
    # rn=1 filter is pushed INTO the window as WindowGroupLimit (top-1
    # per partition kept pre-shuffle) — at scale this prunes the window
    # input instead of ranking every group fully
    assert "WindowGroupLimit" in plan


def test_q21_late_fact_computed_once(spark, specs):
    """r15 rewrite: the NOT-EXISTS self-anti-join on the derived late
    fact became a per-order window count (the fact is DISTINCT pairs,
    so 'no other late supplier' ≡ count==1) and the EXISTS became a
    semi join against per-order distinct-supplier counts — the late
    subtree is planned ONCE (the old plan duplicated its whole
    join+distinct lineage per subquery) and no anti join remains."""
    plan = plan_of(specs["q21_waiting_suppliers"].fn(spark, SF_SMOKE))
    assert "LeftSemi" in plan and "LeftAnti" not in plan
    # one scan of orders (the late fact built once), not two
    assert plan.count("orders.parquet") == 1


def test_media_catalog_prunes_payload_bytes(spark, specs):
    plan = plan_of(specs["media_catalog_stats"].fn(spark, SF_SMOKE))
    reads = [l for l in plan.splitlines() if "ReadSchema" in l]
    # metadata rollup must not scan the document text payload column
    # beyond what the byte-length projection needs — and never the
    # binary content as a stored column (it's derived in-flight here;
    # on a real media table this is the content-column prune)
    assert reads, plan


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Bucketing both sides on the join key pre-partitions the data so
    the join plans with zero Exchange — on a cluster this is the
    difference between a 100 TB shuffle and none."""
    from fintech_etl_spark.sources.tables import load_table

    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite"
    ).saveAsTable("orders_b")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable("lineitem_b")
    # At smoke scale the planner would broadcast instead (also shuffle-
    # free, but then the plan proves nothing about bucketing). Pin the
    # cluster-scale shape: both sides too big to broadcast.
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table("lineitem_b")
            .join(
                spark.table("orders_b"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.sum("l_extendedprice").alias("total"))
        )
        plan = plan_of(j)
        join_section = plan.split("HashAggregate")[0]
        assert "Exchange hashpartitioning" not in join_section, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


@pytest.mark.parametrize("transactional", [False, True])
def test_partition_pruning_on_receipt_lake(spark, tmp_path, transactional):
    """The month-partitioned receipt sink supports partition pruning:
    a transaction_month filter turns into a directory-level prune, not
    a full scan — in BOTH lake modes. The transactional lake resolves
    segments through the manifest (read_receipts), and each
    per-segment scan still carries the PartitionFilters prune."""
    import datetime as dt

    from fintech_etl_spark.operators.receipts import build_receipts
    from fintech_etl_spark.sinks import read_receipts, write_receipts_parquet
    from fintech_etl_spark.sources.invoice_csv import read_invoice_csv
    from tests.test_receipts_pipeline import HEADER, ROWS

    fixture = tmp_path / "f.csv"
    fixture.write_text(HEADER + "\n" + "\n".join(ROWS) + "\n")
    receipts = build_receipts(
        read_invoice_csv(spark, str(fixture)), run_date=dt.date(2024, 6, 1)
    )
    lake = str(tmp_path / "lake")
    write_receipts_parquet(receipts, lake, transactional=transactional)
    if transactional:
        # a second committed batch: the union path must prune per segment
        write_receipts_parquet(receipts, lake)
        df = read_receipts(spark, lake).filter(
            F.col("transaction_month") == "2024-06"
        )
        expected = 4
    else:
        df = spark.read.parquet(lake).filter(
            F.col("transaction_month") == "2024-06"
        )
        expected = 2
    plan = plan_of(df)
    assert "PartitionFilters" in plan
    for line in plan.splitlines():
        if "PartitionFilters" in line:
            assert "transaction_month" in line, plan
    assert df.count() == expected


def test_months_filter_pushes_down_on_non_partitioned_lake(spark, tmp_path):
    """A lake written with partition_by_month=False has no partition
    column; read_receipts(months=) translates the range to HALF-OPEN
    transaction_date comparisons precisely so parquet row-group stats
    can prune — a date_format() wrapper would defeat pushdown. Pinned:
    the scan carries PushedFilters on transaction_date (both plain and
    transactional shapes)."""
    import datetime as dt

    from fintech_etl_spark.operators.receipts import build_receipts
    from fintech_etl_spark.sinks import read_receipts, write_receipts_parquet
    from fintech_etl_spark.sources.invoice_csv import read_invoice_csv
    from tests.test_receipts_pipeline import HEADER, ROWS

    fixture = tmp_path / "f.csv"
    fixture.write_text(HEADER + "\n" + "\n".join(ROWS) + "\n")
    receipts = build_receipts(
        read_invoice_csv(spark, str(fixture)), run_date=dt.date(2024, 6, 1)
    )
    for transactional in (False, True):
        lake = str(tmp_path / f"lake_{transactional}")
        write_receipts_parquet(
            receipts, lake, partition_by_month=False,
            transactional=transactional,
            **({"batch_key": "b0"} if transactional else {}),
        )
        df = read_receipts(spark, lake, months=("2024-06", "2024-06"))
        plan = plan_of(df)
        pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
        assert pushed, plan
        assert any("transaction_date" in l for l in pushed), plan
        assert df.count() == 2


def test_partition_pruning_on_webhook_ledger(spark, tmp_path):
    """The delivery ledger is batch_id-partitioned, so the per-batch
    skip read (`_read_ledger`) is a directory prune — one partition,
    not a scan of every batch ever delivered (unbounded on a
    long-lived stream)."""
    from fintech_etl_spark.sinks import WebhookSink

    ledger = str(tmp_path / "ledger")
    payloads = spark.createDataFrame(
        [("d1", "{}"), ("d2", "{}")], "document_id string, payload string"
    )
    sink = WebhookSink(
        url="http://example.invalid/hook",
        poster=lambda u, b, h: 200,
        ledger_path=ledger,
    )
    for b in (1, 2, 3):
        sink.send_batch(payloads, batch_id=b)

    pruned = sink._read_ledger(spark, 2)
    plan = plan_of(pruned)
    pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "batch_id" in pf
    assert pruned.count() == 2
# that legitimately need more are listed with the reason their shape
# demands it. A new operator exceeding its budget fails here BEFORE it
# ships a 100 TB shuffle regression.
_SHUFFLE_BUDGET_DEFAULT = 2
_SHUFFLE_BUDGET = {
    "q21_waiting_suppliers": 6,  # two derived facts + semi + anti + agg
    # four bandings × (bucket groupBy + pair distinct + truth join) +
    # the exact-jaccard truth subtree — it IS four LSH plans plus a
    # brute-force verifier in one diagnostic query; signature and
    # truth tables are checkpointed so nothing upstream re-shuffles
    "dedup_minhash_banding_sweep": 20,
    "dedup_minhash_lsh": 5,  # spread + band join + candidate dedup + verify
    "dedup_minhash_lsh_dfcap": 5,  # same shape; banned-set agg hides behind its checkpoint
    "dedup_ngram_jaccard": 5,  # spread + inverted-index join + 2 size joins
    # capped twin: spread + ONE shingle groupBy (pre-checkpoint
    # lineage feeds sizes and pairs) + per-doc size agg + pair-count
    # agg + size joins — everything past the bucket agg carries
    # (id, id, int) rows only
    "dedup_ngram_jaccard_capped": 6,
    "dedup_simhash": 4,  # spread + band join + verify
    # the simhash plan (4) + involved-id distinct + source join + two
    # per-source rollups — everything past the banded join is id-sized
    "near_dup_rate_by_source": 9,
    # (label,dim) centroid agg + per-vector intra agg + label rollup +
    # centroid-pair agg + min-inter rollup — every post-centroid stage
    # runs on |labels|- or |labels|²-sized inputs
    "embedding_label_separation": 5,
    "q20_dominant_suppliers": 4,  # 2-level grouped agg + distinct
    # r15: per-row sorted-array folds — no explode, no join, no shuffle
    "quality_repetition_signals": 0,
    "ann_ivf_probe": 4,  # trained-cell assign join + probe rank + in-cell rerank
    # the composed IVF+PQ plan: probe rank window + candidate×code join
    # (keyed on vec_id — ids only, the embeddings stay behind their
    # training checkpoints) + ADC sum agg + refine join; matches the
    # ivf_probe budget, with the PQ side's broadcasts adding none
    "ann_ivf_pq": 4,
    "ann_ivf_pq_auto": 4,  # identical ivf_pq_search plan, auto-k cells
    "tfidf_top_terms": 4,  # tf agg + df window(term) + N agg + shared doc_id window
    "corpus_span_dedup": 3,  # spread + span-text window + per-doc rollup
    "doc_unigram_lm_score": 3,  # vocab agg + total agg + per-doc agg (scoring join broadcast)
    "dq_expectations_report": 6,  # five independent scalar constraint aggregates + ref join
    "corpus_build_manifest": 4,  # md5-dedup agg+join, eval-gram agg, dirty-doc agg, budget window
    "corpus_temperature_weights": 3,  # per-source agg + broadcast normalizer agg (+its exchange)
    "corpus_epoch_plan": 3,  # same shape: per-source agg + broadcast normalizer agg
    # per-key agg + totals agg + TakeOrdered feeding the bounded rank
    # window (r8: global row_number → orderBy().limit(), so the only
    # unpartitioned Window runs over a GlobalLimit-bounded ≤N frame)
    "events_key_skew_report": 3,
    # r8 distributed decile (operators/ranking.py): visible exchanges
    # are the side-table agg, the offset agg, and the decile rollup —
    # the one full-data range exchange sits behind the helper's
    # lineage-cutting localCheckpoint
    "customer_balance_deciles": 3,
    # same recipe, ungrouped exact quantiles: side-table agg + offset
    # agg + the final ≤8-row scalar agg (range exchange checkpointed)
    "agg_quantiles_distributed_exact": 3,
    # grouped twin: per-(pid, group) side agg + offset agg + per-group
    # final agg (range exchange checkpointed)
    "agg_percentiles_distributed_exact": 3,
    "corpus_dedup_survivors": 3,  # md5 agg + survivor join + component join
    "events_weekly_retention": 3,  # cohort + activity + join
    "events_ltv_cohort_triangle": 3,  # cohort agg + purchase join + triangle rollup
    "q11_part_value_concentration": 3,  # value agg + threshold + filter join
    "q15_top_supplier_by_revenue": 3,  # revenue view reused on both sides
    "text_top_bigrams_per_lang": 3,  # explode + count + rank
    "events_markov_transitions": 3,  # user_id lag window + pair count + per-prev normalizer window
    # orientation + wedge self-join on center + closing-edge join on the
    # (t_a, t_b) pair + three scalar aggregates; all joins are on node
    # ids and the wedge side is arboricity-bounded, so every exchange
    # carries (id, id)-sized rows — count is high, bytes are tiny
    "graph_triangle_clustering": 8,
    "corpus_dsir_select": 3,  # bucket count agg + per-doc weight agg + source rank window
    # purchase agg + ref-ts agg; the three exact quartiles are r8
    # distributed global_ntile calls whose range exchanges sit behind
    # the ranking helper's localCheckpoint barriers
    "events_rfm_scores": 3,
    "events_linear_attribution": 4,  # segment window + touch agg + credit join + channel rollup
    "entity_canonicalize_catalog": 3,  # vocab agg + canonical rank window + rewrite-map join
    "audit_benford_screen": 3,  # digit count agg + broadcast total agg (+its exchange)
    "concurrent_open_orders": 4,  # interval agg + boundary-day agg + tiny day-grain running-sum sort
    "brand_share_yoy": 3,  # brand-year agg + per-year share window + per-brand lag window
    "events_new_vs_returning": 3,  # first-day agg + (day,user) distinct + day rollup, all on user_id
    "order_size_distribution": 3,  # per-order count + per-size count + single-row share window
    # ---- top-of-bench tier pinned EXPLICITLY (round-5 verdict #5):
    # these are the most expensive queries in BENCH_r*.json; their
    # post-checkpoint plans are deliberately shallow (checkpoints cut
    # lineage, broadcasts carry the small sides), and a regression that
    # adds a shuffle here is exactly the one that hurts at 100 TB.
    "ann_pq_adc": 2,  # code-assign agg + per-query top-k window; ADC table broadcast
    "graph_copurchase_pagerank": 1,  # per-iteration plans checkpointed; final rank agg only
    "dedup_embedding_neardup": 2,  # block assignment + cogrouped GEMM exchange
    "ann_lsh_bucketed": 2,  # bucket spread + per-query top-k window
    "media_phash_dedup_capped": 3,  # bucket-df agg + allowed-set broadcast + pair distinct
    # md5-signature banding: band-bucket groupBy + candidate distinct +
    # the two verify-side joins; every exchange carries ids/buckets
    "dedup_minhash_lsh_dense": 4,
    # xxhash64 twin: identical _dense_band_verify pipeline → same 4
    "dedup_minhash_lsh_dense_fast": 4,
    # capped simhash: band-bucket groupBy + pair distinct + the cap is
    # a filter on the aggregated bucket row (no extra exchange); 3
    # matches the exact tier's shape
    "dedup_simhash_capped": 3,
    # LM training (bigram agg + vocab distinct), per-doc NLL agg, and
    # the doc-side output join; every exchange carries (word, count) or
    # (doc_id, double) rows — token text never shuffles twice (context
    # counts re-aggregate the bigram table, not the stream)
    "text_lm_perplexity_bucket": 5,
}


def test_every_query_within_shuffle_budget(spark, specs):
    over = {}
    for name, spec in sorted(specs.items()):
        tree = tree_of(plan_of(spec.fn(spark, SF_SMOKE)))
        n = tree.count("- Exchange")
        if n > _SHUFFLE_BUDGET.get(name, _SHUFFLE_BUDGET_DEFAULT):
            over[name] = n
    assert not over, f"queries over shuffle budget: {over}"


def _write_events_fixture(path, skewed: bool, n: int = 400_000) -> None:
    """Synthetic events table split into 8 files (a skewed REDUCER
    partition can only be split along MAPPER boundaries — one input
    file would make AQE's skew split structurally impossible). The
    payload column keeps the join shuffle fat enough for byte-based
    skew detection."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    rng = np.random.default_rng(7)
    hot = int(n * 0.3)
    if skewed:
        user = np.concatenate([np.full(hot, 1), rng.integers(2, 1001, n - hot)])
        rng.shuffle(user)
    else:
        user = rng.integers(1, 1001, n)
    payload = [bytes(b).hex() for b in rng.integers(0, 256, (n, 64), dtype=np.uint8)]
    etype = np.array(["view", "click", "purchase"])[rng.integers(0, 3, n)]
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(
                np.datetime64("2024-01-01", "us")
                + rng.integers(0, 30 * 86_400_000_000, n).astype("timedelta64[us]")
            ),
            "user_id": pa.array(user, pa.int64()),
            "event_type": pa.array(etype, pa.string()),
            "value": np.round(rng.random(n), 4),
            "props": pa.array(["{}"] * n),
            "payload": pa.array(payload),
        }
    )
    os.makedirs(path)
    for i in range(8):
        pq.write_table(t.slice(i * n // 8, n // 8), f"{path}/part-{i}.parquet")


_SKEW_CONF = {
    # force the shuffled-join path (no broadcast escape hatch) and make
    # AQE's byte thresholds reachable at test scale
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
}


def test_aqe_skew_join_splits_hot_key(spark, tmp_path):
    """Adversarial skew injection (round-5 verdict #3): one user owns
    30% of events (~14x the average key). Assert (a) AQE actually
    splits the skewed partition (SortMergeJoin(skew=true) in the final
    adaptive plan), (b) results are identical to the uniform path's
    semantics, and (c) wall-time stays within a small factor of the
    uniform fixture — the skew is absorbed by the split, not serialized
    through one reducer."""
    import time

    skew_dir = str(tmp_path / "skew" / "events.parquet")
    flat_dir = str(tmp_path / "flat" / "events.parquet")
    _write_events_fixture(skew_dir, skewed=True)
    _write_events_fixture(flat_dir, skewed=False)

    dim = spark.range(1, 1001).select(
        F.col("id").alias("user_id"), (F.col("id") % 7).alias("grp")
    )

    def run(events_dir):
        ev = spark.read.parquet(events_dir)
        return (
            ev.join(dim, "user_id")
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.length("payload")).alias("payload_bytes"),
            )
        )

    saved = {k: spark.conf.get(k, None) for k in _SKEW_CONF}
    try:
        for k, v in _SKEW_CONF.items():
            spark.conf.set(k, v)

        # (a) the skew split engages on the skewed fixture
        j = run(skew_dir)
        skew_rows = {r.grp: (r.n, r.payload_bytes) for r in j.collect()}
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]

        # (b) values: every event lands exactly once despite the split
        assert sum(n for n, _ in skew_rows.values()) == 400_000
        assert all(b == n * 128 for n, b in skew_rows.values())

        # (c) wall-time: skewed within 3x of uniform (min-of-3 to damp
        # box noise; an unsplit hot reducer serializes ~30% of ALL rows
        # through one task and blows far past this)
        def wall(events_dir):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                run(events_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            return best

        flat_t = wall(flat_dir)
        skew_t = wall(skew_dir)
        assert skew_t <= max(3.0 * flat_t, flat_t + 1.0), (skew_t, flat_t)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    # salted-aggregation tier: the engine's answer for skewed GROUP BY
    # (AQE skew handling only covers joins). Verify the salted two-phase
    # rollup on the skewed fixture matches the plain groupBy exactly.
    from fintech_etl_spark.operators.events_analytics import (
        events_salted_heavy_hitters,
    )

    got = {
        r.event_type: (r.n, r.total)
        for r in events_salted_heavy_hitters(spark, str(tmp_path / "skew")).collect()
    }
    ev = spark.read.parquet(skew_dir)
    want = {
        r.event_type: (r.n, r.total)
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# r8: registry-wide single-partition-window tripwire (round-7 verdict #4).
# An unpartitioned WindowExec funnels its whole input through ONE task —
# the four entity-grain offenders were rewritten onto the distributed
# ranking recipe (operators/ranking.py); this walks EVERY registry query's
# physical plan so the shape can never silently come back.

# Unpartitioned windows whose input is provably bounded are fine: a
# GlobalLimit / TakeOrderedAndProject below the window caps the rows
# entering the single task (skew-report top-N rank, k-means seed pick).
_BOUNDED_NODES = ("GlobalLimit", "TakeOrderedAndProject", "CollectLimit")

# Queries allowed an unpartitioned window over an input that is bounded
# by DATA GRAIN rather than by a limit operator — each entry must say why.
_GLOBAL_WINDOW_ALLOWLIST = {
    # running sum over one row per DAY (interval boundaries): bounded by
    # the calendar, ~36.5k rows per century
    "concurrent_open_orders",
    # month-grain backtest spine: 12 rows per year of history
    "orders_seasonal_backtest",
    # share-of-total over one row per order SIZE (≤ a few hundred
    # distinct line counts)
    "order_size_distribution",
}


def _walk(node):
    yield node
    ch = node.children()
    for i in range(ch.size()):
        yield from _walk(ch.apply(i))


def _subtree_has_bound(node) -> bool:
    return any(n.nodeName() in _BOUNDED_NODES for n in _walk(node))


def test_no_unbounded_single_partition_window_anywhere(spark, specs):
    """Every WindowExec in every registry query either partitions, sits
    above a limit-bounded subtree, or is on the justified data-grain
    allowlist (which must stay the complete inventory)."""
    offenders = {}
    used_allowlist = set()
    for name, spec in sorted(specs.items()):
        plan = spec.fn(spark, SF_SMOKE)._jdf.queryExecution().sparkPlan()
        for node in _walk(plan):
            if node.nodeName() != "Window":
                continue
            if not node.partitionSpec().isEmpty():
                continue
            if _subtree_has_bound(node):
                continue
            if name in _GLOBAL_WINDOW_ALLOWLIST:
                used_allowlist.add(name)
                continue
            offenders.setdefault(name, 0)
            offenders[name] += 1
    assert not offenders, (
        f"unbounded single-partition WindowExec in: {offenders} — "
        "use operators/ranking.py (global_row_number / global_ntile) "
        "or orderBy().limit() instead"
    )
    stale = _GLOBAL_WINDOW_ALLOWLIST - used_allowlist
    assert not stale, f"allowlist entries no longer needed: {stale}"
