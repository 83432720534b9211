"""Event-stream analytics: funnels, cohort retention, calendar spines,
and skew-safe aggregation — the product-analytics shapes a 100 TB event
lake gets queried with daily.

All batch queries over the ``events`` table (event-time ops have
streaming twins in streaming/events.py), each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fintech_etl_spark.barrier import materialization_barrier
from fintech_etl_spark.operators.ranking import global_ntile
from fintech_etl_spark.registry import register
from fintech_etl_spark.sources.tables import load_table


def _r4(c: F.Column) -> F.Column:
    return F.round(c, 4)


@register(
    "events_funnel_conversion",
    """
    WITH per_user AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup'   THEN ts END) AS t_signup,
               min(CASE WHEN event_type = 'click'    THEN ts END) AS t_click,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY user_id)
    SELECT CAST(count(*) AS BIGINT)                                    AS n_users,
           CAST(count(t_signup) AS BIGINT)                             AS n_signup,
           CAST(count(CASE WHEN t_click > t_signup THEN 1 END) AS BIGINT)   AS n_signup_click,
           CAST(count(CASE WHEN t_purchase > t_click AND t_click > t_signup
                           THEN 1 END) AS BIGINT)                      AS n_full_funnel
    FROM per_user
    """,
    doc=(
        "Ordered conversion funnel (signup → click → purchase) as ONE "
        "conditional min-aggregation per user plus a global rollup — no "
        "joins, no window sort; shuffles once on user_id."
    ),
    tags=("events", "agg"),
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def first_ts(kind: str) -> F.Column:
        return F.min(F.when(F.col("event_type") == kind, F.col("ts")))

    per_user = ev.groupBy("user_id").agg(
        first_ts("signup").alias("t_signup"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_signup").alias("n_signup"),
        F.count(
            F.when(F.col("t_click") > F.col("t_signup"), 1)
        ).alias("n_signup_click"),
        F.count(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_signup")),
                1,
            )
        ).alias("n_full_funnel"),
    )


@register(
    "events_weekly_retention",
    """
    WITH firsts AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events GROUP BY user_id),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               CAST(date_diff('week', f.cohort_week, date_trunc('week', e.ts)) AS INTEGER) AS week_no
        FROM events e JOIN firsts f ON e.user_id = f.user_id)
    SELECT CAST(cohort_week AS DATE) AS cohort_week, week_no,
           CAST(count(*) AS BIGINT) AS active_users
    FROM activity GROUP BY 1, 2
    """,
    doc=(
        "Cohort retention: first-activity week per user, then distinct "
        "(user, week offset) counts per cohort. Two shuffles on user_id "
        "(cohort derivation reuses the partitioning) + one on the "
        "(cohort, week) rollup."
    ),
    tags=("events", "agg", "time"),
)
def events_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.floor(
                    F.datediff(
                        F.to_date(F.date_trunc("week", "ts")),
                        F.to_date("cohort_week"),
                    )
                    / 7
                )
            ).cast("int").alias("week_no"),
        )
        .distinct()
    )
    return activity.groupBy(
        F.col("cohort_week").cast("date").alias("cohort_week"), "week_no"
    ).agg(F.count(F.lit(1)).alias("active_users"))


@register(
    "events_date_spine_gapfill",
    """
    WITH spine AS (
        SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30',
                                           INTERVAL 1 DAY)) AS DATE) AS day),
    daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               count(*) AS n, round(sum(value), 4) AS total
        FROM events WHERE event_type = 'purchase' GROUP BY 1)
    SELECT spine.day,
           CAST(coalesce(daily.n, 0) AS BIGINT) AS n_purchases,
           coalesce(daily.total, 0.0)           AS total_value
    FROM spine LEFT JOIN daily ON spine.day = daily.day
    """,
    doc=(
        "Calendar date spine + gap fill: sequence()-generated day "
        "dimension left-joined to the daily rollup so zero-activity days "
        "surface as explicit zeros. The spine is driver-side tiny and "
        "broadcast; the fact rollup is the only shuffle."
    ),
    tags=("events", "time", "join"),
)
def events_date_spine_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-01-30").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .agg(F.count(F.lit(1)).alias("n"), _r4(F.sum("value")).alias("total"))
    )
    # broadcast the RIGHT side: a left outer join can only broadcast-
    # build its right input; the aggregated daily rollup is tiny anyway.
    return spine.join(F.broadcast(daily), "day", "left").select(
        "day",
        F.coalesce("n", F.lit(0)).alias("n_purchases"),
        F.coalesce("total", F.lit(0.0)).alias("total_value"),
    )


@register(
    "events_salted_heavy_hitters",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS total
    FROM events GROUP BY event_type
    """,
    doc=(
        "Skew-safe two-phase aggregation: event_type has only 5 values — "
        "at 100 TB a plain groupBy funnels each type through one reducer. "
        "Salting (key, hash%N) first makes phase one fan out N-wide, then "
        "the tiny resalted partials collapse in phase two. The oracle is "
        "the plain groupBy: salting must be a pure execution detail."
    ),
    tags=("events", "agg", "skew"),
)
def events_salted_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    n_salts = 16
    salted = ev.withColumn("_salt", F.pmod(F.xxhash64("event_id"), F.lit(n_salts)))
    partial = salted.groupBy("event_type", "_salt").agg(
        F.count(F.lit(1)).alias("pn"), F.sum("value").alias("pt")
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"), _r4(F.sum("pt")).alias("total")
    )


@register(
    "events_session_window_native",
    """
    WITH gaps AS (
        SELECT user_id, ts,
               -- microsecond-exact, INCLUSIVE split bound: Spark's
               -- session_window end is EXCLUSIVE (event at exactly
               -- t+30min starts a new session), and a whole-second
               -- date_diff would truncate gaps in (1800, 1801) s into
               -- the same session — invisible at gate scale, 26 rows
               -- of divergence at sf1 where ~30-min gaps are common
               CASE WHEN lag(ts) OVER w IS NULL
                    OR date_diff('microsecond', lag(ts) OVER w, ts)
                       >= 1800 * 1000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
        SELECT user_id, ts,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        FROM gaps)
    SELECT user_id, min(ts) AS session_start,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id, sess_id
    """,
    doc=(
        "Native session_window() aggregation (30-min gap): Spark's "
        "built-in session assembly, oracle-checked against the classic "
        "lag-gap-cumsum derivation — proving the two formulations agree. "
        "The same expression runs on a stream with a watermark."
    ),
    tags=("events", "window", "time"),
)
def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.min("ts").alias("session_start"))
        .select("user_id", "session_start", "n_events")
    )


_SKEW_TOP = 5  # heaviest keys reported


@register(
    "events_key_skew_report",
    f"""
    WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
               FROM events GROUP BY user_id),
    t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
                 CAST(count(*) AS BIGINT) AS n_keys
          FROM c),
    r AS (SELECT user_id, cnt,
                 row_number() OVER (ORDER BY cnt DESC, user_id) AS rk
          FROM c)
    SELECT user_id, cnt, CAST(rk AS INTEGER) AS rk,
           round(cnt * 1.0 / total, 4)            AS share,
           round(cnt * 1.0 / (total * 1.0 / n_keys), 4) AS skew_vs_avg,
           n_keys
    FROM r CROSS JOIN t WHERE rk <= {_SKEW_TOP}
    """,
    doc=(
        "Shuffle-skew diagnostic for a join/aggregation key: the "
        f"top-{_SKEW_TOP} heaviest user_ids with their row share and "
        "multiple-of-average — the report that tells you BEFORE a "
        "100 TB join whether this key needs salting or AQE skew "
        "handling (a key at 30× average means one reducer does 30× "
        "the work). Per-key counts are one map-side-combined "
        "aggregation; only the tiny (key,cnt) frame enters the global "
        "rank, with WindowGroupLimit truncating to the top rows."
    ),
    tags=("events", "skew", "observability"),
)
def events_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    t = c.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    # top-N via orderBy().limit() — compiles to TakeOrderedAndProject
    # (per-partition heaps + driver merge of N rows), NOT a global
    # row_number through one task; the rank window then runs over the
    # already-bounded ≤N-row frame (GlobalLimit below it), which is
    # the allowed shape in the plan tripwire
    r = (
        c.orderBy(F.col("cnt").desc(), "user_id")
        .limit(_SKEW_TOP)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.col("cnt").desc(), "user_id")
            ),
        )
    )
    avg = F.col("total") * 1.0 / F.col("n_keys")
    return r.crossJoin(F.broadcast(t)).select(
        "user_id",
        "cnt",
        F.col("rk").cast("int").alias("rk"),
        F.round(F.col("cnt") * 1.0 / F.col("total"), 4).alias("share"),
        F.round(F.col("cnt") * 1.0 / avg, 4).alias("skew_vs_avg"),
        "n_keys",
    )


@register(
    "events_first_touch_attribution",
    """
    WITH s AS (SELECT event_id, user_id, ts, event_type,
                      CASE WHEN lag(ts) OVER w IS NULL
                           OR date_diff('second', lag(ts) OVER w, ts) > 3600
                           THEN 1 ELSE 0 END AS new_session
               FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    i AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING) AS session_no
          FROM s),
    f AS (SELECT *,
                 first_value(event_type) OVER ws AS first_touch,
                 row_number() OVER ws AS pos_in_session
          FROM i WINDOW ws AS (PARTITION BY user_id, session_no ORDER BY ts, event_id))
    SELECT event_id, user_id, ts,
           CAST(session_no AS BIGINT)          AS session_no,
           first_touch,
           CAST(pos_in_session - 1 AS INTEGER) AS n_prior_in_session
    FROM f WHERE event_type = 'purchase'
    """,
    doc=(
        "First-touch attribution: every purchase is credited to the "
        "event type that OPENED its session (1h-gap sessionization via "
        "lag + running sum, then first_value within the session) — the "
        "marketing-attribution composite of the sessionize and window "
        "families. One user_id shuffle serves the lag, the island sum, "
        "and the per-session windows (same partition prefix, sorts "
        "only)."
    ),
    tags=("events", "window", "attribution"),
)
def events_first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    s = ev.withColumn(
        "new_session", (gap.isNull() | (gap > 3600)).cast("int")
    )
    i = s.withColumn(
        "session_no",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ws = Window.partitionBy("user_id", "session_no").orderBy("ts", "event_id")
    f = i.withColumn("first_touch", F.first("event_type").over(ws)).withColumn(
        "pos_in_session", F.row_number().over(ws)
    )
    return f.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.col("session_no").cast("long").alias("session_no"),
        "first_touch",
        (F.col("pos_in_session") - 1).cast("int").alias("n_prior_in_session"),
    )


@register(
    "events_ltv_cohort_triangle",
    """
    WITH f AS (SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
               FROM events GROUP BY user_id),
    a AS (SELECT e.user_id, f.cohort_week,
                 (date_diff('day', CAST(f.cohort_week AS DATE),
                            CAST(date_trunc('week', e.ts) AS DATE)) // 7)
                     AS age_weeks,
                 e.value
          FROM events e JOIN f ON e.user_id = f.user_id
          WHERE e.event_type = 'purchase')
    SELECT CAST(cohort_week AS DATE) AS cohort_week,
           CAST(age_weeks AS INTEGER) AS age_weeks,
           CAST(count(*) AS BIGINT) AS n_purchases,
           round(sum(value), 4) AS revenue,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_buyers
    FROM a GROUP BY cohort_week, age_weeks
    """,
    doc=(
        "LTV cohort triangle: users keyed by first-seen ISO week, "
        "purchase revenue rolled up by (cohort, weeks-since-cohort) — "
        "the lifetime-value matrix every growth team plots. First-touch "
        "week from one user aggregation (broadcast back), then one "
        "grouped rollup; week age measured in whole days/7 between "
        "Monday-start week truncations, identical on both engines."
    ),
    tags=("events", "cohort"),
)
def events_ltv_cohort_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    a = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(f), "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(
                    F.date_trunc("week", "ts").cast("date"),
                    F.col("cohort_week").cast("date"),
                )
                / 7
            ).alias("age_weeks"),
            "value",
        )
    )
    return a.groupBy("cohort_week", "age_weeks").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.round(F.sum("value"), 4).alias("revenue"),
        F.count_distinct("user_id").alias("n_buyers"),
    ).select(
        F.col("cohort_week").cast("date").alias("cohort_week"),
        F.col("age_weeks").cast("int").alias("age_weeks"),
        "n_purchases",
        "revenue",
        "n_buyers",
    )


@register(
    "events_markov_transitions",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM events),
    t AS (SELECT prev, event_type AS cur, CAST(count(*) AS BIGINT) AS n
          FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2)
    SELECT prev, cur, n,
           round(n * 1.0 / sum(n) OVER (PARTITION BY prev), 4) AS p
    FROM t
    """,
    doc=(
        "First-order Markov transition matrix of per-user event "
        "sequences: lag over (user_id, event-time) pairs consecutive "
        "event types, then transition counts normalize to P(next|cur) "
        "per source state. ONE shuffle on user_id for the lag; the "
        "count table is |event_types|² rows, so the normalizing window "
        "is driver-trivial at any corpus size. Ties in event time "
        "break on event_id so both engines pair identically. The "
        "behavioral-model primitive behind next-action prediction and "
        "anomalous-session scoring."
    ),
    tags=("events", "window", "agg"),
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        "event_type",
        F.lag("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev"),
    )
    t = (
        seq.filter(F.col("prev").isNotNull())
        .groupBy("prev", F.col("event_type").alias("cur"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return t.select(
        "prev",
        "cur",
        "n",
        _r4(F.col("n") * 1.0 / F.sum("n").over(Window.partitionBy("prev"))).alias("p"),
    )


@register(
    "cdc_apply_tombstones",
    """
    WITH ranked AS (
        SELECT user_id, event_type, value, ts,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn,
               CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_ops
        FROM events)
    SELECT user_id,
           event_type        AS last_event_type,
           round(value, 4)   AS last_value,
           ts                AS last_ts,
           n_ops
    FROM ranked WHERE rn = 1 AND event_type != 'error'
    """,
    doc=(
        "CDC change-feed apply with tombstones: the event stream is a "
        "keyed change feed (user_id = primary key, 'error' = delete "
        "marker), and the materialized view is latest-op-wins with "
        "tombstoned keys absent — the full MERGE semantics "
        "lake_upsert_latest's insert/update-only shape lacks. "
        "Resolution is ONE hash aggregation: max_by over the (ts, "
        "event_id) ordering struct with map-side combine — no window "
        "sort, no row_number — so a 100 TB feed shuffles once on the "
        "key and each partial aggregate carries one candidate row per "
        "key. The oracle expresses the same semantics as rank-1 "
        "selection."
    ),
    tags=("events", "lake", "cdc"),
)
def cdc_apply_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    last = F.max_by(
        F.struct("event_type", "value", "ts"), F.struct("ts", "event_id")
    )
    resolved = ev.groupBy("user_id").agg(
        last.alias("last"), F.count(F.lit(1)).alias("n_ops")
    )
    return resolved.filter(F.col("last.event_type") != "error").select(
        "user_id",
        F.col("last.event_type").alias("last_event_type"),
        _r4(F.col("last.value")).alias("last_value"),
        F.col("last.ts").alias("last_ts"),
        "n_ops",
    )


@register(
    "events_rfm_scores",
    """
    WITH p AS (SELECT user_id, max(ts) AS last_purchase,
                      CAST(count(*) AS BIGINT) AS frequency,
                      round(sum(value), 4) AS monetary
               FROM events WHERE event_type = 'purchase' GROUP BY user_id),
    mx AS (SELECT max(ts) AS ref_ts FROM events),
    b AS (SELECT user_id,
                 CAST(date_diff('day', CAST(last_purchase AS DATE),
                                CAST(ref_ts AS DATE)) AS INTEGER) AS recency_days,
                 frequency, monetary
          FROM p CROSS JOIN mx),
    sc AS (SELECT *,
                  5 - ntile(4) OVER (ORDER BY recency_days ASC, user_id) AS r_score,
                  5 - ntile(4) OVER (ORDER BY frequency DESC, user_id)  AS f_score,
                  5 - ntile(4) OVER (ORDER BY monetary DESC, user_id)   AS m_score
           FROM b)
    SELECT user_id, recency_days, frequency, monetary,
           CAST(r_score AS INTEGER) AS r_score,
           CAST(f_score AS INTEGER) AS f_score,
           CAST(m_score AS INTEGER) AS m_score,
           CAST(r_score * 100 + f_score * 10 + m_score AS INTEGER) AS rfm_code
    FROM sc
    """,
    doc=(
        "RFM segmentation: per purchasing user, days since last "
        "purchase / purchase count / revenue, each quartiled into a "
        "1-4 score (4 = best; ties broken by user_id so both engines "
        "tile identically) and composed into the classic 3-digit RFM "
        "code. The heavy pass is ONE grouped aggregation over the "
        "purchase stream; the ntile windows run over one row per "
        "purchasing user — at lake scale the exact global sort would "
        "be replaced by three broadcast quartile boundaries from "
        "percentile_approx, the documented trade for an exact oracle "
        "here."
    ),
    tags=("events", "window", "agg"),
)
def events_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("last_purchase"),
            F.count(F.lit(1)).alias("frequency"),
            _r4(F.sum("value")).alias("monetary"),
        )
    )
    mx = ev.agg(F.max("ts").alias("ref_ts"))
    b = p.crossJoin(F.broadcast(mx)).select(
        "user_id",
        F.datediff(
            F.col("ref_ts").cast("date"), F.col("last_purchase").cast("date")
        )
        .cast("int")
        .alias("recency_days"),
        "frequency",
        "monetary",
    )
    # three exact global quartiles via distributed ranking (range
    # exchange + per-partition offsets — fintech_etl_spark/operators/
    # ranking.py) instead of three single-partition ntile windows;
    # values are bit-identical, the plan stays parallel at 10⁸ users
    sc = global_ntile(
        b, [F.col("recency_days").asc(), "user_id"], 4, "_r_t"
    )
    sc = global_ntile(
        sc, [F.col("frequency").desc(), "user_id"], 4, "_f_t"
    )
    sc = global_ntile(
        sc, [F.col("monetary").desc(), "user_id"], 4, "_m_t"
    )
    sc = (
        sc.withColumn("r_score", (5 - F.col("_r_t")).cast("int"))
        .withColumn("f_score", (5 - F.col("_f_t")).cast("int"))
        .withColumn("m_score", (5 - F.col("_m_t")).cast("int"))
    )
    return sc.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score"))
        .cast("int")
        .alias("rfm_code"),
    )


@register(
    "events_linear_attribution",
    """
    WITH o AS (SELECT user_id, ts, event_id, event_type, value,
                      coalesce(sum(CASE WHEN event_type = 'purchase'
                                        THEN 1 ELSE 0 END)
                               OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND 1 PRECEDING), 0) AS seg
               FROM events),
    t AS (SELECT user_id, seg,
                 CAST(sum(CASE WHEN event_type IN ('click', 'view')
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_touches
          FROM o GROUP BY 1, 2),
    p AS (SELECT user_id, seg, value FROM o WHERE event_type = 'purchase'),
    c AS (SELECT o.event_type, p.value / t.n_touches AS credit
          FROM o JOIN p USING (user_id, seg) JOIN t USING (user_id, seg)
          WHERE o.event_type IN ('click', 'view') AND t.n_touches > 0)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_touches,
           round(sum(credit), 4) AS credited_revenue
    FROM c GROUP BY event_type
    UNION ALL
    SELECT 'unattributed', CAST(count(*) AS BIGINT), round(sum(p.value), 4)
    FROM p JOIN t USING (user_id, seg) WHERE t.n_touches = 0
    """,
    doc=(
        "Linear multi-touch attribution, the fair-share counterpart "
        "of events_first_touch_attribution: each purchase's value "
        "splits equally across the click/view touches since the "
        "user's previous purchase. The exclusive running purchase "
        "count assigns every event a segment — each segment ends at "
        "(and contains exactly) one purchase, so touch sets never "
        "overlap — then two segment-keyed aggregations and one join "
        "produce per-channel credited revenue, with zero-touch "
        "purchases reported as 'unattributed' rather than dropped. "
        "Everything shuffles on (user_id[, seg]): the window and both "
        "groupBys share the same partitioning prefix."
    ),
    tags=("events", "window", "attribution"),
)
def events_linear_attribution(
    spark: SparkSession, sf_dir: str, barrier: str = "auto"
) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    o = ev.select(
        "user_id",
        "event_type",
        "value",
        F.coalesce(
            F.sum((F.col("event_type") == "purchase").cast("int")).over(w),
            F.lit(0),
        ).alias("seg"),
    )
    # three consumers below — injectable barrier policy
    # (fintech_etl_spark.barrier: reliable on checkpoint-dir clusters)
    o = materialization_barrier(o, barrier)
    t = o.groupBy("user_id", "seg").agg(
        F.sum(F.col("event_type").isin("click", "view").cast("int"))
        .cast("long")
        .alias("n_touches")
    )
    p = o.filter(F.col("event_type") == "purchase").select(
        "user_id", "seg", "value"
    )
    touches = (
        o.filter(F.col("event_type").isin("click", "view"))
        .join(p.withColumnRenamed("value", "p_value"), ["user_id", "seg"])
        .join(t.filter(F.col("n_touches") > 0), ["user_id", "seg"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            _r4(F.sum(F.col("p_value") / F.col("n_touches"))).alias(
                "credited_revenue"
            ),
        )
    )
    unattributed = (
        p.join(t.filter(F.col("n_touches") == 0), ["user_id", "seg"])
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            _r4(F.sum("value")).alias("credited_revenue"),
        )
        .select(
            F.lit("unattributed").alias("event_type"),
            "n_touches",
            "credited_revenue",
        )
    )
    return touches.unionAll(unattributed)


@register(
    "events_ab_test_summary",
    """
    WITH u AS (SELECT user_id,
                      CASE WHEN user_id % 2 = 0 THEN 'treatment'
                           ELSE 'control' END AS arm,
                      max(CASE WHEN event_type = 'purchase' AND value >= 150
                               THEN 1 ELSE 0 END) AS converted
               FROM events GROUP BY user_id),
    a AS (SELECT arm,
                 CAST(count(*) AS BIGINT)      AS n_users,
                 CAST(sum(converted) AS BIGINT) AS n_converted,
                 avg(converted)                 AS rate
          FROM u GROUP BY arm),
    w AS (SELECT max(CASE WHEN arm = 'treatment' THEN rate END)        AS rt,
                 max(CASE WHEN arm = 'control' THEN rate END)          AS rc,
                 max(CASE WHEN arm = 'treatment' THEN n_users END)     AS nt,
                 max(CASE WHEN arm = 'control' THEN n_users END)       AS nc,
                 sum(n_converted) * 1.0 / sum(n_users)                 AS pool
          FROM a)
    SELECT a.arm, a.n_users, a.n_converted, round(a.rate, 4) AS rate,
           round(w.rt - w.rc, 4) AS lift_abs,
           round((w.rt - w.rc)
                 / sqrt(w.pool * (1 - w.pool) * (1.0 / w.nt + 1.0 / w.nc)),
                 4) AS z_stat
    FROM a CROSS JOIN w
    """,
    doc=(
        "A/B experiment readout (conversion = any high-value, ≥150, "
        "purchase — the base purchase rate is saturated at 1.0 in this "
        "data, which would zero the z denominator): users assigned by a "
        "deterministic id-hash rule (parity here; salted hash64 in "
        "production — same shape), per-arm conversion to purchase, "
        "absolute lift, and the pooled two-proportion z statistic — "
        "the experimentation primitive every event lake serves daily. "
        "ONE user-grain aggregation (conversion as a conditional max, "
        "no joins) then a two-row rollup; the z-test inputs are a "
        "broadcast scalar, so the whole readout costs one shuffle on "
        "user_id at any scale."
    ),
    tags=("events", "agg", "experiment"),
)
def events_ab_test_summary(
    spark: SparkSession, sf_dir: str, barrier: str = "auto"
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            (
                (F.col("event_type") == "purchase") & (F.col("value") >= 150)
            ).cast("int")
        ).alias("converted")
    ).withColumn(
        "arm",
        F.when(F.col("user_id") % 2 == 0, "treatment").otherwise("control"),
    )
    a = (
        u.groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("converted").cast("long").alias("n_converted"),
            F.avg("converted").alias("rate"),
        )
    )
    # two consumers (the per-arm rows and the z-test rollup) — cut the
    # replan of the user-grain aggregation via the injectable barrier
    a = materialization_barrier(a, barrier)
    w = a.agg(
        F.max(F.when(F.col("arm") == "treatment", F.col("rate"))).alias("rt"),
        F.max(F.when(F.col("arm") == "control", F.col("rate"))).alias("rc"),
        F.max(F.when(F.col("arm") == "treatment", F.col("n_users"))).alias("nt"),
        F.max(F.when(F.col("arm") == "control", F.col("n_users"))).alias("nc"),
        (F.sum("n_converted") * 1.0 / F.sum("n_users")).alias("pool"),
    )
    z = (F.col("rt") - F.col("rc")) / F.sqrt(
        F.col("pool")
        * (1 - F.col("pool"))
        * (1.0 / F.col("nt") + 1.0 / F.col("nc"))
    )
    return a.crossJoin(F.broadcast(w)).select(
        "arm",
        "n_users",
        "n_converted",
        _r4(F.col("rate")).alias("rate"),
        _r4(F.col("rt") - F.col("rc")).alias("lift_abs"),
        _r4(z).alias("z_stat"),
    )


@register(
    "events_rolling_anomaly_zscore",
    """
    WITH e AS (SELECT event_id, user_id, ts, value,
                      CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_e2
               FROM events),
    w AS (SELECT event_id, user_id, ts, value,
                 v_e2,
                 sum(v_e2) OVER pw         AS s1,
                 sum(v_e2 * v_e2) OVER pw  AS s2,
                 count(*) OVER pw          AS n
          FROM e
          WINDOW pw AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING))
    SELECT event_id, user_id, ts,
           round(value, 4) AS value,
           -- explicit half-up on the (bit-identical) double: engine
           -- round() builtins disagree exactly at .xxxx5, and s1/(100n)
           -- produces such ties systematically (integer / integer)
           floor(s1 / (100.0 * n) * 10000 + 0.5) / 10000.0 AS rolling_mean,
           floor((v_e2 - s1 * 1.0 / n)
                 / sqrt((n * s2 - s1 * s1) * 1.0 / (n * (n - 1)))
                 * 10000 + 0.5) / 10000.0 AS z,
           abs((v_e2 - s1 * 1.0 / n)
               / sqrt((n * s2 - s1 * s1) * 1.0 / (n * (n - 1)))) > 3
               AS is_anomaly
    FROM w WHERE n >= 5 AND n * s2 - s1 * s1 > 0
    """,
    doc=(
        "Per-user rolling anomaly detection: each event's value "
        "z-scored against the trailing window of its user's previous "
        "10 events (frame excludes the current row, so the baseline "
        "is strictly historical — no leakage), flagged at |z| > 3. "
        "The rolling moments accumulate in integer cents (sum and "
        "sum-of-squares as BIGINT window aggregates), so mean, "
        "variance, and even the zero-variance guard (n·Σx² − (Σx)² "
        "as an exact integer test) are bit-identical across engines — "
        "a double `avg` over the frame rounds differently at .xxxx5 "
        "boundaries. Rows with fewer than 5 priors or a degenerate "
        "baseline are excluded rather than emitting NaN/±inf. ONE "
        "user_id shuffle serves the whole computation; the stateful "
        "streaming twin would carry the trailing window in keyed "
        "state exactly like markov_transitions_stateful carries its "
        "lag."
    ),
    tags=("events", "window", "anomaly"),
)
def events_rolling_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").withColumn(
        "v_e2", F.floor(F.col("value") * 100 + 0.5).cast("long")
    )
    pw = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, -1)
    )
    w = ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        "v_e2",
        F.sum("v_e2").over(pw).alias("s1"),
        F.sum(F.col("v_e2") * F.col("v_e2")).over(pw).alias("s2"),
        F.count(F.lit(1)).over(pw).alias("n"),
    )
    var_num = F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    z = (F.col("v_e2") - F.col("s1") * 1.0 / F.col("n")) / F.sqrt(
        var_num * 1.0 / (F.col("n") * (F.col("n") - 1))
    )
    return w.filter((F.col("n") >= 5) & (var_num > 0)).select(
        "event_id",
        "user_id",
        "ts",
        _r4(F.col("value")).alias("value"),
        # explicit half-up — see the oracle comment on round() ties
        (F.floor(F.col("s1") / (100.0 * F.col("n")) * 10000 + 0.5) / 10000.0).alias(
            "rolling_mean"
        ),
        (F.floor(z * 10000 + 0.5) / 10000.0).alias("z"),
        (F.abs(z) > 3).alias("is_anomaly"),
    )


@register(
    "events_funnel_time_windowed",
    """
    WITH per_user AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY user_id),
    d AS (SELECT user_id, t_signup, t_purchase,
                 date_diff('second', t_signup, t_purchase) AS lag_s
          FROM per_user WHERE t_signup IS NOT NULL)
    SELECT CAST(count(*) AS BIGINT) AS n_signups,
           CAST(count(CASE WHEN lag_s > 0 THEN 1 END) AS BIGINT)
               AS n_converted_ever,
           CAST(count(CASE WHEN lag_s > 0 AND lag_s <= 3600 THEN 1 END)
                AS BIGINT) AS n_within_1h,
           CAST(count(CASE WHEN lag_s > 0 AND lag_s <= 86400 THEN 1 END)
                AS BIGINT) AS n_within_24h,
           round(count(CASE WHEN lag_s > 0 AND lag_s <= 86400 THEN 1 END)
                 * 1.0 / count(*), 4) AS cvr_24h
    FROM d
    """,
    doc=(
        "Time-windowed conversion funnel: among signed-up users, how "
        "many purchased ever / within 1 hour / within 24 hours of "
        "their first signup — the SLA-bounded variant of "
        "events_funnel_conversion (unbounded conversion flatters the "
        "metric; growth teams quote windowed CVR). Still ONE "
        "conditional-min aggregation per user and a global rollup — "
        "no joins, no window sort; second-granularity lags are exact "
        "integers so every count and the 4-decimal CVR are engine-"
        "identical."
    ),
    tags=("events", "agg", "funnel"),
)
def events_funnel_time_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "t_signup"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    lag_s = F.unix_timestamp(
        F.col("t_purchase").cast("timestamp")
    ) - F.unix_timestamp(F.col("t_signup").cast("timestamp"))
    d = per_user.filter(F.col("t_signup").isNotNull()).withColumn(
        "lag_s", lag_s
    )
    conv = F.col("lag_s") > 0
    return d.agg(
        F.count(F.lit(1)).alias("n_signups"),
        F.count(F.when(conv, 1)).alias("n_converted_ever"),
        F.count(F.when(conv & (F.col("lag_s") <= 3600), 1)).alias(
            "n_within_1h"
        ),
        F.count(F.when(conv & (F.col("lag_s") <= 86400), 1)).alias(
            "n_within_24h"
        ),
        F.round(
            F.count(F.when(conv & (F.col("lag_s") <= 86400), 1))
            * 1.0
            / F.count(F.lit(1)),
            4,
        ).alias("cvr_24h"),
    )


@register(
    "customer_purchase_gaps",
    """
    WITH p AS (SELECT user_id, ts,
                      lag(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS prev_ts
               FROM events WHERE event_type = 'purchase'),
    g AS (SELECT user_id,
                 date_diff('second', prev_ts, ts) AS gap_s
          FROM p WHERE prev_ts IS NOT NULL)
    SELECT user_id,
           CAST(count(*) AS BIGINT)            AS n_gaps,
           CAST(min(gap_s) AS BIGINT)          AS min_gap_s,
           CAST(max(gap_s) AS BIGINT)          AS max_gap_s,
           -- explicit half-up: integer-ratio means can land on .xxxx5
           -- ties where engine round() builtins disagree
           floor(avg(gap_s) * 10000 + 0.5) / 10000.0 AS avg_gap_s
    FROM g GROUP BY user_id
    """,
    doc=(
        "Inter-purchase cadence per customer: the gap series between "
        "consecutive purchases (lag over event-time, event_id tie-"
        "break) reduced to count/min/max/mean seconds — the "
        "repurchase-rhythm feature behind churn-risk and next-order "
        "prediction, and the per-entity complement of the RFM "
        "recency point-read. One user_id shuffle serves the lag and "
        "the per-user rollup; gaps are exact integer seconds, and "
        "avg(gap_s) is an integer-sum / count ratio — deterministic "
        "in both engines."
    ),
    tags=("events", "window", "agg"),
)
def customer_purchase_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = ev.select("user_id", "ts", F.lag("ts").over(w).alias("prev_ts"))
    gap_s = F.unix_timestamp(
        F.col("ts").cast("timestamp")
    ) - F.unix_timestamp(F.col("prev_ts").cast("timestamp"))
    g = p.filter(F.col("prev_ts").isNotNull()).select(
        "user_id", gap_s.alias("gap_s")
    )
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap_s").alias("min_gap_s"),
        F.max("gap_s").alias("max_gap_s"),
        (F.floor(F.avg("gap_s") * 10000 + 0.5) / 10000.0).alias("avg_gap_s"),
    )


@register(
    "events_cart_abandonment",
    """
    WITH s AS (SELECT user_id, ts, event_id, event_type,
                      CASE WHEN lag(ts) OVER w IS NULL
                           OR date_diff('second', lag(ts) OVER w, ts) > 3600
                           THEN 1 ELSE 0 END AS new_session
               FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    i AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING) AS session_no
          FROM s),
    ses AS (SELECT user_id, session_no,
                   max(CASE WHEN event_type IN ('click', 'view') THEN 1 ELSE 0 END)
                       AS browsed,
                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS purchased
            FROM i GROUP BY user_id, session_no)
    SELECT CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN browsed = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_browsing,
           CAST(sum(CASE WHEN browsed = 1 AND purchased = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_abandoned,
           round(sum(CASE WHEN browsed = 1 AND purchased = 0 THEN 1 ELSE 0 END)
                 * 1.0
                 / greatest(sum(CASE WHEN browsed = 1 THEN 1 ELSE 0 END), 1), 4)
               AS abandonment_rate
    FROM ses
    """,
    doc=(
        "Cart/session abandonment: 1h-gap sessionization (the same "
        "lag + island sum as first-touch attribution), each session "
        "reduced to browsed/purchased flags, rolled up to the share "
        "of browsing sessions that end without a purchase — the "
        "conversion-leak metric product teams track beside windowed "
        "CVR. One user_id shuffle serves the lag, the island sum, "
        "and the session flags; the rollup is a single row."
    ),
    tags=("events", "window", "funnel"),
)
def events_cart_abandonment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp(F.col("ts").cast("timestamp")) - F.unix_timestamp(
        F.lag("ts").over(w).cast("timestamp")
    )
    i = ev.withColumn(
        "new_session", (gap.isNull() | (gap > 3600)).cast("int")
    ).withColumn(
        "session_no",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ses = i.groupBy("user_id", "session_no").agg(
        F.max(
            F.col("event_type").isin("click", "view").cast("int")
        ).alias("browsed"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias(
            "purchased"
        ),
    )
    browsed = F.sum(F.when(F.col("browsed") == 1, 1).otherwise(0))
    abandoned = F.sum(
        F.when((F.col("browsed") == 1) & (F.col("purchased") == 0), 1).otherwise(0)
    )
    return ses.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        browsed.cast("long").alias("n_browsing"),
        abandoned.cast("long").alias("n_abandoned"),
        F.round(
            abandoned * 1.0 / F.greatest(browsed, F.lit(1)), 4
        ).alias("abandonment_rate"),
    )


@register(
    "events_daypart_matrix",
    """
    SELECT CAST(hour(ts) AS INTEGER) AS hour_of_day,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           -- explicit half-up: integer-ratio means land on .xxxx5 ties
           -- where engine round() builtins disagree
           floor(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                 / (100.0 * count(*)) * 10000 + 0.5) / 10000.0 AS avg_value
    FROM events GROUP BY 1, 2
    """,
    doc=(
        "Daypart heat matrix: event volume and mean value per "
        "(hour-of-day × event type) — the load/engagement screen "
        "behind capacity planning and send-time optimization. ONE "
        "grouped aggregation whose key space is fixed (24 × event "
        "types), so map-side combine reduces any event volume to a "
        "few hundred shuffle rows; value sums in integer cents keep "
        "the mean an exact-integer ratio."
    ),
    tags=("events", "agg"),
)
def events_daypart_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.hour("ts").cast("int").alias("hour_of_day"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.floor(
                F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
                / (100.0 * F.count(F.lit(1)))
                * 10000
                + 0.5
            )
            / 10000.0
        ).alias("avg_value"),
    )


@register(
    "events_new_vs_returning",
    """
    WITH fu AS (SELECT user_id, CAST(min(ts) AS DATE) AS first_day
                FROM events GROUP BY user_id),
    act AS (SELECT DISTINCT CAST(e.ts AS DATE) AS day, e.user_id
            FROM events e),
    j AS (SELECT act.day, act.user_id, fu.first_day
          FROM act JOIN fu ON act.user_id = fu.user_id)
    SELECT day,
           CAST(count(*) AS BIGINT) AS active_users,
           CAST(sum(CASE WHEN first_day = day THEN 1 ELSE 0 END) AS BIGINT)
               AS new_users,
           CAST(sum(CASE WHEN first_day < day THEN 1 ELSE 0 END) AS BIGINT)
               AS returning_users,
           round(sum(CASE WHEN first_day < day THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4) AS returning_share
    FROM j GROUP BY day
    """,
    doc=(
        "Growth accounting: per day, active users split into new "
        "(first-ever event that day) vs returning — the DAU "
        "decomposition every growth team charts first. One user-grain "
        "min (first day), one distinct (day, user) reduction, and a "
        "user-keyed join — all three shuffle on user_id, so the plan "
        "re-uses one partitioning; exact integer counts make the "
        "returning share engine-identical. Day-grain casts match the "
        "oracle's DATE truncation exactly."
    ),
    tags=("events", "agg", "growth"),
)
def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    fu = ev.groupBy("user_id").agg(F.min("ts").cast("date").alias("first_day"))
    act = ev.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    j = act.join(fu, "user_id")
    returning = F.sum(
        F.when(F.col("first_day") < F.col("day"), 1).otherwise(0)
    )
    return j.groupBy("day").agg(
        F.count(F.lit(1)).alias("active_users"),
        F.sum(F.when(F.col("first_day") == F.col("day"), 1).otherwise(0))
        .cast("long")
        .alias("new_users"),
        returning.cast("long").alias("returning_users"),
        F.round(returning * 1.0 / F.count(F.lit(1)), 4).alias(
            "returning_share"
        ),
    )


@register(
    "events_session_length_stats",
    """
    WITH s AS (SELECT user_id, ts, event_id,
                      CASE WHEN lag(ts) OVER w IS NULL
                           OR date_diff('second', lag(ts) OVER w, ts) > 3600
                           THEN 1 ELSE 0 END AS new_session
               FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    i AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING) AS session_no
          FROM s),
    ses AS (SELECT user_id, session_no,
                   CAST(count(*) AS BIGINT) AS n_events,
                   date_diff('second', min(ts), max(ts)) AS duration_s
            FROM i GROUP BY user_id, session_no)
    SELECT n_events,
           CAST(count(*) AS BIGINT)           AS n_sessions,
           CAST(min(duration_s) AS BIGINT)    AS min_duration_s,
           CAST(max(duration_s) AS BIGINT)    AS max_duration_s,
           floor(avg(duration_s) * 10000 + 0.5) / 10000.0 AS avg_duration_s
    FROM ses GROUP BY n_events
    """,
    doc=(
        "Session-length distribution: 1h-gap sessions (the shared "
        "sessionization expression) bucketed by event count, with "
        "duration stats per bucket — the engagement-depth profile "
        "behind stickiness metrics and the state-size model for the "
        "stateful streaming sessionizer (its memory is one row per "
        "OPEN session, so this distribution bounds it). Durations "
        "are exact integer seconds; the bucket mean uses the "
        "explicit floor-based half-up (integer-ratio means land on "
        "round() ties). One user_id shuffle + one small bucket "
        "rollup."
    ),
    tags=("events", "window", "stats"),
)
def events_session_length_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp(F.col("ts").cast("timestamp")) - F.unix_timestamp(
        F.lag("ts").over(w).cast("timestamp")
    )
    i = ev.withColumn(
        "new_session", (gap.isNull() | (gap > 3600)).cast("int")
    ).withColumn(
        "session_no",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ses = i.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.unix_timestamp(F.max("ts").cast("timestamp"))
            - F.unix_timestamp(F.min("ts").cast("timestamp"))
        ).alias("duration_s"),
    )
    return ses.groupBy("n_events").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.min("duration_s").alias("min_duration_s"),
        F.max("duration_s").alias("max_duration_s"),
        (F.floor(F.avg("duration_s") * 10000 + 0.5) / 10000.0).alias(
            "avg_duration_s"
        ),
    )
