"""Relational/analytics queries over the TPC-H-ish test tables + the
reference-fidelity transform pipeline, each with a DuckDB oracle.

Numeric discipline for cross-engine equality: every SUM over doubles goes
through DECIMAL(18,6) per-row casts (exact, order-independent accumulation);
averages are computed as exact-decimal-sum cast to double divided by count
(one IEEE division — deterministic); no bare double SUMs anywhere.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cnpj_data_pipeline_spark.functions.transforms import (
    clean_code,
    decimal_comma_to_double,
    normalize_description,
    strip_accents,
    zero_date_to_null,
)
from cnpj_data_pipeline_spark.operators.antijoin import enrich_reference_codes


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan → filter → hash agg (map-side partials free)."""
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: c.cast("decimal(18,6)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec(F.col("l_quantity"))).cast("double").alias("sum_qty"),
            F.sum(dec(F.col("l_extendedprice"))).cast("double").alias("sum_base_price"),
            F.sum(dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .cast("double")
            .alias("sum_disc_price"),
            F.sum(
                dec(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                )
            )
            .cast("double")
            .alias("sum_charge"),
            (F.sum(dec(F.col("l_quantity"))).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(dec(F.col("l_discount"))).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + deterministic top-k (O-family): revenue top-10 customers.

    Top-k shape: ``orderBy(...).limit(10)`` — Catalyst emits
    TakeOrderedAndProject (parallel per-partition partial top-k, tiny driver
    merge), NOT a global sort. A ``Window.orderBy`` with no partitionBy here
    would funnel every aggregated customer through ONE task — a single-task
    scale-killer at 10^8 customers. The rank column is window-ranked only
    over the 10 surviving rows."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    agg = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double").alias("revenue"),
        )
    )
    top = agg.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc()).limit(10)
    w = Window.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
    return top.withColumn("rank", F.row_number().over(w))


def q_region_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join star query: orders → customer → nation → region rollup."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double").alias("revenue"),
        )
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window lag/gap sessionization of the event stream (30-min gap)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull() | (gap > 1800), 1).otherwise(0),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


def q_reference_transforms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F6 fidelity pipeline over synthesized reference-quirk strings:
    decimal-comma parse, zero-date parse, code pad, upper/trim/accent-fold."""
    part = _t(spark, sf_dir, "part")
    raw = part.select(
        "p_partkey",
        F.concat((F.col("p_size") % 100).cast("string"), F.lit(","), F.lit("50")).alias("amount_str"),
        F.when(F.col("p_partkey") % 5 == 0, F.lit("0"))
        .when(F.col("p_partkey") % 5 == 1, F.lit("00000000"))
        .otherwise(
            F.concat(
                F.lit("2020"),
                F.lpad(((F.col("p_partkey") % 12) + 1).cast("string"), 2, "0"),
                F.lpad(((F.col("p_partkey") % 28) + 1).cast("string"), 2, "0"),
            )
        )
        .alias("date_str"),
        (F.col("p_partkey") % 100).cast("string").alias("code_str"),
        F.concat(F.lit("  descrição número "), (F.col("p_partkey") % 7).cast("string"), F.lit(" ")).alias("desc_str"),
    )
    return raw.select(
        "p_partkey",
        decimal_comma_to_double("amount_str").alias("amount"),
        zero_date_to_null("date_str").alias("event_date"),
        clean_code("code_str", width=2).alias("code"),
        strip_accents(normalize_description(F.col("desc_str"))).alias("descricao"),
    )


def q_code_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5+U1: official nation codes enriched with the missing external codes
    (trim/pad/upper/accent-fold + left_anti + unionByName)."""
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    official = nation.select(
        F.col("n_nationkey").cast("string").alias("codigo"),
        F.col("n_name").alias("descricao"),
    )
    external = cust.select(
        (F.col("c_nationkey") + 15).cast("string").alias("codigo"),
        F.concat(F.lit("país "), F.col("c_nationkey").cast("string")).alias("descricao"),
    ).distinct()
    return enrich_reference_codes(official, external, code_width=2)


# Watermark replay parameters: events re-arrive in 100-event batches with a
# deterministic lateness permutation (every 50th event two batches late,
# every 50th+25 one batch late — ~4% late traffic); the watermark is the
# running max event time of all PRIOR batches minus 1 hour, Spark's
# withWatermark contract expressed batch-explicitly so DuckDB can replay it.
WM_BATCH = 100
WM_SHIFT = "CASE WHEN event_id % 50 = 0 THEN 2 WHEN event_id % 50 = 25 THEN 1 ELSE 0 END"


def q_event_time_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling 1-day windows under a late-data watermark policy:
    replay the event stream in arrival batches, drop events older than the
    watermark in force when their batch arrives (late = ts < running max of
    prior batches − 1h), then aggregate survivors per (window, event_type)
    and audit the drops per window. The per-batch watermark table is
    metadata-scale (#batches rows — the one intentional single-partition
    running-max window), broadcast back onto the event scan; everything
    data-sized stays a hash aggregate. The native `withWatermark` streaming
    twin of this policy is exercised in tests/test_event_windows.py; this
    batch-explicit form is the deterministic, oracle-checkable statement of
    the same semantics."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "ab", F.expr(f"event_id DIV {WM_BATCH} + ({WM_SHIFT})")
    )
    bmax = ev.groupBy("ab").agg(F.max("ts").alias("mx"))
    wrun = Window.orderBy("ab").rowsBetween(Window.unboundedPreceding, -1)
    wm = bmax.select(
        "ab", (F.max("mx").over(wrun) - F.expr("INTERVAL 1 HOUR")).alias("w")
    )
    j = ev.join(F.broadcast(wm), "ab").withColumn(
        "late", F.col("w").isNotNull() & (F.col("ts") < F.col("w"))
    )
    return (
        j.groupBy(
            F.window("ts", "1 day")["start"].alias("win_start"), "event_type"
        )
        .agg(
            F.count(F.when(~F.col("late"), 1)).alias("n_events"),
            F.round(
                F.sum(
                    F.when(~F.col("late"), F.col("value")).cast("decimal(18,6)")
                ).cast("double"),
                6,
            ).alias("sum_value"),
            F.count(F.when(F.col("late"), 1)).alias("n_dropped"),
        )
    )


# deterministic synthetic interval table for the range-join gate: 30
# variable-width, overlapping value windows keyed by event_type — pure
# integer arithmetic over range(30), identical in Spark and DuckDB
RJ_N_INTERVALS = 30
RJ_ETYPES = ["click", "error", "purchase", "signup", "view"]
RJ_BUCKET_WIDTH = 25.0


def _rj_intervals(spark: SparkSession) -> DataFrame:
    i = F.col("id")
    lo = (i * 37) % 450
    return spark.range(RJ_N_INTERVALS).select(
        i.alias("interval_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in RJ_ETYPES]),
            (i % 5 + 1).cast("int"),
        ).alias("event_type"),
        lo.cast("double").alias("lo"),
        (lo + 10 + (i * 13) % 40).cast("double").alias("hi"),
    )


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (interval-containment) JOIN: events matched to every
    variable-width, overlapping value window of their event_type
    (lo <= value < hi), rolled up per interval. Routes through the bucketed
    range join (operators/rangejoin.py) — interval rows explode to their
    overlapped fixed-width buckets, events equi-join on
    (event_type, bucket), the exact predicate prunes boundary false
    positives — instead of the O(events x intervals) nested-loop Spark
    plans for a raw inequality join. The decimal-cast sum keeps the float
    rollup order-independent (bit-stable across partitionings and vs the
    oracle)."""
    from cnpj_data_pipeline_spark.operators.rangejoin import interval_join

    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    joined = interval_join(
        ev,
        _rj_intervals(spark),
        point_col="value",
        lo_col="lo",
        hi_col="hi",
        on=("event_type",),
        bucket_width=RJ_BUCKET_WIDTH,
    )
    return joined.groupBy("interval_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6
        ).alias("sum_value"),
    )


QUERIES = {
    "q_interval_join": q_interval_join,
    "q_pricing_summary": q_pricing_summary,
    "q_event_time_windows": q_event_time_windows,
    "q_top_customers": q_top_customers,
    "q_region_sales": q_region_sales,
    "q_sessionize": q_sessionize,
    "q_reference_transforms": q_reference_transforms,
    "q_code_enrichment": q_code_enrichment,
}

_RJ_ETYPES_SQL = "[" + ", ".join(f"'{t}'" for t in RJ_ETYPES) + "]"

ORACLES = {
    "q_interval_join": f"""
        WITH iv AS (
          SELECT i AS interval_id,
                 {_RJ_ETYPES_SQL}[CAST(i % 5 AS INT) + 1] AS event_type,
                 CAST((i * 37) % 450 AS DOUBLE) AS lo,
                 CAST((i * 37) % 450 + 10 + (i * 13) % 40 AS DOUBLE) AS hi
          FROM range({RJ_N_INTERVALS}) t(i))
        SELECT iv.interval_id, iv.event_type,
               count(*) AS n_events,
               round(CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE), 6)
                   AS sum_value
        FROM events e
        JOIN iv ON e.event_type = iv.event_type
               AND e.value >= iv.lo AND e.value < iv.hi
        GROUP BY 1, 2
    """,
    "q_event_time_windows": f"""
        WITH e AS (
          SELECT *, event_id // {WM_BATCH} + ({WM_SHIFT}) AS ab FROM events
        ),
        bmax AS (SELECT ab, max(ts) AS mx FROM e GROUP BY ab),
        wm AS (
          SELECT ab,
                 max(mx) OVER (
                     ORDER BY ab ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ) - INTERVAL 1 HOUR AS w
          FROM bmax
        ),
        j AS (
          SELECT e.*, (wm.w IS NOT NULL AND e.ts < wm.w) AS late
          FROM e JOIN wm USING (ab)
        )
        SELECT date_trunc('day', ts) AS win_start, event_type,
               count(*) FILTER (WHERE NOT late) AS n_events,
               round(CAST(sum(CAST(value AS DECIMAL(18,6))) FILTER (WHERE NOT late) AS DOUBLE), 6) AS sum_value,
               count(*) FILTER (WHERE late) AS n_dropped
        FROM j GROUP BY 1, 2
    """,
    "q_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_qty,
               CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q_top_customers": """
        WITH agg AS (
          SELECT c_custkey, c_name, count(*) AS n_orders,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY c_custkey, c_name
        )
        SELECT * FROM (
          SELECT *, CAST(row_number() OVER (ORDER BY revenue DESC, c_custkey ASC) AS INTEGER) AS rank
          FROM agg
        ) WHERE rank <= 10
    """,
    "q_region_sales": """
        SELECT r_name, count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "q_sessionize": """
        WITH flagged AS (
          SELECT user_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                           OR date_diff('second', lag(ts) OVER w, ts) > 1800
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        )
        SELECT user_id,
               CAST(sum(new_session) AS BIGINT) AS n_sessions,
               count(*) AS n_events
        FROM flagged GROUP BY user_id
    """,
    "q_reference_transforms": """
        WITH raw AS (
          SELECT p_partkey,
                 CAST(p_size % 100 AS VARCHAR) || ',' || '50' AS amount_str,
                 CASE WHEN p_partkey % 5 = 0 THEN '0'
                      WHEN p_partkey % 5 = 1 THEN '00000000'
                      ELSE '2020' || lpad(CAST((p_partkey % 12) + 1 AS VARCHAR), 2, '0')
                                  || lpad(CAST((p_partkey % 28) + 1 AS VARCHAR), 2, '0')
                 END AS date_str,
                 CAST(p_partkey % 100 AS VARCHAR) AS code_str,
                 '  descrição número ' || CAST(p_partkey % 7 AS VARCHAR) || ' ' AS desc_str
          FROM part
        )
        SELECT p_partkey,
               try_cast(replace(amount_str, ',', '.') AS DOUBLE) AS amount,
               CASE WHEN date_str IN ('0', '00000000', '') THEN NULL
                    ELSE CAST(try_strptime(date_str, '%Y%m%d') AS DATE) END AS event_date,
               CASE WHEN regexp_matches(trim(code_str), '^[0-9]{1}$')
                    THEN lpad(trim(code_str), 2, '0') ELSE trim(code_str) END AS code,
               strip_accents(
                 CASE WHEN upper(trim(desc_str)) IS NULL OR upper(trim(desc_str)) = ''
                      THEN 'DESCRIÇÃO INDISPONÍVEL' ELSE upper(trim(desc_str)) END
               ) AS descricao
        FROM raw
    """,
    "q_code_enrichment": """
        WITH official AS (
          SELECT CAST(n_nationkey AS VARCHAR) AS codigo, n_name AS descricao FROM nation
        ),
        external AS (
          SELECT DISTINCT CAST(c_nationkey + 15 AS VARCHAR) AS codigo,
                 'país ' || CAST(c_nationkey AS VARCHAR) AS descricao
          FROM customer
        ),
        cleaned AS (
          SELECT CASE WHEN regexp_matches(trim(codigo), '^[0-9]{1}$')
                      THEN lpad(trim(codigo), 2, '0') ELSE trim(codigo) END AS codigo,
                 strip_accents(
                   CASE WHEN upper(trim(descricao)) IS NULL OR upper(trim(descricao)) = ''
                        THEN 'DESCRIÇÃO INDISPONÍVEL' ELSE upper(trim(descricao)) END
                 ) AS descricao
          FROM external
          WHERE codigo IS NOT NULL AND codigo <> ''
        )
        SELECT codigo, descricao FROM official
        UNION ALL
        SELECT c.codigo, c.descricao FROM cleaned c
        LEFT JOIN official o ON c.codigo = o.codigo
        WHERE o.codigo IS NULL
    """,
}
