"""Relational breadth: join family, top-k, set ops, rollup, analytic windows,
distinct/approx aggregates (SURVEY.md §2.6 X5-X10 — capability extensions;
the reference itself has none of these, §2.5).

Scale notes are inline per query; the common rules:
- dimension tables (region/nation/supplier) are broadcast — no shuffle of the
  fact side for those joins;
- top-k per group is rank-filter (one shuffle+sort), global top-k is
  TakeOrderedAndProject (no full sort);
- double-valued aggregates are ROUNDed because summation order is
  engine-dependent (SURVEY.md §5 pitfall 2).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from ..io import parquet_row_count, read_table, ts_micros, ts_seconds, ts_seconds_d
from ..operators.joins import asof_join
from ..operators.scale import exact_global_rank
from . import query

def REVENUE():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "q_join_inner",
    oracle="""
    SELECT o_orderpriority,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    doc="Fact-fact inner join + keyed agg. Both sides shuffle on the join key; AQE may convert to broadcast at small SF.",
)
def q_join_inner(spark: SparkSession, sf_dir: str):
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.round(F.sum(REVENUE()), 2).alias("revenue"), F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_join_broadcast",
    oracle="""
    SELECT r_name AS region,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    doc="Star join with explicitly broadcast dims (supplier/nation/region) — zero fact-side shuffles before the agg.",
)
def q_join_broadcast(spark: SparkSession, sf_dir: str):
    li = read_table(spark, sf_dir, "lineitem")
    supp = F.broadcast(read_table(spark, sf_dir, "supplier"))
    nation = F.broadcast(read_table(spark, sf_dir, "nation"))
    region = F.broadcast(read_table(spark, sf_dir, "region"))
    return (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"))
        .agg(F.round(F.sum(REVENUE()), 2).alias("revenue"), F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Left-semi join (EXISTS). Spark ships only the key column of the right side.",
)
def q_join_semi(spark: SparkSession, sf_dir: str):
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Left-anti join (NOT EXISTS): customers with no orders.",
)
def q_join_anti(spark: SparkSession, sf_dir: str):
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_range",
    oracle="""
    SELECT o_orderkey, count(*) AS n_shipped_30d,
           round(sum(l_extendedprice), 2) AS value_30d
    FROM orders JOIN lineitem
      ON l_orderkey = o_orderkey
     AND l_shipdate >= o_orderdate
     AND l_shipdate < o_orderdate + INTERVAL 30 DAY
    GROUP BY o_orderkey
    """,
    doc="Equi+range join: lineitems shipped within 30 days of their order. The equality key keeps it a hash join; the range is a post-filter, NOT a cross product.",
)
def q_join_range(spark: SparkSession, sf_dir: str):
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    cond = (
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate >= orders.o_orderdate)
        & (li.l_shipdate < orders.o_orderdate + F.expr("INTERVAL 30 DAYS"))
    )
    return (
        orders.join(li, cond)
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_shipped_30d"),
            F.round(F.sum("l_extendedprice"), 2).alias("value_30d"),
        )
    )


@query(
    "q_join_range_asof",
    oracle="""
    SELECT p.user_id, p.event_id, CAST(p.ts AS TIMESTAMP) AS ts, p.value,
           CAST(e.ts AS TIMESTAMP) AS err_ts_asof, e.event_id AS err_id_asof
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON p.user_id = e.user_id AND p.ts >= e.ts
    """,
    doc="As-of join: for each purchase, the most recent prior error of the same user (operators/joins.py union+window plan — one shuffle, no inequality cross product).",
)
def q_join_range_asof(spark: SparkSession, sf_dir: str):
    ev = read_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("err_ts"), F.col("event_id").alias("err_id")
    )
    joined = asof_join(
        purchases,
        errors,
        on=["user_id"],
        left_ts="ts",
        right_ts="err_ts",
        value_cols=["err_ts", "err_id"],
    )
    return joined.select(
        "user_id",
        "event_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "value",
        F.col("err_ts_asof").cast("timestamp_ntz").alias("err_ts_asof"),
        "err_id_asof",
    )


@query(
    "q_topk_per_group",
    oracle="""
    SELECT p_brand, l_partkey, revenue, CAST(rn AS INTEGER) AS rnk
    FROM (
      SELECT p_brand, l_partkey, revenue,
             row_number() OVER (PARTITION BY p_brand ORDER BY revenue DESC, l_partkey) AS rn
      FROM (
        SELECT p_brand, l_partkey, round(sum(l_extendedprice), 2) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, l_partkey
      )
    ) WHERE rn <= 3
    """,
    doc="Top-3 parts by revenue per brand: agg then rank-filter. Rank on the ROUNDED measure with l_partkey tie-break keeps it deterministic.",
)
def q_topk_per_group(spark: SparkSession, sf_dir: str):
    li = read_table(spark, sf_dir, "lineitem")
    part = F.broadcast(read_table(spark, sf_dir, "part"))
    per_part = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "l_partkey")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("revenue"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.col("revenue").desc(), F.col("l_partkey"))
    return (
        per_part.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("p_brand", "l_partkey", "revenue", "rnk")
    )


@query(
    "q_topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    doc="Global top-10 orders: orderBy+limit compiles to TakeOrderedAndProject (per-partition heap + driver merge, no full sort).",
)
def q_topk_global(spark: SparkSession, sf_dir: str):
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "q_set_ops",
    oracle="""
    WITH cust_n AS (
      SELECT DISTINCT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
    ), supp_n AS (
      SELECT DISTINCT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
    )
    SELECT 'both' AS op, n_name FROM (SELECT n_name FROM cust_n INTERSECT SELECT n_name FROM supp_n)
    UNION ALL
    SELECT 'cust_only' AS op, n_name FROM (SELECT n_name FROM cust_n EXCEPT SELECT n_name FROM supp_n)
    UNION ALL
    SELECT 'either' AS op, n_name FROM (SELECT n_name FROM cust_n UNION SELECT n_name FROM supp_n)
    """,
    doc="Set operations: INTERSECT / EXCEPT / UNION (distinct) over customer vs supplier nations.",
)
def q_set_ops(spark: SparkSession, sf_dir: str):
    nation = F.broadcast(read_table(spark, sf_dir, "nation"))
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    cust_n = cust.join(nation, F.col("c_nationkey") == F.col("n_nationkey")).select("n_name").distinct()
    supp_n = supp.join(nation, F.col("s_nationkey") == F.col("n_nationkey")).select("n_name").distinct()
    return (
        cust_n.intersect(supp_n).select(F.lit("both").alias("op"), "n_name")
        .unionAll(cust_n.subtract(supp_n).select(F.lit("cust_only").alias("op"), "n_name"))
        .unionAll(cust_n.union(supp_n).distinct().select(F.lit("either").alias("op"), "n_name"))
    )


@query(
    "q_rollup",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           round(sum(l_quantity), 2)     AS sum_qty,
           count(*)                      AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    doc="ROLLUP hierarchy totals (flag, status) -> (flag) -> (); NULL markers coalesced to 'ALL' on both sides.",
)
def q_rollup(spark: SparkSession, sf_dir: str):
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


@query(
    "q_cube",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL')    AS orderstatus,
           COALESCE(o_orderpriority, 'ALL')  AS orderpriority,
           round(sum(o_totalprice), 2)       AS total,
           count(*)                          AS n
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    doc="CUBE over (status, priority): all 4 grouping sets in one pass (Spark Expand + single shuffle).",
)
def q_cube(spark: SparkSession, sf_dir: str):
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "total",
            "n",
        )
    )


@query(
    "q_window_moving_avg",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
           CAST(sum(cents) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
           / (100.0 * count(*) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) AS mov_avg3,
           CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS seq
    FROM (SELECT *, CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents FROM orders)
    """,
    doc="Analytic window functions: lag + 3-row moving average + row_number per customer, ordered by (date, key) for determinism. The moving average goes through integer cents so frame sums are exact and engine-identical (a rounded double avg can land on a half-boundary where rounding modes disagree).",
)
def q_window_moving_avg(spark: SparkSession, sf_dir: str):
    orders = read_table(spark, sf_dir, "orders").withColumn(
        "cents", F.round(F.col("o_totalprice") * 100, 0).cast("long")
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w3 = w.rowsBetween(-2, 0)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        (F.sum("cents").over(w3).cast("double") / (100.0 * F.count(F.lit(1)).over(w3))).alias(
            "mov_avg3"
        ),
        F.row_number().over(w).alias("seq"),
    )


@query(
    "q_count_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS u_supp,
           count(DISTINCT l_partkey) AS u_part,
           count(*)                  AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Multi-column DISTINCT aggregation (Expand-based plan, two-phase).",
)
def q_count_distinct(spark: SparkSession, sf_dir: str):
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("u_supp"),
        F.countDistinct("l_partkey").alias("u_part"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_approx_distinct",
    oracle=None,  # HLL sketches are implementation-specific -> rows-only check.
    doc="approx_count_distinct (HyperLogLog++): the 100 TB-scale path for cardinality; sketch values differ across engines so no value oracle.",
)
def q_approx_distinct(spark: SparkSession, sf_dir: str):
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_suppkey", 0.01).alias("approx_u_supp"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_sliding_window",
    oracle="""
    WITH base AS (
      SELECT event_type, value, CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS slot
      FROM events
    ), w AS (
      SELECT event_type, value, unnest([slot, slot - 300]) AS start_s FROM base
    )
    SELECT make_timestamp(start_s * 1000000)         AS window_start,
           make_timestamp((start_s + 600) * 1000000) AS window_end,
           event_type                                AS symbol,
           count(*)                                  AS n,
           round(sum(value), 4)                      AS total_value
    FROM w GROUP BY 1, 2, 3
    """,
    doc=(
        "Sliding (hopping) window: 10-minute windows every 5 minutes — each event "
        "lands in exactly 2 windows (Spark's window(ts, '10 minutes', '5 minutes'); "
        "capability extension of the reference's tumbling window, SURVEY §2.4 T2). "
        "Oracle expands the window membership with unnest."
    ),
)
def q_sliding_window(spark: SparkSession, sf_dir: str):
    e = read_table(spark, sf_dir, "events")
    w = F.window(F.col("ts"), "10 minutes", "5 minutes")
    return (
        e.groupBy(w.alias("w"), F.col("event_type").alias("symbol"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            F.col("w.end").cast("timestamp_ntz").alias("window_end"),
            "symbol",
            "n",
            "total_value",
        )
    )


@query(
    "q_session_window",
    oracle="""
    WITH s AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ), g AS (
      SELECT *, sum(new_sess) OVER (
        PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM s
    )
    SELECT user_id,
           CAST(min(ts) AS TIMESTAMP)                      AS session_start,
           CAST(max(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
           count(*)                                        AS n,
           round(sum(value), 4)                            AS total_value
    FROM g GROUP BY user_id, sess_id
    """,
    doc=(
        "Session window (30-minute gap) per user — Spark's session_window() "
        "(capability extension, SURVEY §2.4 T2); oracle is the classic "
        "gaps-and-islands rewrite. Session end = last event + gap, half-open, "
        "so a gap of EXACTLY 30 min starts a new session in both."
    ),
)
def q_session_window(spark: SparkSession, sf_dir: str):
    e = read_table(spark, sf_dir, "events")
    sw = F.session_window(F.col("ts"), "30 minutes")
    return (
        e.groupBy(sw.alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            "user_id",
            F.col("sw.start").cast("timestamp_ntz").alias("session_start"),
            F.col("sw.end").cast("timestamp_ntz").alias("session_end"),
            "n",
            "total_value",
        )
    )


@query(
    "q_grouping_sets",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           round(sum(l_quantity), 2)     AS sum_qty,
           count(*)                      AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    doc="Explicit GROUPING SETS (by-flag, by-status, grand total) via the engine's SQL surface — one Expand + single shuffle, not three scans.",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str):
    read_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               round(sum(l_quantity), 2)     AS sum_qty,
               count(*)                      AS n
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "q_join_left",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           count(o_orderkey)                      AS n_orders,
           round(coalesce(sum(o_totalprice), 0.0), 2) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
    doc=(
        "Left-outer join + agg: every customer retained, zero-order customers "
        "get count 0 / spend 0. COUNT(col) null-skipping does the outer-row "
        "bookkeeping — no driver-side fixups."
    ),
)
def q_join_left(spark: SparkSession, sf_dir: str):
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


@query(
    "q_join_full",
    oracle="""
    WITH c AS (
      SELECT c_nationkey AS nationkey, count(*) AS n_cust
      FROM customer GROUP BY c_nationkey
    ), s AS (
      SELECT s_nationkey AS nationkey, count(*) AS n_supp
      FROM supplier GROUP BY s_nationkey
    )
    SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
           coalesce(n_cust, 0) AS n_cust,
           coalesce(n_supp, 0) AS n_supp
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    """,
    doc=(
        "Full-outer join of two pre-aggregated sides (customer vs supplier "
        "presence per nation). Aggregate-then-join: the outer join sees "
        "|nations| rows, not |customers|+|suppliers|."
    ),
)
def q_join_full(spark: SparkSession, sf_dir: str):
    cust = (
        read_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        read_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        cust.join(supp, "nationkey", "full_outer")
        .select(
            F.col("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


@query(
    "q_join_cross",
    oracle="""
    SELECT r_name, o_orderstatus, count(*) AS n
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
    GROUP BY r_name, o_orderstatus
    """,
    doc=(
        "Cross join of two tiny relations (5 regions x |statuses|). Cross "
        "joins are only ever sane when at least one side is broadcast-small; "
        "the engine broadcasts the distinct-status side explicitly."
    ),
)
def q_join_cross(spark: SparkSession, sf_dir: str):
    region = read_table(spark, sf_dir, "region")
    statuses = read_table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return (
        region.crossJoin(F.broadcast(statuses))
        .groupBy("r_name", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                    AS sum_qty,
           round(sum(l_extendedprice), 2)                               AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                    AS avg_qty,
           round(avg(l_extendedprice), 4)                               AS avg_price,
           round(avg(l_discount), 4)                                    AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2024-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc=(
        "TPC-H Q1-shaped pricing summary: the canonical scan-heavy partial-agg "
        "workload. One scan, filter pushed to parquet, 8 declarative "
        "aggregates in a single HashAggregate pair; output cardinality is "
        "|flags|x|statuses| regardless of input size."
    ),
)
def q_pricing_summary(spark: SparkSession, sf_dir: str):
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2024-09-01 00:00:00").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "q_revenue_by_nation",
    oracle="""
    SELECT n_name AS nation,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc=(
        "TPC-H Q5-shaped local-supplier revenue: two fact-fact shuffles "
        "(lineitem-orders on orderkey, +customer on custkey) and broadcast "
        "dims (supplier/nation). Join order keeps the widest relation "
        "(lineitem) shuffled exactly once; the c_nationkey = s_nationkey "
        "filter rides the broadcast join, not a separate pass."
    ),
)
def q_revenue_by_nation(spark: SparkSession, sf_dir: str):
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    supp = F.broadcast(read_table(spark, sf_dir, "supplier"))
    nation = F.broadcast(read_table(spark, sf_dir, "nation"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(REVENUE()), 2).alias("revenue"))
    )


@query(
    "q_join_right",
    oracle="""
    SELECT p_partkey, p_brand,
           count(l_orderkey)                          AS n_items,
           round(coalesce(sum(l_quantity), 0.0), 2)   AS total_qty
    FROM lineitem RIGHT JOIN part ON l_partkey = p_partkey
    GROUP BY p_partkey, p_brand
    """,
    doc=(
        "Right-outer join + agg: every part retained, never-ordered parts get "
        "zero counts. Planner note: Spark rewrites right-outer as left-outer "
        "with sides swapped, so the preserved (part) side can still broadcast."
    ),
)
def q_join_right(spark: SparkSession, sf_dir: str):
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    return (
        li.join(part, li.l_partkey == part.p_partkey, "right")
        .groupBy("p_partkey", "p_brand")
        .agg(
            F.count("l_orderkey").alias("n_items"),
            F.round(F.coalesce(F.sum("l_quantity"), F.lit(0.0)), 2).alias("total_qty"),
        )
    )


@query(
    "q_group_sum_salted",
    oracle="""
    SELECT event_type, round(sum(value), 2) AS total, count(*) AS n
    FROM events GROUP BY event_type
    """,
    doc=(
        "Two-phase salted aggregation (operators/scale.salted_group_sum): "
        "groupBy(key, salt) partial then groupBy(key) final. Semantically "
        "identical to the plain sum — the oracle IS the plain sum — but the "
        "first shuffle spreads a pathologically hot key over `buckets` "
        "reducers. The defense when AQE skew handling isn't enough."
    ),
)
def q_group_sum_salted(spark: SparkSession, sf_dir: str):
    from ..operators.scale import salted_group_sum

    e = read_table(spark, sf_dir, "events").select("event_type", "value")
    out = salted_group_sum(e, keys=["event_type"], agg_cols={"total": "value"}, buckets=16)
    return out.select("event_type", F.round("total", 2).alias("total"), "n")


@query(
    "q_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders o
    WHERE o_totalprice > 2 * (
      SELECT avg(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey
    )
    """,
    doc=(
        "Correlated scalar subquery (orders over 2x their customer's "
        "average). Catalyst decorrelates it into an aggregate + join — one "
        "pass over orders, not a subquery per row. The engine's SQL surface "
        "is Spark SQL itself."
    ),
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str):
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_sq")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders_sq o
        WHERE o_totalprice > 2 * (
          SELECT avg(o2.o_totalprice) FROM orders_sq o2 WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


@query(
    "q_pivot",
    oracle="""
    SELECT l_returnflag,
           round(coalesce(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 0.0), 2) AS qty_F,
           round(coalesce(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 0.0), 2) AS qty_O
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc=(
        "Pivot (wide layout): one HashAggregate with conditional aggregates "
        "— pivot never needs a second shuffle. Pivot values are declared "
        "explicitly: at scale, value discovery is a separate distinct scan "
        "you should not pay implicitly."
    ),
)
def q_pivot(spark: SparkSession, sf_dir: str):
    li = read_table(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum("l_quantity"))
    )
    return out.select(
        "l_returnflag",
        F.round(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("qty_F"),
        F.round(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("qty_O"),
    )


@query(
    "q_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4)  AS p50,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS p95
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc=(
        "Exact interpolated percentiles (Spark `percentile` == DuckDB "
        "quantile_cont: linear interpolation). Exact percentile is a "
        "sort-based aggregate — at 100 TB prefer approx_percentile "
        "(t-digest, mergeable, partial-aggregatable) unless exactness is a "
        "requirement."
    ),
)
def q_percentiles(spark: SparkSession, sf_dir: str):
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("p95"),
    )


@query(
    "q_stats_profile",
    oracle="""
    SELECT l_returnflag,
           round(avg(l_extendedprice), 4)                        AS mean_price,
           round(stddev_samp(l_extendedprice), 4)                AS sd_price,
           round(var_samp(l_quantity), 4)                        AS var_qty,
           round(corr(l_extendedprice, l_quantity), 6)           AS corr_pq,
           round(covar_samp(l_extendedprice, l_discount), 6)     AS cov_pd
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc=(
        "Statistical profiling aggregates (stddev/variance/correlation/"
        "covariance): all declarative moment aggregates — partial moments "
        "merge associatively, so one partial+final HashAggregate pair, same "
        "plan shape as a plain sum. The data-profiling pass a training-data "
        "pipeline runs before filtering."
    ),
)
def q_stats_profile(spark: SparkSession, sf_dir: str):
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.avg("l_extendedprice"), 4).alias("mean_price"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("corr_pq"),
        F.round(F.covar_samp("l_extendedprice", "l_discount"), 6).alias("cov_pd"),
    )


@query(
    "q_set_ops_all",
    oracle="""
    SELECT o_custkey, count(*) AS n FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT o_custkey FROM orders WHERE o_totalprice > 100000
      EXCEPT ALL
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    GROUP BY o_custkey
    """,
    doc=(
        "Bag-semantics set ops (UNION ALL / EXCEPT ALL): multiplicity is "
        "preserved, so EXCEPT ALL subtracts per-occurrence — a different "
        "operator from set-semantics EXCEPT (q_set_ops), planned as a "
        "count-and-subtract aggregate, not a distinct."
    ),
)
def q_set_ops_all(spark: SparkSession, sf_dir: str):
    orders = read_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = orders.filter(F.col("o_totalprice") > 100000).select("o_custkey")
    c = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        a.unionAll(b).exceptAll(c)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_window_funcs",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(o_totalprice, 2)                                          AS price,
           lead(o_orderkey) OVER w                                         AS next_order,
           CAST(ntile(4) OVER w AS INTEGER)                                AS spend_quartile,
           first_value(o_orderkey) OVER w                                  AS first_order,
           round(percent_rank() OVER w, 6)                                 AS pr
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    """,
    doc=(
        "Analytic-function breadth in one keyed window: lead, ntile, "
        "first_value, percent_rank share a single (partition, sort) pass — "
        "Spark plans ONE Window operator for all four, so adding functions "
        "to an existing window spec is free of extra shuffles."
    ),
)
def q_window_funcs(spark: SparkSession, sf_dir: str):
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("price"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.ntile(4).over(w).alias("spend_quartile"),
        F.first_value("o_orderkey").over(w).alias("first_order"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
    )


@query(
    "q_datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)                      AS y,
           CAST(month(o_orderdate) AS INTEGER)                     AS m,
           CAST(day(o_orderdate) AS INTEGER)                       AS d,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)     AS month_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP)  AS month_end,
           CAST(date_diff('day', CAST(o_orderdate AS DATE),
                          DATE '2024-12-31') AS BIGINT)            AS days_to_eoy,
           CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP)       AS plus_3m
    FROM orders
    """,
    doc=(
        "Date/time function parity sweep (year/month/day, month bounds, "
        "day arithmetic, calendar-aware month addition). These are the "
        "expressions most prone to cross-engine drift (week numbering and "
        "dow bases differ between engines and are deliberately excluded — "
        "standardize on ISO expressions before porting queries that use them)."
    ),
)
def q_datetime_funcs(spark: SparkSession, sf_dir: str):
    orders = read_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("d"),
        F.date_trunc("month", d).alias("month_start"),
        F.last_day(d).cast("timestamp_ntz").alias("month_end"),
        F.datediff(F.lit("2024-12-31").cast("date"), d.cast("date")).cast("long").alias("days_to_eoy"),
        (d + F.expr("INTERVAL 3 MONTH")).alias("plus_3m"),
    )


@query(
    "q_string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                         AS up,
           lower(c_mktsegment)                   AS lo,
           substr(c_name, 1, 8)                  AS pre,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
           replace(c_name, '#', '-')             AS repl,
           reverse(c_mktsegment)                 AS rev,
           CAST(length(c_name) AS INTEGER)       AS n_chars,
           CAST(position('1' IN c_name) AS INTEGER) AS pos1,
           starts_with(c_name, 'Customer')       AS is_cust
    FROM customer
    """,
    doc=(
        "String function parity sweep (case, substring, padding, replace, "
        "reverse, position, prefix test) — all whole-stage-codegen "
        "expressions; the subset chosen is identical across engines "
        "(initcap/soundex/regexp flavors are the ones that drift)."
    ),
)
def q_string_funcs(spark: SparkSession, sf_dir: str):
    cust = read_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.substring("c_name", 1, 8).alias("pre"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("repl"),
        F.reverse("c_mktsegment").alias("rev"),
        F.length("c_name").alias("n_chars"),
        F.instr(F.col("c_name"), "1").alias("pos1"),
        F.startswith(F.col("c_name"), F.lit("Customer")).alias("is_cust"),
    )


@query(
    "q_null_semantics",
    oracle="""
    SELECT o_orderkey,
           nullif(o_orderstatus, 'O')                         AS status_or_null,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN')       AS status_filled,
           (nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM
            nullif(o_orderpriority, o_orderpriority))         AS both_null_eq,
           CAST(count(nullif(o_orderstatus, 'O'))
                OVER (PARTITION BY o_custkey) AS BIGINT)      AS non_open_cnt
    FROM orders
    """,
    doc=(
        "NULL-semantics operators: nullif/coalesce, null-safe equality "
        "(Spark <=> / eqNullSafe == SQL IS NOT DISTINCT FROM — TRUE when "
        "both sides are NULL, where plain = yields NULL), and COUNT's "
        "null-skipping under a window. The semantics that silently corrupt "
        "ported queries when engines disagree."
    ),
)
def q_null_semantics(spark: SparkSession, sf_dir: str):
    orders = read_table(spark, sf_dir, "orders")
    s_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    p_null = F.nullif(F.col("o_orderpriority"), F.col("o_orderpriority"))
    w = Window.partitionBy("o_custkey")
    return orders.select(
        "o_orderkey",
        s_null.alias("status_or_null"),
        F.coalesce(s_null, F.lit("OPEN")).alias("status_filled"),
        s_null.eqNullSafe(p_null).alias("both_null_eq"),
        F.count(s_null).over(w).alias("non_open_cnt"),
    )


@query(
    "q_filter_agg",
    oracle="""
    SELECT l_returnflag,
           count(*)                                              AS n_all,
           count(*) FILTER (WHERE l_discount > 0.05)             AS n_discounted,
           round(coalesce(sum(l_extendedprice)
                 FILTER (WHERE l_quantity >= 25), 0.0), 2)       AS big_qty_revenue
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc=(
        "SQL FILTER clause on aggregates: per-aggregate predicates in ONE "
        "HashAggregate pass — the declarative form of conditional "
        "aggregation (equivalent to CASE WHEN inputs, planned identically)."
    ),
)
def q_filter_agg(spark: SparkSession, sf_dir: str):
    read_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_fa")
    return spark.sql(
        """
        SELECT l_returnflag,
               count(*)                                              AS n_all,
               count(*) FILTER (WHERE l_discount > 0.05)             AS n_discounted,
               round(coalesce(sum(l_extendedprice)
                     FILTER (WHERE l_quantity >= 25), 0.0), 2)       AS big_qty_revenue
        FROM lineitem_fa
        GROUP BY l_returnflag
        """
    )


@query(
    "q_funnel",
    oracle="""
    WITH first_signup AS (
      SELECT user_id, min(ts) AS signup_ts
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    )
    SELECT f.user_id,
           CAST(f.signup_ts AS TIMESTAMP) AS signup_ts,
           CAST(count(e.event_id) AS BIGINT) AS n_purchases_1h,
           count(e.event_id) > 0 AS converted
    FROM first_signup f
    LEFT JOIN events e
      ON e.user_id = f.user_id AND e.event_type = 'purchase'
     AND e.ts >= f.signup_ts AND e.ts < f.signup_ts + INTERVAL 1 HOUR
    GROUP BY f.user_id, f.signup_ts
    """,
    doc=(
        "Funnel conversion: first signup per user, purchases within the "
        "following hour. Aggregate-then-join (the signup side collapses to "
        "one row per user BEFORE the range join) + event-type filters pushed "
        "to the scan — the range condition only ever sees one anchor row "
        "per user."
    ),
)
def q_funnel(spark: SparkSession, sf_dir: str):
    events = read_table(spark, sf_dir, "events")
    first_signup = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("event_id"), F.col("ts").alias("p_ts")
    )
    return (
        first_signup.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("signup_ts"))
            & (F.col("p_ts") < F.col("signup_ts") + F.expr("INTERVAL 1 HOUR")),
            "left",
        )
        .groupBy("user_id", "signup_ts")
        .agg(
            F.count("event_id").alias("n_purchases_1h"),
            (F.count("event_id") > 0).alias("converted"),
        )
    )


@query(
    "q_retention_cohort",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(date_diff('day', CAST(f.cohort_week AS DATE),
                            CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS BIGINT) AS week_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week, week_offset,
           count(*) AS n_active_users
    FROM activity
    GROUP BY cohort_week, week_offset
    """,
    doc=(
        "Cohort retention: users grouped by first-activity week, counted in "
        "each later week they were active. Two aggregations + one join; the "
        "firsts side is |users| rows (broadcastable at any corpus size "
        "where user count << event count). Week bucketing is ISO-Monday "
        "date_trunc in both engines."
    ),
)
def q_retention_cohort(spark: SparkSession, sf_dir: str):
    events = read_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    offset = (
        F.datediff(
            F.date_trunc("week", F.col("ts")).cast("date"), F.col("cohort_week").cast("date")
        )
        / 7
    ).cast("long")
    activity = (
        events.join(F.broadcast(firsts), "user_id")
        .select("user_id", "cohort_week", offset.alias("week_offset"))
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active_users")
    )


@query(
    "q_ship_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(o_orderdate AS TIMESTAMP) AS o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate  > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    doc=(
        "TPC-H Q3 shape (shipping priority): selective filters on both fact "
        "sides BEFORE the joins (pushed to the parquet scans), customer dim "
        "broadcast, then agg + global top-10 via TakeOrderedAndProject — no "
        "full sort of the aggregate output. Tie-broken by unique l_orderkey "
        "so LIMIT is deterministic across engines."
    ),
)
def q_ship_priority(spark: SparkSession, sf_dir: str):
    cust = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(REVENUE()), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q_exists_subquery",
    oracle="""
    SELECT o_orderpriority, count(*) AS n
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
    doc=(
        "TPC-H Q4 shape: correlated EXISTS. Catalyst rewrites it to a "
        "LEFT SEMI join on l_orderkey (RewritePredicateSubquery) — one pass "
        "over each table, never a per-row subquery. The date filter "
        "pre-shrinks the probe side at the scan."
    ),
)
def q_exists_subquery(spark: SparkSession, sf_dir: str):
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_ex")
    read_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_ex")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n
        FROM orders_ex o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-07-01'
          AND EXISTS (
            SELECT 1 FROM lineitem_ex l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
        """
    )


@query(
    "q_having_in",
    oracle="""
    SELECT c_name, o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 260
    )
    GROUP BY c_name, o_orderkey, o_orderdate
    """,
    doc=(
        "TPC-H Q18 shape (large-quantity orders): HAVING-filtered aggregate "
        "as an IN-subquery. DataFrame route: aggregate lineitem once, filter "
        "(the HAVING), then LEFT SEMI join orders against the ~1% survivor "
        "set — the expensive customer join only ever sees surviving orders."
    ),
)
def q_having_in(spark: SparkSession, sf_dir: str):
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("tq"))
        .filter(F.col("tq") > 260)
        .select("l_orderkey")
    )
    surviving = orders.join(
        big, orders.o_orderkey == big.l_orderkey, "left_semi"
    )
    return (
        li.join(surviving, li.l_orderkey == surviving.o_orderkey)
        .join(F.broadcast(cust), surviving.o_custkey == cust.c_custkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
    )


@query(
    "q_window_range_frame",
    oracle="""
    SELECT event_id, user_id,
           count(*) OVER w AS n_events_1h,
           round(sum(value) OVER w, 2) AS sum_value_1h
    FROM events
    WINDOW w AS (
      PARTITION BY user_id
      ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
    )
    """,
    doc=(
        "Time-based RANGE window frame: per-user rolling 1-hour count/sum "
        "without a self-join — one shuffle on user_id, one sort, a sliding "
        "frame over epoch seconds. The self-join formulation of the same "
        "query is O(rows x window_rows); this is O(rows log rows) and the "
        "frame state is bounded by the hour, independent of history length."
    ),
)
def q_window_range_frame(spark: SparkSession, sf_dir: str):
    events = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(ts_seconds("ts"))
        .rangeBetween(-3600, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_events_1h"),
        F.round(F.sum("value").over(w), 2).alias("sum_value_1h"),
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, amount
    FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_tax
          FROM lineitem)
    UNPIVOT (amount FOR measure IN (l_quantity, l_extendedprice, l_tax))
    """,
    doc=(
        "Unpivot (long layout): wide measure columns to (measure, amount) "
        "rows. Spark's Expand node emits 3 rows per input row in a single "
        "narrow pass — no shuffle, no UDF; values pass through bit-exact."
    ),
)
def q_unpivot(spark: SparkSession, sf_dir: str):
    li = read_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_tax"
    ).unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_tax"],
        "measure",
        "amount",
    )


@query(
    "q_not_exists",
    oracle="""
    SELECT o_orderpriority, count(*) AS n
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-07-01'
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    """,
    doc=(
        "TPC-H Q21 shape: correlated NOT EXISTS with an inequality on the "
        "correlated row. Catalyst rewrites to a LEFT ANTI join — unlike "
        "q_join_anti's bare key anti-join, the extra correlated predicate "
        "rides along as the join condition, still one pass per table."
    ),
)
def q_not_exists(spark: SparkSession, sf_dir: str):
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_ne")
    read_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_ne")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n
        FROM orders_ne o
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1997-07-01'
          AND NOT EXISTS (
            SELECT 1 FROM lineitem_ne l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
          )
        GROUP BY o_orderpriority
        """
    )


@query(
    "q_scd2_intervals",
    oracle="""
    SELECT event_id, user_id,
           CAST(ts AS TIMESTAMP) AS valid_from,
           CAST(lead(ts) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
           ) AS TIMESTAMP) AS valid_to
    FROM events
    """,
    doc=(
        "SCD2 validity intervals: each event's state is valid from its "
        "timestamp until the user's next event (NULL = still current). One "
        "lead() pass — shuffle on user_id, sort by (ts, event_id) — turns "
        "an append-only event log into a point-in-time-queryable dimension; "
        "the self-join formulation this replaces is quadratic per key."
    ),
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str):
    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )


@query(
    "q_dq_profile",
    oracle="""
    SELECT count(*) AS n_rows,
           count(*) FILTER (l_quantity IS NULL) AS l_quantity_nulls,
           count(DISTINCT l_quantity) AS l_quantity_distinct,
           min(l_quantity) AS l_quantity_min,
           max(l_quantity) AS l_quantity_max,
           count(*) FILTER (l_discount IS NULL) AS l_discount_nulls,
           count(DISTINCT l_discount) AS l_discount_distinct,
           min(l_discount) AS l_discount_min,
           max(l_discount) AS l_discount_max
    FROM lineitem
    """,
    doc=(
        "Data-quality profile gate (operators/quality.py): per-column "
        "nulls / exact distincts / min / max in ONE aggregation pass — the "
        "batch generalization of the reference monitor DAG's freshness "
        "check. min/max/count are plain declarative aggs; the distincts "
        "expand-and-dedup; at 100 TB swap in approx_count_distinct."
    ),
)
def q_dq_profile(spark: SparkSession, sf_dir: str):
    from ..operators.quality import numeric_profile

    li = read_table(spark, sf_dir, "lineitem")
    return numeric_profile(li, ["l_quantity", "l_discount"])


@query(
    "q_dq_orphans",
    oracle="""
    SELECT fk, orphans FROM (
      SELECT 'orders->customer' AS fk, count(*) AS orphans FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      UNION ALL
      SELECT 'lineitem->orders', count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      UNION ALL
      SELECT 'lineitem->part', count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
      UNION ALL
      SELECT 'lineitem->supplier', count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
      UNION ALL
      SELECT 'customer->nation', count(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
    )
    """,
    doc=(
        "Referential-integrity orphan audit: one row per foreign-key "
        "relationship with the count of child rows whose parent key is "
        "missing — the cross-table half of data quality (q_dq_profile is "
        "the single-table half), and the check that catches a partial "
        "upstream load before it poisons every downstream join. Each "
        "branch is a LEFT ANTI join (parent side broadcast for dims, "
        "shuffled for fact-sized parents — Spark picks by stats) feeding "
        "a partial+final count; the five one-row results union narrow. "
        "All-zero on the TPC-H-shaped fixtures by construction — the "
        "non-zero case is the alarm."
    ),
)
def q_dq_orphans(spark: SparkSession, sf_dir: str):
    t = {
        name: read_table(spark, sf_dir, name)
        for name in ("orders", "customer", "lineitem", "part", "supplier", "nation")
    }

    def orphans(label, child, key, parent, pkey):
        return (
            t[child]
            .select(F.col(key))
            .join(t[parent].select(F.col(pkey).alias(key)), key, "left_anti")
            .agg(F.count(F.lit(1)).alias("orphans"))
            .select(F.lit(label).alias("fk"), "orphans")
        )

    checks = [
        orphans("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        orphans("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        orphans("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
        orphans("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        orphans("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


@query(
    "q_math_funcs",
    oracle="""
    SELECT event_id,
           round(ln(value + 1), 6)             AS ln_v,
           round(log10(value + 1), 6)          AS log10_v,
           round(exp(value / 500), 6)          AS exp_v,
           round(sqrt(value), 6)               AS sqrt_v,
           round(pow(value, 2), 4)             AS pow_v,
           CAST(floor(value) AS BIGINT)        AS floor_v,
           CAST(ceil(value) AS BIGINT)         AS ceil_v,
           CAST(sign(value - 100) AS DOUBLE)   AS sign_v,
           round(abs(value - 100), 4)          AS abs_v,
           round(sin(value / 100), 6)          AS sin_v,
           round(atan2(value, 100), 6)         AS atan2_v,
           greatest(value, 100.0)              AS greatest_v,
           least(value, 100.0)                 AS least_v
    FROM events
    """,
    doc=(
        "Math-function parity sweep: ln/log10/exp/sqrt/pow/floor/ceil/sign/"
        "abs/sin/atan2/greatest/least agree with the oracle bit-for-bit "
        "after ROUND (both engines call IEEE-754 libm). All JVM-codegen "
        "scalar expressions — one narrow pass, no shuffle. Type parity "
        "pinned where dialects differ: Spark floor/ceil return LONG, "
        "DuckDB DOUBLE (cast), Spark signum DOUBLE."
    ),
)
def q_math_funcs(spark: SparkSession, sf_dir: str):
    e = read_table(spark, sf_dir, "events")
    v = F.col("value")
    return e.select(
        "event_id",
        F.round(F.log(v + 1), 6).alias("ln_v"),
        F.round(F.log10(v + 1), 6).alias("log10_v"),
        F.round(F.exp(v / 500), 6).alias("exp_v"),
        F.round(F.sqrt(v), 6).alias("sqrt_v"),
        F.round(F.pow(v, 2), 4).alias("pow_v"),
        F.floor(v).alias("floor_v"),
        F.ceil(v).alias("ceil_v"),
        F.signum(v - 100).alias("sign_v"),
        F.round(F.abs(v - 100), 4).alias("abs_v"),
        F.round(F.sin(v / 100), 6).alias("sin_v"),
        F.round(F.atan2(v, F.lit(100.0)), 6).alias("atan2_v"),
        F.greatest(v, F.lit(100.0)).alias("greatest_v"),
        F.least(v, F.lit(100.0)).alias("least_v"),
    )


@query(
    "q_regression",
    oracle="""
    SELECT event_type,
           CAST(regr_count(value, (epoch(ts) - 1704067200) / 86400) AS BIGINT)
             AS n,
           round(regr_slope(value, (epoch(ts) - 1704067200) / 86400), 6)
             AS slope_per_day,
           round(regr_intercept(value, (epoch(ts) - 1704067200) / 86400), 4)
             AS intercept,
           round(regr_r2(value, (epoch(ts) - 1704067200) / 86400), 6)
             AS r2
    FROM events
    GROUP BY event_type
    """,
    doc=(
        "Per-key linear trend via regression aggregates (regr_slope/"
        "intercept/r2): the price-drift estimator, computed as declarative "
        "moment aggregates — one partial+final HashAggregate, no iteration, "
        "no ML library. The regressor is centered to days-since-epoch-start "
        "BEFORE aggregation: regressing on raw epoch seconds squares "
        "~1.7e9 into the moment sums and eats all double precision."
    ),
)
def q_regression(spark: SparkSession, sf_dir: str):
    e = read_table(spark, sf_dir, "events")
    x = (ts_seconds_d("ts") - F.lit(1704067200.0)) / 86400
    v = F.col("value")
    return e.groupBy("event_type").agg(
        F.regr_count(v, x).alias("n"),
        F.round(F.regr_slope(v, x), 6).alias("slope_per_day"),
        F.round(F.regr_intercept(v, x), 4).alias("intercept"),
        F.round(F.regr_r2(v, x), 6).alias("r2"),
    )


@query(
    "q_anomaly_zscore",
    oracle="""
    SELECT event_id, event_type, z
    FROM (
      SELECT event_id, event_type,
             round((value - avg(value) OVER (PARTITION BY event_type))
                   / stddev_samp(value) OVER (PARTITION BY event_type),
                   6) AS z
      FROM events
    )
    ORDER BY abs(z) DESC, event_id
    LIMIT 20
    """,
    doc=(
        "Z-score anomaly top-k: per-key mean/stddev as window aggregates "
        "(one shuffle on the key, NO stats-table self-join), then global "
        "top-20 by |z| via TakeOrderedAndProject. z is rounded before "
        "ranking so the cross-engine order is stable; event_id breaks ties "
        "deterministically. The monitoring query that catches bad feeds "
        "(fat-finger prints, unit mix-ups) before they hit training data."
    ),
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str):
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    z = F.round(
        (F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w), 6
    )
    return (
        e.select("event_id", "event_type", z.alias("z"))
        .orderBy(F.abs(F.col("z")).desc(), "event_id")
        .limit(20)
    )


@query(
    "q_approx_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_disc(l_extendedprice, 0.5)  AS p50,
           quantile_disc(l_extendedprice, 0.9)  AS p90,
           quantile_disc(l_extendedprice, 0.99) AS p99
    FROM lineitem GROUP BY l_returnflag
    """,
    doc=(
        "Approximate percentiles (Greenwald-Khanna sketch): p50/p90/p99 of "
        "price per return flag. The sketches merge associatively — "
        "partial+final aggregate, one tiny shuffle — where EXACT "
        "percentiles (q_percentiles) need a sort per group; at 100 TB the "
        "sketch is the only affordable form, and accuracy is the knob "
        "trading sketch memory for rank error (epsilon ~ 1/accuracy). "
        "PARITY MODE here derives accuracy from the table's parquet-footer "
        "row count (accuracy > n, floor 1e7) so epsilon*n < 1 at ANY "
        "fixture scale — the sketch then returns EXACT discrete order "
        "statistics and the query value-hash-matches DuckDB's "
        "quantile_disc (verified to agree with Spark's rank convention at "
        "all groups/percentiles/SFs), instead of silently re-entering the "
        "approximate regime (and failing the hash oracle) the moment a "
        "fixture outgrows a pinned constant. The deliberate cost of "
        "exactness: with epsilon*n < 1 the GK buffer effectively retains "
        "all values per group, O(n) memory — this configuration measures "
        "parity, not sketch economics. A production 100 TB run dials "
        "accuracy back to ~1e4 and keeps the identical merge machinery "
        "with bounded error (tolerance-tested in tests/test_scale_ops.py)."
    ),
)
def q_approx_percentile(spark: SparkSession, sf_dir: str):
    li = read_table(spark, sf_dir, "lineitem")
    # accuracy > n keeps the sketch exact at any SF; footer read only, no
    # job. None (unknown layout) falls back to the 1e7 floor — exact
    # through ~sf1.6, and beyond that the doc's caveat applies.
    n_rows = parquet_row_count(sf_dir, "lineitem") or 0
    # ApproximatePercentile validates accuracy in [1, Int.MaxValue]; past
    # ~1.07e9 rows (sf ~190) clamp and degrade to the documented
    # approximate regime instead of failing analysis.
    accuracy = min(max(10_000_000, 2 * n_rows), 2_147_483_647)
    pct = F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], accuracy)
    return li.groupBy("l_returnflag").agg(
        pct[0].alias("p50"), pct[1].alias("p90"), pct[2].alias("p99")
    )


@query(
    "q_histogram",
    oracle="""
    SELECT CAST(CASE WHEN value < 0.0 THEN 0
                     WHEN value >= 500.0 THEN 21
                     ELSE floor(value / 25.0) + 1 END AS BIGINT) AS bucket,
           count(*) AS n,
           round(min(value), 4) AS lo,
           round(max(value), 4) AS hi
    FROM events
    GROUP BY 1
    """,
    doc=(
        "Value histogram via width_bucket (20 equal bins over [0, 500); "
        "DuckDB has no width_bucket, so the oracle spells out the same "
        "under/overflow-bucket arithmetic): "
        "binning is a pure codegen'd expression, so the histogram is one "
        "partial+final aggregate — the distribution-profiling pass at any "
        "scale. Bin edges are declared literals: data-dependent edges "
        "(equi-depth) would need a percentile pre-pass."
    ),
)
def q_histogram(spark: SparkSession, sf_dir: str):
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.width_bucket("value", F.lit(0.0), F.lit(500.0), F.lit(20)).alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
        )
    )


@query(
    "q_cumsum",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_value,
           count(*) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS n_so_far
    FROM events
    """,
    doc=(
        "Per-key cumulative sum/count (running balance): growing-frame "
        "window — one shuffle on the key, one sort, O(1) state per row "
        "(Spark plans UNBOUNDED PRECEDING..CURRENT ROW as a running "
        "accumulator, not a re-scan per row). Ordered by (ts, event_id) so "
        "the prefix — and therefore every emitted row — is deterministic."
    ),
)
def q_cumsum(spark: SparkSession, sf_dir: str):
    e = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
        F.count(F.lit(1)).over(w).alias("n_so_far"),
    )


@query(
    "q_new_vs_returning",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('day', min(ts)) AS first_day
      FROM events GROUP BY user_id
    ), daily AS (
      SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
    )
    SELECT CAST(d.day AS TIMESTAMP) AS day,
           count(*) AS active_users,
           CAST(count(*) FILTER (f.first_day = d.day) AS BIGINT) AS new_users,
           CAST(count(*) FILTER (f.first_day < d.day) AS BIGINT) AS returning_users
    FROM daily d JOIN firsts f USING (user_id)
    GROUP BY d.day
    """,
    doc=(
        "Daily active users split new vs returning: dedup to (day, user) "
        "first (the DISTINCT collapses event volume to at most "
        "days x users rows), then a broadcast join against the per-user "
        "first-day table — the growth dashboard query, shaped so the "
        "event-volume table is touched exactly twice and never self-joined."
    ),
)
def q_new_vs_returning(spark: SparkSession, sf_dir: str):
    e = read_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("first_day")
    )
    daily = e.select(F.date_trunc("day", "ts").alias("day"), "user_id").distinct()
    return (
        daily.join(F.broadcast(firsts), "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("active_users"),
            F.count(F.when(F.col("first_day") == F.col("day"), 1)).alias("new_users"),
            F.count(F.when(F.col("first_day") < F.col("day"), 1)).alias(
                "returning_users"
            ),
        )
    )


@query(
    "q_disjunctive_filter",
    oracle="""
    SELECT count(*)                                          AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1  AND 15 AND l_quantity BETWEEN 1  AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 30)
    """,
    doc=(
        "TPC-H Q19-shaped disjunctive predicate: an OR of brand/size/"
        "quantity conjunctions across both join sides. The planner must "
        "split the disjunction — per-side implied predicates (l_quantity "
        "BETWEEN 1 AND 30, p_size BETWEEN 1 AND 50, brand IN set) push to "
        "the scans, the cross-side residual rides the join — instead of "
        "evaluating the whole OR post-join. Part side broadcasts."
    ),
)
def q_disjunctive_filter(spark: SparkSession, sf_dir: str):
    li = read_table(spark, sf_dir, "lineitem")
    part = F.broadcast(read_table(spark, sf_dir, "part"))
    qty, size, brand = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    disj = (
        ((brand == "Brand#1") & size.between(1, 15) & qty.between(1, 11))
        | ((brand == "Brand#2") & size.between(10, 30) & qty.between(10, 20))
        | ((brand == "Brand#3") & size.between(20, 50) & qty.between(20, 30))
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(disj)
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(REVENUE()), 2).alias("revenue"),
        )
    )


@query(
    "q_idle_customers",
    oracle="""
    WITH cutoff AS (
      SELECT avg(c_acctbal) AS m FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey,
           count(*)                   AS n_cust,
           round(sum(c_acctbal), 2)   AS total_bal
    FROM customer, cutoff
    WHERE c_acctbal > cutoff.m
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_totalprice > 400000
      )
    GROUP BY c_nationkey
    """,
    doc=(
        "TPC-H Q22-shaped: wealthy-but-idle customers — above-average "
        "account balance (uncorrelated scalar subquery -> one-row "
        "broadcast) with no high-value order (anti join with the price "
        "predicate pushed into the orders scan, shrinking the build side "
        "before the join). Per-nation count + balance rollup."
    ),
)
def q_idle_customers(spark: SparkSession, sf_dir: str):
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    cutoff = cust.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("m"))
    big_orders = orders.filter(F.col("o_totalprice") > 400000).select("o_custkey")
    return (
        cust.join(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("m"))
        .join(big_orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@query(
    "q_sessionize_islands",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_no
      FROM ordered
    )
    SELECT user_id,
           CAST(session_no AS BIGINT) AS session_no,
           count(*)                   AS n_events,
           min(ts)                    AS session_start,
           max(ts)                    AS session_end
    FROM sess GROUP BY user_id, session_no
    """,
    doc=(
        "Gaps-and-islands sessionization: a new session starts after a "
        ">30 min silence; the island number is a running sum over the "
        "boundary flags. One shuffle on user_id feeds BOTH window passes "
        "(lag + running sum share the partition/order spec, one Window "
        "node) and the session rollup — the explicit-session-id twin of "
        "q_session_window, for when downstream needs a stable join key "
        "per session. Ties broken by event_id so ordering is reproducible."
    ),
)
def q_sessionize_islands(spark: SparkSession, sf_dir: str):
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    gap_us = ts_micros("ts") - ts_micros(prev)
    new_sess = F.when(prev.isNull() | (gap_us > 1800 * 1_000_000), 1).otherwise(0)
    sess_no = F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        e.select("user_id", "ts", "event_id")
        .withColumn("session_no", sess_no)
        .groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


@query(
    "q_event_paths",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type || ' > ' || e2 || ' > ' || e3 AS path,
           count(*) AS n
    FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY path
    ORDER BY n DESC, path
    LIMIT 10
    """,
    doc=(
        "Top-10 three-step behavioral paths: per-user event sequences via "
        "two lead() offsets in ONE window pass (a self-join-per-step "
        "formulation would shuffle the event table three times), then a "
        "partial+final count and TakeOrderedAndProject top-k. The "
        "path-mining primitive behind funnels/Markov transition models."
    ),
)
def q_event_paths(spark: SparkSession, sf_dir: str):
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
        .select(
            F.concat_ws(" > ", "event_type", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(10)
    )


@query(
    "q_rolling_dau",
    oracle="""
    WITH du AS (
      SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
    ), grid AS (
      SELECT DISTINCT day FROM du
    )
    SELECT CAST(g.day AS TIMESTAMP)   AS day,
           count(DISTINCT du.user_id) AS dau_7d
    FROM grid g JOIN du
      ON du.day BETWEEN g.day - INTERVAL 6 DAY AND g.day
    GROUP BY g.day
    """,
    doc=(
        "Trailing 7-day distinct active users per day: window COUNT "
        "DISTINCT doesn't exist, so the right shape is dedup-first "
        "(events collapse to at most days x users rows BEFORE any join), "
        "then a range join against the tiny broadcast day grid and one "
        "distinct-agg. The event table is touched once; the expensive "
        "side of the range join is already deduplicated."
    ),
)
def q_rolling_dau(spark: SparkSession, sf_dir: str):
    e = read_table(spark, sf_dir, "events")
    du = e.select(F.date_trunc("day", "ts").alias("day"), "user_id").distinct()
    grid = F.broadcast(du.select(F.col("day").alias("gday")).distinct())
    return (
        du.join(
            grid,
            F.col("day").between(
                F.col("gday") - F.expr("INTERVAL 6 DAYS"), F.col("gday")
            ),
        )
        .groupBy(F.col("gday").alias("day"))
        .agg(F.countDistinct("user_id").alias("dau_7d"))
    )


@query(
    "q_winsorize",
    oracle="""
    WITH b AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS lo,
             quantile_cont(value, 0.95) AS hi
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           count(*) FILTER (e.value < b.lo)                          AS n_low,
           count(*) FILTER (e.value > b.hi)                          AS n_high,
           round(avg(least(greatest(e.value, b.lo), b.hi)), 6)       AS clipped_mean
    FROM events e JOIN b USING (event_type)
    GROUP BY e.event_type
    """,
    doc=(
        "Winsorization (clip to p05/p95 per key): the outlier-robust "
        "preprocessing step for training features. Bounds are one exact-"
        "percentile aggregate per key — a |keys|-row table, broadcast back "
        "onto the fact side — so the clip itself is a narrow map + one "
        "final aggregate; the fact table shuffles once."
    ),
)
def q_winsorize(spark: SparkSession, sf_dir: str):
    e = read_table(spark, sf_dir, "events")
    bounds = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("lo"),
        F.expr("percentile(value, 0.95)").alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        e.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.when(F.col("value") < F.col("lo"), 1)).alias("n_low"),
            F.count(F.when(F.col("value") > F.col("hi"), 1)).alias("n_high"),
            F.round(F.avg(clipped), 6).alias("clipped_mean"),
        )
    )


@query(
    "q_equidepth",
    oracle="""
    SELECT o_orderpriority, decile,
           count(*)                    AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM (
      SELECT o_orderpriority, o_totalprice, o_orderkey,
             ntile(10) OVER (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders
    )
    GROUP BY o_orderpriority, decile
    """,
    doc=(
        "Equi-depth deciles per priority class (ntile + per-bin min/max/"
        "count): the histogram variant that adapts bin edges to the "
        "distribution — q_histogram's fixed-width complement. Partitioned "
        "ntile keeps every window keyed (no global sort / single-task "
        "Exchange); ties broken by o_orderkey for cross-engine determinism."
    ),
)
def q_equidepth(spark: SparkSession, sf_dir: str):
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        o.select("o_orderpriority", "o_totalprice", F.ntile(10).over(w).alias("decile"))
        .groupBy("o_orderpriority", "decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@query(
    "q_hll_union",
    oracle=None,  # Datasketches HLL internals are engine-specific; driver
    # records the rows-only check, accuracy bounded vs exact in pytest.
    doc=(
        "Mergeable HLL sketches (Apache DataSketches via hll_sketch_agg): "
        "one sketch per lang partition, then hll_union_agg collapses them "
        "into the GLOBAL distinct estimate without touching rows again — "
        "the pattern that makes distinct counts incremental at 100 TB "
        "(per-day/per-partition sketches persisted, any rollup = sketch "
        "union, never a re-scan). Exact countDistinct alongside for the "
        "accuracy comparison; pytest bounds relative error at lgK=14."
    ),
)
def q_hll_union(spark: SparkSession, sf_dir: str):
    docs = read_table(spark, sf_dir, "documents")
    per_lang = docs.groupBy("lang").agg(
        F.hll_sketch_agg(F.col("text"), F.lit(14)).alias("sk"),
        F.countDistinct("text").alias("exact_distinct"),
    )
    lang_rows = per_lang.select(
        "lang",
        "exact_distinct",
        F.hll_sketch_estimate("sk").alias("estimate"),
    )
    total = per_lang.agg(
        F.lit("__all__").alias("lang"),
        F.sum(F.lit(0)).alias("_z"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("estimate"),
    ).join(
        docs.agg(F.countDistinct("text").alias("exact_distinct"))
    ).select("lang", "exact_distinct", "estimate")
    return lang_rows.unionByName(total)


#: Portable-HLL geometry (q_hll_portable): p=8 -> m=256 buckets. The 60-bit
#: md5 prefix (same primitive as operators/dedup_hash.token_hash) splits as
#: bucket = h mod 256 and a 52-bit word w = h >> 8; rho(w) = leading zeros
#: within the 52-bit word + 1 = 53 - bit_length(w) (all-zero word -> 53).
#: The harmonic sum is kept EXACT by integer-scaling: sum(2^(53-M_j)) as a
#: long (max 256 * 2^53 < 2^62), so the only floating-point step is one
#: final division by the precomputed constant alpha_m * m^2 * 2^53 — same
#: decimal literal on both engine sides -> bit-identical IEEE estimate.
_HLL_M = 256
_HLL_C = 0.7213 / (1.0 + 1.079 / _HLL_M) * _HLL_M * _HLL_M * 2.0**53


def hll_bucket_rho(df, text_col: str, *keep_cols: str):
    """(bucket, rho) rows of the portable HLL for one string column —
    the algorithmic core of q_hll_portable, factored out so the
    hypothesis property suite can cross-check the md5-prefix/shiftright/
    bin-length arithmetic against a pure-Python replica on arbitrary
    unicode (tests/test_properties.py), independent of both DuckDB and
    the fixtures."""
    h60 = F.conv(
        F.substring(F.md5(F.col(text_col).cast("binary")), 1, 15), 16, 10
    ).cast("long")
    hashed = df.select(*keep_cols, h60.alias("h"))
    w = F.shiftright(F.col("h"), 8)
    return hashed.select(
        *keep_cols,
        (F.col("h") % _HLL_M).cast("int").alias("bkt"),
        F.when(w == 0, F.lit(53))
        .otherwise(F.lit(53) - F.length(F.bin(w)))
        .cast("int")
        .alias("rho"),
    )


@query(
    "q_hll_portable",
    oracle=f"""
    WITH h AS (
      SELECT lang, CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS h
      FROM documents
    ), r AS (
      SELECT lang, CAST(h % {_HLL_M} AS INTEGER) AS bkt,
             CAST(CASE WHEN h // {_HLL_M} = 0 THEN 53
                  ELSE 53 - length(bin(h // {_HLL_M})) END AS INTEGER) AS rho
      FROM h
    ), mx AS (
      SELECT lang, bkt, max(rho) AS mj FROM r GROUP BY 1, 2
    ), mrg AS (
      SELECT lang, bkt, mj FROM mx
      UNION ALL
      SELECT '__all__' AS lang, bkt, max(mj) AS mj FROM mx GROUP BY 2
    ), s AS (
      SELECT lang,
             CAST(sum(CAST(1 AS BIGINT) << (53 - mj)) AS BIGINT)
               + ({_HLL_M} - count(*)) * {2**53} AS s_total,
             CAST(count(*) AS BIGINT) AS nb
      FROM mrg GROUP BY 1
    ), ex AS (
      SELECT lang, count(DISTINCT text) AS exact_distinct FROM documents GROUP BY 1
      UNION ALL
      SELECT '__all__' AS lang, count(DISTINCT text) AS exact_distinct FROM documents
    )
    SELECT s.lang AS lang, ex.exact_distinct AS exact_distinct,
           floor(CASE WHEN {_HLL_C!r} / s_total <= {2.5 * _HLL_M!r} AND nb < {_HLL_M}
                      THEN {_HLL_M} * ln({_HLL_M} * 1.0 / ({_HLL_M} - nb))
                      ELSE {_HLL_C!r} / s_total END
                 * 10000.0 + 0.5) / 10000.0 AS est
    FROM s JOIN ex ON s.lang = ex.lang
    """,
    doc=(
        "Engine-portable HyperLogLog (md5-based, m=256): the oracle-checkable "
        "twin of q_hll_union. Spark's built-in DataSketches HLL is the "
        "production path but its sketch bytes are engine-specific (rows-only "
        "check); this variant pins the whole algorithm to shared primitives "
        "(md5 60-bit prefix, integer-exact harmonic sum, one IEEE division; "
        "small-range linear-counting branch below 2.5m with the identical "
        "ln() text on both sides), "
        "so the ESTIMATE ITSELF value-hash-matches DuckDB running the same "
        "arithmetic. Scale shape: rho is per-row codegen; the only shuffles "
        "carry (lang, bucket, max-rho) pairs — at most 256 longs per lang "
        "regardless of corpus size — and sketch MERGE is a bucket-wise max "
        "(the '__all__' row), the property that makes per-shard sketches "
        "rollup-able at 100 TB without rescanning rows. Exact countDistinct "
        "alongside for the accuracy comparison."
    ),
)
def q_hll_portable(spark: SparkSession, sf_dir: str):
    docs = read_table(spark, sf_dir, "documents")
    r = hll_bucket_rho(docs, "text", "lang")
    mx = r.groupBy("lang", "bkt").agg(F.max("rho").alias("mj"))
    merged = mx.unionByName(
        mx.groupBy("bkt")
        .agg(F.max("mj").alias("mj"))
        .select(F.lit("__all__").alias("lang"), "bkt", "mj")
    )
    s = merged.groupBy("lang").agg(
        (
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 53 - mj)"))
            + (F.lit(_HLL_M) - F.count(F.lit(1))) * F.lit(2**53)
        ).alias("s_total"),
        F.count(F.lit(1)).cast("bigint").alias("nb"),
    )
    ex = docs.groupBy("lang").agg(F.countDistinct("text").alias("exact_distinct"))
    ex = ex.unionByName(
        docs.agg(F.countDistinct("text").alias("exact_distinct")).select(
            F.lit("__all__").alias("lang"), "exact_distinct"
        )
    )
    raw = F.lit(_HLL_C) / F.col("s_total")
    # Small-range (linear-counting) correction, per the HLL paper: below
    # 2.5m the raw harmonic estimator floors at ~alpha*m, so switch to
    # m*ln(m/V) over the V empty buckets — same ln() formula textually on
    # the oracle side (libm ulp absorbed by the tie-proof round, the
    # q_unigram_lm precedent).
    est = F.when(
        (raw <= F.lit(2.5 * _HLL_M)) & (F.col("nb") < _HLL_M),
        F.lit(_HLL_M) * F.log(_HLL_M * 1.0 / (F.lit(_HLL_M) - F.col("nb"))),
    ).otherwise(raw)
    return s.join(F.broadcast(ex), "lang").select(
        "lang",
        "exact_distinct",
        (F.floor(est * 10000.0 + 0.5) / 10000.0).alias("est"),
    )


@query(
    "q_map_funcs",
    oracle="""
    WITH e AS (
      SELECT doc_id,
             list_transform(
               list_distinct(string_split(text, ' ')),
               t -> struct_pack(
                      k := t,
                      v := len(list_filter(string_split(text, ' '), x -> x = t)))
             ) AS entries
      FROM documents
    )
    SELECT doc_id,
           CAST(len(entries) AS INTEGER)                                  AS n_types,
           CAST(list_filter(entries, x -> x.k = 'the')[1].v AS INTEGER)   AS cnt_the,
           CAST(len(list_filter(entries, x -> x.v = 1)) AS INTEGER)       AS n_singletons,
           CAST(list_aggregate(list_transform(entries, x -> x.v), 'max') AS INTEGER)
                                                                          AS max_cnt
    FROM e
    """,
    doc=(
        "MapType surface parity: per-doc term-count map built row-locally "
        "(map_from_entries over distinct tokens), then map cardinality, "
        "key lookup (element_at, null-safe), map_filter (singleton terms), "
        "map_values + array_max — all codegen'd, zero shuffle. Maps are "
        "the third collection type (after array/struct) an engine must "
        "cover; the oracle mirrors the semantics over entry lists since "
        "DuckDB's map surface differs."
    ),
)
def q_map_funcs(spark: SparkSession, sf_dir: str):
    from ..operators.scale import fan_out

    # fan_out: the O(|tokens|^2) distinct-count transform per row dwarfs
    # the scan and the single-file fixture gives one input split (r10
    # serialization audit: a 1.2 s one-task stage).
    docs = fan_out(read_table(spark, sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    entries = F.transform(
        F.array_distinct(toks),
        lambda t: F.struct(
            t.alias("k"),
            F.size(F.filter(toks, lambda x: x == t)).alias("v"),
        ),
    )
    m = F.map_from_entries(entries)
    return docs.select(
        "doc_id",
        F.size(m).alias("n_types"),
        F.element_at(m, "the").alias("cnt_the"),
        F.size(F.map_filter(m, lambda k, v: v == 1)).alias("n_singletons"),
        F.array_max(F.map_values(m)).alias("max_cnt"),
    )


@query(
    "q_variant_json",
    oracle="""
    SELECT event_id,
           json_extract(props, '$.k')::INTEGER  AS k_val,
           json_extract(props, '$.nope') IS NULL AS missing_is_null
    FROM events
    """,
    doc=(
        "VARIANT semi-structured path (Spark 4): parse_json once into a "
        "binary variant, then typed variant_get extraction — the "
        "schema-on-read shape for heterogeneous props at scale (parse "
        "cost paid once per row, every extraction reads the variant's "
        "internal dictionary instead of re-parsing text, and missing "
        "paths are NULL via try_variant_get, not errors)."
    ),
)
def q_variant_json(spark: SparkSession, sf_dir: str):
    e = read_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_val"),
        F.try_variant_get(v, "$.nope", "int").isNull().alias("missing_is_null"),
    )


@query(
    "q_mode_per_group",
    oracle="""
    SELECT event_type, top_value AS mode_value, n AS mode_count
    FROM (
      SELECT event_type, value AS top_value, count(*) AS n,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY count(*) DESC, value) AS rk
      FROM events GROUP BY event_type, value
    ) WHERE rk = 1
    """,
    doc=(
        "Deterministic per-group mode: count per (group, value), rank by "
        "(count desc, value) — two partial+final aggregates, the second "
        "over the already-collapsed (group, value) table, so nothing "
        "wider than the distinct-value set ever shuffles. Built-in "
        "mode() is tie-nondeterministic across engines; the explicit "
        "tie-break makes the answer reproducible."
    ),
)
def q_mode_per_group(spark: SparkSession, sf_dir: str):
    e = read_table(spark, sf_dir, "events")
    counts = e.groupBy("event_type", "value").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy(F.col("n").desc(), F.col("value"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("event_type", F.col("value").alias("mode_value"), F.col("n").alias("mode_count"))
    )


@query(
    "q_asof_nearest",
    oracle="""
    WITH anchors AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), cand AS (
      SELECT a.event_id, a.user_id, e.event_id AS near_id,
             abs(epoch_us(e.ts) - epoch_us(a.ts)) AS gap_us,
             row_number() OVER (
               PARTITION BY a.event_id
               ORDER BY abs(epoch_us(e.ts) - epoch_us(a.ts)), e.event_id
             ) AS rk
      FROM anchors a JOIN events e
        ON e.user_id = a.user_id
       AND e.event_id <> a.event_id
       AND e.ts BETWEEN a.ts - INTERVAL 5 MINUTE AND a.ts + INTERVAL 5 MINUTE
    )
    SELECT event_id, user_id, near_id, CAST(gap_us AS BIGINT) AS gap_us
    FROM cand WHERE rk = 1
    """,
    doc=(
        "Nearest-in-time join (BOTH directions): for each purchase, the "
        "closest same-user event within ±5 minutes — the bidirectional "
        "complement of the backward-only as-of join (operators/joins.py). "
        "The time tolerance makes the join a bounded range join (each "
        "anchor meets O(rate x window) candidates, never the user's full "
        "history); rank on (|gap|, event_id) is engine-reproducible."
    ),
)
def q_asof_nearest(spark: SparkSession, sf_dir: str):
    e = read_table(spark, sf_dir, "events")
    anchors = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("a_id"),
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("a_ts"),
    )
    cand = anchors.join(
        e,
        (F.col("user_id") == F.col("a_user"))
        & (F.col("event_id") != F.col("a_id"))
        & F.col("ts").between(
            F.col("a_ts") - F.expr("INTERVAL 5 MINUTES"),
            F.col("a_ts") + F.expr("INTERVAL 5 MINUTES"),
        ),
    )
    gap = F.abs(ts_micros("ts") - ts_micros("a_ts"))
    w = Window.partitionBy("a_id").orderBy(gap.asc(), F.col("event_id").asc())
    return (
        cand.withColumn("gap_us", gap)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("a_id").alias("event_id"),
            F.col("a_user").alias("user_id"),
            F.col("event_id").alias("near_id"),
            "gap_us",
        )
    )


@query(
    "q_cdc_apply",
    oracle="""
    WITH log AS (
      SELECT o_custkey AS key, o_orderdate AS ts, o_orderkey AS seq,
             CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op,
             o_totalprice AS val
      FROM orders
    ), ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY key ORDER BY ts DESC, seq DESC) AS rk,
             count(*)     OVER (PARTITION BY key) AS n_changes
      FROM log
    )
    SELECT key AS custkey,
           round(val, 2)           AS last_price,
           CAST(ts AS TIMESTAMP)   AS last_ts,
           CAST(n_changes AS BIGINT) AS n_changes
    FROM ranked WHERE rk = 1 AND op <> 'D'
    """,
    doc=(
        "Change-data-capture apply: collapse an insert/update/delete "
        "event log (orders as the log: key=o_custkey, ts=o_orderdate, "
        "seq=o_orderkey tiebreak, status 'F' = tombstone) into final "
        "table state — latest change wins, keys whose latest change is a "
        "delete vanish. The delete-tombstone half is what "
        "q_upsert_last_wins (reference ON CONFLICT upsert, "
        "processor.py:154-161) cannot express. One shuffle on key serves "
        "both the rank and the change count; at 100 TB the log is "
        "date-partitioned and the apply reads only new partitions."
    ),
)
def q_cdc_apply(spark: SparkSession, sf_dir: str):
    o = read_table(spark, sf_dir, "orders")
    log = o.select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderstatus") == "F", F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.col("o_totalprice").alias("val"),
    )
    wk = Window.partitionBy("key")
    ranked = log.select(
        "*",
        F.row_number().over(wk.orderBy(F.col("ts").desc(), F.col("seq").desc())).alias("rk"),
        F.count(F.lit(1)).over(wk).alias("n_changes"),
    )
    return ranked.filter((F.col("rk") == 1) & (F.col("op") != "D")).select(
        F.col("key").alias("custkey"),
        F.round("val", 2).alias("last_price"),
        F.col("ts").alias("last_ts"),
        F.col("n_changes").cast("bigint").alias("n_changes"),
    )


from ..operators.scale import zorder_key_sql as _zorder_key_sql  # noqa: E402


@query(
    "q_zorder_layout",
    oracle=f"""
    WITH b AS (
      SELECT CAST(l_partkey % 256 AS BIGINT) AS px,
             CAST(l_suppkey % 256 AS BIGINT) AS sx
      FROM lineitem
    ), z AS (
      SELECT px, sx, ({_zorder_key_sql("px", "sx", bits=8)}) AS zval FROM b
    )
    SELECT CAST(zval >> 8 AS BIGINT) AS file_id,
           count(*)                  AS n,
           CAST(min(px) AS BIGINT) AS px_min, CAST(max(px) AS BIGINT) AS px_max,
           CAST(min(sx) AS BIGINT) AS sx_min, CAST(max(sx) AS BIGINT) AS sx_max
    FROM z GROUP BY 1
    """,
    doc=(
        "Z-order (Morton) layout audit: bucketize (l_partkey, l_suppkey) "
        "to 8 bits each, interleave into a Morton key "
        "(operators/scale.py::zorder_key — plain codegen'd bit math, the "
        "Delta/Iceberg OPTIMIZE ZORDER layout without an engine "
        "extension), then group rows into 256-key 'files' and report each "
        "file's min/max in BOTH dimensions. The output IS the file-skip "
        "evidence: tight per-file ranges on both columns mean a scan "
        "filtered on either one prunes most files at 100 TB, which a "
        "single-column sort cannot give. Key computation is narrow; the "
        "only shuffle is the audit's own groupBy."
    ),
)
def q_zorder_layout(spark: SparkSession, sf_dir: str):
    from ..operators.scale import zorder_key

    li = read_table(spark, sf_dir, "lineitem")
    b = li.select(
        (F.col("l_partkey") % 256).cast("bigint").alias("px"),
        (F.col("l_suppkey") % 256).cast("bigint").alias("sx"),
    )
    z = b.withColumn("zval", zorder_key(F.col("px"), F.col("sx"), bits=8))
    return (
        z.select(F.shiftright("zval", 8).cast("bigint").alias("file_id"), "px", "sx")
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("px").cast("bigint").alias("px_min"),
            F.max("px").cast("bigint").alias("px_max"),
            F.min("sx").cast("bigint").alias("sx_min"),
            F.max("sx").cast("bigint").alias("sx_max"),
        )
    )


#: Interval length AND grid pitch for the overlap join (microseconds).
#: Equal pitch => each probe interval spans <= 3 grid cells.
_IVL_US = 120_000_000


@query(
    "q_interval_join",
    oracle=f"""
    WITH a AS (
      SELECT event_id AS a_id, epoch_us(ts) AS a_s
      FROM events WHERE event_type = 'signup'
    ), b AS (
      SELECT event_id AS b_id, epoch_us(ts) AS b_s
      FROM events WHERE event_type = 'purchase'
    )
    SELECT a_id, b_id,
           CAST({_IVL_US} - abs(a_s - b_s) AS BIGINT) AS overlap_us
    FROM a JOIN b ON abs(a_s - b_s) < {_IVL_US}
    """,
    doc=(
        "Interval-overlap join with NO equality key: every "
        "(signup, purchase) pair whose 2-minute activity windows overlap, "
        "across all users. Naively this is a BroadcastNestedLoopJoin "
        "(O(n*m) — the one join shape Spark cannot hash natively); the "
        "engine grid-bucketizes time instead: the probe side explodes "
        "onto the <= 3 grid cells an overlapping partner's START can "
        "occupy, the build side keys on its own start cell, and the "
        "equi-join on cell + an exact |gap| < D residual filter does the "
        "rest. Each pair is examined exactly once (a start cell is "
        "unique), so no distinct pass. Work is O(n x 3 + true pairs) and "
        "shuffles hash-partition on the grid cell — time-uniform, "
        "skew-free. All integer microsecond math (ts_micros, `div`), "
        "exact on both engines."
    ),
)
def q_interval_join(spark: SparkSession, sf_dir: str):
    ev = read_table(spark, sf_dir, "events")
    d = _IVL_US
    a = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("a_id"), ts_micros("ts").alias("a_s")
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("b_id"), ts_micros("ts").alias("b_s")
    )
    # Cells where an overlapping b_s can start: b_s in (a_s - D, a_s + D).
    a_exp = a.withColumn(
        "cell",
        F.explode(
            F.sequence(
                F.expr(f"(a_s - {d} + 1) div {d}"), F.expr(f"(a_s + {d} - 1) div {d}")
            )
        ),
    )
    bk = b.withColumn("cell", F.expr(f"b_s div {d}"))
    gap = F.abs(F.col("a_s") - F.col("b_s"))
    return (
        a_exp.join(bk, "cell")
        .filter(gap < d)
        .select("a_id", "b_id", (F.lit(d) - gap).cast("bigint").alias("overlap_us"))
    )


#: PageRank fixed-point scale and iteration count. Integer quantization
#: (the q_kmeans_ivf trick): every intermediate is BIGINT, `div` truncates
#: identically in both engines, integer sums are order-independent — so an
#: ITERATIVE graph algorithm becomes fully hash-match oracle-checkable.
_PR_SCALE = 1_000_000
_PR_ITERS = 3


def _pagerank_oracle() -> str:
    base = 15 * _PR_SCALE // 100
    cte = f"""
    WITH edges0 AS (
      SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ), edges AS (
      SELECT src, dst FROM edges0 UNION ALL SELECT dst AS src, src AS dst FROM edges0
    ), deg AS (
      SELECT src AS node, count(*) AS d FROM edges GROUP BY 1
    ), pr0 AS (
      SELECT node, CAST({_PR_SCALE} AS BIGINT) AS pr FROM deg
    )"""
    for i in range(1, _PR_ITERS + 1):
        cte += f""", pr{i} AS (
      SELECT e.dst AS node,
             CAST({base} + (85 * sum(p.pr // d.d)) // 100 AS BIGINT) AS pr
      FROM edges e
      JOIN pr{i - 1} p ON e.src = p.node
      JOIN deg d      ON d.node = e.src
      GROUP BY e.dst
    )"""
    return cte + f"""
    SELECT node, pr FROM pr{_PR_ITERS}
    """


@query(
    "q_pagerank",
    oracle=_pagerank_oracle(),
    doc=(
        "Integer-quantized PageRank (3 unrolled iterations, damping 0.85, "
        "unnormalized per-node teleport) over the undirected "
        "customer-supplier trading graph (distinct (o_custkey, l_suppkey) "
        "pairs via orders x lineitem; node space disjoint by parity). The "
        "q_kmeans_ivf determinism trick applied to a GRAPH iteration: all "
        "state is BIGINT, contributions use truncating `div`, sums are "
        "integer — bit-identical across engines, so the DuckDB oracle "
        "(the same three iterations as generated CTEs) hash-matches an "
        "ITERATIVE algorithm exactly. Per iteration: one shuffle joining "
        "rank state to edges (state and degree co-partition on node) and "
        "one aggregate on dst — the Pregel message-passing shape in pure "
        "DataFrame ops; at 100 TB the edge list is bucketed on src so the "
        "per-iteration join is co-located, and iterations checkpoint to "
        "parquet to cut lineage."
    ),
)
def q_pagerank(spark: SparkSession, sf_dir: str):
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    edges0 = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = edges0.union(
        edges0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # Materialize the edge list and degrees once per invocation: every
    # Pregel iteration re-joins both, and without materialization Catalyst
    # re-derives the whole 5-table edge build per iteration (28 FileScans
    # in the 3-iteration plan, zero exchange reuse — measured; GraphX
    # caches edges before iterating for the same reason). localCheckpoint,
    # NOT persist(): persist registers the canonicalized plan in the
    # session CacheManager, so a SECOND invocation (bench run 2-3, the
    # scale probe's measured run) silently reads the first run's cache and
    # records a cache-hit time no other query gets. localCheckpoint blocks
    # are tied to this invocation's lineage — every run pays its own
    # materialization. At 100 TB use a reliable checkpoint dir or an
    # intermediate parquet instead (localCheckpoint dies with an executor).
    # r13 keyed-relayout note: scale.checkpoint_by_key(edges, "src") DID
    # remove the per-iteration edges-side Exchange+Sort (10 -> 7 of each,
    # plans/r13/q_pagerank_{before,after}.txt) — but the interleaved A/B
    # vs the pre-change tree measured the relayout's extra materialization
    # costlier than the three saved exchanges at driver scale (best-of-3
    # 2.09 -> 3.28 s; SCALE_AB_R13OPT.json), because the runtime joins are
    # AQE-broadcast here anyway. Reverted to the plain checkpoint; at
    # 100 TB the equivalent layout comes from bucketed STORAGE (write the
    # edge list bucketed on src once), not an in-job relayout.
    edges = edges.localCheckpoint(eager=True)
    deg = edges.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    deg = deg.localCheckpoint(eager=True)
    state = deg.select("node", F.lit(_PR_SCALE).cast("bigint").alias("pr"), "d")
    base = 15 * _PR_SCALE // 100
    for _ in range(_PR_ITERS):
        contrib = edges.join(
            state.withColumnRenamed("node", "src"), "src"
        ).select("dst", F.expr("pr div d").alias("c"))
        ranks = (
            contrib.groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("s"))
            .select(
                "node",
                (F.lit(base) + F.expr("(85 * s) div 100")).cast("bigint").alias("pr"),
            )
        )
        state = ranks.join(deg, "node").select("node", "pr", "d")
    return state.select("node", "pr")


#: Triangle-count graph sparsifier: only lineitems above this quantity
#: contribute co-supplier edges, keeping the fixture graph's average degree
#: realistic (dozens) instead of near-complete.
_TRI_MIN_QTY = 40


@query(
    "q_triangle_count",
    oracle=f"""
    WITH pe AS (
      SELECT DISTINCT l1.l_suppkey AS a, l2.l_suppkey AS b
      FROM lineitem l1 JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
      WHERE l1.l_quantity > {_TRI_MIN_QTY} AND l2.l_quantity > {_TRI_MIN_QTY}
        AND l1.l_suppkey < l2.l_suppkey
    ), deg AS (
      SELECT v, CAST(count(*) AS BIGINT) AS d
      FROM (SELECT a AS v FROM pe UNION ALL SELECT b AS v FROM pe)
      GROUP BY v
    ), o AS (
      SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND pe.a < pe.b)
                  THEN pe.a ELSE pe.b END AS u,
             CASE WHEN da.d < db.d OR (da.d = db.d AND pe.a < pe.b)
                  THEN pe.b ELSE pe.a END AS v
      FROM pe JOIN deg da ON pe.a = da.v JOIN deg db ON pe.b = db.v
    ), w AS (
      SELECT least(o1.v, o2.v) AS x, greatest(o1.v, o2.v) AS y
      FROM o o1 JOIN o o2 ON o1.u = o2.u AND o1.v < o2.v
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM pe) AS n_edges,
           (SELECT CAST(count(*) AS BIGINT) FROM w)  AS n_wedges,
           (SELECT CAST(count(*) AS BIGINT)
            FROM w JOIN pe ON pe.a = w.x AND pe.b = w.y) AS n_triangles
    """,
    doc=(
        "Distributed triangle counting with DEGREE-ORDERED edge orientation "
        "(Schank-Wagner / Suri-Vassilvitskii 'MapReduce triangles'): edges "
        "are co-supplier pairs within an order (bounded expansion — an order "
        "has at most 7 lineitems, so the per-order pair blow-up is <= C(7,2) "
        "regardless of corpus size). Each undirected edge is oriented from "
        "its lower-DEGREE endpoint (id tie-break), which bounds wedge "
        "generation at O(m^1.5) total and caps every node's out-degree at "
        "O(sqrt(m)) — the skew-proofing that makes the wedge self-join "
        "survive power-law graphs at 100 TB, where id-ordering would pile "
        "all wedges onto hub vertices. Closure check is one equi-join of "
        "wedges against the canonical edge list. Emits edge/wedge/triangle "
        "counts as the scalar audit row."
    ),
)
def q_triangle_count(spark: SparkSession, sf_dir: str):
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") > _TRI_MIN_QTY
    )
    side = li.select("l_orderkey", "l_suppkey")
    pe = (
        side.alias("l1")
        .join(side.alias("l2"), "l_orderkey")
        .filter(F.col("l1.l_suppkey") < F.col("l2.l_suppkey"))
        .select(
            F.col("l1.l_suppkey").alias("a"), F.col("l2.l_suppkey").alias("b")
        )
        .distinct()
    )
    # Materialize the two bounded edge tables once (r13): pe feeds FIVE
    # subtrees (both degree sides, orientation, closure, the edge count)
    # and o feeds both wedge sides — fully lazy, the three joined scalar
    # aggregates each re-derived the whole chain (367-operator plan, 46
    # exchanges; plans/r13/q_triangle_count_before.txt). Both tables are
    # two-int rows bounded by C(7,2)·|orders| — the cheap checkpoint.
    pe = pe.localCheckpoint(eager=True)
    deg = (
        pe.select(F.col("a").alias("v"))
        .unionAll(pe.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    # No broadcast hint on the degree tables: deg is |V|-sized, and a
    # forced broadcast would OOM the driver exactly at the power-law /
    # 100 TB vertex cardinalities this orientation exists for. AQE picks
    # broadcast on its own while |V| is small and falls back to a shuffle
    # join (co-partitioned on the same key as the wedge join) when not.
    o = (
        pe.join(da, "a")
        .join(db, "b")
        .select(
            F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
    ).localCheckpoint(eager=True)
    o1 = o.select(F.col("u"), F.col("v").alias("v1"))
    o2 = o.select(F.col("u"), F.col("v").alias("v2"))
    w = (
        o1.join(o2, "u")
        .filter(F.col("v1") < F.col("v2"))
        .select(
            F.least("v1", "v2").alias("x"), F.greatest("v1", "v2").alias("y")
        )
    )
    # Wedge count + closure count in ONE pass over the wedge stream
    # (r13): pe is unique on (a, b), so the left join preserves wedge
    # cardinality exactly — count(*) is n_wedges and the hit-flag sum is
    # n_triangles, replacing two separate aggregates that each re-built
    # the O(m^1.5) wedge join.
    hit = w.join(
        pe.withColumn("hit", F.lit(1)),
        (pe.a == w.x) & (pe.b == w.y),
        "left",
    )
    counts = hit.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_wedges"),
        # Outer coalesce: SUM over ZERO wedge rows is NULL, and the
        # contract (and DuckDB's scalar COUNT subquery) says 0 — caught
        # by test_triangle_count_matches_bruteforce's single-edge graph.
        F.coalesce(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))), F.lit(0)
        ).cast("bigint").alias("n_triangles"),
    )
    return pe.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges")).join(counts)


#: Skyline price-bucket width: the bounded global pass runs over
#: price_range/width rows (~50 for TPC-H retail prices), never the table.
_SKY_BUCKET = 25.0


@query(
    "q_skyline",
    oracle="""
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice >= p.p_retailprice AND q.p_size >= p.p_size
        AND (q.p_retailprice > p.p_retailprice OR q.p_size > p.p_size)
    )
    """,
    doc=(
        "Skyline (Pareto frontier) over (p_retailprice, p_size), both "
        "maximized: parts no other part weakly dominates. The oracle is "
        "the O(n^2) NOT-EXISTS definition; the Spark plan is the "
        "scale-correct bucket-pruned form — bucket prices into fixed "
        "ranges, take per-bucket max size, run ONE bounded cumulative "
        "pass over the ~50 bucket rows (higher bucket => strictly higher "
        "price, so its max size dominates everything below it with "
        "size <= it), broadcast those thresholds back to prune, then "
        "finish the within-bucket frontier with windows PARTITIONED BY "
        "bucket. No global sort, no self-join: the only "
        "all-to-one exchange is the ~50-row bucket cumsum (the "
        "q_global_shuffle pattern), everything else is key-partitioned — "
        "at 100 TB the prune drops ~all rows before any per-bucket work."
    ),
)
def q_skyline(spark: SparkSession, sf_dir: str):
    part = read_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_retailprice",
        "p_size",
        F.floor(F.col("p_retailprice") / _SKY_BUCKET).cast("long").alias("bkt"),
    )
    # Per-bucket max size, then max over STRICTLY higher buckets (bounded
    # single-partition window over ~price_range/width rows).
    bmax = part.groupBy("bkt").agg(F.max("p_size").alias("bmax"))
    w_bkt = Window.orderBy(F.col("bkt").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    thresholds = bmax.select(
        "bkt", "bmax", F.max("bmax").over(w_bkt).alias("m_higher")
    )
    cand = part.join(F.broadcast(thresholds.drop("bmax")), "bkt").filter(
        F.col("m_higher").isNull() | (F.col("p_size") > F.col("m_higher"))
    )
    # Within-bucket frontier: per distinct price the max size, cumulative
    # max over strictly greater same-bucket prices — windows partitioned
    # by bucket, so no task ever sees more than a bucket.
    grp = cand.groupBy("bkt", "p_retailprice").agg(F.max("p_size").alias("msize"))
    w_in = (
        Window.partitionBy("bkt")
        .orderBy(F.col("p_retailprice").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    grp = grp.select(
        "bkt", "p_retailprice", "msize", F.max("msize").over(w_in).alias("m_in")
    )
    joined = cand.join(grp, ["bkt", "p_retailprice"])
    m1 = F.greatest(
        F.coalesce(F.col("m_in"), F.lit(-1)), F.coalesce(F.col("m_higher"), F.lit(-1))
    )
    return joined.filter(
        (m1 < F.col("p_size")) & (F.col("msize") == F.col("p_size"))
    ).select("p_partkey", "p_retailprice", "p_size")


@query(
    "q_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS from_state,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_state
      FROM events
    ), pairs AS (
      SELECT from_state, to_state, count(*) AS n
      FROM seq WHERE to_state IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT from_state, to_state,
           CAST(n AS BIGINT) AS n,
           round(n / sum(n) OVER (PARTITION BY from_state), 4) AS p
    FROM pairs
    """,
    doc=(
        "First-order Markov transition matrix of user event sequences: "
        "lead() per user gives consecutive (from, to) pairs, one "
        "aggregate counts them, and a window over from_state normalizes "
        "rows into transition probabilities — the behavioral-model "
        "summary funnels and paths (q_funnel, q_event_paths) are special "
        "cases of. One shuffle on user_id for the sequence pass, one on "
        "the pair key for the count; the normalizing window runs on the "
        "|states|^2-row aggregate, not the events. Deterministic (ts, "
        "event_id) ordering; probabilities rounded to 4."
    ),
)
def q_event_transitions(spark: SparkSession, sf_dir: str):
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("from_state"),
        F.lead("event_type").over(w).alias("to_state"),
    ).filter(F.col("to_state").isNotNull())
    pairs = seq.groupBy("from_state", "to_state").agg(F.count(F.lit(1)).alias("n"))
    wf = Window.partitionBy("from_state")
    return pairs.select(
        "from_state",
        "to_state",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n") / F.sum("n").over(wf), 4).alias("p"),
    )


@query(
    "q_scd2",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, event_type, ts,
             CASE WHEN lag(event_type) OVER w IS NULL
                    OR lag(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), isl AS (
      SELECT user_id, event_type, ts,
             sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM seq
    ), runs AS (
      SELECT user_id, island, min(event_type) AS event_type,
             min(ts) AS valid_from, count(*) AS n_events
      FROM isl GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(island AS INT) AS version,
           event_type,
           CAST(valid_from AS TIMESTAMP) AS valid_from,
           CAST(lead(valid_from) OVER (PARTITION BY user_id
                                       ORDER BY island) AS TIMESTAMP)
             AS valid_to,
           CAST(n_events AS BIGINT) AS n_events,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY island)
             IS NULL AS is_current
    FROM runs
    """,
    doc=(
        "Slowly-changing-dimension TYPE-2 build: each user's event_type "
        "stream collapses into validity intervals [valid_from, valid_to) "
        "via gaps-and-islands — lag() marks change points, a running sum "
        "numbers the islands, one aggregate per island takes the interval "
        "bounds, and lead() closes each version with the next one's start "
        "(open interval + is_current on the last). This is the warehouse "
        "history-keeping op q_cdc_apply (latest-state upsert) deliberately "
        "discards, and the run-collapsed completion of q_scd2_intervals "
        "(which keeps one interval PER EVENT, no change detection). ONE "
        "exchange end-to-end: the hash shuffle on user_id "
        "from the first window also satisfies the (user_id, island) "
        "aggregate (subset clustering) and both island-level windows, and "
        "those windows run on the run-count-sized table, not the events. "
        "Deterministic (ts, event_id) ordering; island ids double as "
        "version numbers."
    ),
)
def q_scd2(spark: SparkSession, sf_dir: str):
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("chg"),
    )
    isl = seq.select(
        "user_id",
        "event_type",
        "ts",
        F.sum("chg")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("island"),
    )
    runs = isl.groupBy("user_id", "island").agg(
        F.min("event_type").alias("event_type"),
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wv = Window.partitionBy("user_id").orderBy("island")
    return runs.select(
        "user_id",
        F.col("island").cast("int").alias("version"),
        "event_type",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
    )


#: IVM cutoff: history/delta split point for the merge demonstration
#: (fixture events span 2024-01-01..01-30; the last ~5 days are "new").
_IVM_CUTOFF = "2024-01-25"


@query(
    "q_ivm_merge",
    oracle=f"""
    WITH hist AS (
      SELECT user_id, count(*) AS n, sum(value) AS sv,
             min(ts) AS mn, max(ts) AS mx
      FROM events WHERE ts < TIMESTAMP '{_IVM_CUTOFF}'
      GROUP BY user_id
    ), delta AS (
      SELECT user_id, count(*) AS n, sum(value) AS sv,
             min(ts) AS mn, max(ts) AS mx
      FROM events WHERE ts >= TIMESTAMP '{_IVM_CUTOFF}'
      GROUP BY user_id
    ), merged AS (
      SELECT user_id, sum(n) AS n, sum(sv) AS sv, min(mn) AS mn, max(mx) AS mx
      FROM (SELECT * FROM hist UNION ALL SELECT * FROM delta)
      GROUP BY user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_events,
           round(sv, 4) AS sum_value,
           CAST(mn AS TIMESTAMP) AS first_ts, CAST(mx AS TIMESTAMP) AS last_ts
    FROM merged
    """,
    doc=(
        "Incremental-view maintenance by partial-aggregate merge: the "
        "per-user rollup is computed as agg(history) MERGED with "
        "agg(delta) — union the two partial states and re-aggregate with "
        "the measures' own merge functions (count/sum via sum, min via "
        "min, max via max). The oracle runs the same split-and-merge, "
        "and parity against it plus the suite's direct-aggregate "
        "equivalence test prove the algebra. At 100 TB this is THE "
        "pattern for maintained rollups: partial states persist per "
        "day-partition, a new day aggregates only its own data, and any "
        "reporting window merges stored states — history is never "
        "re-scanned (the batch twin of the streaming job's update-mode "
        "state merge). The delta side's ts-range predicate pushes to the "
        "scan, so the 'new data only' claim is a PushedFilters fact."
    ),
)
def q_ivm_merge(spark: SparkSession, sf_dir: str):
    from ..io import events_between

    def partial(df):
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sv"),
            F.min("ts").alias("mn"),
            F.max("ts").alias("mx"),
        )

    e = read_table(spark, sf_dir, "events")
    cutoff = F.lit(_IVM_CUTOFF).cast("timestamp")
    hist = partial(e.filter(F.col("ts") < cutoff))
    delta = partial(e.filter(F.col("ts") >= cutoff))
    merged = (
        hist.unionByName(delta)
        .groupBy("user_id")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sv").alias("sv"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
    )
    return merged.select(
        "user_id",
        F.col("n").cast("bigint").alias("n_events"),
        F.round("sv", 4).alias("sum_value"),
        F.col("mn").alias("first_ts"),
        F.col("mx").alias("last_ts"),
    )


@query(
    "q_benford",
    oracle="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS INTEGER) AS d
      FROM orders WHERE o_totalprice >= 1.0
    )
    SELECT d,
           CAST(count(*) AS BIGINT) AS n,
           floor(count(*) * 1.0 / sum(count(*)) OVER () * 1000000.0 + 0.5)
             / 1000000.0 AS freq,
           floor(ln(1.0 + 1.0 / d) / ln(10.0) * 1000000.0 + 0.5)
             / 1000000.0 AS benford_expect
    FROM digits GROUP BY d
    """,
    doc=(
        "Benford first-digit audit over order totals: observed leading-"
        "digit frequencies next to the Benford expectation log10(1+1/d) — "
        "the classic fraud/synthetic-data screen for financial columns "
        "(a warehouse DQ gate on naturally-occurring magnitudes; the "
        "fixture's uniform synthetic prices will visibly FAIL the law, "
        "which is itself the point of publishing both columns). Leading "
        "digit via integer-truncate-then-string on both engines — no "
        "float formatting in the hash path; one aggregate plus a 9-row "
        "normalizing window."
    ),
)
def q_benford(spark: SparkSession, sf_dir: str):
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1.0)
    # floor() explicitly: DuckDB's double->BIGINT cast ROUNDS while
    # Spark's truncates — 8999.7 would lead with 8 here and 9 there.
    d = F.substring(
        F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
    ).cast("int")
    counts = o.select(d.alias("d")).groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wall = Window.partitionBy()
    tie = lambda c: F.floor(c * 1000000.0 + 0.5) / 1000000.0  # noqa: E731
    return counts.select(
        "d",
        "n",
        tie(F.col("n") * 1.0 / F.sum("n").over(wall)).alias("freq"),
        tie(F.log(1.0 + 1.0 / F.col("d")) / F.log(F.lit(10.0))).alias("benford_expect"),
    )


@query(
    "q_user_journey",
    oracle="""
    WITH ordered AS (
      SELECT user_id,
             list(event_type ORDER BY ts, event_id) AS evs
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           array_to_string(evs[1:10], '>') AS journey,
           CAST(len(evs) AS BIGINT) AS n_events
    FROM ordered
    """,
    doc=(
        "Ordered sequence aggregation: each user's first-10-event journey "
        "string ('view>click>purchase>...') — the session-replay / "
        "clickstream-mining materialization. collect_list is "
        "order-nondeterministic in a distributed engine, so the elements "
        "carry their own (ts, event_id) key: collect structs, sort_array "
        "once per group, slice, project — deterministic on any partition "
        "layout (the same discipline as min_by/max_by for OHLC). One "
        "partial+final aggregate; per-group state is the event list, "
        "bounded here by per-user activity — at 100 TB cap the collected "
        "list (slice BEFORE the join-back, or pre-filter to the first K "
        "by row_number) when users can be unbounded bots."
    ),
)
def q_user_journey(spark: SparkSession, sf_dir: str):
    e = read_table(spark, sf_dir, "events")
    evs = F.sort_array(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    return (
        e.groupBy("user_id")
        .agg(evs.alias("evs"))
        .select(
            "user_id",
            F.array_join(
                F.transform(F.slice("evs", 1, 10), lambda s: s["event_type"]), ">"
            ).alias("journey"),
            F.size("evs").cast("bigint").alias("n_events"),
        )
    )


#: PSI split point and binning (fixed-width bins, overflow clamped).
_PSI_SPLIT = "2024-01-16"
_PSI_BIN_W, _PSI_MAX_BIN = 25.0, 10
_PSI_EPS = "0.0001"  # proportion floor so empty bins don't ln(0)


@query(
    "q_psi",
    oracle=f"""
    WITH binned AS (
      SELECT CAST(least(floor(value / {_PSI_BIN_W}), {_PSI_MAX_BIN}) AS INTEGER) AS bin,
             CASE WHEN ts < TIMESTAMP '{_PSI_SPLIT}' THEN 1 ELSE 0 END AS is_ref
      FROM events
    ), counts AS (
      SELECT bin,
             sum(is_ref)     AS n_ref,
             sum(1 - is_ref) AS n_cur
      FROM binned GROUP BY bin
    ), props AS (
      SELECT bin, n_ref, n_cur,
             greatest(n_ref * 1.0 / sum(n_ref) OVER (), {_PSI_EPS}) AS p_ref,
             greatest(n_cur * 1.0 / sum(n_cur) OVER (), {_PSI_EPS}) AS p_cur
      FROM counts
    )
    SELECT bin,
           CAST(n_ref AS BIGINT) AS n_ref,
           CAST(n_cur AS BIGINT) AS n_cur,
           floor((p_cur - p_ref) * ln(p_cur / p_ref) * 1000000.0 + 0.5)
             / 1000000.0 AS psi_term
    FROM props
    """,
    doc=(
        "Population stability index between the first and second half of "
        "the month (reference vs current window) over fixed-width value "
        "bins — THE production data-drift monitor for feature "
        "distributions (sum of psi_term > 0.2 = retrain signal). "
        "Bin-based by design, so unlike an exact KS test it needs NO "
        "global order: one conditional aggregate produces both windows' "
        "bin counts in a single pass, and the only all-to-one exchange "
        "is the 11-row proportion normalizer. Empty-bin proportions are "
        "epsilon-floored (standard PSI practice) so ln stays finite; "
        "terms use the tie-proof floor-scale rounding."
    ),
)
def q_psi(spark: SparkSession, sf_dir: str):
    e = read_table(spark, sf_dir, "events")
    bin_ = F.least(
        F.floor(F.col("value") / _PSI_BIN_W), F.lit(_PSI_MAX_BIN)
    ).cast("int")
    is_ref = (F.col("ts") < F.lit(_PSI_SPLIT).cast("timestamp")).cast("int")
    counts = (
        e.select(bin_.alias("bin"), is_ref.alias("is_ref"))
        .groupBy("bin")
        .agg(
            F.sum("is_ref").alias("n_ref"),
            F.sum(1 - F.col("is_ref")).alias("n_cur"),
        )
    )
    wall = Window.partitionBy()
    eps = F.lit(float(_PSI_EPS))
    p_ref = F.greatest(F.col("n_ref") * 1.0 / F.sum("n_ref").over(wall), eps)
    p_cur = F.greatest(F.col("n_cur") * 1.0 / F.sum("n_cur").over(wall), eps)
    term = (p_cur - p_ref) * F.log(p_cur / p_ref)
    return counts.select(
        "bin",
        F.col("n_ref").cast("bigint").alias("n_ref"),
        F.col("n_cur").cast("bigint").alias("n_cur"),
        (F.floor(term * 1000000.0 + 0.5) / 1000000.0).alias("psi_term"),
    )


@query(
    "q_seasonality",
    oracle="""
    WITH hourly AS (
      SELECT event_type AS symbol,
             CAST(extract(hour FROM ts) AS INTEGER) AS hod,
             count(*) AS n,
             floor(avg(value) * 10000.0 + 0.5) / 10000.0 AS avg_value
      FROM events GROUP BY 1, 2
    )
    SELECT symbol, hod, CAST(n AS BIGINT) AS n, avg_value,
           CAST(rank() OVER (PARTITION BY symbol ORDER BY n DESC, hod)
                AS INTEGER) AS activity_rank
    FROM hourly
    """,
    doc=(
        "Hour-of-day seasonality profile per symbol: activity count and "
        "mean value for each of the 24 hours, ranked by activity "
        "(rank 1 = the symbol's peak hour) — the load-shaping/seasonal "
        "baseline every capacity planner and anomaly detector normalizes "
        "against. One partial+final aggregate collapses the stream to "
        "|symbols| x 24 rows; the rank window runs on that tiny "
        "aggregate, partitioned by symbol. Deterministic tiebreak on "
        "hod; floor-scale rounding on the mean."
    ),
)
def q_seasonality(spark: SparkSession, sf_dir: str):
    e = read_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(
            F.col("event_type").alias("symbol"),
            F.hour("ts").cast("int").alias("hod"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.floor(F.avg("value") * 10000.0 + 0.5) / 10000.0).alias("avg_value"),
        )
    )
    w = Window.partitionBy("symbol").orderBy(F.col("n").desc(), F.col("hod"))
    return hourly.select(
        "symbol",
        "hod",
        F.col("n").cast("bigint").alias("n"),
        "avg_value",
        F.rank().over(w).cast("int").alias("activity_rank"),
    )


#: MAD anomaly threshold (the robust-statistics 3-sigma analog:
#: 1.4826 * MAD approximates sigma for normal data; k=3.5 is the
#: conventional outlier cut).
_MAD_K = 3.5 * 1.4826


@query(
    "q_anomaly_mad",
    oracle=f"""
    WITH med AS (
      SELECT user_id, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY user_id
    ), dev AS (
      SELECT e.user_id, e.event_id, e.value, m.med,
             abs(e.value - m.med) AS adev
      FROM events e JOIN med m ON e.user_id = m.user_id
    ), mad AS (
      SELECT user_id, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY user_id
    )
    SELECT d.event_id, d.user_id,
           floor(d.value * 10000.0 + 0.5) / 10000.0 AS value,
           floor((d.med + {_MAD_K} * m.mad) * 10000.0 + 0.5) / 10000.0 AS cutoff
    FROM dev d JOIN mad m ON d.user_id = m.user_id
    WHERE d.adev > {_MAD_K} * m.mad AND m.mad > 0
    """,
    doc=(
        "Robust anomaly detection via median absolute deviation: per "
        "user, flag events whose |value - median| exceeds "
        "3.5 x 1.4826 x MAD — the robust twin of q_anomaly_zscore (mean/"
        "stddev break down exactly when outliers are present; medians "
        "don't, which is why monitoring pipelines prefer MAD). Two "
        "exact-median aggregates on the user key plus joins back — "
        "three passes sharing one hash partitioning (AQE reuses the "
        "exchange); exact interpolated medians use the same "
        "quantile_cont <-> percentile convention q_percentiles pinned. "
        "Zero-MAD users (constant values) are excluded rather than "
        "flagging everything."
    ),
)
def q_anomaly_mad(spark: SparkSession, sf_dir: str):
    e = read_table(spark, sf_dir, "events")
    med = e.groupBy("user_id").agg(F.expr("percentile(value, 0.5)").alias("med"))
    dev = e.join(med, "user_id").select(
        "user_id",
        "event_id",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("user_id").agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    tie4 = lambda c: F.floor(c * 10000.0 + 0.5) / 10000.0  # noqa: E731
    return (
        dev.join(mad, "user_id")
        .filter((F.col("adev") > _MAD_K * F.col("mad")) & (F.col("mad") > 0))
        .select(
            "event_id",
            "user_id",
            tie4(F.col("value")).alias("value"),
            tie4(F.col("med") + _MAD_K * F.col("mad")).alias("cutoff"),
        )
    )


#: Lorenz-curve range-bucket count (the q_global_shuffle two-phase
#: exact-rank machinery applied to a VALUE ordering instead of a hash).
_LORENZ_BUCKETS = 256


@query(
    "q_lorenz",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS rev_c
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT rev_c,
             row_number() OVER (ORDER BY rev_c, o_custkey) AS rk,
             count(*) OVER () AS n,
             sum(rev_c) OVER () AS total
      FROM rev
    ), dec AS (
      SELECT CAST(((rk - 1) * 10) // n AS INTEGER) AS decile, rev_c, total
      FROM ranked
    )
    SELECT decile,
           CAST(count(*) AS BIGINT) AS n_cust,
           floor(sum(rev_c) * 1.0 / any_value(total) * 1000000.0 + 0.5)
             / 1000000.0 AS rev_share,
           floor(sum(sum(rev_c)) OVER (ORDER BY decile) * 1.0
                 / any_value(total) * 1000000.0 + 0.5) / 1000000.0 AS cum_share
    FROM dec GROUP BY decile
    """,
    doc=(
        "Lorenz curve of customer revenue concentration: customers ranked "
        "poorest-to-richest, cut into deciles, each decile's share and "
        "cumulative share of total revenue (the inputs to Gini / "
        "'top-decile drives X%' statements). Revenue is summed in integer "
        "CENTS so the rank order is bit-identical across engines — a "
        "double revenue sum could flip near-ties and move a customer "
        "across a decile boundary, an error rounding can't hide. The "
        "oracle uses the naive global window; the Spark plan reuses the "
        "q_global_shuffle two-phase exact-rank machinery on a VALUE "
        "ordering: a one-row (min, max, n, total) stats broadcast derives "
        "256 order-preserving range buckets, per-bucket parallel "
        "row_number, broadcast bucket-count cumsum offsets — identical "
        "ranks, and the customer table never passes through one task. "
        "Bounded exchanges: the 1-row stats and the 256-row offset "
        "cumsum."
    ),
)
def q_lorenz(spark: SparkSession, sf_dir: str):
    o = read_table(spark, sf_dir, "orders")
    rev_c = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint")
    rev = o.select("o_custkey", rev_c.alias("c")).groupBy("o_custkey").agg(
        F.sum("c").alias("rev_c")
    )
    ranked = exact_global_rank(
        rev,
        value_col="rev_c",
        tiebreak_col="o_custkey",
        n_col="n",
        buckets=_LORENZ_BUCKETS,
        extra_stats={"total": F.sum("rev_c")},
    )
    dec = ranked.select(
        F.expr("CAST(((rk - 1) * 10) div n AS INT)").alias("decile"),
        "rev_c",
        "total",
    )
    tie6 = lambda c: F.floor(c * 1000000.0 + 0.5) / 1000000.0  # noqa: E731
    by_dec = dec.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cust"),
        F.sum("rev_c").alias("drev"),
        F.first("total").alias("total"),
    )
    wcum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return by_dec.select(
        "decile",
        "n_cust",
        tie6(F.col("drev") * 1.0 / F.col("total")).alias("rev_share"),
        tie6(F.sum("drev").over(wcum) * 1.0 / F.col("total")).alias("cum_share"),
    )


#: Decay-score geometry: half-life one day, contributions older than
#: _DECAY_MAX_AGE days dropped (weight < 2^-19 of current — below any
#: ranking relevance). Weights are POWERS OF TWO so the weighted sum stays
#: exact int64: cents(value) <= 5.7e4, shift <= 19 -> term <= 3e10.
#: Headroom is DISTRIBUTIONAL, not worst-case: with the fixture's ~uniform
#: ages, a per-user sum at sf100 (~6e8 rows total / ~1.5e5 users) stays
#: far under 2^63. The adversarial corpus — most rows concentrated at
#: age 1 under ONE key — reaches ~3e10 * rows_per_key and overflows past
#: ~3e8 same-key max-weight events; such skewed-age corpora need per-day
#: partials (sum cents per (user, age), then shift ≤ 21 terms) or a wider
#: fixed point before the final sum.
_DECAY_AS_OF = "2024-02-01"
_DECAY_MAX_AGE = 20


@query(
    "q_decay_score",
    oracle=f"""
    WITH t AS (
      SELECT user_id,
             DATE '{_DECAY_AS_OF}' - CAST(ts AS DATE) AS age,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
      FROM events
    ), w AS (
      SELECT user_id,
             c * (CAST(1 AS BIGINT) << ({_DECAY_MAX_AGE} - age)) AS term
      FROM t WHERE age BETWEEN 1 AND {_DECAY_MAX_AGE}
    )
    SELECT user_id,
           CAST(sum(term) AS BIGINT) / {float(2 ** _DECAY_MAX_AGE)!r} AS decayed
    FROM w GROUP BY 1
    ORDER BY decayed DESC, user_id
    LIMIT 20
    """,
    doc=(
        "Exponentially time-decayed engagement leaderboard (half-life one "
        "day vs a pinned as-of date — the feed-ranking / trending-items "
        "aggregation): each event contributes value * 2^-age. Decay "
        "weights are POWERS OF TWO over cent-scaled longs, so the whole "
        "weighted sum accumulates EXACTLY in int64 and the final "
        "divide-by-2^20 is an exponent shift — bit-identical across "
        "engines, runs, and partitionings, where exp()-weighted double "
        "sums drift with aggregation order. Shape: a redundant literal "
        "ts-range twin of the age filter prunes the history AT THE SCAN "
        "(datediff itself is not pushable; the twin is), one "
        "partial+final aggregate on user_id, top-20 via "
        "TakeOrderedAndProject — no global sort. The integer-dyadic trick "
        "generalizes: any half-life is a day-shift, any event weight a "
        "scaled long. Overflow budget is DISTRIBUTIONAL, not just a row "
        "count: the worst case concentrates every row at age 1 (term "
        "cents*2^19 ~ 2.6e10 at the fixture's max price), which saturates "
        "int64 near ~3.5e8 rows per user — a skewed-age corpus at that "
        "scale needs per-(user, day) partials summed at a lower shift, or "
        "a smaller max_age, before this single-sum form is safe."
    ),
)
def q_decay_score(spark: SparkSession, sf_dir: str):
    e = read_table(spark, sf_dir, "events")
    # The age BETWEEN filter below is exact but datediff() is not pushable;
    # this REDUNDANT plain ts-range (equivalent by construction: age in
    # [1, max_age] <=> ts in [as_of - max_age days, as_of)) is what
    # actually reaches the parquet scan and prunes the history at 100 TB.
    lo = F.lit(_DECAY_AS_OF).cast("date") - F.lit(_DECAY_MAX_AGE)
    e = e.filter(
        (F.col("ts") >= lo.cast("timestamp_ntz"))
        & (F.col("ts") < F.lit(_DECAY_AS_OF).cast("date").cast("timestamp_ntz"))
    )
    age = F.datediff(F.lit(_DECAY_AS_OF).cast("date"), F.col("ts").cast("date"))
    t = e.select(
        "user_id",
        age.alias("age"),
        F.floor(F.col("value") * 100.0 + 0.5).cast("bigint").alias("c"),
    ).filter(F.col("age").between(1, _DECAY_MAX_AGE))
    term = F.col("c") * F.expr(
        f"shiftleft(CAST(1 AS BIGINT), {_DECAY_MAX_AGE} - age)"
    )
    return (
        t.select("user_id", term.alias("term"))
        .groupBy("user_id")
        .agg((F.sum("term") / F.lit(float(2 ** _DECAY_MAX_AGE))).alias("decayed"))
        .orderBy(F.col("decayed").desc(), "user_id")
        .limit(20)
    )


#: Target-encoding smoothing pseudo-count (the m in the standard
#: (pos + m*prior)/(n + m) empirical-Bayes shrinkage).
_TENC_M = 10


@query(
    "q_target_encoding",
    oracle=f"""
    WITH lab AS (
      SELECT l_suppkey,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem
    ), cat AS (
      SELECT l_suppkey,
             CAST(count(*) AS BIGINT) AS n_cat,
             CAST(sum(y) AS BIGINT)   AS pos_cat
      FROM lab GROUP BY 1
    ), gl AS (
      SELECT CAST(count(*) AS BIGINT) AS n_tot,
             CAST(sum(y) AS BIGINT)   AS pos_tot
      FROM lab
    )
    SELECT l_suppkey, n_cat,
           floor(1.0 * (pos_cat * n_tot + {_TENC_M} * pos_tot)
                 / (n_tot * (n_cat + {_TENC_M}))
                 * 1000000.0 + 0.5) / 1000000.0 AS enc
    FROM cat, gl
    """,
    doc=(
        "Smoothed target encoding (empirical-Bayes mean-target per "
        "category, m=10 pseudo-counts toward the global rate): the "
        "standard high-cardinality categorical featurization a training "
        "pipeline materializes as a broadcast lookup table. The shrinkage "
        "is computed as ONE division of exact int64 products — "
        "(pos_cat*n_tot + m*pos_tot) / (n_tot*(n_cat+m)) — instead of "
        "mixing two double ratios, so the encoding is bit-identical "
        "across engines and partitionings. Exactness bound: the integer "
        "product needs pos_cat*n_tot < 2^63, i.e. n_tot below ~3e9 rows "
        "(sf ~500); beyond that, fall back to the two-ratio double form "
        "(loses bit-identity, keeps correctness). Shape: one partial+final "
        "aggregate on the category key + a one-row global-count broadcast; "
        "output is |categories| rows regardless of fact size — exactly "
        "what gets broadcast-joined back at serving/training time."
    ),
)
def q_target_encoding(spark: SparkSession, sf_dir: str):
    li = read_table(spark, sf_dir, "lineitem")
    lab = li.select(
        "l_suppkey",
        F.when(F.col("l_returnflag") == "R", F.lit(1)).otherwise(F.lit(0)).alias("y"),
    )
    cat = lab.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_cat"), F.sum("y").cast("bigint").alias("pos_cat")
    )
    glob = lab.agg(
        F.count(F.lit(1)).alias("n_tot"), F.sum("y").cast("bigint").alias("pos_tot")
    )
    enc = (
        (F.col("pos_cat") * F.col("n_tot") + _TENC_M * F.col("pos_tot"))
        * 1.0
        / (F.col("n_tot") * (F.col("n_cat") + _TENC_M))
    )
    return cat.join(F.broadcast(glob)).select(
        "l_suppkey",
        "n_cat",
        (F.floor(enc * 1000000.0 + 0.5) / 1000000.0).alias("enc"),
    )


# ---------------------------------------------------------------------------
# Portable count-min sketch & exact two-sample KS drift test (round 7)
# ---------------------------------------------------------------------------

#: Count-min geometry: d=4 independent md5-salted hash rows, w=256 buckets.
#: Cells are (row, bucket, count) — at most 1024 longs regardless of corpus
#: size, and sketch MERGE is cell-wise addition (per-shard sketches roll up
#: without rescanning rows — the property that matters at 100 TB).
_CMS_D, _CMS_W = 4, 256
#: Probe terms: three present in the corpus, one absent (its estimate is
#: whatever hash collisions put in its cells — still deterministic).
_CMS_PROBES = ("table", "scan", "merge", "zebra")


def _cms_bucket(tok, i: int):
    """Bucket of ``tok`` under salted hash row ``i`` — md5 60-bit prefix of
    '<i>:<tok>' mod w, the same engine-portable primitive as
    operators/dedup_hash.token_hash (DuckDB computes the identical value
    from the identical md5 hex)."""
    salted = F.concat(F.lit(f"{i}:"), tok)
    h60 = F.conv(F.substring(F.md5(salted.cast("binary")), 1, 15), 16, 10).cast(
        "long"
    )
    return (h60 % _CMS_W).cast("int")


@query(
    "q_cms_portable",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ), cells AS (
      SELECT i, CAST(CAST('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || tok), 1, 15)
                     AS BIGINT) % {_CMS_W} AS INTEGER) AS bkt,
             count(*) AS c
      FROM toks, range(0, {_CMS_D}) AS r(i)
      GROUP BY 1, 2
    ), probes AS (
      SELECT unnest({list(_CMS_PROBES)!r}) AS term
    ), probe_cells AS (
      SELECT term, i,
             CAST(CAST('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || term), 1, 15)
                  AS BIGINT) % {_CMS_W} AS INTEGER) AS bkt
      FROM probes, range(0, {_CMS_D}) AS r(i)
    ), est AS (
      SELECT term, min(coalesce(c, 0)) AS est
      FROM probe_cells LEFT JOIN cells USING (i, bkt)
      GROUP BY term
    ), exact AS (
      SELECT term, coalesce(c, 0) AS exact FROM probes
      LEFT JOIN (SELECT tok, count(*) AS c FROM toks GROUP BY tok) t
        ON t.tok = probes.term
    )
    SELECT term, CAST(exact AS BIGINT) AS exact, CAST(est AS BIGINT) AS est
    FROM exact JOIN est USING (term)
    """,
    doc=(
        "Engine-portable count-min sketch (d=4, w=256, md5-salted rows): "
        "the frequency-sketch sibling of q_hll_portable. Point-query "
        "estimates (min over rows of the probed cells) are >= exact by "
        "construction and the whole pipeline is integer arithmetic, so "
        "exact and estimate both value-hash-match DuckDB running the "
        "same md5/mod math. Scale shape: bucket assignment is per-row "
        "codegen; the only shuffle carries (row, bucket) partial counts "
        "— cells are bounded at d*w = 1024 longs no matter the corpus — "
        "and the probe join broadcasts 16 cells. Production swaps the "
        "probe literals for a keyed lookup against the same cell table."
    ),
)
def q_cms_portable(spark: SparkSession, sf_dir: str):
    from ..operators.scale import fan_out

    # fan_out: d=4 md5 digests per token dominate the scan; one input
    # split on the fixture serialized the hash pass (r10 audit, 0.9 s).
    docs = fan_out(read_table(spark, sf_dir, "documents"))
    toks = (
        docs.select(F.explode_outer(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok").isNotNull())
    )
    hashed = toks.select(
        F.posexplode(F.array(*[_cms_bucket(F.col("tok"), i) for i in range(_CMS_D)]))
        .alias("i", "bkt")
    )
    cells = hashed.groupBy("i", "bkt").agg(F.count(F.lit(1)).alias("c"))
    probes = spark.createDataFrame([(t,) for t in _CMS_PROBES], "term string")
    probe_cells = probes.select(
        "term",
        F.posexplode(
            F.array(*[_cms_bucket(F.col("term"), i) for i in range(_CMS_D)])
        ).alias("i", "bkt"),
    )
    est = (
        probe_cells.join(cells, ["i", "bkt"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
    )
    exact = probes.join(
        toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c")),
        probes.term == F.col("tok"),
        "left",
    ).select("term", F.coalesce(F.col("c"), F.lit(0)).alias("exact"))
    return exact.join(est, "term").select(
        "term",
        F.col("exact").cast("bigint").alias("exact"),
        F.col("est").cast("bigint").alias("est"),
    )


#: KS test reuses q_psi's reference/current time split; value-range buckets
#: for the two-phase exact CDF (bucket order == value order, so per-bucket
#: local cumsums + broadcast bucket offsets reproduce the global cumsum
#: without a single-partition sort — the q_global_shuffle construction).
_KS_SPLIT = _PSI_SPLIT
_KS_BUCKET_W, _KS_MAX_BUCKET = 5.0, 200


@query(
    "q_ks_test",
    oracle=f"""
    WITH flagged AS (
      SELECT value, CASE WHEN ts < TIMESTAMP '{_KS_SPLIT}' THEN 1 ELSE 0 END AS is_ref
      FROM events
    ), per_value AS (
      SELECT value, sum(is_ref) AS r, sum(1 - is_ref) AS c
      FROM flagged GROUP BY value
    ), tot AS (
      SELECT sum(r) AS n_ref, sum(c) AS n_cur FROM per_value
    ), cum AS (
      SELECT sum(r) OVER (ORDER BY value) AS cum_ref,
             sum(c) OVER (ORDER BY value) AS cum_cur
      FROM per_value
    )
    SELECT CAST(n_ref AS BIGINT) AS n_ref,
           CAST(n_cur AS BIGINT) AS n_cur,
           floor(max(abs(cum_ref * 1.0 / n_ref - cum_cur * 1.0 / n_cur))
                 * 1000000.0 + 0.5) / 1000000.0 AS d_stat
    FROM cum CROSS JOIN tot
    GROUP BY n_ref, n_cur
    """,
    doc=(
        "EXACT two-sample Kolmogorov-Smirnov statistic between the "
        "reference and current half of the month — the order-sensitive "
        "complement of q_psi's binned drift score (KS catches shape "
        "drift PSI's 11 bins smear out). The textbook formulation needs "
        "both empirical CDFs evaluated on one global value order; this "
        "plan gets the global cumsum WITHOUT a global sort: per-value "
        "counts, value-range buckets (order-preserving, so bucket order "
        "== value order), per-bucket windowed cumsums in parallel, plus "
        "broadcast per-bucket offsets (a <= 201-row cumsum — the only "
        "single-partition step). D is then one max aggregate. At 100 TB "
        "the bucket edges come from an approx-quantile pre-pass instead "
        "of fixed widths; the construction is unchanged."
    ),
)
def q_ks_test(spark: SparkSession, sf_dir: str):
    e = read_table(spark, sf_dir, "events")
    is_ref = (F.col("ts") < F.lit(_KS_SPLIT).cast("timestamp")).cast("long")
    per_value = (
        e.select("value", is_ref.alias("is_ref"))
        .groupBy("value")
        .agg(
            F.sum("is_ref").alias("r"),
            F.sum(1 - F.col("is_ref")).alias("c"),
        )
        .withColumn(
            "b",
            F.least(
                F.floor(F.col("value") / _KS_BUCKET_W), F.lit(_KS_MAX_BUCKET)
            ).cast("int"),
        )
    )
    tot = per_value.agg(
        F.sum("r").alias("n_ref"), F.sum("c").alias("n_cur")
    )
    # Per-bucket totals -> exclusive running offsets (bounded row count).
    boffs = (
        per_value.groupBy("b")
        .agg(F.sum("r").alias("br"), F.sum("c").alias("bc"))
        .select(
            "b",
            F.coalesce(
                F.sum("br").over(
                    Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).alias("off_r"),
            F.coalesce(
                F.sum("bc").over(
                    Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).alias("off_c"),
        )
    )
    wloc = Window.partitionBy("b").orderBy("value")
    cum = (
        per_value.join(F.broadcast(boffs), "b")
        .select(
            (F.col("off_r") + F.sum("r").over(wloc)).alias("cum_ref"),
            (F.col("off_c") + F.sum("c").over(wloc)).alias("cum_cur"),
        )
    )
    d = cum.join(F.broadcast(tot)).agg(
        F.first("n_ref").alias("n_ref"),
        F.first("n_cur").alias("n_cur"),
        F.max(
            F.abs(
                F.col("cum_ref") * 1.0 / F.col("n_ref")
                - F.col("cum_cur") * 1.0 / F.col("n_cur")
            )
        ).alias("d_raw"),
    )
    return d.select(
        F.col("n_ref").cast("bigint").alias("n_ref"),
        F.col("n_cur").cast("bigint").alias("n_cur"),
        (F.floor(F.col("d_raw") * 1000000.0 + 0.5) / 1000000.0).alias("d_stat"),
    )


@query(
    "q_chi_square",
    oracle=f"""
    WITH obs AS (
      SELECT event_type,
             CASE WHEN ts < TIMESTAMP '{_KS_SPLIT}' THEN 1 ELSE 0 END AS is_ref,
             count(*) AS o
      FROM events GROUP BY 1, 2
    ), margins AS (
      SELECT event_type, sum(o) AS row_tot FROM obs GROUP BY 1
    ), cols AS (
      SELECT is_ref, sum(o) AS col_tot FROM obs GROUP BY 1
    ), n AS (
      SELECT sum(o) AS n FROM obs
    ), grid AS (
      SELECT event_type, row_tot, is_ref, col_tot FROM margins CROSS JOIN cols
    ), cells AS (
      SELECT CAST(floor(
               (coalesce(o, 0) - row_tot * 1.0 * col_tot / n)
               * (coalesce(o, 0) - row_tot * 1.0 * col_tot / n)
               / (row_tot * 1.0 * col_tot / n)
               * 1000000.0 + 0.5) AS BIGINT) AS t_micro
      FROM grid LEFT JOIN obs USING (event_type, is_ref) CROSS JOIN n
    )
    SELECT CAST(sum(t_micro) AS BIGINT) / 1000000.0 AS chi2,
           CAST((SELECT count(*) - 1 FROM margins) AS INTEGER) AS dof,
           CAST((SELECT n FROM n) AS BIGINT) AS n
    FROM cells
    """,
    doc=(
        "Chi-square independence test: event-type mix vs reference/"
        "current window — the CATEGORICAL drift monitor beside q_psi "
        "(numeric bins) and q_ks_test (numeric shape). One conditional "
        "aggregate produces the contingency table; margins are "
        "category-count-sized broadcasts; expected counts come from the "
        "observed row/col products. Per-cell (O-E)^2/E terms are floored "
        "to micro-integers BEFORE the cross-cell sum (exact BIGINT "
        "addition — cell iteration order can't perturb the statistic), "
        "one final division back to the chi2 scale. dof = (|types|-1) * "
        "(2-1). Nothing in the plan grows past |categories| rows after "
        "the first aggregate."
    ),
)
def q_chi_square(spark: SparkSession, sf_dir: str):
    e = read_table(spark, sf_dir, "events")
    is_ref = (F.col("ts") < F.lit(_KS_SPLIT).cast("timestamp")).cast("int")
    obs = (
        e.select("event_type", is_ref.alias("is_ref"))
        .groupBy("event_type", "is_ref")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    margins = obs.groupBy("event_type").agg(F.sum("o").alias("row_tot"))
    cols = obs.groupBy("is_ref").agg(F.sum("o").alias("col_tot"))
    n = obs.agg(F.sum("o").alias("n"))
    # The statistic iterates the FULL margins x cols grid, not just the
    # observed cells: a category present in only one window contributes
    # its O=0 cell's E term — the strongest drift signal, which an
    # observed-cells-only sum would silently drop. Integer products are
    # promoted to double between factors (row_tot * 1.0 * col_tot) so the
    # expected-count arithmetic cannot overflow int64 at corpus scale.
    exp = F.col("row_tot") * 1.0 * F.col("col_tot") / F.col("n")
    o = F.coalesce(F.col("o"), F.lit(0))
    t_micro = F.floor(
        (o - exp) * (o - exp) / exp * 1000000.0 + 0.5
    ).cast("bigint")
    grid = margins.crossJoin(cols)
    cells = (
        grid.join(obs, ["event_type", "is_ref"], "left")
        .join(F.broadcast(n))
        .select(t_micro.alias("t_micro"))
    )
    dof = margins.agg((F.count(F.lit(1)) - 1).cast("int").alias("dof"))
    return (
        cells.agg((F.sum("t_micro").cast("bigint") / 1000000.0).alias("chi2"))
        .join(F.broadcast(dof))
        .join(F.broadcast(n.select(F.col("n").cast("bigint").alias("n"))))
    )


#: RFM pinned as-of date — one day past the fixture's last order
#: (1995-01-01..2001-08-01), so recency is a positive day count.
_RFM_AS_OF = "2001-08-02"

@query(
    "q_rfm_segments",
    oracle=f"""
    WITH m AS (
      SELECT o_custkey,
             CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
                            DATE '{_RFM_AS_OF}') AS INTEGER) AS r_days,
             CAST(count(*) AS BIGINT) AS f,
             CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS m_cents
      FROM orders GROUP BY 1
    ), r AS (
      SELECT *,
             row_number() OVER (ORDER BY r_days, o_custkey)  AS rr,
             row_number() OVER (ORDER BY f, o_custkey)       AS fr,
             row_number() OVER (ORDER BY m_cents, o_custkey) AS mr,
             count(*) OVER () AS n
      FROM m
    )
    SELECT o_custkey, r_days, f, m_cents,
           CAST(6 - (1 + ((rr - 1) * 5) // n) AS INTEGER) AS r_score,
           CAST(1 + ((fr - 1) * 5) // n AS INTEGER)       AS f_score,
           CAST(1 + ((mr - 1) * 5) // n AS INTEGER)       AS m_score,
           CAST((6 - (1 + ((rr - 1) * 5) // n)) * 100
                + (1 + ((fr - 1) * 5) // n) * 10
                + (1 + ((mr - 1) * 5) // n) AS INTEGER)   AS rfm
    FROM r
    """,
    doc=(
        "RFM customer segmentation (recency/frequency/monetary quintile "
        "scores, the classic CRM / lifecycle-marketing featurization): "
        "days since last order vs a pinned as-of date, order count, and "
        "lifetime revenue in integer CENTS, each cut into exact quintiles "
        "with score 5 = best (most recent / most frequent / highest "
        "spend), concatenated into the 111..555 segment code. All three "
        "rankings ride exact_global_rank (the factored q_lorenz two-phase "
        "machinery: 1-row stats broadcast -> order-preserving range "
        "buckets -> per-bucket row_number -> bounded offset cumsum), so "
        "the customer table never passes through one task and the "
        "quintile assignment — 1 + ((rank-1)*5) div n, ties broken by "
        "custkey — is pure integer arithmetic, bit-identical across "
        "engines where interpolated percentile CUTOFFS would wobble on "
        "FP rounding. Shape: one partial+final aggregate on o_custkey "
        "(|C| rows out), then three rank passes over that |C|-row "
        "aggregate; the only single-partition exchanges are the three "
        "1-row stats and three <=256-row offset cumsums."
    ),
)
def q_rfm_segments(spark: SparkSession, sf_dir: str):
    o = read_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint")
    # localCheckpoint the |C|-row aggregate ONCE (the q_pagerank / BPE
    # materialization pattern): CHAINING the three rank passes instead
    # doubles the un-materialized subtree per pass (each pass references
    # its input in both the stats aggregate and the bucket join), which
    # planned 50 exchanges / 25 broadcasts before this restructure. Three
    # independent rank passes over the materialized table + co-partitioned
    # joins back plan ~16 exchanges, all |C|-sized or bounded.
    m = o.groupBy("o_custkey").agg(
        F.datediff(
            F.lit(_RFM_AS_OF).cast("date"), F.max("o_orderdate").cast("date")
        ).cast("int").alias("r_days"),
        F.count(F.lit(1)).alias("f"),
        F.sum(cents).alias("m_cents"),
    ).localCheckpoint(eager=True)
    r1 = exact_global_rank(
        m, value_col="r_days", tiebreak_col="o_custkey", rank_col="rr", n_col="n"
    ).select("o_custkey", "rr", "n")
    r2 = exact_global_rank(
        m, value_col="f", tiebreak_col="o_custkey", rank_col="fr"
    ).select("o_custkey", "fr")
    r3 = exact_global_rank(
        m, value_col="m_cents", tiebreak_col="o_custkey", rank_col="mr"
    ).select("o_custkey", "mr")
    ranked = m.join(r1, "o_custkey").join(r2, "o_custkey").join(r3, "o_custkey")
    # 1 + ((rk-1)*5) div n — the q_lorenz decile assignment with 5 buckets:
    # pure integer arithmetic, bit-identical across engines. Threshold-based
    # scoring (percentile cutoffs) was rejected: interpolated quantiles are
    # doubles, and a customer sitting exactly on a cutoff can flip buckets
    # on FP rounding differences.
    quint = lambda rk: F.expr(f"CAST(1 + (({rk} - 1) * 5) div n AS INT)")  # noqa: E731
    r_score = (F.lit(6) - quint("rr")).cast("int")
    return ranked.select(
        "o_custkey",
        "r_days",
        "f",
        "m_cents",
        r_score.alias("r_score"),
        quint("fr").alias("f_score"),
        quint("mr").alias("m_score"),
        (r_score * 100 + quint("fr") * 10 + quint("mr")).cast("int").alias("rfm"),
    )


#: Market-basket minimum pair support: pairs co-ordered fewer times carry
#: no signal (the sf0.01 fixture has 3,445 pairs at support >= 2).
_BASKET_MIN_SUPPORT = 2


@query(
    "q_market_basket",
    oracle=f"""
    WITH op AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), item AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_item FROM op GROUP BY 1
    ), tot AS (
      SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM op
    ), pair AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(count(*) AS BIGINT) AS n_ab
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING count(*) >= {_BASKET_MIN_SUPPORT}
    )
    SELECT part_a, part_b, n_ab,
           ia.n_item AS n_a, ib.n_item AS n_b,
           CAST(n_ab * 1000000 // ia.n_item AS BIGINT) AS conf_ab_ppm,
           CAST(n_ab * 1000000 // ib.n_item AS BIGINT) AS conf_ba_ppm,
           CAST(n_ab * n_orders * 1000000 // (ia.n_item * ib.n_item) AS BIGINT)
             AS lift_ppm
    FROM pair
    JOIN item ia ON pair.part_a = ia.l_partkey
    JOIN item ib ON pair.part_b = ib.l_partkey
    CROSS JOIN tot
    """,
    doc=(
        "Market-basket association mining (support / confidence / lift "
        "over part pairs co-occurring in an order — the Apriori-style "
        "pair stage): pair counts filtered to minimum support, then "
        "confidence and lift as EXACT integer-ppm divisions so ranking "
        "order is bit-identical across engines. Shape: pairs are "
        "generated BASKET-LOCALLY — one aggregate collects each order's "
        "distinct sorted parts (bounded: TPC-H orders cap at ~13 lines), "
        "then a row-local nested array transform emits the C(size, 2) "
        "i<j pairs inside codegen — the standard Apriori map step, with "
        "NO self-join of the (order, part) table (the self-join twin "
        "measured 14x task skew at the 10x probe; the oracle keeps that "
        "form as the readable spec). Item counts derive from the same "
        "collected baskets and join back on the part keys WITHOUT a "
        "broadcast hint — |parts| grows with scale (the q_triangle_count "
        "degree-table lesson), AQE broadcasts while small. Exactness "
        "bound: lift's integer product needs n_ab * n_orders * 1e6 < "
        "2^63 — holds while pair support x order count < 9.2e12 (sf "
        "~1000 at observed support levels); beyond that, drop to the "
        "two-ratio double form. The 1-row n_orders scalar rides a "
        "broadcast nested-loop join."
    ),
)
def q_market_basket(spark: SparkSession, sf_dir: str):
    li = read_table(spark, sf_dir, "lineitem")
    baskets = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    item = baskets.select(F.explode("parts").alias("l_partkey")).groupBy(
        "l_partkey"
    ).agg(F.count(F.lit(1)).alias("n_item"))
    tot = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    # Row-local i<j pair expansion: for each position i, pair parts[i]
    # with every later element — flatten to one (part_a, part_b) row per
    # unordered pair. Bounded C(13, 2) per order, all inside codegen.
    pairs_arr = F.flatten(
        F.transform(
            F.col("parts"),
            lambda p, i: F.transform(
                F.slice(F.col("parts"), i + 2, F.size("parts")),
                lambda q: F.struct(p.alias("part_a"), q.alias("part_b")),
            ),
        )
    )
    pair = (
        baskets.select(F.explode(pairs_arr).alias("pr"))
        .select("pr.part_a", "pr.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= _BASKET_MIN_SUPPORT)
    )
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("n_item").alias("n_a"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("n_item").alias("n_b"))
    return (
        pair.join(ia, "part_a")
        .join(ib, "part_b")
        .join(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            "n_a",
            "n_b",
            F.expr("CAST(n_ab * 1000000 div n_a AS BIGINT)").alias("conf_ab_ppm"),
            F.expr("CAST(n_ab * 1000000 div n_b AS BIGINT)").alias("conf_ba_ppm"),
            F.expr(
                "CAST(n_ab * n_orders * 1000000 div (n_a * n_b) AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )


@query(
    "q_attribution",
    oracle="""
    WITH fp AS (
      SELECT user_id, ts, event_id FROM (
        SELECT user_id, ts, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE event_type = 'purchase'
      ) WHERE rn = 1
    ), ft AS (
      SELECT user_id, event_type AS channel FROM (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
      ) WHERE rn = 1
    ), lt AS (
      SELECT user_id, event_type AS channel FROM (
        SELECT e.user_id, e.event_type,
               row_number() OVER (PARTITION BY e.user_id
                                  ORDER BY e.ts DESC, e.event_id DESC) AS rn
        FROM events e JOIN fp ON e.user_id = fp.user_id
        WHERE e.ts < fp.ts OR (e.ts = fp.ts AND e.event_id < fp.event_id)
      ) WHERE rn = 1
    ), ftc AS (
      SELECT f.channel, count(*) AS c
      FROM fp JOIN ft f USING (user_id) GROUP BY 1
    ), ltc AS (
      SELECT coalesce(l.channel, '(none)') AS channel, count(*) AS c
      FROM fp LEFT JOIN lt l USING (user_id) GROUP BY 1
    )
    SELECT coalesce(a.channel, b.channel) AS channel,
           CAST(coalesce(a.c, 0) AS BIGINT) AS first_touch,
           CAST(coalesce(b.c, 0) AS BIGINT) AS last_touch
    FROM ftc a FULL JOIN ltc b ON a.channel = b.channel
    """,
    doc=(
        "Marketing-style conversion attribution: for every converting "
        "user (>= 1 purchase), credit the FIRST-TOUCH channel (their "
        "first event ever) and the LAST-TOUCH channel (the last event "
        "strictly before their first purchase; '(none)' when the "
        "purchase IS their first event), rolled up to per-channel "
        "conversion counts — the report that decides channel budget, "
        "which funnels/retention don't express. Determinism: every "
        "'first'/'last' is ordered by the TOTAL key (ts, event_id) — "
        "Spark computes them as min_by/max_by over a struct (one "
        "aggregate, no rank windows), the oracle as row_number windows; "
        "matching results across the two formulations is itself evidence "
        "the ordering key is total. Shape: three partial+final "
        "aggregates on user_id sharing one partitioning, then channel-"
        "cardinality joins; nothing corpus-sized is ever windowed."
    ),
)
def q_attribution(spark: SparkSession, sf_dir: str):
    e = read_table(spark, sf_dir, "events")
    key = F.struct(F.col("ts").alias("ts"), F.col("event_id").alias("event_id"))
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(key).alias("fpk"))
    )
    ft = e.groupBy("user_id").agg(F.min_by("event_type", key).alias("channel"))
    pre = e.join(fp, "user_id").filter(key < F.col("fpk"))
    lt = pre.groupBy("user_id").agg(F.max_by("event_type", key).alias("channel"))
    ftc = (
        fp.join(ft, "user_id")
        .groupBy("channel")
        .agg(F.count(F.lit(1)).cast("bigint").alias("fc"))
    )
    ltc = (
        fp.join(lt, "user_id", "left")
        .select(F.coalesce(F.col("channel"), F.lit("(none)")).alias("channel"))
        .groupBy("channel")
        .agg(F.count(F.lit(1)).cast("bigint").alias("lc"))
    )
    return (
        ftc.join(ltc.withColumnRenamed("channel", "lchannel"),
                 ftc.channel == F.col("lchannel"), "full")
        .select(
            F.coalesce(F.col("channel"), F.col("lchannel")).alias("channel"),
            F.coalesce(F.col("fc"), F.lit(0)).cast("bigint").alias("first_touch"),
            F.coalesce(F.col("lc"), F.lit(0)).cast("bigint").alias("last_touch"),
        )
    )


#: Windowed-funnel step deadline: each next step must occur within this
#: many days of the previous step's event.
_FUNNEL_WINDOW_DAYS = 3


@query(
    "q_funnel_windowed",
    oracle=f"""
    WITH s1 AS (
      SELECT user_id, ts, event_id FROM (
        SELECT user_id, ts, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE event_type = 'signup'
      ) WHERE rn = 1
    ), s2 AS (
      SELECT user_id, ts, event_id FROM (
        SELECT e.user_id, e.ts, e.event_id,
               row_number() OVER (PARTITION BY e.user_id
                                  ORDER BY e.ts, e.event_id) AS rn
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'view'
          AND (e.ts > s1.ts OR (e.ts = s1.ts AND e.event_id > s1.event_id))
          AND e.ts <= s1.ts + INTERVAL {_FUNNEL_WINDOW_DAYS} DAY
      ) WHERE rn = 1
    ), s3 AS (
      SELECT user_id FROM (
        SELECT e.user_id,
               row_number() OVER (PARTITION BY e.user_id
                                  ORDER BY e.ts, e.event_id) AS rn
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase'
          AND (e.ts > s2.ts OR (e.ts = s2.ts AND e.event_id > s2.event_id))
          AND e.ts <= s2.ts + INTERVAL {_FUNNEL_WINDOW_DAYS} DAY
      ) WHERE rn = 1
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_signup,
           (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n_view,
           (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n_purchase,
           CASE WHEN (SELECT count(*) FROM s1) > 0
                THEN CAST((SELECT count(*) FROM s2) * 1000000
                          // (SELECT count(*) FROM s1) AS BIGINT) END
             AS conv12_ppm,
           CASE WHEN (SELECT count(*) FROM s2) > 0
                THEN CAST((SELECT count(*) FROM s3) * 1000000
                          // (SELECT count(*) FROM s2) AS BIGINT) END
             AS conv23_ppm
    """,
    doc=(
        "Time-constrained funnel (signup -> view within 3 days -> "
        "purchase within 3 days of THAT view): each user's earliest "
        "qualifying event per step, chained so every step's deadline is "
        "anchored on the previous step's actual event — the product-"
        "analytics funnel q_funnel's unbounded variant can't express "
        "(conversion-within-T is what makes funnel numbers comparable "
        "across cohorts). Determinism: every 'first' is min over the "
        "TOTAL key (ts, event_id); Spark computes the chain as three "
        "per-user min(struct) aggregates + co-partitioned joins on "
        "user_id (one partitioning serves the whole chain, no rank "
        "windows over the corpus), the oracle as rank windows. The "
        "final 5-number report is a one-row scalar aggregate; step "
        "ratios are exact integer ppm."
    ),
)
def q_funnel_windowed(spark: SparkSession, sf_dir: str):
    e = read_table(spark, sf_dir, "events")
    key = F.struct(F.col("ts").alias("ts"), F.col("event_id").alias("event_id"))
    deadline = lambda ts: ts + F.expr(  # noqa: E731
        f"INTERVAL {_FUNNEL_WINDOW_DAYS} DAY"
    )
    s1 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(key).alias("k1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "view")
        .join(s1, "user_id")
        .filter((key > F.col("k1")) & (F.col("ts") <= deadline(F.col("k1.ts"))))
        .groupBy("user_id")
        .agg(F.min(key).alias("k2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter((key > F.col("k2")) & (F.col("ts") <= deadline(F.col("k2.ts"))))
        .groupBy("user_id")
        .agg(F.min(key).alias("k3"))
    )
    n1 = s1.agg(F.count(F.lit(1)).cast("bigint").alias("n_signup"))
    n2 = s2.agg(F.count(F.lit(1)).cast("bigint").alias("n_view"))
    n3 = s3.agg(F.count(F.lit(1)).cast("bigint").alias("n_purchase"))
    return (
        n1.join(F.broadcast(n2))
        .join(F.broadcast(n3))
        .select(
            "n_signup",
            "n_view",
            "n_purchase",
            # NULL-guarded like q_precision_recall's ratios: an empty step
            # makes the funnel report NULL conversion, not an ANSI
            # DIVIDE_BY_ZERO crash (a zero-completion funnel is a normal
            # production outcome, not an error).
            F.expr(
                "CASE WHEN n_signup > 0 THEN "
                "CAST(n_view * 1000000 div n_signup AS BIGINT) END"
            ).alias("conv12_ppm"),
            F.expr(
                "CASE WHEN n_view > 0 THEN "
                "CAST(n_purchase * 1000000 div n_view AS BIGINT) END"
            ).alias("conv23_ppm"),
        )
    )


@query(
    "q_cohort_ltv",
    oracle="""
    WITH first_signup AS (
      SELECT user_id, min(ts) AS signup_ts
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), cohorts AS (
      SELECT user_id,
             CAST(date_trunc('week', signup_ts) AS DATE) AS cohort_week
      FROM first_signup
    ), sizes AS (
      SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_n
      FROM cohorts GROUP BY 1
    ), rev AS (
      SELECT c.cohort_week,
             CAST(date_diff('day', c.cohort_week, CAST(e.ts AS DATE)) // 7
                  AS INTEGER) AS weeks_since,
             CAST(sum(CAST(floor(e.value * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS rev_cents,
             CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_buyers
      FROM events e JOIN cohorts c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= c.cohort_week
      GROUP BY 1, 2
    )
    SELECT r.cohort_week, r.weeks_since, r.rev_cents, r.n_buyers,
           CAST(sum(r.rev_cents) OVER (
             PARTITION BY r.cohort_week ORDER BY r.weeks_since
           ) AS BIGINT) AS cum_cents,
           CAST(sum(r.rev_cents) OVER (
             PARTITION BY r.cohort_week ORDER BY r.weeks_since
           ) * 100 // s.cohort_n AS BIGINT) AS ltv_centicents_per_user
    FROM rev r JOIN sizes s USING (cohort_week)
    """,
    doc=(
        "Cohort lifetime-value curves: users grouped by signup week, "
        "purchase revenue accumulated per (cohort, weeks-since-signup) "
        "offset, cumulative LTV per cohort and per cohort member — the "
        "payback-period report subscription/growth teams read "
        "(q_retention_cohort counts WHO comes back; this weighs WHAT "
        "they spend). Revenue in integer CENTS so the running sum and "
        "the per-user division are exact at any parallelism. Shape: one "
        "signup-side aggregate (|users| rows), a co-partitioned "
        "fact-to-cohort join on user_id, a (cohort x weeks)-sized "
        "aggregate, and a running-sum window over partitions bounded by "
        "the observation span in weeks — nothing corpus-sized is "
        "windowed. Purchases before the cohort week-start (possible for "
        "a mid-week signup's same-week purchases at week granularity) "
        "are clipped identically on both sides."
    ),
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str):
    e = read_table(spark, sf_dir, "events")
    firsts = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    cohorts = firsts.select(
        "user_id", F.date_trunc("week", "signup_ts").cast("date").alias("cohort_week")
    )
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_n")
    )
    purchases = e.filter(F.col("event_type") == "purchase")
    rev = (
        purchases.join(cohorts, "user_id")
        .filter(F.col("ts") >= F.col("cohort_week").cast("timestamp_ntz"))
        .groupBy(
            "cohort_week",
            F.expr("CAST(datediff(CAST(ts AS DATE), cohort_week) div 7 AS INT)").alias(
                "weeks_since"
            ),
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("bigint"))
            .cast("bigint")
            .alias("rev_cents"),
            F.countDistinct("user_id").cast("bigint").alias("n_buyers"),
        )
    )
    wcum = (
        Window.partitionBy("cohort_week")
        .orderBy("weeks_since")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        rev.join(sizes, "cohort_week")
        .select(
            "cohort_week",
            "weeks_since",
            "rev_cents",
            "n_buyers",
            F.sum("rev_cents").over(wcum).cast("bigint").alias("cum_cents"),
            F.expr("CAST(sum(rev_cents) OVER (PARTITION BY cohort_week ORDER BY weeks_since ROWS UNBOUNDED PRECEDING) * 100 div cohort_n AS BIGINT)").alias(
                "ltv_centicents_per_user"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Graph analytics, round 7 late: community detection, cores, degree profile
# ---------------------------------------------------------------------------

#: Label-propagation iteration count and the label-encoding base. K must
#: exceed every node id (ids here are custkey*2 / suppkey*2+1, bounded by
#: 2x the key space) and satisfy max_neighbor_count * K < 2^63 — with
#: K=1e12 that allows per-(node, label) counts up to ~9.2e6, far above any
#: realistic community fan-in at fixture or production scale. For graphs
#: with wider id spaces pick K per-graph (or switch the argmax to a
#: struct comparator); the literal is kept here so the oracle text is
#: identical by construction.
_LPA_ITERS = 3
_LPA_K = 1_000_000_000_000


def _lpa_oracle() -> str:
    cte = """
    WITH edges0 AS (
      SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ), edges AS (
      SELECT src, dst FROM edges0 UNION ALL SELECT dst AS src, src AS dst FROM edges0
    ), lbl0 AS (
      SELECT DISTINCT src AS node, src AS lbl FROM edges
    )"""
    for i in range(1, _LPA_ITERS + 1):
        cte += f""", cnt{i} AS (
      SELECT e.dst AS node, p.lbl AS lbl, count(*) AS c
      FROM edges e JOIN lbl{i - 1} p ON e.src = p.node
      GROUP BY 1, 2
    ), lbl{i} AS (
      SELECT node,
             ((max(c * {_LPA_K} - lbl) + {_LPA_K} - 1) // {_LPA_K})
               * {_LPA_K} - max(c * {_LPA_K} - lbl) AS lbl
      FROM cnt{i} GROUP BY node
    )"""
    return cte + f"""
    SELECT node, CAST(lbl AS BIGINT) AS community FROM lbl{_LPA_ITERS}
    """


@query(
    "q_label_propagation",
    oracle=_lpa_oracle(),
    doc=(
        "Community detection by synchronous LABEL PROPAGATION (Raghavan et "
        "al. 2007) over the undirected customer-supplier trading graph — "
        "3 unrolled iterations, each node adopting the most frequent label "
        "among its neighbors with ties broken toward the SMALLEST label. "
        "The argmax-with-tie-break is encoded as one BIGINT "
        "max(c*K - lbl) (K > max node id), so the whole iterative "
        "algorithm is integer arithmetic and hash-matches the generated-"
        "CTE DuckDB oracle exactly — the q_pagerank determinism recipe "
        "applied to the *mode* aggregate instead of a sum. Per iteration: "
        "one co-partitionable label-to-edges join plus two key-local "
        "aggregates ((dst,lbl) count, then per-dst argmax) — the Pregel "
        "shape; at 100 TB the edge list is bucketed on src, labels stay "
        "8 bytes/node, and iterations checkpoint to parquet to cut "
        "lineage exactly as in q_pagerank."
    ),
)
def q_label_propagation(spark: SparkSession, sf_dir: str):
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    edges0 = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = edges0.union(
        edges0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # Same materialize-once rationale as q_pagerank: every iteration
    # re-joins the edge list; localCheckpoint (not persist) so repeat
    # bench runs each pay their own materialization. The r10
    # serialization audit flagged the distinct finalize + checkpoint
    # materialization as ~1 s of single-task stages (AQE coalesces the
    # small-bytes dedup exchange), but an A/B measured the explicit
    # respread CURE as worse than the disease: repartitioning the edge
    # list before distinct/checkpoint added two full shuffles and took
    # the warm sf0.1 best-of-4 from 4.0 s to 6.7 s, so the serialized
    #-but-cheap stages stay. r13: the keyed-relayout variant
    # (checkpoint_by_key on src) removed the per-iteration edges-side
    # exchange+sort (9 -> 5 exchanges) but its extra materialization
    # measured net-negative at driver scale, same verdict as q_pagerank
    # (SCALE_AB_R13OPT.json) — plain checkpoint kept, bucketed storage is
    # the 100 TB form of the same layout.
    edges = edges.localCheckpoint(eager=True)
    state = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    for _ in range(_LPA_ITERS):
        cnt = (
            edges.join(state.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"), "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        score = F.col("c") * _LPA_K - F.col("lbl")
        state = cnt.groupBy("node").agg(F.max(score).alias("s")).select(
            "node",
            (
                F.expr(f"(s + {_LPA_K} - 1) div {_LPA_K}") * _LPA_K - F.col("s")
            ).alias("lbl"),
        )
    return state.select("node", F.col("lbl").cast("bigint").alias("community"))


#: k-core threshold and the number of unrolled peeling rounds. The output
#: contract is "the graph after R peeling rounds at k" — deterministic by
#: construction; on the fixture graphs 4 rounds reach the fixpoint
#: (asserted by the rounds-vs-rounds+1 DuckDB test in
#: tests/test_properties.py; the random-graph replica there checks the
#: R-round contract itself), and production runs loop until a round
#: removes nothing, checkpointing per round.
_KCORE_K = 3
_KCORE_ROUNDS = 4


def _kcore_oracle(rounds: int = _KCORE_ROUNDS) -> str:
    # `rounds` parametrized so tests/test_properties.py can re-run the
    # identical CTE program with rounds+1 and assert the fixture graphs
    # reached their peeling fixpoint by round _KCORE_ROUNDS.
    cte = f"""
    WITH pe AS (
      SELECT DISTINCT l1.l_suppkey AS a, l2.l_suppkey AS b
      FROM lineitem l1 JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
      WHERE l1.l_quantity > {_TRI_MIN_QTY} AND l2.l_quantity > {_TRI_MIN_QTY}
        AND l1.l_suppkey < l2.l_suppkey
    ), e0 AS (
      SELECT a AS src, b AS dst FROM pe UNION ALL SELECT b AS src, a AS dst FROM pe
    )"""
    for i in range(1, rounds + 1):
        cte += f""", d{i} AS (
      SELECT src AS node, count(*) AS d FROM e{i - 1} GROUP BY 1
    ), a{i} AS (
      SELECT node FROM d{i} WHERE d >= {_KCORE_K}
    ), e{i} AS (
      SELECT e.src, e.dst FROM e{i - 1} e
      JOIN a{i} s ON e.src = s.node
      JOIN a{i} t ON e.dst = t.node
    )"""
    return cte + f"""
    SELECT src AS node, CAST(count(*) AS BIGINT) AS core_deg
    FROM e{rounds} GROUP BY src
    """


@query(
    "q_kcore",
    oracle=_kcore_oracle(),
    doc=(
        "k-CORE decomposition (k=3) of the co-supplier graph by iterative "
        "degree peeling (Matula-Beck): each round drops every vertex whose "
        "current degree is below k and restricts the edge list to "
        "survivors; 4 unrolled rounds emit each surviving vertex with its "
        "in-core degree. The dense-subgraph screen used for graph-data "
        "curation and community seeding (and the classic spam/bot-ring "
        "signal). Everything is counting — bit-identical across engines "
        "with no quantization needed. Per round: one key-local degree "
        "aggregate plus two SEMI-join-shaped restrictions co-partitioned "
        "on the edge endpoints; at 100 TB the edge list is bucketed on "
        "src once and every round reuses that partitioning, vertices "
        "carry 8 bytes of state, and rounds checkpoint like q_pagerank. "
        "Graph sparsified by the q_triangle_count quantity gate so the "
        "fixture's co-order blow-up stays C(7,2)-bounded per order."
    ),
)
def q_kcore(spark: SparkSession, sf_dir: str):
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") > _TRI_MIN_QTY
    )
    side = li.select("l_orderkey", "l_suppkey")
    pe = (
        side.alias("l1")
        .join(side.alias("l2"), "l_orderkey")
        .filter(F.col("l1.l_suppkey") < F.col("l2.l_suppkey"))
        .select(
            F.col("l1.l_suppkey").alias("a"), F.col("l2.l_suppkey").alias("b")
        )
        .distinct()
    )
    edges = pe.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
        pe.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    # Checkpoint the peeling LINEAGE every two rounds (r13): each round
    # references the previous round's edge set THREE times (degree
    # aggregate + two semi-join sides), so a fully lazy unroll triples
    # the plan per round — the before-plan had ~886 physical operators
    # (3^4 copies of the base subtree, 161 exchanges;
    # plans/r13/q_kcore_before.txt), planning/codegen bloat that grows
    # EXPONENTIALLY with rounds and would kill the driver long before the
    # executors on a production loop-to-fixpoint run. A checkpoint every
    # OTHER round bounds every lazy segment at 3^2 = 9 subtree copies
    # (final plan 31 operators) while paying half the materialization
    # jobs of the per-round variant, which the interleaved A/B measured
    # as the dominant local cost (SCALE_AB_R13OPT.json).
    edges = edges.localCheckpoint(eager=True)
    for _r in range(_KCORE_ROUNDS):
        alive = (
            edges.groupBy(F.col("src").alias("node"))
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= _KCORE_K)
            .select("node")
        )
        edges = (
            edges.join(alive.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(alive.withColumnRenamed("node", "dst"), "dst", "left_semi")
            .select("src", "dst")
        )
        # Checkpoint every other round AND on the final round (r13 ADVICE
        # #3): the cadence alone silently assumed _KCORE_ROUNDS stays
        # even — an odd future value would leave a trailing uncheckpointed
        # segment whose plan re-grows 3^k. No-op at the current value
        # (round 3 satisfies both conditions).
        if _r % 2 == 1 or _r == _KCORE_ROUNDS - 1:
            edges = edges.localCheckpoint(eager=True)
    return (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_deg"))
    )


@query(
    "q_degree_stats",
    oracle="""
    WITH edges0 AS (
      SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ), edges AS (
      SELECT src, dst FROM edges0 UNION ALL SELECT dst AS src, src AS dst FROM edges0
    ), deg AS (
      SELECT src AS node, count(*) AS d FROM edges GROUP BY 1
    )
    SELECT CAST(length(bin(d)) AS INTEGER) AS deg_bucket,
           CAST(count(*) AS BIGINT)        AS n_nodes,
           CAST(sum(d) AS BIGINT)          AS sum_deg,
           CAST(min(d) AS BIGINT)          AS min_deg,
           CAST(max(d) AS BIGINT)          AS max_deg
    FROM deg GROUP BY 1
    """,
    doc=(
        "Degree-distribution profile of the trading graph: per-node degree "
        "rolled into EXACT log2 buckets (bucket = bit length of the "
        "degree, via length(bin(d)) — pure integer semantics on both "
        "engines, no FP log). The dataset-card statistic for any graph "
        "workload: the bucket histogram is the power-law/hub evidence "
        "that motivates q_triangle_count's degree orientation and sizes "
        "skew mitigations before running joins over the edge list. Two "
        "key-local aggregates (degree, then a <=64-bucket rollup) — "
        "partial-agg combines make the second exchange 64 rows per "
        "partition at any scale."
    ),
)
def q_degree_stats(spark: SparkSession, sf_dir: str):
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    edges0 = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = edges0.union(
        edges0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    return deg.groupBy(
        F.length(F.bin("d")).cast("int").alias("deg_bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum("d").cast("bigint").alias("sum_deg"),
        F.min("d").cast("bigint").alias("min_deg"),
        F.max("d").cast("bigint").alias("max_deg"),
    )


#: BFS seed selection (customers of one nation) and the unrolled round
#: count. 3 rounds covers cust->supp->cust->supp; production loops until
#: the frontier empties, checkpointing per round like q_pagerank.
_BFS_SEED_NATION = 19
_BFS_ROUNDS = 3


def _bfs_oracle() -> str:
    cte = f"""
    WITH edges0 AS (
      SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ), edges AS (
      SELECT src, dst FROM edges0 UNION ALL SELECT dst AS src, src AS dst FROM edges0
    ), d0 AS (
      SELECT DISTINCT c_custkey * 2 AS node, 0 AS dist
      FROM customer WHERE c_nationkey = {_BFS_SEED_NATION}
    )"""
    for i in range(1, _BFS_ROUNDS + 1):
        cte += f""", d{i} AS (
      SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM d{i - 1}
        UNION ALL
        SELECT e.dst AS node, p.dist + 1 AS dist
        FROM edges e JOIN d{i - 1} p ON e.src = p.node
      ) GROUP BY node
    )"""
    return cte + f"""
    SELECT node, CAST(dist AS INTEGER) AS dist FROM d{_BFS_ROUNDS}
    """


@query(
    "q_bfs_reach",
    oracle=_bfs_oracle(),
    doc=(
        "Multi-source BREADTH-FIRST SEARCH: shortest-hop distance from "
        "one nation's customers through the undirected customer-supplier "
        "trading graph, 3 unrolled rounds — the traversal primitive "
        "(supply-chain blast radius, fraud-ring proximity, influence "
        "reach) completing the graph family beside PageRank/LPA/k-core. "
        "Pure integer hop counts — bit-identical across engines with no "
        "quantization. The Spark plan expands only the FRONTIER (nodes "
        "first reached in the previous round) instead of the oracle's "
        "whole-state self-union — provably the same result (expanding a "
        "settled node can only rediscover neighbors at a larger "
        "distance, which min() discards), and the per-round join cost "
        "tracks |frontier| edges, not |reached|; at 100 TB the edge "
        "list is bucketed on src once, rounds checkpoint like "
        "q_pagerank, and the loop exits when the frontier empties."
    ),
)
def q_bfs_reach(spark: SparkSession, sf_dir: str):
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    cust = read_table(spark, sf_dir, "customer")
    edges0 = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = edges0.union(
        edges0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # r13: the keyed-relayout checkpoint (see q_pagerank's note) was
    # reverted here too — the per-round frontier join is AQE-broadcast at
    # driver scale, so the relayout bought nothing and cost an extra
    # materialization (SCALE_AB_R13OPT.json: 2.32 -> 3.24 s).
    edges = edges.localCheckpoint(eager=True)
    state = (
        cust.filter(F.col("c_nationkey") == _BFS_SEED_NATION)
        .select((F.col("c_custkey") * 2).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0))
    )
    frontier = state
    for i in range(1, _BFS_ROUNDS + 1):
        reached = (
            edges.join(
                frontier.withColumnRenamed("node", "src").select("src"), "src"
            )
            .select(F.col("dst").alias("node"), F.lit(i).alias("dist"))
            .distinct()
        )
        new_state = (
            state.unionByName(reached)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        # Frontier = nodes first reached THIS round; localCheckpoint cuts
        # the per-round lineage growth exactly as in q_pagerank.
        new_state = new_state.localCheckpoint(eager=True)
        frontier = new_state.filter(F.col("dist") == i)
        state = new_state
    return state.select("node", F.col("dist").cast("int").alias("dist"))


# ---------------------------------------------------------------------------
# Link prediction (X23 extension): score NON-edges of the customer projection
# graph by shared-neighbor evidence. Built on the STRONG-TIE projection —
# customer-supplier edges kept only at >= _LP_MIN_ORDERS distinct orders —
# which is what makes bipartite projection tractable at scale: the raw
# projection is quadratic in supplier degree (11.7M candidate pairs at
# sf0.01), while repeat-business ties thin with scale (406k pairs sf0.01,
# 70k sf0.1). The strength threshold is the declared sparsification knob.
# ---------------------------------------------------------------------------

_LP_MIN_ORDERS = 2  # strong-tie threshold for the bipartite projection
_LP_TOPK = 50


@query(
    "q_link_predict",
    oracle=f"""
    WITH e AS (
      SELECT o_custkey AS c, l_suppkey AS s
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY 1, 2 HAVING count(DISTINCT o_orderkey) >= {_LP_MIN_ORDERS}
    ), degc AS (
      SELECT c, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY 1
    ), degs AS (
      SELECT s, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY 1
    ), pairs AS (
      SELECT a.c AS cust_a, b.c AS cust_b,
             CAST(count(*) AS BIGINT) AS cn,
             CAST(sum(CAST(floor(1000000.0 / ln(ds.d)) AS BIGINT)) AS BIGINT)
               AS aa_micro
      FROM e a JOIN e b ON a.s = b.s AND a.c < b.c
      JOIN degs ds ON ds.s = a.s
      GROUP BY 1, 2
    )
    SELECT cust_a, cust_b, cn, aa_micro,
           CAST(cn * 1000000 // (da.d + db.d - cn) AS BIGINT) AS jac_ppm,
           da.d AS deg_a, db.d AS deg_b
    FROM pairs
    JOIN degc da ON da.c = pairs.cust_a
    JOIN degc db ON db.c = pairs.cust_b
    ORDER BY aa_micro DESC, cn DESC, cust_a, cust_b
    LIMIT {_LP_TOPK}
    """,
    doc=(
        "Link prediction over the strong-tie customer projection: rank "
        "customer pairs that share suppliers by Adamic-Adar (sum of "
        "1/ln(supplier degree) over shared suppliers), with common-"
        "neighbor count and Jaccard-over-degrees as companions — the "
        "classic who-should-trade-with-whom / recommendation scores. "
        "Pairs are generated SUPPLIER-LOCALLY: one aggregate collects "
        "each supplier's sorted strong customers, a row-local nested "
        "transform emits the i<j pairs carrying that supplier's "
        "pre-quantized AA term (the q_market_basket move — no self-join "
        "of the edge table, whose 10x-probe twin skewed 14x), then one "
        "pair aggregate sums EXACT int64 micro-AA terms (each term "
        "floor-quantized BEFORE summation, so the iterative-free FP is "
        "one ln per supplier, deterministic per row). The oracle keeps "
        "the readable self-join spec. Top-50 is a TakeOrdered over a "
        "fully deterministic (aa, cn, a, b) total order. At 100 TB the "
        "supplier-local expansion is bounded by the strong-tie degree "
        "(median 12 at sf0.1 and FALLING with scale); degree joins ride "
        "AQE, no forced broadcast (the q_triangle_count lesson)."
    ),
)
def q_link_predict(spark: SparkSession, sf_dir: str):
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    e = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .agg(F.count_distinct("o_orderkey").alias("w"))
        .filter(F.col("w") >= _LP_MIN_ORDERS)
        .select("c", "s")
    )
    degc = e.groupBy("c").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    # Supplier-local candidate generation: each supplier's sorted strong
    # customers + its pre-quantized Adamic-Adar contribution.
    supp = e.groupBy("s").agg(F.array_sort(F.collect_list("c")).alias("cs"))
    # Filter BEFORE the aa_term projection: a degree-1 supplier would put
    # ln(1)=0 in the divisor (inf -> ANSI overflow on the bigint cast).
    supp = supp.filter(F.size("cs") >= 2).select(
        "cs",
        F.floor(1000000.0 / F.log(F.size("cs").cast("double")))
        .cast("bigint")
        .alias("aa_term"),
    )
    pairs_arr = F.flatten(
        F.transform(
            F.col("cs"),
            lambda p, i: F.transform(
                F.slice(F.col("cs"), i + 2, F.size("cs")),
                lambda q: F.struct(p.alias("cust_a"), q.alias("cust_b")),
            ),
        )
    )
    pair = (
        supp.select(F.explode(pairs_arr).alias("pr"), "aa_term")
        .select("pr.cust_a", "pr.cust_b", "aa_term")
        .groupBy("cust_a", "cust_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cn"),
            F.sum("aa_term").cast("bigint").alias("aa_micro"),
        )
    )
    da = degc.select(F.col("c").alias("cust_a"), F.col("d").alias("deg_a"))
    db = degc.select(F.col("c").alias("cust_b"), F.col("d").alias("deg_b"))
    return (
        pair.join(da, "cust_a")
        .join(db, "cust_b")
        .select(
            "cust_a",
            "cust_b",
            "cn",
            "aa_micro",
            F.expr("CAST(cn * 1000000 div (deg_a + deg_b - cn) AS BIGINT)").alias(
                "jac_ppm"
            ),
            "deg_a",
            "deg_b",
        )
        .orderBy(
            F.col("aa_micro").desc(), F.col("cn").desc(), "cust_a", "cust_b"
        )
        .limit(_LP_TOPK)
    )


_KM_CENSOR_DAYS = 7  # users active within the last week are right-censored


@query(
    "q_kaplan_meier",
    oracle=f"""
    WITH spans AS (
      SELECT user_id,
             CAST(min(ts) AS DATE) AS first_day,
             CAST(max(ts) AS DATE) AS last_day
      FROM events GROUP BY user_id
    ), cut AS (
      SELECT CAST(max(ts) AS DATE) - {_KM_CENSOR_DAYS} AS censor_day FROM events
    ), durs AS (
      SELECT user_id,
             CAST(last_day - first_day AS BIGINT) AS dur,
             CASE WHEN last_day <= cut.censor_day THEN 1 ELSE 0 END AS died
      FROM spans CROSS JOIN cut
    ), byd AS (
      SELECT dur,
             CAST(sum(died) AS BIGINT) AS d,
             CAST(sum(1 - died) AS BIGINT) AS c
      FROM durs GROUP BY dur
    ), risk AS (
      SELECT dur, d, c,
             CAST(sum(d + c) OVER (ORDER BY dur DESC) AS BIGINT) AS n_risk
      FROM byd
    ), terms AS (
      SELECT dur, d, c, n_risk,
             CASE WHEN d = 0 THEN CAST(0 AS BIGINT)
                  WHEN n_risk > d THEN
                    CAST(floor(ln((n_risk - d) * 1.0 / n_risk) * 1000000.0)
                         AS BIGINT)
             END AS lterm,
             CASE WHEN d >= n_risk THEN 1 ELSE 0 END AS wipe
      FROM risk
    ), cum AS (
      SELECT dur, d, c, n_risk,
             sum(lterm) OVER (ORDER BY dur) AS cl,
             max(wipe) OVER (ORDER BY dur) AS wiped
      FROM terms
    )
    SELECT dur AS duration_days, n_risk, d AS n_events, c AS n_censored,
           CASE WHEN wiped = 1 THEN 0.0
                ELSE floor(exp(cl * 1.0 / 1000000.0) * 1000000.0 + 0.5)
                     / 1000000.0 END AS surv
    FROM cum
    """,
    doc=(
        "Kaplan-Meier survival curve for user lifetime (days between "
        "first and last event), right-censoring users still active in "
        "the final week — THE retention statistic naive churn averages "
        "get wrong, because censored users contribute to the at-risk "
        "denominator for as long as they are observed without being "
        "counted as churn. Per-duration death/censor counts come from "
        "one user-level aggregate; the at-risk counts are a DESC "
        "running sum and the survival product is exp of a running sum "
        "of per-duration ln terms, each floor-quantized to int64 "
        "micro-nats BEFORE the cumulative sum (exact integer "
        "accumulation; the d >= n_risk full-wipe time point zeroes the "
        "curve from there on, avoiding ln(0)). Scale shape: everything "
        "after the user aggregate operates on the |distinct durations| "
        "table — bounded by the observation window in DAYS (<=31 rows "
        "here, a few thousand at decade horizons), so its "
        "single-partition windows are bounded-size by construction."
    ),
)
def q_kaplan_meier(spark: SparkSession, sf_dir: str):
    e = read_table(spark, sf_dir, "events")
    spans = e.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("first_day"),
        F.max("ts").cast("date").alias("last_day"),
    )
    cut = e.agg(
        F.date_sub(F.max("ts").cast("date"), _KM_CENSOR_DAYS).alias("censor_day")
    )
    durs = spans.crossJoin(F.broadcast(cut)).select(
        F.datediff("last_day", "first_day").cast("bigint").alias("dur"),
        F.when(F.col("last_day") <= F.col("censor_day"), 1).otherwise(0).alias(
            "died"
        ),
    )
    byd = durs.groupBy("dur").agg(
        F.sum("died").cast("bigint").alias("d"),
        F.sum(1 - F.col("died")).cast("bigint").alias("c"),
    )
    wdesc = Window.orderBy(F.col("dur").desc()).rangeBetween(
        Window.unboundedPreceding, 0
    )
    risk = byd.withColumn(
        "n_risk", F.sum(F.col("d") + F.col("c")).over(wdesc).cast("bigint")
    )
    lterm = F.when(F.col("d") == 0, F.lit(0).cast("bigint")).when(
        F.col("n_risk") > F.col("d"),
        F.floor(
            F.log((F.col("n_risk") - F.col("d")) * 1.0 / F.col("n_risk"))
            * 1000000.0
        ).cast("bigint"),
    )
    terms = risk.select(
        "dur",
        "d",
        "c",
        "n_risk",
        lterm.alias("lterm"),
        F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0).alias("wipe"),
    )
    wasc = Window.orderBy("dur").rangeBetween(Window.unboundedPreceding, 0)
    cum = terms.select(
        "dur",
        "d",
        "c",
        "n_risk",
        F.sum("lterm").over(wasc).alias("cl"),
        F.max("wipe").over(wasc).alias("wiped"),
    )
    return cum.select(
        F.col("dur").alias("duration_days"),
        "n_risk",
        F.col("d").alias("n_events"),
        F.col("c").alias("n_censored"),
        F.when(F.col("wiped") == 1, F.lit(0.0))
        .otherwise(
            F.floor(F.exp(F.col("cl") * 1.0 / 1000000.0) * 1000000.0 + 0.5)
            / 1000000.0
        )
        .alias("surv"),
    )


@query(
    "q_ab_test",
    oracle="""
    WITH users AS (
      SELECT user_id, CAST(user_id % 2 AS INTEGER) AS variant,
             CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS conv
      FROM events GROUP BY user_id
    ), agg AS (
      SELECT CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
             CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(sum(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_b
      FROM users
    )
    SELECT n_a, conv_a, n_b, conv_b,
           floor(conv_a * 1.0 / n_a * 1000000.0 + 0.5) / 1000000.0 AS rate_a,
           floor(conv_b * 1.0 / n_b * 1000000.0 + 0.5) / 1000000.0 AS rate_b,
           CASE WHEN conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b THEN
             floor((conv_b * 1.0 / n_b - conv_a * 1.0 / n_a)
                   / sqrt(((conv_a + conv_b) * 1.0 / (n_a + n_b))
                          * (1.0 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                          * (1.0 / n_a + 1.0 / n_b))
                   * 1000000.0 + 0.5) / 1000000.0 END AS z,
           CASE WHEN conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b THEN
             abs((conv_b * 1.0 / n_b - conv_a * 1.0 / n_a)
                 / sqrt(((conv_a + conv_b) * 1.0 / (n_a + n_b))
                        * (1.0 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b))) > 1.96
           ELSE FALSE END AS significant
    FROM agg
    """,
    doc=(
        "Two-proportion A/B conversion z-test: deterministic 50/50 "
        "variant split on user_id parity, conversion = any purchase "
        "event, pooled-variance z statistic and the 95% significance "
        "verdict — the experimentation-readout complement of the drift "
        "family (q_chi_square tests mix shift, this tests a DESIGNED "
        "split). All counts are exact int64 from one user-level "
        "aggregate + one 4-way conditional rollup; the z expression is "
        "IDENTICAL FP both sides (divisions and one sqrt on exact-int-"
        "derived doubles), so even the boolean significance comparison "
        "agrees bit-for-bit. Scale shape: one user_id aggregate (the "
        "only data-sized exchange) collapsing to a 1-row report."
    ),
)
def q_ab_test(spark: SparkSession, sf_dir: str):
    e = read_table(spark, sf_dir, "events")
    users = e.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("conv")
    ).select((F.col("user_id") % 2).cast("int").alias("variant"), "conv")
    agg = users.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("variant") == 0, F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("conv_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("variant") == 1, F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("conv_b"),
    )
    ra = F.col("conv_a") * 1.0 / F.col("n_a")
    rb = F.col("conv_b") * 1.0 / F.col("n_b")
    pp = (F.col("conv_a") + F.col("conv_b")) * 1.0 / (F.col("n_a") + F.col("n_b"))
    z = (rb - ra) / F.sqrt(
        pp * (1.0 - pp) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    # A degenerate experiment (0% or 100% pooled conversion) has zero
    # pooled variance: z undefined (NULL), significance false — and the
    # guard must precede the expression or ANSI mode raises on the divide.
    ok = (
        (F.col("conv_a") + F.col("conv_b") > 0)
        & (F.col("conv_a") + F.col("conv_b") < F.col("n_a") + F.col("n_b"))
    )
    return agg.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        (F.floor(ra * 1000000.0 + 0.5) / 1000000.0).alias("rate_a"),
        (F.floor(rb * 1000000.0 + 0.5) / 1000000.0).alias("rate_b"),
        F.when(ok, F.floor(z * 1000000.0 + 0.5) / 1000000.0).alias("z"),
        F.when(ok, F.abs(z) > 1.96).otherwise(F.lit(False)).alias("significant"),
    )


#: Lateness histogram bucket edges (seconds). Lateness of an event =
#: how far the per-key event-time high-water mark had already advanced
#: past it when it arrived — the statistic that tells you what a
#: streaming watermark of W would DROP.
_LATE_BUCKETS = (60, 300, 3600)


@query(
    "q_late_data_audit",
    oracle=f"""
    WITH arr AS (
      SELECT event_type,
             CAST(epoch(ts) AS BIGINT) AS es,
             max(CAST(epoch(ts) AS BIGINT))
               OVER (PARTITION BY event_type ORDER BY event_id
                     ROWS UNBOUNDED PRECEDING) AS hwm
      FROM events
    ), lat AS (
      SELECT event_type, hwm - es AS late_s FROM arr
    )
    SELECT event_type,
           CASE WHEN late_s <= 0 THEN 'on_time'
                WHEN late_s <= {_LATE_BUCKETS[0]} THEN 'le_1m'
                WHEN late_s <= {_LATE_BUCKETS[1]} THEN 'le_5m'
                WHEN late_s <= {_LATE_BUCKETS[2]} THEN 'le_1h'
                ELSE 'gt_1h' END AS bucket,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(max(late_s) AS BIGINT) AS max_late_s
    FROM lat GROUP BY 1, 2
    """,
    doc=(
        "Event-time lateness audit per stream key: how far behind the "
        "key's running event-time high-water mark (arrival order = "
        "event_id, the ingest sequence) each event arrived, bucketed "
        "into the histogram that DIRECTLY answers 'what would a "
        "watermark of 1m/5m/1h drop?' — the tuning table for every "
        "withWatermark in the streaming layer (streaming/job.py), "
        "computed from the batch log instead of guessed. Exact integer "
        "seconds throughout. Shape: one window pass and the aggregate "
        "share a single event_type exchange; output is |keys| x 5 "
        "buckets regardless of corpus size. At 100 TB the arrival "
        "order is whatever ingest sequence column exists per partition "
        "— the audit never needs a global sort, only per-key order."
    ),
)
def q_late_data_audit(spark: SparkSession, sf_dir: str):
    e = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    late = e.select(
        "event_type",
        (F.max(ts_seconds("ts")).over(w) - ts_seconds("ts")).alias("late_s"),
    )
    bucket = (
        F.when(F.col("late_s") <= 0, F.lit("on_time"))
        .when(F.col("late_s") <= _LATE_BUCKETS[0], F.lit("le_1m"))
        .when(F.col("late_s") <= _LATE_BUCKETS[1], F.lit("le_5m"))
        .when(F.col("late_s") <= _LATE_BUCKETS[2], F.lit("le_1h"))
        .otherwise(F.lit("gt_1h"))
    )
    return late.groupBy("event_type", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("late_s").cast("bigint").alias("max_late_s"),
    )


#: Skew-audit report depth: the hottest keys surfaced, a constant.
_SKEW_TOP = 10


@query(
    "q_skew_audit",
    oracle=f"""
    WITH k AS (
      SELECT user_id, count(*) AS n FROM events GROUP BY user_id
    ), tot AS (
      SELECT sum(n) AS n_rows, count(*) AS n_keys FROM k
    ), top AS (
      SELECT user_id, n FROM k ORDER BY n DESC, user_id LIMIT {_SKEW_TOP}
    )
    SELECT user_id, CAST(n AS BIGINT) AS n,
           CAST(n * 1000000 // n_rows AS BIGINT) AS share_ppm,
           CAST(n * n_keys * 1000 // n_rows AS BIGINT) AS x_mean_milli,
           CAST(n_keys AS BIGINT) AS n_keys,
           CAST(n_rows AS BIGINT) AS n_rows
    FROM top CROSS JOIN tot
    """,
    doc=(
        "Operational key-skew audit: the hottest event keys with their "
        "exact corpus share (ppm) and hot-over-mean ratio (milli-x) — the "
        "table an engineer reads BEFORE picking a salting factor or "
        "blaming a straggler (every shuffle in this repo keys on "
        "something; this query tells you which keys will own the slow "
        "tasks). Scale shape: one partial-aggregated groupBy to per-key "
        "counts, then orderBy+limit — Spark's TakeOrdered, a per-partition "
        "top-k plus a driver merge of bounded candidate sets, NEVER a "
        "global sort or a rank window over the key table — and a 1-row "
        "broadcast total. Integer-exact shares via BIGINT ppm division."
    ),
)
def q_skew_audit(spark: SparkSession, sf_dir: str):
    e = read_table(spark, sf_dir, "events")
    k = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    tot = k.agg(
        F.sum("n").alias("n_rows"), F.count(F.lit(1)).alias("n_keys")
    )
    top = k.orderBy(F.col("n").desc(), "user_id").limit(_SKEW_TOP)
    return top.join(F.broadcast(tot)).select(
        "user_id",
        F.col("n").cast("bigint").alias("n"),
        F.expr("CAST(n * 1000000 div n_rows AS BIGINT)").alias("share_ppm"),
        F.expr("CAST(n * n_keys * 1000 div n_rows AS BIGINT)").alias(
            "x_mean_milli"
        ),
        F.col("n_keys").cast("bigint").alias("n_keys"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
    )


#: WOE binning: fixed-width value bins (the q_psi move — no global
#: quantile pass) and Laplace smoothing so empty cells stay finite. The
#: smoothed proportions are (2n+1)/(2N+2k) written as pure-integer
#: numerators/denominators so both engines feed ln() the identical double.
_WOE_BIN_W = 50.0
_WOE_BINS = 10


@query(
    "q_woe_iv",
    oracle=f"""
    WITH labeled AS (
      SELECT least(CAST(floor(value / {_WOE_BIN_W}) AS BIGINT), {_WOE_BINS - 1}) AS bin,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      FROM events
    ), cells AS (
      SELECT bin,
             sum(pos) AS n_good,
             sum(1 - pos) AS n_bad
      FROM labeled GROUP BY bin
    ), tot AS (
      SELECT sum(n_good) AS g_tot, sum(n_bad) AS b_tot FROM cells
    )
    SELECT bin,
           CAST(n_good AS BIGINT) AS n_good,
           CAST(n_bad AS BIGINT)  AS n_bad,
           CAST(floor(ln(((2 * n_good + 1) * 1.0 / (2 * g_tot + {2 * _WOE_BINS}))
                         / ((2 * n_bad + 1) * 1.0 / (2 * b_tot + {2 * _WOE_BINS})))
                      * 1000000.0 + 0.5) AS BIGINT) AS woe_micro,
           CAST(floor((((2 * n_good + 1) * 1.0 / (2 * g_tot + {2 * _WOE_BINS}))
                       - ((2 * n_bad + 1) * 1.0 / (2 * b_tot + {2 * _WOE_BINS})))
                      * ln(((2 * n_good + 1) * 1.0 / (2 * g_tot + {2 * _WOE_BINS}))
                           / ((2 * n_bad + 1) * 1.0 / (2 * b_tot + {2 * _WOE_BINS})))
                      * 1000000.0 + 0.5) AS BIGINT) AS iv_term_micro
    FROM cells CROSS JOIN tot
    """,
    doc=(
        "Weight-of-evidence / information-value table for the purchase "
        "label over fixed-width value bins — the classic credit-scoring / "
        "feature-screening statistic (IV = sum of per-bin terms; rule of "
        "thumb: <0.02 useless, >0.3 strong). Fixed-width bins, not "
        "quantiles (the q_psi discipline: no global sort); Laplace-"
        "smoothed proportions (2n+1)/(2N+2k) keep empty bins finite and "
        "are written as integer-ratio expressions TEXTUALLY identical in "
        "both engines before the single ln(), so the micro-quantized "
        "outputs hash-match (the q_mutual_info precedent). Shape: one "
        "partial-aggregated groupBy to <=10 cells + a 1-row broadcast "
        "total; per-bin terms emitted, never a cross-cell FP sum."
    ),
)
def q_woe_iv(spark: SparkSession, sf_dir: str):
    e = read_table(spark, sf_dir, "events")
    labeled = e.select(
        F.least(
            F.floor(F.col("value") / _WOE_BIN_W).cast("bigint"),
            F.lit(_WOE_BINS - 1),
        ).alias("bin"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
    )
    cells = labeled.groupBy("bin").agg(
        F.sum("pos").alias("n_good"), F.sum(1 - F.col("pos")).alias("n_bad")
    )
    tot = cells.agg(
        F.sum("n_good").alias("g_tot"), F.sum("n_bad").alias("b_tot")
    )
    k2 = 2 * _WOE_BINS
    pg = (2 * F.col("n_good") + 1) * 1.0 / (2 * F.col("g_tot") + k2)
    pb = (2 * F.col("n_bad") + 1) * 1.0 / (2 * F.col("b_tot") + k2)
    woe = F.log(pg / pb)
    return cells.join(F.broadcast(tot)).select(
        "bin",
        F.col("n_good").cast("bigint").alias("n_good"),
        F.col("n_bad").cast("bigint").alias("n_bad"),
        F.floor(woe * 1000000.0 + 0.5).cast("bigint").alias("woe_micro"),
        F.floor((pg - pb) * woe * 1000000.0 + 0.5)
        .cast("bigint")
        .alias("iv_term_micro"),
    )


#: Entity-resolution knobs: blocking key = first two words of p_name
#: (bounded combination vocabulary), sorted-neighborhood window in rank
#: units, match threshold in edit-distance units. Both engines'
#: levenshtein agree exactly (verified on boundary cases incl. empty
#: strings).
_ER_MAX_DIST = 8
_ER_WINDOW = 8


@query(
    "q_entity_match",
    oracle=f"""
    WITH p AS (
      SELECT p_partkey,
             p_name,
             split_part(p_name, ' ', 1) || ' ' || split_part(p_name, ' ', 2)
               AS blk
      FROM part
    ), ranked AS (
      SELECT p_partkey, p_name, blk,
             row_number() OVER (PARTITION BY blk
                                ORDER BY p_name, p_partkey) AS rn
      FROM p
    )
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM ranked a JOIN ranked b
      ON a.blk = b.blk AND b.rn - a.rn BETWEEN 1 AND {_ER_WINDOW}
    WHERE levenshtein(a.p_name, b.p_name) <= {_ER_MAX_DIST}
    """,
    doc=(
        "Entity resolution (record linkage) over part names: BLOCKING "
        "(first two name words) composed with the SORTED-NEIGHBORHOOD "
        "method (Hernandez & Stolfo 1995) — inside a block, records sort "
        "by name and each compares only to its next w=8 sort neighbors, "
        "then survive an edit-distance gate. Blocking alone is "
        "sum-of-squared-block-sizes, which grew quadratically in the 10x "
        "probe (48.8x wall — blocks scale with the corpus); the sorted "
        "window makes candidate generation EXACTLY linear (block_size x "
        "w pairs) at the standard recall tradeoff: matches whose names "
        "sort more than w apart inside a block are missed, the knob "
        "every SN deployment tunes. Spark side uses the bounded "
        "levenshtein (early-exit above the threshold, exact at/below it "
        "— identical to DuckDB's unbounded value under the filter) and "
        "evaluates JVM-side, no UDF. The rank window and the self-join "
        "ride the same block-key exchange."
    ),
)
def q_entity_match(spark: SparkSession, sf_dir: str):
    part = read_table(spark, sf_dir, "part")
    words = F.split(F.col("p_name"), " ")
    # F.get (0-based) returns NULL past the end instead of ANSI-throwing
    # like element_at, and the coalesce-to-'' makes a single-word name
    # block as "word " — exactly DuckDB's split_part || ' ' || '' (the
    # TPC-H fixture always has 5-word names; this is corpus-robustness).
    p = part.select(
        "p_partkey",
        "p_name",
        F.concat(
            F.get(words, 0), F.lit(" "), F.coalesce(F.get(words, 1), F.lit(""))
        ).alias("blk"),
    )
    # EXPLICIT-count hash repartition on the block key: the name table is
    # small in BYTES, so AQE coalesces its shuffle to ONE partition and
    # the CPU-bound stages downstream ran serially (probe: 33 s in a
    # single task). A user-specified numPartitions survives AQE and the
    # rank WINDOW reuses this partitioning directly. The (blk, rn)
    # equi-join below plans its own exchange on the composite key;
    # measured at the 10x/30x probes it stays spread (max task 1.25 s of
    # 2.19 s wall at 30x) — if a future Spark version re-serializes it,
    # the fix is the same explicit-count move on (blk, rn)
    # (the q_bootstrap_ci lesson, join-input edition).
    from ..operators.scale import configured_shuffle_partitions

    p = p.repartition(configured_shuffle_partitions(spark), "blk")
    wb = Window.partitionBy("blk").orderBy("p_name", "p_partkey")
    ranked = p.withColumn("rn", F.row_number().over(wb))
    # EQUI-join on (blk, exact neighbor rank), not a blk join with a rank
    # BETWEEN filter: the latter still ENUMERATES all block^2 pairs and
    # only then filters (the 30x probe measured 70x wall — pair count
    # grows with block^2 even though survivors are linear). Exploding
    # each record to its next w rank slots makes generation EXACTLY
    # w x N: each exploded row meets at most one partner. Row_numbers
    # are dense per block, so (blk, rn_a + j) == (blk, rn_b) reproduces
    # b.rn - a.rn BETWEEN 1 AND w verbatim — the oracle keeps the
    # BETWEEN form (DuckDB's cost at oracle scale is irrelevant).
    a = ranked.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        "blk",
        F.explode(
            F.array(*[F.col("rn") + F.lit(j) for j in range(1, _ER_WINDOW + 1)])
        ).alias("rn"),
    )
    b = ranked.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
        "blk",
        "rn",
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"), _ER_MAX_DIST)
    return (
        a.join(b, ["blk", "rn"])
        .withColumn("dist", dist.cast("bigint"))
        .filter((F.col("dist") >= 0) & (F.col("dist") <= _ER_MAX_DIST))
        .select("key_a", "key_b", "dist")
    )
