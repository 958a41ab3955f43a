"""Relational query plans over the driver testdata tables.

Each query exists twice with identical column names and rounding:
a Spark DataFrame callable (spark, sf_dir) -> DataFrame, and an ANSI-SQL
oracle string for DuckDB. These cover the reference's relational-operator
surface (SURVEY.md §2.H): equi-joins (evaluator GT<->pred id-join,
reference: calamari_ocr/ocr/evaluator.py:239-249), aggregations (evaluator
totals, evaluator.py:167-203), distinct (codec charset, codec.py:65-106),
windows (fold assignment base.py:101-107; lag page-flush
pagexml/reader.py:425-429), sorts/limits/top-k (scripts/eval.py:17-49),
and set ops (cross_fold.py:94-109).

Scale notes are inline per query: which side broadcasts, where the
shuffle lands, what AQE handles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from calamari_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# TPC-H-style aggregations & joins
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregation with map-side partial aggregation; one shuffle on
    the (tiny-cardinality) group keys. Filter pushes to parquet scan."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                AS sum_qty,
       round(sum(l_extendedprice), 2)                           AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)        AS sum_disc_price,
       round(avg(l_quantity), 4)                                AS avg_qty,
       round(avg(l_discount), 4)                                AS avg_disc,
       count(*)                                                 AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer (small) broadcasts into orders; orders⋈lineitem shuffles on
    orderkey. Top-k is a partial top-k per partition then merge (Spark
    TakeOrderedAndProject)."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("c_mktsegment") == "BUILDING")
        .filter(F.col("o_orderdate") < F.lit("1998-03-15"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: all dims broadcast (region/nation/customer/supplier are
    tiny at every SF); the only shuffle is the final groupBy on n_name."""
    region = load_table(spark, "region", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_SQL = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q_top_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k over a join-agg (reference analog: top-N confusions,
    scripts/eval.py:17-34)."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    return (
        li.groupBy("l_partkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .select("p_name", "p_brand", "total_qty")
        .orderBy(F.desc("total_qty"), "p_name")
        .limit(25)
    )


Q_TOP_PARTS_SQL = """
SELECT p_name, p_brand, total_qty FROM (
  SELECT l_partkey, round(sum(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY l_partkey
) j JOIN part ON l_partkey = p_partkey
ORDER BY total_qty DESC, p_name
LIMIT 25
"""


def q_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi + left-anti joins (reference analog: evaluator
    non_existing_pred handling modes, evaluator.py:219-237;
    keep_files_with_same_file_name, file.py:73)."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).select("o_custkey")
    with_orders = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
    without = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
    return (
        with_orders.select(F.lit("with_orders").alias("bucket"), "c_custkey")
        .union(without.select(F.lit("without_orders").alias("bucket"), "c_custkey"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_customers"), F.min("c_custkey").alias("min_key"))
        .orderBy("bucket")
    )


Q_SEMI_ANTI_SQL = """
WITH w AS (SELECT 'with_orders' AS bucket, c_custkey FROM customer
           WHERE c_custkey IN (SELECT o_custkey FROM orders)),
     wo AS (SELECT 'without_orders' AS bucket, c_custkey FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders))
SELECT bucket, count(*) AS n_customers, min(c_custkey) AS min_key
FROM (SELECT * FROM w UNION ALL SELECT * FROM wo)
GROUP BY bucket ORDER BY bucket
"""


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union / except (reference analog: cross-fold train = all folds
    except i, cross_fold.py:94-109; codec extend/shrink codec.py:195-283)."""
    orders = load_table(spark, "orders", sf_dir)
    a = orders.filter(F.col("o_orderdate") < F.lit("1998-01-01")).select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return (
        a.intersect(b).select(F.lit("both").alias("grp"), "o_custkey")
        .union(a.exceptAll(b).dropDuplicates().select(F.lit("only_early").alias("grp"), "o_custkey"))
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.min("o_custkey").alias("min_key"))
        .orderBy("grp")
    )


Q_SET_OPS_SQL = """
WITH a AS (SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
     b AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
     ib AS (SELECT 'both' AS grp, o_custkey FROM (SELECT DISTINCT o_custkey FROM a INTERSECT SELECT DISTINCT o_custkey FROM b)),
     oe AS (SELECT 'only_early' AS grp, o_custkey FROM (SELECT DISTINCT o_custkey FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)))
SELECT grp, count(*) AS n, min(o_custkey) AS min_key
FROM (SELECT * FROM ib UNION ALL SELECT * FROM oe)
GROUP BY grp ORDER BY grp
"""


def q_cube_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (reference analog: per-fold + overall evaluation,
    predict_and_eval.py:129-131)."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
        .orderBy("l_returnflag", "l_linestatus")
    )


Q_CUBE_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""


def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native pivot: order totals per priority, one column per order
    status. Pivot with explicit values is a single partial-aggregated
    shuffle (no second pass to discover the pivot domain) — always pass
    the value list at 100 TB."""
    orders = load_table(spark, "orders", sf_dir)
    out = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.round(F.sum("o_totalprice"), 2))
        .orderBy("o_orderpriority")
    )
    return out.select(
        "o_orderpriority",
        F.col("F").alias("total_f"),
        F.col("O").alias("total_o"),
        F.col("P").alias("total_p"),
    )


Q_PIVOT_SQL = """
SELECT o_orderpriority,
       round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS total_f,
       round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS total_o,
       round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS total_p
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------

def q_fold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based fold assignment (reference: base.py:101-107,
    cross_fold.py:70-73 shuffles randomly). fold = md5(seed || doc_id)
    prefix mod k: a pure per-row map — no global window, no shuffle before
    the final tiny groupBy — and stable under Spark task retries, so it
    holds at any scale (the round-1 row_number() variant forced every row
    through one task)."""
    docs = load_table(spark, "documents", sf_dir)
    hex8 = F.substring(F.md5(F.concat(F.lit("fold:"), F.col("doc_id").cast("string"))), 1, 8)
    fold = F.pmod(F.conv(hex8, 16, 10).cast("long"), F.lit(5)).cast("int")
    return (
        docs.select("doc_id")
        .withColumn("fold_id", fold)
        .groupBy("fold_id")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_doc"))
        .orderBy("fold_id")
    )


Q_FOLD_SQL = """
SELECT fold_id, count(*) AS n_docs, min(doc_id) AS first_doc
FROM (SELECT doc_id,
             CAST(CAST('0x' || substring(md5('fold:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 5 AS INTEGER) AS fold_id
      FROM documents)
GROUP BY fold_id ORDER BY fold_id
"""


def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum per user ordered by time (reference analog: sequential
    page store / neighbor extents lag-lead, pagexml/reader.py:425-429,
    predict/params.py:106-115). One shuffle on user_id."""
    ev = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("running_value", F.round(F.sum("value").over(w), 2))
        .select("event_id", "user_id", "running_value")
        .filter(F.col("event_id") % 97 == 0)
        .orderBy("event_id")
    )


Q_RUNNING_SQL = """
SELECT event_id, user_id, running_value FROM (
  SELECT event_id, user_id,
         round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
  FROM events
) WHERE event_id % 97 = 0 ORDER BY event_id
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session counting via lag(): a new session when the gap > 30 min
    (the lag-based page-flush pattern, pagexml/reader.py:425-429)."""
    ev = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    return (
        ev.withColumn("new_session", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .groupBy("user_id")
        .agg(F.sum("new_session").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
        .orderBy("user_id")
    )


Q_SESSIONIZE_SQL = """
SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
FROM (
  SELECT user_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
) GROUP BY user_id ORDER BY user_id
"""


def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed aggregation — the batch shape of the
    Structured Streaming job in calamari_spark.streaming."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy("window_start", "event_type")
    )


Q_TUMBLING_SQL = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n, round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2 ORDER BY 1, 2
"""


RELATIONAL_QUERIES = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "q5_nation_revenue": (q5_nation_revenue, Q5_SQL),
    "q_top_parts": (q_top_parts, Q_TOP_PARTS_SQL),
    "q_semi_anti": (q_semi_anti, Q_SEMI_ANTI_SQL),
    "q_set_ops": (q_set_ops, Q_SET_OPS_SQL),
    "q_cube_status": (q_cube_status, Q_CUBE_SQL),
    "q_pivot_status": (q_pivot_status, Q_PIVOT_SQL),
    "q_fold_assign": (q_fold_assign, Q_FOLD_SQL),
    "q_running_total": (q_running_total, Q_RUNNING_SQL),
    "q_sessionize": (q_sessionize, Q_SESSIONIZE_SQL),
    "q_events_tumbling": (q_events_tumbling, Q_TUMBLING_SQL),
}
