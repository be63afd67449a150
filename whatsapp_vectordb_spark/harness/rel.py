"""Relational (TPC-H-shaped) queries.

Split out of the monolithic harness.py (registration order preserved
within each family; see harness/__init__.py for the module order).
"""
from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from whatsapp_vectordb_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    euclidean_distance,
    l2_norm,
)
from whatsapp_vectordb_spark.operators.search import topk, topk_batched

from whatsapp_vectordb_spark.harness._core import _events, _register, _t  # noqa: E501



# ==========================================================================
# Relational surface over the TPC-H-ish star schema — green-field per
# SURVEY.md §2.10 (the reference has no joins/aggregations): demonstrates
# scan→filter→partial agg, broadcast joins, and per-group top-k at scale.
# ==========================================================================


@_register(
    "rel_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def rel_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


@_register(
    "rel_top_customers",
    """
SELECT c_custkey, c_name,
       ROUND(SUM(o_totalprice), 2) AS revenue,
       COUNT(*) AS n_orders
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
)
def rel_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@_register(
    "rel_nation_revenue",
    """
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
""",
)
def rel_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


# ==========================================================================
# Per-group top-k over the relational schema (window rank — the grouped
# twin of the global TakeOrderedAndProject top-k).
# ==========================================================================


@_register(
    "rel_orders_topk_per_cust",
    """
SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS price, CAST(rn AS INTEGER) AS rank
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 3
""",
)
def rel_orders_topk_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            "rank",
        )
    )


# ==========================================================================
# Relational coverage: rollup, distinct aggregate, running (cumulative)
# window sum — green-field per SURVEY.md §2.10.
# ==========================================================================


@_register(
    "rel_revenue_rollup",
    """
SELECT n_name, o_orderpriority,
       ROUND(SUM(o_totalprice), 2) AS revenue,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY ROLLUP(n_name, o_orderpriority)
""",
)
def rel_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .rollup("n_name", "o_orderpriority")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


@_register(
    "rel_distinct_customers",
    """
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_orderpriority
""",
)
def rel_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


@_register(
    "rel_running_revenue",
    """
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey), 2) AS running_rev
FROM orders
""",
)
def rel_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_rev"),
    )


@_register(
    "rel_price_quantiles",
    """
SELECT o_orderpriority,
       ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
       ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75
FROM orders GROUP BY o_orderpriority
""",
)
def rel_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(o_totalprice, 0.50)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.75)"), 4).alias("p75"),
    )


# Skew-mitigation tools in the gate: both are result-identical to the
# vanilla plan (the oracle runs the vanilla SQL) — salting changes HOW
# the shuffle distributes hot keys, never WHAT comes out.
@_register(
    "rel_salted_join_counts",
    """
SELECT c.c_mktsegment, e.event_type, COUNT(*) AS n_events
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
""",
)
def rel_salted_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fact side gets a deterministic row salt, the dim side is
    replicated S×, the join key becomes (key, salt) — a known-hot user id
    spreads over S tasks instead of pinning one. Disable-broadcast is
    forced so the salted shuffle path actually executes here."""
    from whatsapp_vectordb_spark.functions.skew import salted_join

    ev = _events(spark, sf_dir).select(
        F.col("user_id").alias("c_custkey"), "event_type"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = salted_join(ev, cust, on="c_custkey", n_salts=8)
        return joined.groupBy("c_mktsegment", "event_type").agg(
            F.count("*").alias("n_events")
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


@_register(
    "rel_salted_distinct_users",
    """
SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct_user_id
FROM events GROUP BY 1
""",
)
def rel_salted_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-key COUNT(DISTINCT) without a single reducer owning a
    hot key: dedupe under (key, hash(value) % S), then sum the disjoint
    per-salt partials."""
    from whatsapp_vectordb_spark.functions.skew import salted_distinct_count

    ev = _events(spark, sf_dir).select("event_type", "user_id")
    return salted_distinct_count(ev, "event_type", "user_id", n_salts=8)


@_register(
    "rel_set_ops",
    """
WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'),
     y96 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
SELECT 'both' AS tag, o_custkey FROM (SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y96)
UNION ALL
SELECT 'only_1995' AS tag, o_custkey FROM (SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96)
""",
)
def rel_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")

    def year_custs(y: int):
        return (
            orders.where(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )

    y95, y96 = year_custs(1995), year_custs(1996)
    both = y95.intersect(y96).select(F.lit("both").alias("tag"), "o_custkey")
    only95 = y95.exceptAll(y96).select(F.lit("only_1995").alias("tag"), "o_custkey")
    return both.unionByName(only95)


# ==========================================================================
# Round 3: explicit Bloom-pruned join (operators/bloom.py) — the runtime
# row-level-filter primitive made engine-portable: md5-derived positions,
# 32-bit words in int64, identical bitmap in both engines.
# ==========================================================================


@_register(
    "rel_salted_join",
    """
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
""",
)
def rel_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-mitigation join under the correctness gate: salted_join
    (functions/skew.py — left side salted by xxhash64 of the full row,
    right side replicated 16×) must be RESULT-IDENTICAL to the plain
    equi-join the oracle runs. Stress evidence (1.8× on a 50%-hot key at
    16M rows, checksum-verified) lives in tools/stress_skew.py; this
    entry pins the equivalence per-round at sf gate scale."""
    from whatsapp_vectordb_spark.functions.skew import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        # quantize to cents MAP-SIDE: the sum is an exact BIGINT, immune
        # to double summation order (which the salt would perturb)
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("_cents"),
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    j = salted_join(li, orders, "o_orderkey")
    return j.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum("_cents").cast("long").alias("revenue_cents"),
    )



@_register(
    "rel_bloom_pruned_join",
    """
WITH keys AS (
  SELECT DISTINCT o_orderkey AS kk FROM orders WHERE o_orderpriority = '1-URGENT'
),
pos AS (
  SELECT kk, (('0x' || substr(md5(kk::VARCHAR), 1, 15))::BIGINT >> (15 * i.i)) % 32768 AS p
  FROM keys CROSS JOIN range(0, 4) i(i)
),
bits AS (
  SELECT p // 32 AS word, bit_or(1::BIGINT << CAST(p % 32 AS INTEGER)) AS bits
  FROM pos GROUP BY 1
),
dkeys AS (SELECT DISTINCT l_orderkey AS lk FROM lineitem),
ppos AS (
  SELECT lk, (('0x' || substr(md5(lk::VARCHAR), 1, 15))::BIGINT >> (15 * i.i)) % 32768 AS p
  FROM dkeys CROSS JOIN range(0, 4) i(i)
),
pass_keys AS (
  SELECT pp.lk
  FROM ppos pp JOIN bits b ON pp.p // 32 = b.word
  WHERE (b.bits & (1::BIGINT << CAST(pp.p % 32 AS INTEGER))) <> 0
  GROUP BY pp.lk HAVING COUNT(*) = 4
)
SELECT (SELECT COUNT(*) FROM lineitem) AS n_rows,
       (SELECT COUNT(*) FROM lineitem l JOIN pass_keys pk ON l.l_orderkey = pk.lk) AS n_passed,
       (SELECT COUNT(*) FROM lineitem l JOIN keys k ON l.l_orderkey = k.kk) AS n_true
""",
)
def rel_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-side pruning with an explicit portable Bloom filter: build the
    bitmap over urgent orders' keys (a KB-scale aggregate), inline it as a
    literal, and count how many lineitem rows pass the map-only filter vs
    how many truly join. The pass count is deterministic (md5 positions),
    so the false-positive behavior itself is hash-checked."""
    from whatsapp_vectordb_spark.operators.bloom import bloom_might_contain, bloom_words

    # ONE pass over the fact side: the bloom predicate rides as a PROJECTED
    # flag (a filter would be pushed below the spreading repartition and
    # evaluate in the single scan task of a one-row-group file — measured
    # 4× slower), the true-join flag as a broadcast left join, and all
    # three counts fold into a single aggregate — no crossJoins, no
    # re-scans. (At real scale inputs arrive in thousands of splits and
    # the spread is moot; the one-pass shape still wins.)
    li = _t(spark, sf_dir, "lineitem").repartition(
        spark.sparkContext.defaultParallelism
    )
    orders = _t(spark, sf_dir, "orders")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
    words = [
        (r["word"], r["bits"]) for r in bloom_words(urgent, "o_orderkey").collect()
    ]
    truekeys = urgent.select("o_orderkey").dropDuplicates().withColumn(
        "_true", F.lit(1)
    )
    flagged = li.join(
        F.broadcast(truekeys), li["l_orderkey"] == truekeys["o_orderkey"], "left"
    ).select(
        bloom_might_contain(words, F.col("l_orderkey")).alias("_pass"),
        F.col("_true"),
    )
    return flagged.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("_pass"), 1).otherwise(0)).alias("n_passed"),
        F.count(F.col("_true")).alias("n_true"),
    )


@_register(
    "customer_scd2_versions",
    """
WITH chg AS (
  SELECT c_custkey, 'SEG_A' AS c_mktsegment, 1 AS eff_seq
  FROM customer WHERE c_custkey % 5 = 0
  UNION ALL
  SELECT c_custkey, 'SEG_B', 2 FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT c_custkey, 'SEG_B', 3 FROM customer WHERE c_custkey % 20 = 0
),
v AS (
  SELECT c_custkey, c_mktsegment, CAST(0 AS BIGINT) AS eff_seq FROM customer
  UNION ALL
  SELECT c_custkey, c_mktsegment, CAST(eff_seq AS BIGINT) FROM chg
),
d AS (
  SELECT *, lag(c_mktsegment) OVER (PARTITION BY c_custkey ORDER BY eff_seq) AS prev
  FROM v
),
kept AS (
  SELECT c_custkey, c_mktsegment, eff_seq FROM d
  WHERE prev IS NULL OR prev <> c_mktsegment
)
SELECT c_custkey, c_mktsegment,
       eff_seq AS valid_from_seq,
       lead(eff_seq) OVER (PARTITION BY c_custkey ORDER BY eff_seq) AS valid_to_seq
FROM kept
""",
)
def customer_scd2_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 merge: fold a 3-step deterministic change batch into a
    validity-interval history of customer segments. No-op changes collapse
    (seq-3 re-asserts seq-2's value → no new version). One shuffle by key
    (operators/curate.py scd2_apply)."""
    from whatsapp_vectordb_spark.operators.curate import scd2_apply

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    k = F.col("c_custkey")
    changes = (
        cust.where(k % 5 == 0).select(k.alias("c_custkey"), F.lit("SEG_A").alias("c_mktsegment"), F.lit(1).alias("eff_seq"))
        .unionByName(cust.where(k % 10 == 0).select(k.alias("c_custkey"), F.lit("SEG_B").alias("c_mktsegment"), F.lit(2).alias("eff_seq")))
        .unionByName(cust.where(k % 20 == 0).select(k.alias("c_custkey"), F.lit("SEG_B").alias("c_mktsegment"), F.lit(3).alias("eff_seq")))
    )
    return scd2_apply(cust, changes, "c_custkey", ["c_mktsegment"])


@_register(
    "rel_scd2_point_in_time",
    """
WITH chg AS (
  SELECT c_custkey, 'SEG_A' AS c_mktsegment, 1 AS eff_seq
  FROM customer WHERE c_custkey % 5 = 0
  UNION ALL
  SELECT c_custkey, 'SEG_B', 2 FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT c_custkey, 'SEG_B', 3 FROM customer WHERE c_custkey % 20 = 0
),
v AS (
  SELECT c_custkey, c_mktsegment, CAST(0 AS BIGINT) AS eff_seq FROM customer
  UNION ALL
  SELECT c_custkey, c_mktsegment, CAST(eff_seq AS BIGINT) FROM chg
),
d AS (
  SELECT *, lag(c_mktsegment) OVER (PARTITION BY c_custkey ORDER BY eff_seq) AS prev
  FROM v
),
kept AS (
  SELECT c_custkey, c_mktsegment, eff_seq FROM d
  WHERE prev IS NULL OR prev <> c_mktsegment
),
hist AS (
  SELECT c_custkey, c_mktsegment,
         eff_seq AS valid_from_seq,
         lead(eff_seq) OVER (PARTITION BY c_custkey ORDER BY eff_seq) AS valid_to_seq
  FROM kept
),
o AS (SELECT o_orderkey, o_custkey, o_orderkey % 4 AS as_of_seq FROM orders)
SELECT o.as_of_seq, h.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(o.o_orderkey) AS BIGINT) AS orderkey_checksum
FROM o
JOIN hist h ON h.c_custkey = o.o_custkey
 AND h.valid_from_seq <= o.as_of_seq
 AND (h.valid_to_seq IS NULL OR o.as_of_seq < h.valid_to_seq)
GROUP BY o.as_of_seq, h.c_mktsegment
""",
)
def rel_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (time-travel) join against the SCD2 history: each
    order reads the customer version valid AT its as-of sequence — the
    query every versioned dimension exists to answer. Equi-join on the
    customer key plus an interval filter over that key's ≤4 versions;
    one shuffle, no range-join blow-up."""
    from whatsapp_vectordb_spark.operators.curate import scd2_apply

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    k = F.col("c_custkey")
    changes = (
        cust.where(k % 5 == 0).select(k.alias("c_custkey"), F.lit("SEG_A").alias("c_mktsegment"), F.lit(1).alias("eff_seq"))
        .unionByName(cust.where(k % 10 == 0).select(k.alias("c_custkey"), F.lit("SEG_B").alias("c_mktsegment"), F.lit(2).alias("eff_seq")))
        .unionByName(cust.where(k % 20 == 0).select(k.alias("c_custkey"), F.lit("SEG_B").alias("c_mktsegment"), F.lit(3).alias("eff_seq")))
    )
    hist = scd2_apply(cust, changes, "c_custkey", ["c_mktsegment"])
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.pmod("o_orderkey", F.lit(4)).alias("as_of_seq")
    )
    j = orders.join(hist, orders.o_custkey == hist.c_custkey).where(
        (F.col("valid_from_seq") <= F.col("as_of_seq"))
        & (F.col("valid_to_seq").isNull() | (F.col("as_of_seq") < F.col("valid_to_seq")))
    )
    return j.groupBy("as_of_seq", "c_mktsegment").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum("o_orderkey").cast("long").alias("orderkey_checksum"),
    )


@_register(
    "rel_priority_shipping",
    """
SELECT l.l_returnflag,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l.l_returnflag
""",
)
def rel_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape on this schema: per return flag, urgent-vs-other
    order counts for lineitems shipped in one year — the conditional
    aggregate over a fact-fact join. The shipdate predicate pushes to
    the lineitem scan (a year of a 7-year span prunes ~6/7 of rows
    before the join); the join shuffles on orderkey with AQE free to
    pick broadcast at small SF."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )
