"""Relational query layer over the TPC-H-ish tables (SURVEY.md §2B).

The reference implements no relational algebra — these queries document
that every standard category is covered by Spark built-ins, and give
the driver's DuckDB oracle a surface to check: scan+filter+project,
inner/semi/anti joins (broadcast where the dim side is small),
aggregation, ranking and analytic windows, sort/limit/top-k, set ops,
rollup/grouping sets, and scalar string/date/JSON functions.

Determinism rules applied throughout (the driver hash-compares values):
- top-k sorts always carry a unique integer tiebreak column;
- sums whose true value sits on a 2/4-decimal grid are rounded (4 dp);
  averages (and any 6-decimal-grid sums) use exact integer cent/micro
  arithmetic with a floor-truncated quotient — see whisper_queries
  for the boundary analysis; raw column values pass through un-rounded;
- ``count``/``row_number`` outputs are cast to matching integer types.

Scale notes: dimension joins (region/nation/customer) are explicit
``F.broadcast``; fact-fact joins shuffle on their natural keys; every
aggregate is a partial-aggregating hash aggregate. At 100 TB the same
plans hold — the broadcast dims stay tiny, and AQE handles skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_whisper_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ------------------------------------------------------------ r_q1_pricing
def r_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter pushdown + wide hash aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    # Averages and the 6-decimal charge sum use exact integer (cent /
    # micro-unit) arithmetic: all inputs are exact 2-decimal numbers, so
    # true averages land exactly on round() boundaries whenever the
    # group count is 2^a*5^b and the engines' ulp-different double sums
    # round apart.  Grid-aligned 2/4-decimal sums keep plain round().
    charge_micro = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")) * 1_000_000
    ).cast("long")
    agged = (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.sum(charge_micro).alias("charge_micro"),
            F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("qty_c"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("price_c"),
            F.sum(F.round(F.col("l_discount") * 100).cast("long")).alias("disc_c"),
            F.count("*").alias("count_order"),
        )
    )
    n = F.col("count_order")
    return agged.select(
        "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price", "sum_disc_price",
        (F.expr("charge_micro div 100").cast("double") / 10000.0).alias("sum_charge"),
        (F.floor(F.col("qty_c").cast("double") * 10000 / n) / 1_000_000.0).alias("avg_qty"),
        (F.floor(F.col("price_c").cast("double") * 10000 / n) / 1_000_000.0).alias("avg_price"),
        (F.floor(F.col("disc_c").cast("double") * 10000 / n) / 1_000_000.0).alias("avg_disc"),
        "count_order",
    )


R_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000) AS BIGINT)) // 100 AS DOUBLE) / 10000.0 AS sum_charge,
       floor(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) * 10000 / count(*)) / 1000000.0 AS avg_qty,
       floor(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) * 10000 / count(*)) / 1000000.0 AS avg_price,
       floor(CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) * 10000 / count(*)) / 1000000.0 AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# ------------------------------------------------------------ r_q3_revenue
def r_q3_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: broadcast dim join + fact join + aggregate."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1997-01-01"))
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit("1997-01-01"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


R_Q3_SQL = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_shipdate > TIMESTAMP '1997-01-01'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
"""


# ---------------------------------------------------------- r_q5_nation_rev
def r_q5_nation_rev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: snowflake dim chain (region→nation→customer), all broadcast."""
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


R_Q5_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


# ------------------------------------------------------------ r_topk_orders
def r_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: sort on a raw column with unique integer tiebreak."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


R_TOPK_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
"""


# ------------------------------------------------------ r_window_topk_cust
def r_window_topk_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: top 3 orders per customer (row_number <= k)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


R_WINDOW_TOPK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC
         ) AS INTEGER) AS rn
  FROM orders
)
WHERE rn <= 3
"""


# ---------------------------------------------------------- r_window_running
def r_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic windows: running sum + lag delta per customer.

    This is the Graphite derivative/integral analog on order history.
    """
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
            4,
        ).alias("running_total"),
        F.round(
            F.col("o_totalprice") - F.lag("o_totalprice", 1).over(w), 4
        ).alias("delta_prev"),
    )


R_WINDOW_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ), 4) AS running_total,
       round(o_totalprice - lag(o_totalprice, 1) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ), 4) AS delta_prev
FROM orders
"""


# ------------------------------------------------------------ r_rank_funcs
def r_rank_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranking-function family on one deterministic ordering:
    dense_rank, ntile(4), percent_rank, cume_dist.  The rational
    outputs ((k-1)/(n-1), k/n) are single divisions of identical
    integers in both engines — bit-exact, no rounding needed.
    """
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_orderstatus",
        "o_orderkey",
        F.dense_rank().over(w).cast("long").alias("drank"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


R_RANK_FUNCS_SQL = """
SELECT o_orderstatus, o_orderkey,
       CAST(dense_rank() OVER w AS BIGINT) AS drank,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey ASC)
"""


# ------------------------------------------------------------ r_semi_anti
def r_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti-join shape: customers with vs without orders, per segment."""
    cust = _t(spark, sf_dir, "customer")
    ocust = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ok")
    ).distinct()
    return (
        cust.join(ocust, cust.c_custkey == ocust.ok, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count("ok").alias("with_orders"),
            (F.count("*") - F.count("ok")).alias("without_orders"),
        )
    )


R_SEMI_ANTI_SQL = """
WITH ocust AS (SELECT DISTINCT o_custkey FROM orders)
SELECT c_mktsegment,
       count(o_custkey) AS with_orders,
       count(*) - count(o_custkey) AS without_orders
FROM customer LEFT JOIN ocust ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""


# -------------------------------------------------------------- r_setops
def r_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT (distinct set semantics in both engines)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    machinery = cust.where(F.col("c_mktsegment") == "MACHINERY").select(
        F.col("c_custkey").alias("custkey")
    )
    big_buyers = orders.where(F.col("o_totalprice") > 150000).select(
        F.col("o_custkey").alias("custkey")
    )
    inter = machinery.intersect(big_buyers).select(
        F.lit("machinery_and_big").alias("op"), "custkey"
    )
    minus = machinery.subtract(big_buyers).select(
        F.lit("machinery_not_big").alias("op"), "custkey"
    )
    # Multiset (ALL) variants pin bag semantics: a customer with 3
    # big orders appears 3x in big_buyers; intersectAll keeps
    # min(multiplicity), exceptAll subtracts multiplicities.
    inter_all = big_buyers.intersectAll(machinery).select(
        F.lit("big_and_machinery_all").alias("op"), "custkey"
    )
    minus_all = big_buyers.exceptAll(machinery).select(
        F.lit("big_not_machinery_all").alias("op"), "custkey"
    )
    return inter.unionByName(minus).unionByName(inter_all).unionByName(minus_all)


R_SETOPS_SQL = """
WITH machinery AS (
  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
), big_buyers AS (
  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
)
SELECT 'machinery_and_big' AS op, custkey
FROM (SELECT custkey FROM machinery INTERSECT SELECT custkey FROM big_buyers)
UNION ALL
SELECT 'machinery_not_big' AS op, custkey
FROM (SELECT custkey FROM machinery EXCEPT SELECT custkey FROM big_buyers)
UNION ALL
SELECT 'big_and_machinery_all' AS op, custkey
FROM (SELECT custkey FROM big_buyers INTERSECT ALL SELECT custkey FROM machinery)
UNION ALL
SELECT 'big_not_machinery_all' AS op, custkey
FROM (SELECT custkey FROM big_buyers EXCEPT ALL SELECT custkey FROM machinery)
"""


# ------------------------------------------------------------ r_exists_sql
def r_exists_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS through the ``spark.sql`` surface
    (temp views) — same Catalyst plan as the DataFrame semi/anti form;
    registered to pin the SQL entry point of the engine.
    """
    _t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment
        FROM v_customer c
        WHERE EXISTS (
                SELECT 1 FROM v_orders o
                WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
              )
          AND NOT EXISTS (
                SELECT 1 FROM v_orders o
                WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
              )
        """
    )


R_EXISTS_SQL = """
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
      )
  AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
      )
"""


# ---------------------------------------------------------- r_salted_topk
def r_salted_topk_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof two-phase top-k (functions.salting.salted_window_topk)
    — the salt is internal, so the result is identical to the plain
    window top-k, and the PLAIN form is the oracle: the correctness of
    the skew path is checked against an engine that never salted.
    """
    from go_whisper_spark.functions.salting import salted_window_topk

    orders = _t(spark, sf_dir, "orders")
    out = salted_window_topk(
        orders,
        ["o_custkey"],
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        k=3,
        n_salts=8,
    )
    return out.select("o_custkey", "o_orderkey", "o_totalprice", "rn")


R_SALTED_TOPK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC
         ) AS INTEGER) AS rn
  FROM orders
)
WHERE rn <= 3
"""


# ------------------------------------------------------------ r_rollup_orders
def r_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets over (status, priority)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 4).alias("sum_total"),
    )


R_ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 4) AS sum_total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


# ------------------------------------------------------------ r_json_props
def r_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar JSON extraction over the events.props JSON-string column."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
        )
        .select(
            "event_type", "n", "min_k", "max_k",
            (F.floor(F.col("sum_k").cast("double") * 1_000_000 / F.col("n")) / 1_000_000.0).alias("avg_k"),
        )
    )


R_JSON_SQL = """
SELECT event_type,
       count(k) AS n,
       min(k) AS min_k,
       max(k) AS max_k,
       floor(CAST(sum(k) AS DOUBLE) * 1000000 / count(k)) / 1000000.0 AS avg_k
FROM (
  SELECT event_type, CAST(props->>'k' AS INTEGER) AS k FROM events
)
GROUP BY event_type
"""


# ------------------------------------------------------------ r_scalar_funcs
def r_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level string/math scalar functions (exact, no rounding needed)."""
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_type").alias("upper_type"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        (F.col("p_size") - F.col("p_size") % 10).cast("int").alias("size_bucket"),
        F.round(F.col("p_retailprice") * 1.1, 4).alias("marked_up"),
    )


R_SCALAR_SQL = """
SELECT p_partkey,
       upper(p_type) AS upper_type,
       substring(p_name, 1, 8) AS name_prefix,
       CAST(length(p_name) AS BIGINT) AS name_len,
       concat_ws('/', p_brand, p_type) AS brand_type,
       CAST(p_size - p_size % 10 AS INTEGER) AS size_bucket,
       round(p_retailprice * 1.1, 4) AS marked_up
FROM part
"""


# ------------------------------------------------------------ r_date_parts
def r_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date scalar functions + aggregate by calendar parts."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.withColumn("order_year", F.year("o_orderdate").cast("long"))
        .withColumn("order_month", F.month("o_orderdate").cast("long"))
        .groupBy("order_year", "order_month")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("tp_c"),
        )
        .select(
            "order_year", "order_month", "n_orders",
            (F.floor(F.col("tp_c").cast("double") * 10000 / F.col("n_orders")) / 1_000_000.0).alias("avg_total"),
        )
    )


R_DATE_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(month(o_orderdate) AS BIGINT) AS order_month,
       count(*) AS n_orders,
       floor(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) * 10000 / count(*)) / 1000000.0 AS avg_total
FROM orders
GROUP BY 1, 2
"""


# -------------------------------------------------------------- r_pivot
def r_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: linestatus values become columns (conditional-agg shape)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .sum("l_quantity")
        .select(
            "l_returnflag",
            F.round(F.col("O"), 4).alias("qty_open"),
            F.round(F.col("F"), 4).alias("qty_filled"),
        )
    )


R_PIVOT_SQL = """
SELECT l_returnflag,
       round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 4) AS qty_open,
       round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 4) AS qty_filled
FROM lineitem
GROUP BY l_returnflag
"""


# -------------------------------------------------------------- r_cube
def r_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets: all 2^2 combinations of (status, priority)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 4).alias("sum_total"),
    )


R_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 4) AS sum_total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# ------------------------------------------------------ r_corr_scalar_sub
def r_corr_scalar_sub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated *scalar* subqueries (per-part count
    and quantity sum) that Catalyst decorrelates into aggregate +
    join — small-quantity orders below 20% of the part's average.

    The threshold test is integer-exact: ``qty < 0.2 * avg(qty)`` is
    algebraically ``5 * qty * n < sum_qty``, all BIGINTs (quantities
    are whole numbers), so no engine can disagree at the boundary —
    ``0.2 * avg`` in doubles is NOT cross-engine stable when the true
    average is a terminating decimal.
    """
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    _t(spark, sf_dir, "part").createOrReplaceTempView("v_part")
    return spark.sql(
        """
        SELECT p.p_brand,
               count(*) AS n_small,
               round(sum(l.l_extendedprice), 4) AS small_revenue
        FROM v_lineitem l JOIN v_part p ON p.p_partkey = l.l_partkey
        WHERE p.p_size <= 10
          AND 5 * CAST(l.l_quantity AS BIGINT)
                * (SELECT count(*) FROM v_lineitem l2
                   WHERE l2.l_partkey = l.l_partkey)
              < (SELECT sum(CAST(l2.l_quantity AS BIGINT)) FROM v_lineitem l2
                 WHERE l2.l_partkey = l.l_partkey)
        GROUP BY p.p_brand
        """
    )


R_CORR_SCALAR_SQL = """
SELECT p.p_brand,
       count(*) AS n_small,
       round(sum(l.l_extendedprice), 4) AS small_revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_size <= 10
  AND 5 * CAST(l.l_quantity AS BIGINT)
        * (SELECT count(*) FROM lineitem l2
           WHERE l2.l_partkey = l.l_partkey)
      < (SELECT sum(CAST(l2.l_quantity AS BIGINT)) FROM lineitem l2
         WHERE l2.l_partkey = l.l_partkey)
GROUP BY p.p_brand
"""


# ------------------------------------------------------ r_q12_priority
def r_q12_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact join + CASE-conditional counts —
    high- vs low-priority line counts per return flag for a one-year
    ship window.  Counts are exact integers; the only shuffle is the
    orderkey equi-join plus the tiny final groupBy.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    o = _t(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


R_Q12_SQL = """
SELECT l.l_returnflag,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= '1997-01-01' AND l.l_shipdate < '1998-01-01'
GROUP BY l.l_returnflag
"""


# --------------------------------------------------------- r_q14_promo
def r_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share for one month.  Revenue
    terms are exact 4-decimal numbers, scaled to BIGINT tenth-mils, so
    both sums are exact and the share is floor-truncated in exact
    arithmetic.  The part side broadcasts.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-09-01"))
        & (F.col("l_shipdate") < F.lit("1997-10-01"))
    )
    p = _t(spark, sf_dir, "part")
    rev_u = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10_000
    ).cast("long")
    agged = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev_u).otherwise(0)).alias("promo_u"),
            F.sum(rev_u).alias("total_u"),
        )
    )
    return agged.select(
        (F.floor(F.col("promo_u").cast("double") * 100_000_000 / F.col("total_u"))
         / F.lit(1_000_000.0)).alias("promo_pct"),
        (F.col("total_u").cast("double") / 10_000.0).alias("total_revenue"),
    )


R_Q14_SQL = """
WITH f AS (
  SELECT CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS rev_u,
         p_type
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE l_shipdate >= '1997-09-01' AND l_shipdate < '1997-10-01'
)
SELECT floor(CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_u ELSE 0 END) AS DOUBLE)
             * 100000000 / sum(rev_u)) / 1000000.0 AS promo_pct,
       CAST(sum(rev_u) AS DOUBLE) / 10000.0 AS total_revenue
FROM f
"""


# ---------------------------------------------------- r_q16_supplier_cnt
def r_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: count(DISTINCT supplier) per part attribute
    group, with NOT IN brand exclusion and an IN size list (lineitem
    stands in for partsupp as the part↔supplier association).  The
    distinct-agg expands to a two-stage aggregate keyed by the group +
    suppkey — fully partitionable.
    """
    p = _t(spark, sf_dir, "part").where(
        ~F.col("p_brand").isin("Brand#1", "Brand#2")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


R_Q16_SQL = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand NOT IN ('Brand#1','Brand#2')
  AND p_type <> 'PROMO'
  AND p_size IN (1,5,10,15,20,25,30,35)
GROUP BY p_brand, p_type, p_size
"""


# ------------------------------------------------------ r_q19_disjunct
def r_q19_disjunct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive (OR-of-ANDs) brand/size/quantity
    predicates across the join — Catalyst extracts the common
    `p_partkey = l_partkey` conjunct and pushes the per-table residual
    filters below the join instead of evaluating the OR post-join.
    """
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    arm = lambda brand, smax, qlo, qhi: (
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    rev_u = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10_000
    ).cast("long")
    return (
        j.where(arm("Brand#12", 5, 1, 11) | arm("Brand#21", 10, 10, 20) | arm("Brand#15", 15, 20, 30))
        .agg(
            F.count("*").alias("n_lines"),
            (F.sum(rev_u).cast("double") / 10_000.0).alias("revenue"),
        )
    )


R_Q19_SQL = """
SELECT count(*) AS n_lines,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE)
         / 10000.0 AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


# -------------------------------------------------------- r_unpivot
def r_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot → UNPIVOT round trip: per-status revenue spread across
    three priority columns, then melted back to (status, measure, val)
    rows with SQL-standard ``UNPIVOT`` — the wide↔long reshaping
    surface.  Revenue is exact cents; the pivot is a conditional
    aggregate, so the whole thing is one shuffle on o_orderstatus.
    """
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        WITH agged AS (
          SELECT o_orderstatus,
                 CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                          THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS DOUBLE) / 100.0 AS urgent,
                 CAST(sum(CASE WHEN o_orderpriority = '2-HIGH'
                          THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS DOUBLE) / 100.0 AS high,
                 CAST(sum(CASE WHEN o_orderpriority = '5-LOW'
                          THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS DOUBLE) / 100.0 AS low
          FROM v_orders GROUP BY o_orderstatus
        )
        SELECT o_orderstatus, measure, val
        FROM agged UNPIVOT (val FOR measure IN (urgent, high, low))
        """
    )


R_UNPIVOT_SQL = """
WITH agged AS (
  SELECT o_orderstatus,
         CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                  THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS DOUBLE) / 100.0 AS urgent,
         CAST(sum(CASE WHEN o_orderpriority = '2-HIGH'
                  THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS DOUBLE) / 100.0 AS high,
         CAST(sum(CASE WHEN o_orderpriority = '5-LOW'
                  THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS DOUBLE) / 100.0 AS low
  FROM orders GROUP BY o_orderstatus
)
SELECT o_orderstatus, measure, val
FROM agged UNPIVOT (val FOR measure IN (urgent, high, low))
"""


# ---------------------------------------------------- r_lateral_top2
def r_lateral_top2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT: each
    low-key customer's two most expensive orders — the lateral form of
    per-group top-k (Catalyst rewrites it to the same windowed plan
    the explicit ``row_number`` form produces; both surfaces are part
    of the engine).  Deterministic via the (price DESC, orderkey ASC)
    total order.
    """
    _t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment, l.o_orderkey, l.o_totalprice
        FROM v_customer c
        JOIN LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM v_orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey ASC
          LIMIT 2
        ) l
        WHERE c.c_custkey < 100
        """
    )


R_LATERAL_SQL = """
SELECT c.c_custkey, c.c_mktsegment, l.o_orderkey, l.o_totalprice
FROM customer c
JOIN LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey ASC
  LIMIT 2
) l ON true
WHERE c.c_custkey < 100
"""


# ---------------------------------------------------- r_q2_min_cost
def r_q2_min_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each small part, the supplier offering the
    minimum unit price (lineitem stands in for partsupp).  Real Q2
    uses a correlated min subquery; the Spark-native form is a
    per-part window rank — one shuffle on partkey, and the correlated
    scan Catalyst would decorrelate into exists anyway.  Unit price is
    rounded at 6 dp with a suppkey tiebreak, so the rank-1 row is
    deterministic in both engines.
    """
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_size") <= 3)
    up = li.select(
        "l_partkey",
        "l_suppkey",
        F.round(F.col("l_extendedprice") / F.col("l_quantity"), 6).alias("unit_price"),
    )
    w = Window.partitionBy("l_partkey").orderBy("unit_price", "l_suppkey")
    cheapest = up.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return cheapest.join(
        F.broadcast(p), F.col("p_partkey") == F.col("l_partkey")
    ).select(
        "p_partkey",
        "p_brand",
        F.col("l_suppkey").alias("cheapest_supp"),
        "unit_price",
    )


R_Q2_SQL = """
WITH up AS (
  SELECT l_partkey, l_suppkey,
         round(l_extendedprice / l_quantity, 6) AS unit_price
  FROM lineitem
),
ranked AS (
  SELECT l_partkey, l_suppkey, unit_price,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY unit_price, l_suppkey) AS rn
  FROM up
)
SELECT p.p_partkey, p.p_brand,
       r.l_suppkey AS cheapest_supp,
       r.unit_price
FROM ranked r JOIN part p ON p.p_partkey = r.l_partkey
WHERE r.rn = 1 AND p.p_size <= 3
"""


# -------------------------------------------------- r_q7_nation_volume
def r_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: five-way join with the nation dimension playing
    two roles (supplier's and customer's), symmetric two-nation filter,
    revenue by year.  Both nation sides and supplier/customer broadcast
    (dims stay tiny at 100 TB); the only big shuffles are the
    lineitem-orders equi-join and the final 3-key aggregate.  Revenue
    in exact BIGINT tenth-mils.
    """
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    rev_u = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10_000
    ).cast("long")
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nk") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("c_nk") == F.col("c_nationkey"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg((F.sum(rev_u).cast("double") / 10_000.0).alias("revenue"))
    )


R_Q7_SQL = """
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE)
         / 10000.0 AS revenue
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
GROUP BY 1, 2, 3
"""


# ------------------------------------------------------ r_q22_acctbal
def r_q22_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance
    and no orders since 1999 (every customer here has *some* order, so
    the dormancy cutoff keeps the anti-join non-degenerate), grouped by
    nation (the phone-prefix country code of real Q22).  The global-
    average comparison is exact integer cross-multiplication
    (bal·n > Σbal in cents); dormancy is a left-anti join whose right
    side is pre-filtered — the date predicate pushes to the scan.  The
    one-row global stats broadcast to every partition.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") >= F.lit("1999-01-01"))
    pos = c.where(F.col("c_acctbal") > 0.0).select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"),
    )
    stats = pos.agg(F.count("*").alias("n"), F.sum("bal_c").alias("s"))
    return (
        pos.crossJoin(F.broadcast(stats))
        .where(F.col("bal_c") * F.col("n") > F.col("s"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            (F.sum("bal_c").cast("double") / 100.0).alias("totacctbal"),
        )
    )


R_Q22_SQL = """
WITH pos AS (
  SELECT c_custkey, c_nationkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
  FROM customer WHERE c_acctbal > 0.0
),
stats AS (SELECT count(*) AS n, sum(bal_c) AS s FROM pos)
SELECT c_nationkey AS cntrycode,
       count(*) AS numcust,
       CAST(sum(bal_c) AS DOUBLE) / 100.0 AS totacctbal
FROM pos, stats
WHERE bal_c * n > s
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = pos.c_custkey
                    AND o.o_orderdate >= '1999-01-01')
GROUP BY c_nationkey
"""


# =====================================================================
# Round-6 batch: the remaining TPC-H query shapes.  The synthetic star
# schema has no partsupp table and no commit/receipt dates, so Q4, Q9,
# Q11, Q20 and Q21 are adapted to equivalent plan shapes over the
# columns that exist (noted per query).  Determinism follows the
# module-wide rules: exact integer cent / tenth-mil arithmetic for
# ratios and averages, round(4) for grid-aligned sums, unique integer
# tiebreaks on every top-k.


# ------------------------------------------------------------ r_q6_forecast
def r_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the canonical scan→filter→scalar-aggregate.
    Every predicate pushes to the parquet scan; no join, no shuffle
    beyond the single-row final aggregate.  Revenue is
    price·discount, both exact 2-decimal values, so the product is
    exact in scaled integers (cents × cent-discount = 1e-4 units).
    """
    li = _t(spark, sf_dir, "lineitem")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(price_c * disc_c).cast("double") / 10_000.0).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


R_Q6_SQL = """
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# --------------------------------------------------------- r_q4_order_exists
def r_q4_order_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: priority counts over orders with an EXISTS
    lineitem predicate.  The reference predicate (commitdate <
    receiptdate) has no columns here, so the correlation is
    "some lineitem shipped more than 30 days after the order date" —
    same plan: a left-semi join with a non-equi residual on top of the
    orderkey equi-condition, then a tiny groupBy.
    """
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-07-01"))
        & (F.col("o_orderdate") < F.lit("1997-10-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


R_Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= '1997-07-01' AND o_orderdate < '1997-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
"""


# ----------------------------------------------------------- r_q8_mkt_share
def r_q8_mkt_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: a nation's market share per year — two
    broadcast dim chains (customer→nation→region for the market,
    supplier→nation for the share numerator) hanging off the
    lineitem⋈orders fact join.  The share is a ratio of two exact
    tenth-mil sums, floor-truncated at 6 decimals (the Q14 pattern).
    """
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")

    mkt_cust = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey")
    )
    supp_nation = supp.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"),
                                  F.col("n_name").alias("supp_nation"))),
        supp.s_nationkey == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")

    rev_u = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10_000
    ).cast("long")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(mkt_cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", rev_u).otherwise(0)).alias("nat_u"),
            F.sum(rev_u).alias("total_u"),
        )
        .select(
            "o_year",
            (F.floor(F.col("nat_u").cast("double") * 1_000_000 / F.col("total_u"))
             / F.lit(1_000_000.0)).alias("mkt_share"),
            (F.col("total_u").cast("double") / 10_000.0).alias("total_volume"),
        )
    )


R_Q8_SQL = """
WITH f AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS rev_u,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN part     ON p_partkey = l_partkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region   ON cn.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
    AND o_orderdate >= '1995-01-01' AND o_orderdate < '1997-01-01'
)
SELECT o_year,
       floor(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev_u ELSE 0 END) AS DOUBLE)
             * 1000000 / sum(rev_u)) / 1000000.0 AS mkt_share,
       CAST(sum(rev_u) AS DOUBLE) / 10000.0 AS total_volume
FROM f
GROUP BY o_year
"""


# -------------------------------------------------------------- r_q9_profit
def r_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per year.  There is
    no partsupp.ps_supplycost, so cost is modeled as 60% of
    p_retailprice per unit — same join graph (lineitem⋈orders⋈part⋈
    supplier⋈nation), same amount expression shape.  Revenue and cost
    terms are separately rounded to exact tenth-mils before the
    subtraction so the sum is exact.
    """
    nation = _t(spark, sf_dir, "nation")
    supp = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    supp_nation = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", "n_name")
    rev_u = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10_000
    ).cast("long")
    cost_u = F.round(
        F.col("p_retailprice") * F.col("l_quantity") * 0.6 * 10_000
    ).cast("long")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(p.select("p_partkey", "p_retailprice")),
              F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg((F.sum(rev_u - cost_u).cast("double") / 10_000.0).alias("sum_profit"))
    )


R_Q9_SQL = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
                - CAST(round(p_retailprice * l_quantity * 0.6 * 10000) AS BIGINT)) AS DOUBLE)
         / 10000.0 AS sum_profit
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY n_name, CAST(year(o_orderdate) AS BIGINT)
"""


# ------------------------------------------------------------ r_q10_returns
def r_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned revenue for one
    quarter — fact join filtered on l_returnflag='R', broadcast
    customer⋈nation dims, revenue round(4), custkey tiebreak on the
    global top-k (TakeOrderedAndProject, no full sort).
    """
    c = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-10-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    dims = c.join(F.broadcast(nation), c.c_nationkey == nation.n_nationkey).select(
        "c_custkey", "c_name", "c_acctbal", "n_name"
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


R_Q10_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= '1997-10-01' AND o_orderdate < '1998-01-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------- r_q11_top_value
def r_q11_top_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value with a HAVING against a scalar
    fraction of the global total.  partsupp is absent, so "value" is
    lineitem revenue from EUROPE-nation suppliers per part.  The
    threshold is scale-free — parts above 1.8× the AVERAGE part value
    (real Q11's fixed fraction degenerates as the part count grows) —
    and the compare is exact integer cross-multiplication
    (val_u·nparts·10 > total_u·18): no FP in the filter.  The one-row
    total broadcasts.  (The BIGINT cross-product holds through ~1e9
    parts; past that, drop to a double ratio — the filter is no longer
    hash-compared at that scale.)
    """
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    nation = _t(spark, sf_dir, "nation")
    supp = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    eu_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey")
    )
    rev_u = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10_000
    ).cast("long")
    per_part = (
        li.join(F.broadcast(eu_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(rev_u).alias("val_u"))
    )
    total = per_part.agg(F.sum("val_u").alias("total_u"),
                         F.count("*").alias("nparts"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("val_u") * F.col("nparts") * 10 > F.col("total_u") * 18)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("val_u").cast("double") / 10_000.0).alias("part_value"),
        )
    )


R_Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS val_u
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey
),
total AS (SELECT sum(val_u) AS total_u, count(*) AS nparts FROM per_part)
SELECT l_partkey AS p_partkey,
       CAST(val_u AS DOUBLE) / 10000.0 AS part_value
FROM per_part, total
WHERE val_u * nparts * 10 > total_u * 18
"""


# ---------------------------------------------------------- r_q13_cust_dist
def r_q13_cust_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution via a left
    outer join (customers with zero qualifying orders must appear with
    count 0) followed by a second aggregate over the counts.  The
    o_comment NOT LIKE filter of real Q13 becomes an o_orderpriority
    exclusion.  Pure integer outputs.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


R_Q13_SQL = """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON o_custkey = c_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust
GROUP BY c_count
"""


# -------------------------------------------------------- r_q15_top_supplier
def r_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) achieving the maximum
    three-month revenue — the classic argmax-against-a-scalar-subquery.
    Revenue is an exact cent-scaled BIGINT, so the equality against the
    broadcast max is exact integer equality (real Q15's documented
    float-equality hazard disappears).
    """
    supp = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    rev_u = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10_000
    ).cast("long")
    per_supp = li.groupBy("l_suppkey").agg(F.sum(rev_u).alias("rev_u"))
    mx = per_supp.agg(F.max("rev_u").alias("max_u"))
    return (
        per_supp.crossJoin(F.broadcast(mx))
        .where(F.col("rev_u") == F.col("max_u"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_u").cast("double") / 10_000.0).alias("total_revenue"),
        )
    )


R_Q15_SQL = """
WITH per_supp AS (
  SELECT l_suppkey,
         sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS rev_u
  FROM lineitem
  WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(rev_u AS DOUBLE) / 10000.0 AS total_revenue
FROM per_supp
JOIN supplier ON s_suppkey = l_suppkey
WHERE rev_u = (SELECT max(rev_u) FROM per_supp)
"""


# ---------------------------------------------------------- r_q17_small_qty
def r_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders — each
    lineitem compared against 20% of its part's average quantity.  The
    correlated scalar subquery becomes a broadcast join of per-part
    (sum, count) pairs, and the comparison is exact integer
    cross-multiplication: qty·5·cnt < Σqty (all cent-scaled BIGINTs).
    The /7.0 yearly average is floor-truncated at 6 decimals.
    """
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_type") == "SMALL") & (F.col("p_brand") == "Brand#1")
    )
    li = _t(spark, sf_dir, "lineitem")
    qty_c = F.round(F.col("l_quantity") * 100).cast("long")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    li2 = li.join(F.broadcast(p.select("p_partkey")),
                  F.col("p_partkey") == F.col("l_partkey"))
    per_part = li2.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(qty_c).alias("sum_qty_c"), F.count("*").alias("cnt")
    )
    return (
        li2.join(F.broadcast(per_part), F.col("l_partkey") == F.col("pk"))
        .where(qty_c * 5 * F.col("cnt") < F.col("sum_qty_c"))
        .agg(F.sum(price_c).alias("total_c"), F.count("*").alias("n_lines"))
        .select(
            (F.floor(F.col("total_c").cast("double") * 10_000 / 7)
             / F.lit(1_000_000.0)).alias("avg_yearly"),
            "n_lines",
        )
    )


R_Q17_SQL = """
WITH li2 AS (
  SELECT l_partkey,
         CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  WHERE p_type = 'SMALL' AND p_brand = 'Brand#1'
),
per_part AS (
  SELECT l_partkey AS pk, sum(qty_c) AS sum_qty_c, count(*) AS cnt
  FROM li2 GROUP BY 1
)
SELECT floor(CAST(sum(price_c) AS DOUBLE) * 10000 / 7) / 1000000.0 AS avg_yearly,
       count(*) AS n_lines
FROM li2 JOIN per_part ON l_partkey = pk
WHERE qty_c * 5 * cnt < sum_qty_c
"""


# ------------------------------------------------------- r_q18_large_volume
def r_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders — the IN-subquery over a
    grouped HAVING becomes an aggregate then join (Catalyst plans the
    IN the same way).  The >300-unit threshold is exact on cent-scaled
    quantities; top-100 sorted by o_totalprice (raw column) with
    orderkey tiebreak.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    qty_c = F.round(F.col("l_quantity") * 100).cast("long")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty_c).alias("sum_qty_c"))
        .where(F.col("sum_qty_c") > 300 * 100)
    )
    return (
        o.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice",
            (F.col("sum_qty_c").cast("double") / 100.0).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


R_Q18_SQL = """
WITH big AS (
  SELECT l_orderkey, sum(CAST(round(l_quantity * 100) AS BIGINT)) AS sum_qty_c
  FROM lineitem GROUP BY 1
  HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 30000
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       CAST(sum_qty_c AS DOUBLE) / 100.0 AS total_qty
FROM orders
JOIN big ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


# --------------------------------------------------------- r_q20_part_promo
def r_q20_part_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested semi-joins — suppliers in EUROPE who
    shipped more than 50 units of PROMO parts during 1997.  partsupp's
    availqty is absent, so the innermost threshold is on shipped
    quantity; the join nesting (part-filter → per-supplier agg →
    supplier semi-join → nation/region filter) mirrors Q20's plan.
    """
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    nation = _t(spark, sf_dir, "nation")
    supp = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    qty_c = F.round(F.col("l_quantity") * 100).cast("long")
    qualifying = (
        li.join(F.broadcast(p.select("p_partkey")),
                F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(qty_c).alias("qty_c"))
        .where(F.col("qty_c") > 50 * 100)
    )
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(qualifying, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


R_Q20_SQL = """
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_type = 'PROMO'
      AND l_shipdate >= '1997-01-01' AND l_shipdate < '1998-01-01'
    GROUP BY l_suppkey
    HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 5000)
"""


# ------------------------------------------------------------ r_q21_waiting
def r_q21_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the exists/not-exists double correlation.
    With no receipt/commit dates, "kept the order waiting" is adapted
    to: in finalized ('F') multi-supplier orders, the supplier was the
    UNIQUE last to ship (its per-order max shipdate equals the order
    max, and no other supplier ties it — the not-exists arm).  Plans
    as two grouped aggregates joined back, then a per-supplier count;
    all comparisons are exact timestamp equality.
    """
    supp = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    per_os = (
        li.join(o.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("supp_max"))
    )
    per_o = per_os.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.max("supp_max").alias("order_max"), F.count("*").alias("n_supp")
    )
    winners = per_os.join(
        per_o,
        (F.col("l_orderkey") == F.col("ok"))
        & (F.col("supp_max") == F.col("order_max"))
        & (F.col("n_supp") >= 2),
    )
    sole = (
        winners.groupBy("l_orderkey", "l_suppkey")
        .agg(F.lit(1).alias("one"))
        .groupBy(F.col("l_orderkey").alias("sok"))
        .agg(F.count("*").alias("n_winners"))
        .where(F.col("n_winners") == 1)
    )
    return (
        winners.join(sole, F.col("l_orderkey") == F.col("sok"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_suppkey"))
        .limit(20)
    )


R_Q21_SQL = """
WITH per_os AS (
  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS supp_max
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1, 2
),
per_o AS (
  SELECT l_orderkey AS ok, max(supp_max) AS order_max, count(*) AS n_supp
  FROM per_os GROUP BY 1
),
winners AS (
  SELECT p.l_orderkey, p.l_suppkey
  FROM per_os p JOIN per_o ON p.l_orderkey = ok
  WHERE p.supp_max = order_max AND n_supp >= 2
),
sole AS (
  SELECT l_orderkey FROM winners GROUP BY 1 HAVING count(*) = 1
)
SELECT s_suppkey, s_name, count(*) AS numwait
FROM winners
JOIN sole USING (l_orderkey)
JOIN supplier ON s_suppkey = l_suppkey
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_suppkey
LIMIT 20
"""


# -------------------------------------------------------- r_grouping_sets
def r_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping_id — the generalized form
    behind CUBE/ROLLUP (both already covered): per (status, priority),
    per status, and the grand total in ONE aggregate pass.  Catalyst
    expands the sets AFTER the partial aggregate, so the shuffle still
    carries one row per (set, group).  Revenue is an exact cent sum.
    """
    o = _t(spark, sf_dir, "orders")
    o.select(
        "o_orderstatus",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_c"),
    ).createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping_id() AS BIGINT) AS gid,
               count(*) AS n_orders,
               CAST(sum(price_c) AS DOUBLE) / 100.0 AS revenue
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        """
    )


R_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""


QUERIES = {
    "r_q1_pricing": r_q1_pricing,
    "r_corr_scalar_sub": r_corr_scalar_sub,
    "r_q12_priority": r_q12_priority,
    "r_q14_promo": r_q14_promo,
    "r_q16_supplier_cnt": r_q16_supplier_cnt,
    "r_q19_disjunct": r_q19_disjunct,
    "r_q7_nation_volume": r_q7_nation_volume,
    "r_q2_min_cost": r_q2_min_cost,
    "r_unpivot": r_unpivot,
    "r_lateral_top2": r_lateral_top2,
    "r_q22_acctbal": r_q22_acctbal,
    "r_cube_orders": r_cube_orders,
    "r_pivot": r_pivot,
    "r_q3_revenue": r_q3_revenue,
    "r_q5_nation_rev": r_q5_nation_rev,
    "r_topk_orders": r_topk_orders,
    "r_window_topk_cust": r_window_topk_cust,
    "r_window_running": r_window_running,
    "r_rank_funcs": r_rank_funcs,
    "r_semi_anti": r_semi_anti,
    "r_setops": r_setops,
    "r_exists_sql": r_exists_sql,
    "r_salted_topk_cust": r_salted_topk_cust,
    "r_rollup_orders": r_rollup_orders,
    "r_json_props": r_json_props,
    "r_scalar_funcs": r_scalar_funcs,
    "r_date_parts": r_date_parts,
    "r_q6_forecast": r_q6_forecast,
    "r_q4_order_exists": r_q4_order_exists,
    "r_q8_mkt_share": r_q8_mkt_share,
    "r_q9_profit": r_q9_profit,
    "r_q10_returns": r_q10_returns,
    "r_q11_top_value": r_q11_top_value,
    "r_q13_cust_dist": r_q13_cust_dist,
    "r_q15_top_supplier": r_q15_top_supplier,
    "r_q17_small_qty": r_q17_small_qty,
    "r_q18_large_volume": r_q18_large_volume,
    "r_q20_part_promo": r_q20_part_promo,
    "r_q21_waiting": r_q21_waiting,
    "r_grouping_sets": r_grouping_sets,
}

ORACLES = {
    "r_q1_pricing": R_Q1_SQL,
    "r_corr_scalar_sub": R_CORR_SCALAR_SQL,
    "r_q12_priority": R_Q12_SQL,
    "r_q14_promo": R_Q14_SQL,
    "r_q16_supplier_cnt": R_Q16_SQL,
    "r_q19_disjunct": R_Q19_SQL,
    "r_q7_nation_volume": R_Q7_SQL,
    "r_q2_min_cost": R_Q2_SQL,
    "r_unpivot": R_UNPIVOT_SQL,
    "r_lateral_top2": R_LATERAL_SQL,
    "r_q22_acctbal": R_Q22_SQL,
    "r_cube_orders": R_CUBE_SQL,
    "r_pivot": R_PIVOT_SQL,
    "r_q3_revenue": R_Q3_SQL,
    "r_q5_nation_rev": R_Q5_SQL,
    "r_topk_orders": R_TOPK_SQL,
    "r_window_topk_cust": R_WINDOW_TOPK_SQL,
    "r_window_running": R_WINDOW_RUNNING_SQL,
    "r_rank_funcs": R_RANK_FUNCS_SQL,
    "r_semi_anti": R_SEMI_ANTI_SQL,
    "r_setops": R_SETOPS_SQL,
    "r_exists_sql": R_EXISTS_SQL,
    "r_salted_topk_cust": R_SALTED_TOPK_SQL,
    "r_rollup_orders": R_ROLLUP_SQL,
    "r_json_props": R_JSON_SQL,
    "r_scalar_funcs": R_SCALAR_SQL,
    "r_date_parts": R_DATE_SQL,
    "r_q6_forecast": R_Q6_SQL,
    "r_q4_order_exists": R_Q4_SQL,
    "r_q8_mkt_share": R_Q8_SQL,
    "r_q9_profit": R_Q9_SQL,
    "r_q10_returns": R_Q10_SQL,
    "r_q11_top_value": R_Q11_SQL,
    "r_q13_cust_dist": R_Q13_SQL,
    "r_q15_top_supplier": R_Q15_SQL,
    "r_q17_small_qty": R_Q17_SQL,
    "r_q18_large_volume": R_Q18_SQL,
    "r_q20_part_promo": R_Q20_SQL,
    "r_q21_waiting": R_Q21_SQL,
    "r_grouping_sets": R_GROUPING_SETS_SQL,
}
