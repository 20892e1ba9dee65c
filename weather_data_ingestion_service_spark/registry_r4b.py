"""Round-4 second-wave registry entries: the remaining adapted TPC-H
composites (Q9/Q10/Q12/Q13/Q14/Q15/Q17/Q19/Q22 shapes), runtime-filter
join infrastructure, ORC storage round trip, change/ratio window
analytics, scalar null/rounding families, and four more LLM-pipeline
operators (C4-style quality gate, curriculum ordering, exact ROC-AUC
evaluation, BPE encode application).

Same cross-engine conventions as ``registry.py`` / ``registry_r4.py``:
aliased columns, integer cents (``_cents``) for money, whole-valued
doubles summed as BIGINT, ratios in exact integer micro-units via
``DIV`` (Spark) / ``//`` (DuckDB) on NON-NEGATIVE numerators only
(the two engines disagree on negative integer division: DuckDB floors,
Spark truncates — negatives are carried as a separate sign column),
and md5-of-decimal-string for engine-portable hashing.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .io import load_table
from .registry import (
    _cents,
    _clean_stale_scratch,
    _register_new_this_round,
    _session_tag,
    register,
)

# =====================================================================
# A. Adapted TPC-H composites (schema has no partsupp/shipmode/comment
# columns, so each query keeps the REFERENCE SHAPE — join graph,
# subquery pattern, predicate structure — over the columns that exist)
# =====================================================================


@register(
    "bench_q9",
    """
    SELECT n.n_name, EXTRACT(year FROM o.o_orderdate) AS o_year,
           sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) / 100.0
             AS profit
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, EXTRACT(year FROM o.o_orderdate)
    ORDER BY n.n_name, o_year DESC
    """,
)
def q_bench_q9(spark, sf_dir):
    """TPC-H Q9 shape (product-line profit by nation and year): a
    5-way star join — the fact filtered through a substring predicate
    on the part dimension, revenue grouped by supplier geography ×
    order year.  All three dimensions (part, supplier, nation) are
    broadcast; only the fact-to-orders join shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                / 100.0
            ).alias("profit")
        )
        .orderBy("n_name", F.col("o_year").desc())
    )


@register(
    "bench_q10",
    """
    SELECT c.c_custkey, c.c_name, n.n_name, c.c_acctbal,
           sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) / 100.0
             AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q_bench_q10(spark, sf_dir):
    """TPC-H Q10 shape (returned-item revenue): quarter-windowed
    orders joined to returned lineitems, customer geography broadcast,
    top-20 lost-revenue customers via TakeOrderedAndProject."""
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(
            (
                F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                / 100.0
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "bench_q12",
    """
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
)
def q_bench_q12(spark, sf_dir):
    """TPC-H Q12 shape (shipping-priority split; the schema has no
    l_shipmode, so line status stands in for ship mode): a
    year-windowed fact join with the classic conditional-count pivot
    on order priority — both counts map-side combinable."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "bench_q13",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_bench_q13(spark, sf_dir):
    """TPC-H Q13 shape (customer order-count distribution): left outer
    join with an ON-clause filter (customers with zero qualifying
    orders must survive with c_count = 0), then a second aggregation
    over the counts — the distribution-of-a-distribution pattern."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "bench_q14",
    """
    SELECT CAST(sum(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS promo_cents,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
                AS BIGINT) AS total_cents,
           CAST(sum(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
                    ELSE 0 END) * 1000000
                // sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
                AS BIGINT) AS promo_share_micro
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
      AND l.l_shipdate < TIMESTAMP '1997-04-01'
    """,
)
def q_bench_q14(spark, sf_dir):
    """TPC-H Q14 shape (promotion revenue share): month-windowed fact
    joined to a broadcast part dimension; the share is published in
    exact integer micro-units (cents × 1e6 DIV cents) so the hash
    can't depend on float division."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("long"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(promo).cast("long").alias("promo_cents"),
            F.sum(rev).cast("long").alias("total_cents"),
        )
        .select(
            "promo_cents",
            "total_cents",
            F.expr("CAST(promo_cents * 1000000 DIV total_cents AS BIGINT)").alias(
                "promo_share_micro"
            ),
        )
    )


@register(
    "bench_q15",
    """
    WITH rev AS (
      SELECT l_suppkey,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
                  AS BIGINT) AS total_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_cents / 100.0 AS total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_cents = (SELECT max(total_cents) FROM rev)
    ORDER BY s.s_suppkey
    """,
)
def q_bench_q15(spark, sf_dir):
    """TPC-H Q15 shape (top supplier by quarterly revenue): a revenue
    CTE reused twice — once for the rows, once for the scalar max —
    with the equality on EXACT integer cents, so the max-matching
    supplier set is engine-independent."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    sup = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .cast("long")
        .alias("total_cents")
    )
    top = rev.agg(F.max("total_cents").alias("total_cents"))
    best = rev.join(F.broadcast(top), "total_cents", "left_semi")
    return (
        sup.join(best, sup.s_suppkey == best.l_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_cents") / 100.0).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "bench_q17",
    """
    WITH stats AS (
      SELECT l_partkey,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             CAST(count(*) AS BIGINT) AS n_li
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p.p_brand,
           sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) / 100.0 AS small_qty_revenue,
           CAST(count(*) AS BIGINT) AS n_small
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN stats s ON l.l_partkey = s.l_partkey
    WHERE CAST(l.l_quantity AS BIGINT) * 5 * s.n_li < s.sum_qty
    GROUP BY p.p_brand
    ORDER BY p.p_brand
    """,
)
def q_bench_q17(spark, sf_dir):
    """TPC-H Q17 shape (small-quantity-order revenue): the correlated
    avg-quantity subquery decorrelated into a per-part aggregate
    joined back to the fact.  The threshold qty < 0.2·avg(qty) is
    evaluated as 5·n·qty < sum(qty) — pure BIGINT, no float avg."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    stats = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.count("*").alias("n_li"),
    )
    return (
        li.join(stats, "l_partkey")
        .filter(F.col("l_quantity").cast("long") * 5 * F.col("n_li") < F.col("sum_qty"))
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            (F.sum(_cents("l_extendedprice")) / 100.0).alias("small_qty_revenue"),
            F.count("*").alias("n_small"),
        )
        .orderBy("p_brand")
    )


@register(
    "bench_q19",
    """
    SELECT p.p_brand,
           sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) / 100.0
             AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#25' AND p.p_size BETWEEN 1 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    GROUP BY p.p_brand
    ORDER BY p.p_brand
    """,
)
def q_bench_q19(spark, sf_dir):
    """TPC-H Q19 shape (discounted revenue under disjunctive
    predicates): three brand/size/quantity conjunction arms OR-ed
    together across the join — the classic test that a disjunction
    spanning both sides still evaluates after an equi-join (not a
    nested loop), with each arm's single-side conjuncts pushable."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    arm1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & (q >= 1)
        & (q <= 11)
    )
    arm2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 25)
        & (q >= 10)
        & (q <= 20)
    )
    arm3 = (
        (F.col("p_brand") == "Brand#25")
        & F.col("p_size").between(1, 50)
        & (q >= 20)
        & (q <= 30)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(arm1 | arm2 | arm3)
        .groupBy("p_brand")
        .agg(
            (
                F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                / 100.0
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("p_brand")
    )


@register(
    "bench_q22",
    """
    WITH pos AS (
      SELECT c_custkey, c_nationkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
      FROM customer WHERE c_acctbal > 0.0
    ),
    avg_ AS (
      SELECT CAST(sum(bal_cents) AS BIGINT) AS sum_cents,
             CAST(count(*) AS BIGINT) AS n FROM pos
    )
    SELECT p.c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
           sum(p.bal_cents) / 100.0 AS totacctbal
    FROM pos p CROSS JOIN avg_
    WHERE p.bal_cents * avg_.n > avg_.sum_cents
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = p.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY p.c_nationkey
    ORDER BY p.c_nationkey
    """,
)
def q_bench_q22(spark, sf_dir):
    """TPC-H Q22 shape (global-sales-opportunity): customers with an
    above-average positive balance and no RECENT orders (every
    customer in this dataset has some order, so the idleness window
    keeps the anti join non-vacuous) — a scalar-aggregate threshold
    evaluated as bal·n > sum in exact cents, no float avg."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    pos = cust.filter(F.col("c_acctbal") > 0.0).select(
        "c_custkey", "c_nationkey", _cents("c_acctbal").alias("bal_cents")
    )
    avg_ = pos.agg(
        F.sum("bal_cents").cast("long").alias("sum_cents"),
        F.count("*").alias("n"),
    )
    return (
        pos.join(F.broadcast(avg_))
        .filter(F.col("bal_cents") * F.col("n") > F.col("sum_cents"))
        .join(orders, pos.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            (F.sum("bal_cents") / 100.0).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


_register_new_this_round(
    "bench_q9",
    "bench_q10",
    "bench_q12",
    "bench_q13",
    "bench_q14",
    "bench_q15",
    "bench_q17",
    "bench_q19",
    "bench_q22",
)
