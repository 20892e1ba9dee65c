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

from .io import load_table, local_frame
from .registry import (
    _cents,
    _clean_stale_scratch,
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
    # one fact scan: the scalar max comes from a global window over the
    # per-supplier aggregate (tiny — one row per supplier), not a
    # second pass over lineitem
    best = (
        rev.withColumn("mx", F.max("total_cents").over(Window.partitionBy()))
        .filter(F.col("total_cents") == F.col("mx"))
        .drop("mx")
    )
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


# =====================================================================
# B. Join/runtime-filter infrastructure, storage formats, set ops,
# window analytics, scalar families
# =====================================================================


@register(
    "join_bloom_prefilter",
    """
    SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_orders,
           sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) / 100.0 AS total
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY n.n_name ORDER BY n.n_name
    """,
)
def q_join_bloom_prefilter(spark, sf_dir):
    """Runtime-filter join: before shuffling the fact, probe a
    bloom-style bitmap built from the filtered dimension's join keys
    (xxhash64 mod 2^17 bits, OR-folded into 2048 64-bit words,
    broadcast) and drop fact rows that cannot match.  False positives
    are removed by the real join, so the result is IDENTICAL to the
    plain join — the oracle is the plain join — but at 100 TB the
    shuffle moves only the ~segment fraction of the fact.  (This is
    the manual form of Spark's own runtime row-level filtering /
    DPP, expressed as an operator so it composes with any plan.)"""
    m_bits = 1 << 17
    orders = load_table(spark, sf_dir, "orders")
    nat = load_table(spark, sf_dir, "nation")
    dim = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    words = (
        dim.withColumn(
            "bit", F.pmod(F.xxhash64(F.col("c_custkey")), F.lit(m_bits))
        )
        .select(
            (F.col("bit") / 64).cast("long").alias("word"),
            F.expr("shiftleft(1L, CAST(bit % 64 AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("mask"))
    )
    probe = (
        orders.withColumn(
            "bit", F.pmod(F.xxhash64(F.col("o_custkey")), F.lit(m_bits))
        )
        .withColumn("word", (F.col("bit") / 64).cast("long"))
        .withColumn("pmask", F.expr("shiftleft(1L, CAST(bit % 64 AS INT))"))
        .drop("bit")
        .join(F.broadcast(words), "word")
        .filter(F.col("mask").bitwiseAND(F.col("pmask")) != 0)
        .drop("word", "mask", "pmask")
    )
    return (
        probe.join(dim, probe.o_custkey == dim.c_custkey)
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum(_cents("o_totalprice")) / 100.0).alias("total"),
        )
        .orderBy("n_name")
    )


@register(
    "sink_orc_roundtrip",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q_sink_orc_roundtrip(spark, sf_dir):
    """ORC sink/source round trip (the third columnar format after
    parquet and CSV/JSON text): orders written as ORC, read back, and
    aggregated — parity with the raw parquet proves lossless typing
    (timestamps, doubles) through the format boundary."""
    _clean_stale_scratch("/tmp/wds_orc_*")
    out = f"/tmp/wds_orc_{_session_tag(spark, sf_dir)}"
    orders = load_table(spark, sf_dir, "orders")
    orders.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            (F.sum(_cents("o_totalprice")) / 100.0).alias("total"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "set_symmetric_diff",
    """
    WITH a AS (
      SELECT DISTINCT user_id, event_type FROM events WHERE value > 100.0
    ),
    b AS (
      SELECT DISTINCT user_id, event_type FROM events
      WHERE ts >= TIMESTAMP '2024-01-16'
    )
    SELECT user_id, event_type, 'value_only' AS side
    FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
    UNION ALL
    SELECT user_id, event_type, 'recent_only' AS side
    FROM (SELECT * FROM b EXCEPT SELECT * FROM a)
    """,
)
def q_set_symmetric_diff(spark, sf_dir):
    """Symmetric difference with provenance: (A∖B) ⊎ (B∖A), each side
    tagged — the audit question 'which (user, type) pairs appear under
    one selection but not the other'.  Planned as ONE exchange: both
    sides are tagged, unioned, and folded in a single membership
    aggregate (max of the tags), so the symmetric difference costs a
    union scan plus one hash agg — not two distincts and two anti
    joins."""
    ev = load_table(spark, sf_dir, "events")
    a = (
        ev.filter(F.col("value") > 100.0)
        .select("user_id", "event_type")
        .withColumn("in_a", F.lit(1))
        .withColumn("in_b", F.lit(0))
    )
    b = (
        ev.filter(F.col("ts") >= F.lit("2024-01-16").cast("timestamp"))
        .select("user_id", "event_type")
        .withColumn("in_a", F.lit(0))
        .withColumn("in_b", F.lit(1))
    )
    return (
        a.unionAll(b)
        .groupBy("user_id", "event_type")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
        .filter(F.col("in_a") != F.col("in_b"))
        .select(
            "user_id",
            "event_type",
            F.when(F.col("in_a") == 1, "value_only")
            .otherwise("recent_only")
            .alias("side"),
        )
    )


@register(
    "win_lead_gap",
    """
    SELECT event_id, user_id,
           CAST(coalesce(
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts), event_id)
             - epoch_us(ts), -1) AS BIGINT) AS gap_us
    FROM events
    """,
)
def q_win_lead_gap(spark, sf_dir):
    """Forward-looking window: microseconds until each user's NEXT
    event (lead), -1 sentinel on the last event.  The order key is
    (ts, event_id) — a total order, so ties can't flip the lead target
    between engines.  Complements win_lag_delta's backward delta."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.coalesce(
            F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts"),
            F.lit(-1),
        )
        .cast("long")
        .alias("gap_us"),
    )


@register(
    "win_pct_change",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    lagged AS (
      SELECT event_type, day, cents,
             lag(cents) OVER (PARTITION BY event_type ORDER BY day) AS prev
      FROM daily
    )
    SELECT event_type, day, cents,
           CAST(CASE WHEN cents >= prev THEN 1 ELSE -1 END AS INT) AS direction,
           CAST(abs(cents - prev) * 1000000 // prev AS BIGINT) AS abs_change_micro
    FROM lagged WHERE prev IS NOT NULL
    """,
)
def q_win_pct_change(spark, sf_dir):
    """Day-over-day percent change of per-type daily volume, published
    as direction × |Δ|·1e6 DIV prev: integer division is only applied
    to the NON-NEGATIVE |Δ| because DuckDB floors and Spark truncates
    negative quotients — the sign travels separately."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(_cents("value")).cast("long").alias("cents"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.withColumn("prev", F.lag("cents").over(w)).filter(
        F.col("prev").isNotNull()
    )
    return lagged.select(
        "event_type",
        "day",
        "cents",
        F.when(F.col("cents") >= F.col("prev"), 1).otherwise(-1)
        .cast("int")
        .alias("direction"),
        F.expr("CAST(abs(cents - prev) * 1000000 DIV prev AS BIGINT)").alias(
            "abs_change_micro"
        ),
    )


@register(
    "f_null_family",
    """
    SELECT c_custkey,
           nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'suppressed') AS seg_defaulted,
           CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NOT NULL
                THEN 'kept' ELSE 'masked' END AS nvl2_tag,
           CAST(CASE WHEN c_acctbal < 0.0 THEN NULL
                     ELSE round(c_acctbal * 100) END AS BIGINT) AS pos_cents,
           CAST(coalesce(CASE WHEN c_acctbal < 0.0 THEN NULL
                              ELSE round(c_acctbal * 100) END, 0) AS BIGINT)
             AS pos_cents_or_zero
    FROM customer
    """,
)
def q_f_null_family(spark, sf_dir):
    """NULL-handling scalar family: nullif / coalesce-default / the
    nvl2 pattern (spelled as CASE on both engines — DuckDB has no
    nvl2) / conditional NULL-out with a coalesce floor.  Errors and
    suppressions as VALUES, the reference's posture."""
    cust = load_table(spark, sf_dir, "customer")
    seg_null = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    pos = F.when(F.col("c_acctbal") < 0.0, F.lit(None)).otherwise(
        _cents("c_acctbal")
    )
    return cust.select(
        "c_custkey",
        seg_null.alias("seg_or_null"),
        F.coalesce(seg_null, F.lit("suppressed")).alias("seg_defaulted"),
        F.when(seg_null.isNotNull(), "kept").otherwise("masked").alias("nvl2_tag"),
        pos.cast("long").alias("pos_cents"),
        F.coalesce(pos, F.lit(0)).cast("long").alias("pos_cents_or_zero"),
    )


@register(
    "f_round_family",
    """
    SELECT c_custkey,
           CAST(floor(c_acctbal) AS BIGINT) AS floor_v,
           CAST(ceil(c_acctbal) AS BIGINT) AS ceil_v,
           CAST(CASE WHEN c_acctbal >= 0.0 THEN floor(c_acctbal)
                     ELSE ceil(c_acctbal) END AS BIGINT) AS trunc_v,
           CAST(CASE WHEN c_acctbal > 0.0 THEN 1
                     WHEN c_acctbal < 0.0 THEN -1 ELSE 0 END AS INT) AS sign_v,
           CAST(abs(round(c_acctbal * 100)) AS BIGINT) AS abs_cents,
           CAST(((c_custkey - 750) % 7 + 7) % 7 AS BIGINT) AS posmod7
    FROM customer
    """,
)
def q_f_round_family(spark, sf_dir):
    """Rounding/sign scalar family over a SIGNED measure (balances go
    negative): floor, ceil, truncation-toward-zero spelled as the
    floor/ceil CASE (Spark's numeric cast truncates but DuckDB's
    rounds — neither cast crosses engines safely), sign, |cents|, and
    the always-positive ((x%n)+n)%n modulus written identically on
    both engines (their native % already agree on sign-of-dividend,
    the double-mod form documents the contract)."""
    cust = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return cust.select(
        "c_custkey",
        F.floor(bal).cast("long").alias("floor_v"),
        F.ceil(bal).cast("long").alias("ceil_v"),
        F.when(bal >= 0.0, F.floor(bal)).otherwise(F.ceil(bal))
        .cast("long")
        .alias("trunc_v"),
        F.when(bal > 0.0, 1).when(bal < 0.0, -1).otherwise(0)
        .cast("int")
        .alias("sign_v"),
        F.abs(_cents("c_acctbal")).cast("long").alias("abs_cents"),
        F.expr("CAST(((c_custkey - 750) % 7 + 7) % 7 AS BIGINT)").alias("posmod7"),
    )


# =====================================================================
# C. LLM-pipeline: quality gate, curriculum, ranking eval, tokenizer
# =====================================================================

# tokenization shared with registry_r4/registry_ext — ONE definition,
# imported (a second copy could silently drift from the oracle pairing)
from .registry_r4 import _TOK_SQL, _tok  # noqa: E402



# the zero-exchange token-frequency fold and the full gate live in
# ext/text (shared with the streaming curation sink) — one definition
from .ext.text import max_run_length as _max_token_freq  # noqa: E402
from .ext.text import quality_gate_flags  # noqa: E402


@register(
    "ext_filter_c4",
    f"""
    WITH t AS (SELECT doc_id, {_TOK_SQL} AS w FROM documents),
    u AS (
      SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
             CAST(coalesce(list_sum(list_transform(w, x -> len(x))), 0)
                  AS BIGINT) AS sum_chars
      FROM t
    ),
    fr AS (
      SELECT doc_id, CAST(max(cnt) AS BIGINT) AS max_freq FROM (
        SELECT doc_id, tok, count(*) AS cnt
        FROM (SELECT doc_id, unnest(w) AS tok FROM t) GROUP BY doc_id, tok
      ) GROUP BY doc_id
    )
    SELECT u.doc_id, u.n_words,
           (u.n_words BETWEEN 20 AND 80) AS r_wordcount,
           (u.sum_chars * 1000 >= 4000 * u.n_words
            AND u.sum_chars * 1000 < 4900 * u.n_words) AS r_meanlen,
           (coalesce(fr.max_freq, 0) * 100 < 12 * u.n_words) AS r_repetition,
           ((u.n_words BETWEEN 20 AND 80)
            AND u.sum_chars * 1000 >= 4000 * u.n_words
            AND u.sum_chars * 1000 < 4900 * u.n_words
            AND coalesce(fr.max_freq, 0) * 100 < 12 * u.n_words) AS keep
    FROM u LEFT JOIN fr ON u.doc_id = fr.doc_id
    """,
)
def q_ext_filter_c4(spark, sf_dir):
    """C4/Gopher-style quality gate, materialized with per-rule
    provenance: word-count bounds, mean-word-length band, and a
    max-single-token-frequency repetition cap — every rule an EXACT
    integer inequality (counts cross-multiplied, no float ratios), so
    the keep decision is engine- and partitioning-independent.  One
    corpus pass for the length stats plus one token-level aggregate
    for the repetition cap; no shuffle beyond the per-doc hash aggs.
    (The reference corpus is synthetic word-soup, so the classic
    terminal-punctuation rule would be vacuous here; the three rules
    kept are the ones that discriminate.)"""
    docs = load_table(spark, sf_dir, "documents")
    g = quality_gate_flags(docs.select("doc_id", "text"), "text")
    return g.select(
        "doc_id", "n_words", "r_wordcount", "r_meanlen", "r_repetition", "keep"
    )


@register(
    "ext_curriculum",
    f"""
    WITH t AS (SELECT doc_id, {_TOK_SQL} AS w FROM documents),
    s AS (
      SELECT doc_id,
             CAST(CAST(len(list_distinct(w)) AS BIGINT) * 1000000
                  // CAST(len(w) AS BIGINT) AS BIGINT) AS uniq_micro
      FROM t
    ),
    b AS (
      SELECT doc_id, uniq_micro,
             CAST(ntile(4) OVER (ORDER BY uniq_micro DESC, doc_id) AS INT) AS bin
      FROM s
    )
    SELECT doc_id, uniq_micro, bin,
           CAST(row_number() OVER (
             PARTITION BY bin
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS pos
    FROM b
    """,
)
def q_ext_curriculum(spark, sf_dir):
    """Curriculum ordering for training: docs scored by lexical
    diversity (distinct-token ratio in exact integer micro-units),
    quartile-binned best-first, then given a DETERMINISTIC but
    decorrelated position within each bin via the md5 id-hash (the
    engine-portable shuffle — same convention as ext_sample_epoch).
    A trainer reads bins in order, rows by position.  The ntile here
    is the exact small-N form; at corpus scale the same contract is
    served by binning against 3 exact rank-selected cut scores
    (two-pass agg, no global window) — the cut-selection pattern
    agg_percentile/agg_median_mad already implement."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.select(
        "doc_id",
        F.size(F.array_distinct(_tok())).cast("long").alias("n_uniq"),
        F.size(_tok()).cast("long").alias("n_words"),
    ).select(
        "doc_id",
        F.expr("CAST(n_uniq * 1000000 DIV n_words AS BIGINT)").alias(
            "uniq_micro"
        ),
    )
    b = s.withColumn(
        "bin",
        F.ntile(4)
        .over(Window.orderBy(F.col("uniq_micro").desc(), "doc_id"))
        .cast("int"),
    )
    return b.withColumn(
        "pos",
        F.row_number()
        .over(
            Window.partitionBy("bin").orderBy(
                F.md5(F.col("doc_id").cast("string").cast("binary")), "doc_id"
            )
        )
        .cast("long"),
    )


@register(
    "ext_eval_auc",
    """
    WITH d AS (SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS score FROM documents),
    sc AS (
      SELECT score, CAST(count(*) AS BIGINT) AS n_s,
             CAST(coalesce(sum(count(*)) OVER (
               ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS cum_all_below
      FROM d GROUP BY score
    ),
    ls AS (
      SELECT lang, score, CAST(count(*) AS BIGINT) AS npos_s,
             CAST(coalesce(sum(count(*)) OVER (
               PARTITION BY lang
               ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS cumpos_below
      FROM d GROUP BY lang, score
    ),
    agg AS (
      SELECT l.lang,
             CAST(sum(l.npos_s * (s.cum_all_below - l.cumpos_below)) AS BIGINT)
               AS pairs_won,
             CAST(sum(l.npos_s * (s.n_s - l.npos_s)) AS BIGINT) AS ties,
             CAST(sum(l.npos_s) AS BIGINT) AS npos
      FROM ls l JOIN sc s ON l.score = s.score GROUP BY l.lang
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d)
    SELECT lang, npos, CAST(tot.n - npos AS BIGINT) AS nneg,
           CAST((2 * pairs_won + ties) * 1000000
                // (2 * npos * (tot.n - npos)) AS BIGINT) AS auc_micro
    FROM agg CROSS JOIN tot ORDER BY lang
    """,
)
def q_ext_eval_auc(spark, sf_dir):
    """Exact ROC-AUC (one-vs-rest per language, doc length as the
    score) — the Mann-Whitney U statistic computed distributively; see
    ext/simsearch.exact_auc for the kernel (per-score prefix sums, no
    O(n²) pair join, ties as ½, exact integer micro-units; windows run
    over DISTINCT SCORES, bounded at any corpus size)."""
    from .ext.simsearch import exact_auc

    docs = load_table(spark, sf_dir, "documents")
    return exact_auc(docs.select("lang", "n_chars"), "lang", "n_chars")


@register("ext_tokenizer_apply")  # greedy merge application — rows-only
def q_ext_tokenizer_apply(spark, sf_dir):
    """Encode the corpus with the BPE merge table ext_tokenizer_bpe
    trains: per-doc word/symbol/token counts plus the achieved
    compression in integer micro-units.  Train (bounded merge-table
    collect) + one narrow Arrow encode pass; see ext/text.bpe_encode
    for the scale shape."""
    from .ext.text import bpe_encode, bpe_train

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=12, min_count=2)
    return bpe_encode(docs, merges, "doc_id", "text")


# =====================================================================
# D. Pipeline composition, sampling, calibration, multimodal dedup,
# k-NN graph
# =====================================================================


@register(
    "ext_pipeline_e2e",
    f"""
    WITH t AS (SELECT doc_id, lang, n_chars, text, {_TOK_SQL} AS w FROM documents),
    u AS (
      SELECT doc_id, lang, n_chars, text, CAST(len(w) AS BIGINT) AS n_words,
             CAST(coalesce(list_sum(list_transform(w, x -> len(x))), 0)
                  AS BIGINT) AS sum_chars
      FROM t
    ),
    fr AS (
      SELECT doc_id, CAST(max(cnt) AS BIGINT) AS max_freq FROM (
        SELECT doc_id, tok, count(*) AS cnt
        FROM (SELECT doc_id, unnest(w) AS tok FROM t) GROUP BY doc_id, tok
      ) GROUP BY doc_id
    ),
    kept AS (
      SELECT u.* FROM u JOIN fr USING (doc_id)
      WHERE u.n_words BETWEEN 20 AND 80
        AND u.sum_chars * 1000 >= 4000 * u.n_words
        AND u.sum_chars * 1000 < 4900 * u.n_words
        AND fr.max_freq * 100 < 12 * u.n_words
    ),
    dedup AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM kept
      ) WHERE rn = 1
    )
    SELECT CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'cc'
                THEN 'train' ELSE 'val' END AS split,
           lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars_total
    FROM dedup GROUP BY 1, 2
    """,
)
def q_ext_pipeline_e2e(spark, sf_dir):
    """The curation pipeline END-TO-END in one declarative plan —
    quality gate (exact-integer C4 rules) → exact dedup (keep lowest
    id per content hash) → leakage-proof hash split → per-(split,
    lang) token accounting.  Composing the stages as one DataFrame
    lets Catalyst pipeline them: the gate is a narrow projection
    (array folds, `_max_token_freq` — no explode, no shuffle), the
    dedup window is the ONLY corpus-keyed exchange, and the split/agg
    reuses nothing but the gate's survivors — one job, two shuffles,
    no intermediate parquet, which is exactly how the stages should
    ship at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    kept = quality_gate_flags(
        docs.select("doc_id", "lang", "n_chars", "text"), "text"
    ).filter(F.col("keep"))
    w_dedup = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy(
        "doc_id"
    )
    dedup = (
        kept.withColumn("rn", F.row_number().over(w_dedup))
        .filter(F.col("rn") == 1)
    )
    split = F.when(
        F.md5(F.col("doc_id").cast("string").cast("binary")) < "cc", "train"
    ).otherwise("val")
    return (
        dedup.groupBy(split.alias("split"), "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars_total"),
        )
    )


@register(
    "ext_sample_pergroup",
    """
    SELECT doc_id, source, CAST(rn AS BIGINT) AS pos FROM (
      SELECT doc_id, source, row_number() OVER (
        PARTITION BY source
        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    ) WHERE rn <= 10
    """,
)
def q_ext_sample_pergroup(spark, sf_dir):
    """Exact-k per-group sampling (10 docs per source): the
    deterministic counterpart of per-stratum reservoir sampling —
    rank by the engine-portable md5 id-hash inside each group and
    keep the first k.  One shuffle on the group key; the hash order
    makes the sample a pure function of the ids, independent of
    partitioning, engine, and cluster size."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), "doc_id"
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("doc_id", "source", F.col("rn").cast("long").alias("pos"))
    )


@register(
    "ext_eval_calibration",
    """
    SELECT CAST(n_chars // 50 AS BIGINT) AS bin,
           CAST((n_chars // 50) * 50 + 25 AS BIGINT) AS bin_mid,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS pos_rate_micro
    FROM documents GROUP BY 1, 2 ORDER BY 1
    """,
)
def q_ext_eval_calibration(spark, sf_dir):
    """Calibration curve for a score (doc length) against a binary
    outcome (lang = 'en'): fixed-width score bins, per-bin positive
    rate in exact integer micro-units — the reliability-diagram
    companion to ext_eval_auc, and a pure map-side-combinable
    aggregate (one shuffle, any scale)."""
    docs = load_table(spark, sf_dir, "documents")
    b = F.expr("CAST(n_chars DIV 50 AS BIGINT)")
    pos = F.when(F.col("lang") == "en", 1).otherwise(0)
    return (
        docs.groupBy(b.alias("bin"))
        .agg(
            F.count("*").alias("n"),
            F.sum(pos).cast("long").alias("n_pos"),
        )
        .select(
            "bin",
            (F.col("bin") * 50 + 25).cast("long").alias("bin_mid"),
            "n",
            "n_pos",
            F.expr("CAST(n_pos * 1000000 DIV n AS BIGINT)").alias(
                "pos_rate_micro"
            ),
        )
        .orderBy("bin")
    )


def _planted_image_hashes(spark, sf_dir):
    """Shared payload synthesis for the perceptual-hash queries: every
    doc gets a REAL PNG keyed on doc_id mod 50, so each ~10 docs share
    an identical image (planted duplicates), then aHash them.  Both
    phash queries MUST use this one builder — their semantics assume
    the same planted-duplicate structure."""
    from .ext.multimodal import image_avg_hash, synth_png_payload

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    keys = docs.select(
        (F.col("doc_id") % 50).cast("long").alias("img_key")
    ).distinct()
    # pattern="bits": per-key md5-derived block images, so distinct
    # keys get DISTINCT aHashes (the default gradient collides — ~6
    # hashes for 50 keys — which would merge planted groups and break
    # the "same payload ⇔ same doc_id % 50 group" oracle contract)
    imgs = synth_png_payload(
        keys.withColumnRenamed("img_key", "doc_id"),
        id_col="doc_id",
        pattern="bits",
    ).withColumnRenamed("doc_id", "img_key")
    payloads = docs.withColumn(
        "img_key", (F.col("doc_id") % 50).cast("long")
    ).join(F.broadcast(imgs), "img_key")
    return image_avg_hash(
        payloads.select("doc_id", "payload"), "doc_id", "payload"
    )


@register(
    "ext_multimodal_phash",
    """
    SELECT doc_id,
           min(doc_id) OVER (PARTITION BY doc_id % 50) AS group_rep,
           (doc_id = min(doc_id) OVER (PARTITION BY doc_id % 50))
             AS is_canonical,
           CAST(count(*) OVER (PARTITION BY doc_id % 50) AS BIGINT)
             AS group_size
    FROM documents
    """,
)
def q_ext_multimodal_phash(spark, sf_dir):
    """Image dedup by perceptual average-hash: synthesize real PNG
    payloads keyed on doc_id mod 50 (so every ~10 docs share an
    identical image — planted duplicates), aHash them (stdlib decode →
    8×8 block means → threshold bits), and mark each image's canonical
    representative per hash group — dedup as a hash GROUP BY, no
    pixel-level comparison.  See ext/multimodal.image_avg_hash.
    Payload synthesis delegates to _planted_image_hashes so both phash
    queries share the one planted-duplicate structure.

    ORACLE (round-6 upgrade, the ext_multimodal_decode restatement
    pattern): the planted structure makes the aHash GROUPS a pure
    function of doc_id — identical payload ⇔ same doc_id mod 50 — so
    the published group structure (representative, canonical flag,
    size) is restated relationally over doc_id % 50.  The Spark side
    still derives it from the REAL decoded hashes (grouping by
    ``ahash``), so a decode nondeterminism splitting a group or a hash
    collision merging two would hash-fail; the 64-bit hash VALUES
    themselves stay pinned by the multimodal pytest fixtures."""
    hashed = _planted_image_hashes(spark, sf_dir)
    w = Window.partitionBy("ahash")
    return hashed.select(
        "doc_id",
        F.min("doc_id").over(w).alias("group_rep"),
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("is_canonical"),
        F.count(F.lit(1)).over(w).cast("long").alias("group_size"),
    )


def _knn_oracle_sql():
    from .registry_ext import _COSINE_SQL, _md5_srp_bucket_sql

    bk = _md5_srp_bucket_sql(
        6, "(SELECT p FROM params)", plane_cap=32
    )
    cos = _COSINE_SQL.format(a="ea.embedding", b="eb.embedding")
    return f"""
    WITH params AS (
      SELECT greatest(3, length(bin(count(*) // 64)) - 1) AS p
      FROM embeddings),
    {bk},
    cand AS (
      SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
      FROM bk x JOIN bk y ON x.tbl = y.tbl AND x.bucket = y.bucket
      WHERE x.vec_id <> y.vec_id),
    scored AS (
      SELECT c.a, c.b, {cos} AS cos
      FROM cand c
      JOIN embeddings ea ON ea.vec_id = c.a
      JOIN embeddings eb ON eb.vec_id = c.b),
    r AS (
      SELECT a, b, cos,
             row_number() OVER (PARTITION BY a ORDER BY cos DESC, b) AS rank
      FROM scored)
    SELECT a AS vec_id, b AS neighbor_id, CAST(rank AS INT) AS rank,
           CAST(round(cos * 1000) AS BIGINT) AS cos_milli
    FROM r WHERE rank <= 5 ORDER BY vec_id, rank
    """


@register("ext_knn_graph", _knn_oracle_sql())
def q_ext_knn_graph(spark, sf_dir):
    """Approximate k-NN graph over the embedding corpus (k=5, 6 LSH
    tables): bucket-local candidates, cross-table dedup before
    scoring, exact cosine re-rank.  The plane count ADAPTS to corpus
    size (buckets ≈ N/64, so per-bucket candidate work is constant as
    the corpus grows — the knob that keeps the candidate set linear,
    not quadratic, at 100 TB); recall 0.77 vs exact at sf0.001,
    pinned ≥0.6 by pytest.  See ext/simsearch.knn_graph.

    ORACLE (round-8 upgrade, VERDICT r7 #4): md5-Rademacher planes
    over integer-quantized components (see
    ``srp_buckets(scheme='md5-rademacher')``) make the bucketing
    restatable bit-for-bit in SQL; the adaptive plane count is the
    INTEGER formula max(3, bitlength(n >> 6) − 1) — identical to
    ``greatest(3, length(bin(n // 64)) - 1)`` on the oracle side
    (equality pytest-pinned across the n range), never a float log2
    whose rounding could diverge at power-of-two corpus sizes."""
    from .io import load_table as _lt
    from .ext.simsearch import knn_graph

    emb = _lt(spark, sf_dir, "embeddings")
    n = emb.count()
    n_planes = max(3, (n >> 6).bit_length() - 1)
    return knn_graph(
        emb,
        "vec_id",
        "embedding",
        k=5,
        n_planes=n_planes,
        n_tables=6,
        scheme="md5-rademacher",
    )


# =====================================================================
# E. Multi-distinct aggregates, grouping ids, time-range frames,
# conditional semi-joins, date truncation, token rarity
# =====================================================================


@register(
    "agg_multi_distinct",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q_agg_multi_distinct(spark, sf_dir):
    """Several COUNT(DISTINCT …) over different keys in ONE aggregate:
    Spark plans this with an Expand (each input row fans out once per
    distinct-column set, tagged with a grouping id) so all three
    measures resolve in a single shuffle pass instead of three
    self-joined single-distinct aggregates."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.countDistinct(F.to_date("ts")).alias("n_days"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_grouping_id",
    """
    SELECT CAST(grouping(event_type, CAST(ts AS DATE)) AS BIGINT) AS gid,
           event_type, CAST(ts AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY GROUPING SETS ((event_type, CAST(ts AS DATE)), (event_type), ())
    """,
)
def q_agg_grouping_id(spark, sf_dir):
    """GROUPING SETS with an explicit grouping-id bitmask — the
    disambiguator that separates 'aggregated-away NULL' from 'NULL in
    the data', which rollup consumers (cube browsers, OLAP caches)
    require.  Same Expand-based single-pass plan as rollup/cube."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day")
    )
    ev.createOrReplaceTempView("wds_events_gid")
    return spark.sql(
        """
        SELECT CAST(grouping_id(event_type, day) AS BIGINT) AS gid,
               event_type, day, CAST(count(*) AS BIGINT) AS n
        FROM wds_events_gid
        GROUP BY GROUPING SETS ((event_type, day), (event_type), ())
        """
    )


@register(
    "win_time_range_sum",
    """
    SELECT event_id, user_id,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS hour_cents
    FROM events
    """,
)
def q_win_time_range_sum(spark, sf_dir):
    """TIME-based window frame (RANGE over epoch-µs, not ROWS): each
    event's trailing-one-hour spend per user.  Unlike a row frame the
    width adapts to event density — the fraud/rate-limit primitive.
    The frame bound is integer microseconds on both engines, so ties
    and boundary inclusion agree exactly."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(_cents("value")).over(w).cast("long").alias("hour_cents"),
    )


@register(
    "join_semi_conditional",
    """
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
    """,
)
def q_join_semi_conditional(spark, sf_dir):
    """Correlated EXISTS with a non-equi conjunct (TPC-H Q4's shape):
    orders with any lineitem shipped more than 60 days after order
    date.  Planned as a LEFT SEMI join whose condition carries both
    the equality (the shuffle key) and the inequality (evaluated
    post-match) — no distinct-then-join double shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (orders.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "f_date_trunc_family",
    """
    SELECT o_orderkey,
           CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start,
           CAST(date_trunc('year', o_orderdate) AS DATE) AS year_start
    FROM orders
    """,
)
def q_f_date_trunc_family(spark, sf_dir):
    """Calendar truncation family (week → Monday, month, quarter,
    year), normalized to DATE on both engines (Spark's date_trunc
    yields a timestamp, DuckDB's a date — the cast is the portable
    contract).  Completes f_date_parts' numeric calendar family with
    the bucketing form used by every period-over-period rollup."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.date_trunc("week", "o_orderdate").cast("date").alias("week_start"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.date_trunc("quarter", "o_orderdate").cast("date").alias("quarter_start"),
        F.date_trunc("year", "o_orderdate").cast("date").alias("year_start"),
    )


@register(
    "ext_text_rarity",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOK_SQL}) AS tok FROM documents
    ),
    vocab AS (
      SELECT tok, CAST(row_number() OVER (
        ORDER BY count(*) DESC, tok) AS BIGINT) AS rank
      FROM tok GROUP BY tok
    )
    SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(v.rank) * 1000000 // count(*) AS BIGINT) AS mean_rank_micro
    FROM tok t JOIN vocab v ON t.tok = v.tok
    GROUP BY t.doc_id
    """,
)
def q_ext_text_rarity(spark, sf_dir):
    """Vocabulary-rarity quality signal: every token's corpus
    frequency RANK (1 = most common), averaged per document in exact
    integer micro-units — the log-free stand-in for unigram surprisal
    (rank is monotone in -log p), rankable cross-engine because no
    float log is ever taken.  The vocab table is corpus-bounded and
    broadcast back onto the token stream; docs full of rare tokens
    score high — jargon/noise at the top, boilerplate at the bottom."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_tok()).alias("tok"))
    vocab = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.col("cnt").desc(), "tok"))
            .cast("long"),
        )
        .drop("cnt")
    )
    return (
        tok.join(F.broadcast(vocab), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.expr(
                "CAST(sum(rank) * 1000000 DIV count(*) AS BIGINT)"
            ).alias("mean_rank_micro"),
        )
    )


# =====================================================================
# F. The remaining TPC-H shapes (all 22 now covered), compaction,
# incremental dedup
# =====================================================================


@register(
    "bench_q8",
    """
    WITH rev AS (
      SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
             ns.n_name AS supp_nation,
             CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
               AS cents
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation nc ON c.c_nationkey = nc.n_nationkey
      JOIN region r ON nc.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation ns ON s.s_nationkey = ns.n_nationkey
      WHERE r.r_name = 'AMERICA'
    )
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'BRAZIL' THEN cents ELSE 0 END)
                AS BIGINT) AS brazil_cents,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           CAST(sum(CASE WHEN supp_nation = 'BRAZIL' THEN cents ELSE 0 END)
                * 1000000 // sum(cents) AS BIGINT) AS mkt_share_micro
    FROM rev GROUP BY o_year ORDER BY o_year
    """,
)
def q_bench_q8(spark, sf_dir):
    """TPC-H Q8 shape (national market share): revenue in an AMERICA
    customer region attributed to BRAZIL suppliers, per year — the
    deepest star in the suite (6 dimension hops), every geography
    branch broadcast, share in exact integer micro-units."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    nc = nat.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_reg")
    )
    ns = nat.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nc), cust.c_nationkey == F.col("nc_key"))
        .join(F.broadcast(reg), F.col("nc_reg") == reg.r_regionkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(ns), sup.s_nationkey == F.col("ns_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            F.col("supp_nation"),
            _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "cents"
            ),
        )
    )
    brazil = F.when(F.col("supp_nation") == "BRAZIL", F.col("cents")).otherwise(
        F.lit(0).cast("long")
    )
    return (
        rev.groupBy("o_year")
        .agg(
            F.sum(brazil).cast("long").alias("brazil_cents"),
            F.sum("cents").cast("long").alias("total_cents"),
        )
        .select(
            "o_year",
            "brazil_cents",
            "total_cents",
            F.expr(
                "CAST(brazil_cents * 1000000 DIV total_cents AS BIGINT)"
            ).alias("mkt_share_micro"),
        )
        .orderBy("o_year")
    )


@register(
    "bench_q11",
    """
    WITH val AS (
      SELECT s.s_nationkey, l.l_partkey,
             CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS value_cents
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY s.s_nationkey, l.l_partkey
    ),
    tot AS (SELECT CAST(sum(value_cents) AS BIGINT) AS total_cents,
                   CAST(count(*) AS BIGINT) AS n_groups FROM val)
    SELECT v.s_nationkey, v.l_partkey, v.value_cents
    FROM val v CROSS JOIN tot
    WHERE v.value_cents * tot.n_groups * 2 > 5 * tot.total_cents
    ORDER BY v.value_cents DESC, v.s_nationkey, v.l_partkey
    """,
)
def q_bench_q11(spark, sf_dir):
    """TPC-H Q11 shape (important stock; the schema has no partsupp,
    so supplier-shipped value stands in for stock value): per
    (nation, part) value filtered against a scalar threshold — value
    above 2.5× the mean group value, evaluated as 2·value·n > 5·total
    in exact cents (scale-free, so the query stays selective-but-
    non-vacuous at every SF; no float fraction)."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    val = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy("s_nationkey", "l_partkey")
        .agg(F.sum(_cents("l_extendedprice")).cast("long").alias("value_cents"))
    )
    tot = val.agg(
        F.sum("value_cents").cast("long").alias("total_cents"),
        F.count("*").alias("n_groups"),
    )
    return (
        val.join(F.broadcast(tot))
        .filter(F.col("value_cents") * F.col("n_groups") * 2 > 5 * F.col("total_cents"))
        .select("s_nationkey", "l_partkey", "value_cents")
        .orderBy(F.col("value_cents").desc(), "s_nationkey", "l_partkey")
    )


@register(
    "bench_q20",
    """
    WITH red AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
    shipped AS (
      SELECT l.l_suppkey,
             CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem l
      WHERE l.l_partkey IN (SELECT p_partkey FROM red)
        AND l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l.l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, sh.qty
    FROM supplier s JOIN shipped sh ON s.s_suppkey = sh.l_suppkey
    WHERE sh.qty > 100
    ORDER BY s.s_suppkey
    """,
)
def q_bench_q20(spark, sf_dir):
    """TPC-H Q20 shape (suppliers with significant flow of a part
    class; no partsupp, so shipped quantity stands in for stock):
    semi-join the fact against a name-filtered part list, aggregate
    per supplier inside a year window, threshold, decorate from the
    supplier dim."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith("red")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    sup = load_table(spark, sf_dir, "supplier")
    shipped = (
        li.join(F.broadcast(part.select("p_partkey")),
                li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
        .filter(F.col("qty") > 100)
    )
    return (
        sup.join(shipped, sup.s_suppkey == shipped.l_suppkey)
        .select("s_suppkey", "s_name", "qty")
        .orderBy("s_suppkey")
    )


@register(
    "bench_q21",
    """
    WITH f AS (
      SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
    ),
    lastship AS (
      SELECT l_orderkey,
             max(l_shipdate) AS max_ship,
             CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp
      FROM f GROUP BY l_orderkey
    ),
    blamed AS (
      SELECT DISTINCT f.l_orderkey, f.l_suppkey
      FROM f JOIN lastship ls ON f.l_orderkey = ls.l_orderkey
      WHERE f.l_shipdate = ls.max_ship AND ls.n_supp >= 2
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM blamed b JOIN supplier s ON b.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
)
def q_bench_q21(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who kept multi-supplier orders
    waiting; no commit/receipt dates, so 'last supplier to ship on a
    finished multi-supplier order' carries the blame semantics): fact
    self-aggregation for per-order last-ship + supplier count, join
    back on the max (the EXISTS/NOT EXISTS pair collapsed into one
    aggregate), top-10 offenders."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    sup = load_table(spark, sf_dir, "supplier")
    f = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lastship = f.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("max_ship"),
        F.countDistinct("l_suppkey").alias("n_supp"),
    )
    blamed = (
        f.join(lastship, "l_orderkey")
        .filter(
            (F.col("l_shipdate") == F.col("max_ship")) & (F.col("n_supp") >= 2)
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        blamed.join(F.broadcast(sup), blamed.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


@register(
    "sink_compaction",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q_sink_compaction(spark, sf_dir):
    """Small-files compaction — the operational chore every landing
    zone needs: a deliberately over-fragmented write (64 shards) is
    compacted to 4 sorted files via repartition + sortWithinPartitions
    (coalesce would skip the shuffle but inherit the skew), and the
    aggregate over the compacted copy must match the raw table —
    compaction is a LAYOUT change, never a data change.  The pytest
    companion asserts the file count actually dropped."""
    _clean_stale_scratch("/tmp/wds_compact_*")
    base = f"/tmp/wds_compact_{_session_tag(spark, sf_dir)}"
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    ev.repartition(64).write.mode("overwrite").parquet(f"{base}/fragmented")
    frag = spark.read.parquet(f"{base}/fragmented")
    (
        frag.repartition(4, "event_type")
        .sortWithinPartitions("event_type", "ts", "event_id")
        .write.mode("overwrite")
        .parquet(f"{base}/compacted")
    )
    back = spark.read.parquet(f"{base}/compacted")
    return (
        back.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(_cents("value")).cast("long").alias("cents"),
        )
        .orderBy("event_type")
    )


@register(
    "ext_dedup_incremental",
    """
    WITH corpus AS (
      SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 5 <> 0
    ),
    batch AS (
      SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 5 = 0
    ),
    fresh AS (
      SELECT b.doc_id, b.h FROM batch b
      WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.h = b.h)
    )
    SELECT doc_id, h AS content_hash FROM (
      SELECT doc_id, h, row_number() OVER (
        PARTITION BY h ORDER BY doc_id) AS rn
      FROM fresh
    ) WHERE rn = 1
    """,
)
def q_ext_dedup_incremental(spark, sf_dir):
    """INCREMENTAL dedup — the production shape exact-dedup actually
    runs in: a new batch (doc_id ≡ 0 mod 5) is admitted only if its
    content hash is absent from the standing corpus (anti join on the
    hash — at scale the corpus side is a bucketed hash index, so the
    probe co-locates) AND it is the first occurrence within the batch
    itself (per-hash window).  Never rescans or rewrites the corpus;
    cost is O(batch) + one index probe."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("h")
    )
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    fresh = batch.join(corpus, "h", "left_anti")
    w = Window.partitionBy("h").orderBy("doc_id")
    return (
        fresh.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("h").alias("content_hash"))
    )


# =====================================================================
# G. Chunk-level dedup signal, exact variance
# =====================================================================


@register(
    "ext_dedup_chunks",
    f"""
    WITH t AS (
      SELECT doc_id, {_TOK_SQL} AS w FROM documents
      WHERE len({_TOK_SQL}) >= 20
    ),
    c AS (
      SELECT doc_id,
             md5(array_to_string(list_slice(w, i * 20 + 1, i * 20 + 20), ' ')) AS h
      FROM (SELECT doc_id, w, unnest(range(0, len(w) // 20)) AS i FROM t)
    ),
    freq AS (
      SELECT h, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM c GROUP BY h
    )
    SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN f.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared,
           CAST(sum(CASE WHEN f.n_docs > 1 THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS shared_micro
    FROM c JOIN freq f ON c.h = f.h
    GROUP BY c.doc_id
    """,
)
def q_ext_dedup_chunks(spark, sf_dir):
    """Chunk-level (sub-document) duplication signal: docs are cut
    into consecutive 20-token windows, each window content-hashed, and
    every doc scored by the fraction of its chunks that ALSO appear in
    another doc — the copy-paste/boilerplate contamination measure
    that whole-doc dedup can't see (a doc that quotes half of another
    survives exact AND near dedup).  Chunk hashing is one narrow pass;
    the share join is hash-equality on md5 — no similarity math."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", _tok().alias("w")).filter(F.size("w") >= 20)
    c = t.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), (F.size("w") / 20).cast("int") - 1)
        ).alias("i"),
        "w",
    ).select(
        "doc_id",
        F.md5(
            F.array_join(
                F.slice("w", F.col("i") * 20 + 1, 20), " "
            ).cast("binary")
        ).alias("h"),
    )
    freq = c.groupBy("h").agg(F.countDistinct("doc_id").alias("n_docs"))
    shared = F.when(F.col("n_docs") > 1, 1).otherwise(0)
    return (
        c.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(shared).cast("long").alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_shared",
            F.expr(
                "CAST(n_shared * 1000000 DIV n_chunks AS BIGINT)"
            ).alias("shared_micro"),
        )
    )


@register(
    "agg_variance_exact",
    """
    WITH s AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s1,
             CAST(sum(CAST(round(value * 100) AS BIGINT)
                      * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s2
      FROM events GROUP BY event_type
    )
    SELECT event_type, n, s1, s2,
           CAST(n * s2 - s1 * s1 AS DOUBLE) / CAST(n * n AS DOUBLE)
             AS var_cents2,
           sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE) / CAST(n * n AS DOUBLE))
             AS std_cents
    FROM s ORDER BY event_type
    """,
)
def q_agg_variance_exact(spark, sf_dir):
    """Population variance/stddev from associative BIGINT power sums
    (the same pattern as agg_skewness one moment down): partials (n,
    Σx, Σx²) are exact integers, so aggregation order can't change
    them; the final (n·Σx² − (Σx)²)/n² and its sqrt are ONE identical
    IEEE expression tree on both engines (division and sqrt are
    correctly rounded — mirroring the formula mirrors the bits)."""
    ev = load_table(spark, sf_dir, "events")
    c = _cents("value")
    s = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(c).cast("long").alias("s1"),
        F.sum(c * c).cast("long").alias("s2"),
    )
    var = F.expr("CAST(n * s2 - s1 * s1 AS DOUBLE) / CAST(n * n AS DOUBLE)")
    return s.select(
        "event_type", "n", "s1", "s2",
        var.alias("var_cents2"),
        F.sqrt(var).alias("std_cents"),
    ).orderBy("event_type")


# =====================================================================
# H. Dataset card, image near-dup
# =====================================================================


@register(
    "ext_data_card",
    f"""
    WITH t AS (
      SELECT doc_id, source, lang, n_chars, md5(text) AS h,
             CAST(len({_TOK_SQL}) AS BIGINT) AS n_words
      FROM documents
    ),
    dup AS (
      SELECT h, CAST(count(*) AS BIGINT) AS n_h FROM t GROUP BY h
    )
    SELECT t.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(t.n_words) AS BIGINT) AS sum_words,
           CAST(min(t.n_words) AS BIGINT) AS min_words,
           CAST(max(t.n_words) AS BIGINT) AS max_words,
           CAST(count(DISTINCT t.lang) AS BIGINT) AS n_langs,
           CAST(sum(CASE WHEN t.lang = 'en' THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS en_share_micro,
           CAST(sum(CASE WHEN dup.n_h > 1 THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS dup_share_micro
    FROM t JOIN dup ON t.h = dup.h
    GROUP BY t.source ORDER BY t.source
    """,
)
def q_ext_data_card(spark, sf_dir):
    """Per-source dataset card — the one-stop summary a data curator
    publishes next to a corpus: volume (docs, words, min/max length),
    language mix (distinct langs + English share), and exact-duplicate
    exposure (share of docs whose content hash repeats corpus-wide),
    every ratio in exact integer micro-units.  One token-count
    projection, one content-hash frequency aggregate joined back, one
    grouped rollup — three exchanges regardless of corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "source",
        "lang",
        F.md5(F.col("text").cast("binary")).alias("h"),
        F.size(_tok()).cast("long").alias("n_words"),
    )
    dup = t.groupBy("h").agg(F.count(F.lit(1)).alias("n_h"))
    en = F.when(F.col("lang") == "en", 1).otherwise(0)
    isdup = F.when(F.col("n_h") > 1, 1).otherwise(0)
    return (
        t.join(dup, "h")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").cast("long").alias("sum_words"),
            F.min("n_words").cast("long").alias("min_words"),
            F.max("n_words").cast("long").alias("max_words"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum(en).cast("long").alias("n_en"),
            F.sum(isdup).cast("long").alias("n_dup"),
        )
        .select(
            "source",
            "n_docs",
            "sum_words",
            "min_words",
            "max_words",
            "n_langs",
            F.expr("CAST(n_en * 1000000 DIV n_docs AS BIGINT)").alias(
                "en_share_micro"
            ),
            F.expr("CAST(n_dup * 1000000 DIV n_docs AS BIGINT)").alias(
                "dup_share_micro"
            ),
        )
        .orderBy("source")
    )


@register(
    "ext_multimodal_phash_near",
    """
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(0 AS INT) AS hamming
    FROM documents a JOIN documents b
      ON a.doc_id < b.doc_id AND a.doc_id % 50 = b.doc_id % 50
    """,
)
def q_ext_multimodal_phash_near(spark, sf_dir):
    """NEAR-duplicate image pairs: perceptual aHash (stdlib PNG
    decode) banded into 4 chunks, bucket-joined, Hamming-filtered at
    ≤3 bits — re-encodes/small edits pair up with no pixel
    comparison.  Uses the same planted-duplicate payload synthesis as
    ext_multimodal_phash, so exact duplicates appear at Hamming 0 and
    the banding recall contract (bands ≥ max_hamming+1) is enforced.
    See ext/multimodal.image_near_dup_pairs.

    ORACLE (round-6 upgrade): with the 'bits' payload synthesis the 50
    planted aHashes are md5 bit patterns whose minimum pairwise
    Hamming distance is 20 (computed over the fixed key set — the
    images don't vary with SF), so the ≤3 filter admits EXACTLY the
    within-group Hamming-0 pairs: every (a < b) with a ≡ b (mod 50).
    A banding recall miss, a decode flake, or a cross-group collision
    would all hash-fail."""
    from .ext.multimodal import image_near_dup_pairs

    hashed = _planted_image_hashes(spark, sf_dir)
    return image_near_dup_pairs(hashed, "doc_id", "ahash", max_hamming=3, bands=4)


@register(
    "stream_curation_pipeline",
    f"""
    WITH t AS (SELECT doc_id, text, {_TOK_SQL} AS w FROM documents),
    u AS (
      SELECT doc_id, text, CAST(len(w) AS BIGINT) AS n_words,
             CAST(coalesce(list_sum(list_transform(w, x -> len(x))), 0)
                  AS BIGINT) AS sum_chars
      FROM t
    ),
    fr AS (
      SELECT doc_id, CAST(max(cnt) AS BIGINT) AS max_freq FROM (
        SELECT doc_id, tok, count(*) AS cnt
        FROM (SELECT doc_id, unnest(w) AS tok FROM t) GROUP BY doc_id, tok
      ) GROUP BY doc_id
    ),
    k AS (
      SELECT u.doc_id, u.text
      FROM u LEFT JOIN fr ON u.doc_id = fr.doc_id
      WHERE (u.n_words BETWEEN 20 AND 80)
        AND u.sum_chars * 1000 >= 4000 * u.n_words
        AND u.sum_chars * 1000 < 4900 * u.n_words
        AND coalesce(fr.max_freq, 0) * 100 < 12 * u.n_words
    )
    SELECT CAST(0 AS BIGINT) AS batch_id,
           CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_admitted,
           CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_hashes
    FROM k
    """,
)
def q_stream_curation_pipeline(spark, sf_dir):
    """STREAMING corpus curation: the gate→dedup→admit pipeline over a
    document feed — per micro-batch quality gate (shared
    quality_gate_flags), content-hash, cross-batch anti-join against
    the admitted store, idempotent per-epoch append.  Runs the sink to
    completion (availableNow) over the staged corpus and returns the
    admitted store's per-batch accounting.  Cross-batch dedup and
    retry idempotence are pinned by tests/test_streaming.py.  See
    streaming/curation.py.

    ORACLE (round-6 upgrade, batch twin): the staged source is ONE
    coalesced file and the source caps at one file per trigger, so the
    availableNow run is exactly one epoch (batch 0) and the admitted
    store closure is the C4-gate survivors deduplicated to one row per
    content hash — restated as count(DISTINCT md5(text)) over the
    shared gate's SQL.  Multi-batch arrivals, cross-batch dedup and
    replay idempotence stay pinned by the controlled streaming
    tests."""
    from .registry import _clean_stale_scratch, _session_tag
    from .streaming.curation import curation_sink

    _clean_stale_scratch("/tmp/wds_curate_*")
    base = f"/tmp/wds_curate_{_session_tag(spark, sf_dir)}"
    import os

    src_dir = f"{base}/src"
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    if not os.path.exists(src_dir):
        docs.coalesce(1).write.mode("overwrite").parquet(src_dir)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = curation_sink(stream, f"{base}/admitted", "doc_id", "text")
    q.awaitTermination()
    admitted = spark.read.parquet(f"{base}/admitted")
    return (
        admitted.groupBy(F.col("batch").cast("long").alias("batch_id"))
        .agg(
            F.count(F.lit(1)).alias("n_admitted"),
            F.countDistinct("content_hash").alias("n_hashes"),
        )
        .orderBy("batch_id")
    )


@register(
    "win_dense_rank",
    """
    SELECT o_orderkey, o_custkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           CAST(dense_rank() OVER (
             PARTITION BY o_orderpriority
             ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC
           ) AS BIGINT) AS drank
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2001-06-01'
    """,
)
def q_win_dense_rank(spark, sf_dir):
    """dense_rank — the gap-free sibling completing the ranking-window
    family (rank / row_number / percent_rank / cume_dist / ntile):
    ranked over EXACT integer cents so ties (and therefore the dense
    numbering) are engine-identical; a non-deterministic double order
    key here would flip ranks between engines."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-06-01").cast("timestamp")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        _cents("o_totalprice").desc()
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        _cents("o_totalprice").alias("cents"),
        F.dense_rank().over(w).cast("long").alias("drank"),
    )


# =====================================================================
# I. Spark-4 API surfaces: VARIANT, UDTF, LATERAL, higher-order folds
# =====================================================================


@register(
    "f_variant_json",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k_val,
           CAST(CAST(json_extract(props, '$.k') AS INT) % 10 AS INT) AS k_mod
    FROM events
    """,
)
def q_f_variant_json(spark, sf_dir):
    """Semi-structured access through Spark 4's VARIANT type:
    ``parse_json`` once, then typed ``variant_get`` paths — the
    open-schema ingestion pattern (shred at read, not at write).
    The DuckDB oracle reads the same JSON with ``json_extract``; the
    extracted value is integer-typed on both engines."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "int")
    return ev.select(
        "event_id",
        k.alias("k_val"),
        (k % 10).cast("int").alias("k_mod"),
    )


@register(
    "ext_udtf_ngrams",
    f"""
    WITH t AS (SELECT doc_id, {_TOK_SQL} AS w FROM documents
               WHERE len({_TOK_SQL}) >= 3)
    SELECT doc_id, CAST(i - 1 AS INT) AS pos,
           array_to_string(w[i:i+2], ' ') AS gram
    FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i FROM t)
    """,
)
def q_ext_udtf_ngrams(spark, sf_dir):
    """Python user-defined TABLE function (Spark 4 ``@udtf``) expanding
    each doc into its word trigrams via a LATERAL correlated call —
    the row-expanding UDF surface the reference's udf_scalar_pattern
    doesn't cover.  NOTE the scale posture: UDTFs are row-at-a-time
    Python and exist here to prove the API surface end-to-end (the
    engine's production n-gram paths — dedup_chunks, bigrams,
    contamination — are pure JVM array expressions); the oracle checks
    the UDTF's semantics exactly."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, gram string")
    class TriGrams:
        def eval(self, doc_id: int, text: str):
            import re

            toks = [t for t in re.split(r"\s+", (text or "").lower(), flags=re.ASCII) if t]
            for i in range(len(toks) - 2):
                yield doc_id, i, " ".join(toks[i : i + 3])

    spark.udtf.register("wds_trigrams", TriGrams)
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("wds_docs_udtf")
    return spark.sql(
        """
        SELECT g.doc_id, g.pos, g.gram
        FROM wds_docs_udtf d, LATERAL wds_trigrams(d.doc_id, d.text) g
        """
    )


@register(
    "join_lateral_topn",
    """
    SELECT n.n_name, l.c_custkey, l.bal_cents
    FROM nation n, LATERAL (
      SELECT c.c_custkey,
             CAST(round(c.c_acctbal * 100) AS BIGINT) AS bal_cents
      FROM customer c WHERE c.c_nationkey = n.n_nationkey
      ORDER BY bal_cents DESC, c.c_custkey
      LIMIT 2
    ) l
    """,
)
def q_join_lateral_topn(spark, sf_dir):
    """LATERAL correlated subquery — top-2 customers per nation, the
    per-row-subquery surface (Spark decorrelates it into the same
    window plan a rank-filter produces, which is the point: the
    declarative form is free).  Ordered over exact cents with the key
    tie-break so the top-2 set is engine-identical."""
    nat = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    nat.createOrReplaceTempView("wds_nation_lat")
    cust.createOrReplaceTempView("wds_customer_lat")
    return spark.sql(
        """
        SELECT n.n_name, l.c_custkey, l.bal_cents
        FROM wds_nation_lat n, LATERAL (
          SELECT c.c_custkey,
                 CAST(round(c.c_acctbal * 100) AS BIGINT) AS bal_cents
          FROM wds_customer_lat c WHERE c.c_nationkey = n.n_nationkey
          ORDER BY bal_cents DESC, c.c_custkey
          LIMIT 2
        ) l
        """
    )


@register(
    "f_array_fold",
    """
    WITH t AS (
      SELECT o_orderkey,
             range(1, CAST(o_orderkey % 6 AS INT) + 2) AS xs
      FROM orders
    )
    SELECT o_orderkey,
           CAST(len(xs) AS INT) AS n,
           CAST(list_sum(list_transform(xs, x -> x * x)) AS BIGINT)
             AS sum_sq,
           (len(list_filter(xs, x -> x % 2 = 0)) > 0) AS has_even,
           (len(list_filter(xs, x -> NOT (x > 0))) = 0) AS all_positive,
           CAST(len(list_filter(xs, x -> x >= 3)) AS INT) AS n_ge3
    FROM t
    """,
)
def q_f_array_fold(spark, sf_dir):
    """Higher-order array functions as a named surface — transform /
    aggregate (fold) / exists / forall / filter over a generated
    integer sequence: the expression family every zero-exchange
    operator in this engine is built from (the C4 gate, repetition
    stats, chunk hashing), demonstrated in isolation with exact
    integer results."""
    orders = load_table(spark, sf_dir, "orders")
    xs = F.sequence(F.lit(1), (F.col("o_orderkey") % 6 + 1).cast("int"))
    t = orders.select("o_orderkey", xs.alias("xs"))
    return t.select(
        "o_orderkey",
        F.size("xs").cast("int").alias("n"),
        F.aggregate(
            F.transform("xs", lambda x: x * x),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("sum_sq"),
        F.exists("xs", lambda x: x % 2 == 0).alias("has_even"),
        F.forall("xs", lambda x: x > 0).alias("all_positive"),
        F.size(F.filter("xs", lambda x: x >= 3)).cast("int").alias("n_ge3"),
    )


# =====================================================================
# J. Error-as-value arithmetic, dedup-stack QA
# =====================================================================


@register(
    "f_try_arith",
    """
    SELECT event_id,
           CASE WHEN (event_id % 7) = 0 THEN NULL
                ELSE CAST(round(value * 100) AS BIGINT) / (event_id % 7)
           END AS safe_div,
           CAST(CASE WHEN (event_id % 7) = 0 THEN NULL
                ELSE CAST(round(value * 100) AS BIGINT) // (event_id % 7)
           END AS BIGINT) AS safe_intdiv,
           CASE WHEN (event_id % 7) = 0 THEN NULL
                ELSE CAST(round(value * 100) AS BIGINT) % (event_id % 7)
           END AS safe_mod
    FROM events
    """,
)
def q_f_try_arith(spark, sf_dir):
    """Error-as-value arithmetic: division / integer division / modulus
    where every seventh row divides by zero — ``try_divide`` and
    NULL-guarded DIV/mod yield NULL instead of failing the job (the
    reference's errors-are-values posture at expression level,
    server.py:280; ANSI mode would otherwise abort the whole 100 TB
    scan on one bad row).  DuckDB spells the same contract with CASE.
    Numerators are non-negative cents so `//`/`DIV` agree."""
    ev = load_table(spark, sf_dir, "events")
    den = F.col("event_id") % 7
    cents = _cents("value")
    return ev.select(
        "event_id",
        F.try_divide(cents, den).alias("safe_div"),
        F.when(den == 0, F.lit(None))
        .otherwise(F.expr("CAST(round(value * 100) AS BIGINT) DIV (event_id % 7)"))
        .cast("long")
        .alias("safe_intdiv"),
        F.when(den == 0, F.lit(None)).otherwise(cents % den).alias("safe_mod"),
    )


@register("ext_eval_dedup")  # MinHash-vs-exact QA — rows-only (hash-seeded)
def q_ext_eval_dedup(spark, sf_dir):
    """QA of the near-dup stack: precision/recall of the MinHash+LSH
    candidate pairs against the EXACT Jaccard pairs at the same
    threshold, in integer micro-units — the check a pipeline runs
    before trusting its sub-quadratic dedup path at full scale.  Both
    sides are deterministic (seeded MinHash, exact shingle join), but
    MinHash is not SQL-expressible → rows-only; the recall floor is
    pinned by pytest on the planted near-dup corpus."""
    from .ext.dedup import minhash_lsh_pairs, ngram_jaccard_pairs
    from .registry_ext import _near_dup_corpus

    corpus = _near_dup_corpus(spark, sf_dir)
    # Persist both pair tables: three downstream actions (two counts +
    # the semi-join count) would otherwise recompute the shingle-join
    # lineage from scratch each time — harmless at sf0.01, a triple
    # full-corpus pass at 100 TB.  Unpersist before returning (cache
    # manager substitutes cached fragments into unrelated plans).
    exact = (
        ngram_jaccard_pairs(corpus, "doc_id", "text", n=3, threshold=0.5)
        .select("id_a", "id_b")
        .persist()
    )
    approx = (
        minhash_lsh_pairs(corpus, "doc_id", "text")
        .select("id_a", "id_b")
        .persist()
    )
    try:
        both = exact.join(approx, ["id_a", "id_b"], "left_semi")
        n_exact = exact.count()
        n_approx = approx.count()
        n_both = both.count()
    finally:
        exact.unpersist()
        approx.unpersist()
    rows = [
        (
            int(n_exact),
            int(n_approx),
            int(n_both),
            int(n_both * 1_000_000 // max(n_approx, 1)),
            int(n_both * 1_000_000 // max(n_exact, 1)),
        )
    ]
    return local_frame(
        spark,
        rows,
        "n_exact long, n_approx long, n_both long, "
        "precision_micro long, recall_micro long",
    )


# =====================================================================
# K. Graph analytics over the near-dup graph
# =====================================================================

from .registry_ext import _NEAR_DUP_CORPUS_SQL, _NGRAM_PAIRS_SQL  # noqa: E402


@register(
    "ext_graph_degree",
    f"""
    WITH {_NEAR_DUP_CORPUS_SQL},
    {_NGRAM_PAIRS_SQL},
    edges AS (
      SELECT id_a, id_b FROM pairs
      JOIN cnt ca ON pairs.id_a = ca.id
      JOIN cnt cb ON pairs.id_b = cb.id
      WHERE inter / (ca.n_sh + cb.n_sh - inter) >= 0.5
    ),
    deg AS (
      SELECT id, CAST(count(*) AS BIGINT) AS degree FROM (
        SELECT id_a AS id FROM edges UNION ALL SELECT id_b FROM edges
      ) GROUP BY id
    )
    SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY degree ORDER BY degree
    """,
)
def q_ext_graph_degree(spark, sf_dir):
    """Degree distribution of the exact-Jaccard near-dup graph — the
    graph-health histogram a dedup pipeline checks before clustering
    (a hub with degree ≫ family size means a boilerplate shingle
    slipped through the prefix filter).  One explode + two counts over
    the edge list; the oracle rebuilds the same graph relationally."""
    from .ext.dedup import ngram_jaccard_pairs
    from .ext.graph import degree_stats
    from .registry_ext import _near_dup_corpus

    corpus = _near_dup_corpus(spark, sf_dir)
    pairs = ngram_jaccard_pairs(corpus, "doc_id", "text", n=3, threshold=0.5)
    return (
        degree_stats(pairs.select("id_a", "id_b"))
        .groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("degree")
    )


@register(
    "ext_graph_pagerank",
    f"""
    WITH RECURSIVE {_NEAR_DUP_CORPUS_SQL},
    {_NGRAM_PAIRS_SQL},
    edges AS (
      SELECT id_a, id_b FROM pairs
      JOIN cnt ca ON pairs.id_a = ca.id
      JOIN cnt cb ON pairs.id_b = cb.id
      WHERE inter / (ca.n_sh + cb.n_sh - inter) >= 0.5
    ),
    ed AS (
      SELECT id_a AS src, id_b AS dst FROM edges
      UNION
      SELECT id_b AS src, id_a AS dst FROM edges
    ),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM ed GROUP BY src),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
    pr AS (
      SELECT 0 AS it, d.src AS id,
             CAST(1000000000 // nn.n AS BIGINT) AS rank
      FROM deg d, nn
      UNION ALL
      SELECT pr.it + 1, ed.dst AS id,
             CAST(150000000 // nn.n
                  + CAST(sum(pr.rank // d.deg) AS HUGEINT) * 850000 // 1000000
               AS BIGINT) AS rank
      FROM pr
      JOIN ed ON pr.id = ed.src
      JOIN deg d ON d.src = pr.id, nn
      WHERE pr.it < 10
      GROUP BY pr.it, ed.dst, nn.n
    )
    SELECT id, rank AS rank_nano FROM pr WHERE it = 10
    """,
)
def q_ext_graph_pagerank(spark, sf_dir):
    """PageRank over the near-dup graph with EXACT INTEGER state
    (1e-9-unit ranks, floor-div contributions): the result is a pure
    function of (graph, iterations) — identical across partitionings
    and cluster sizes, unlike float PageRank whose summation order
    drifts.  10 rounds, one join+agg per round, no driver collect.
    Hand-computed two/three-node fixtures and a partitioning-
    independence pin live in pytest.  See ext/graph.pagerank_int.

    ORACLE (round-6 upgrade, the BFD recursive-CTE precedent): exact
    integer state means the whole iteration is restatable — the oracle
    rebuilds the same Jaccard-0.5 edge set relationally (shared with
    ext_graph_degree) and replays all 10 rounds in a WITH RECURSIVE
    with the identical teleport/floor-div/damping arithmetic, so every
    rank must match bit-for-bit (all operands non-negative → // and
    DIV agree)."""
    from .ext.dedup import ngram_jaccard_pairs
    from .ext.graph import pagerank_int
    from .registry_ext import _near_dup_corpus

    corpus = _near_dup_corpus(spark, sf_dir)
    pairs = ngram_jaccard_pairs(corpus, "doc_id", "text", n=3, threshold=0.5)
    return pagerank_int(pairs.select("id_a", "id_b"), n_iter=10)


# =====================================================================
# L. Pareto share curve, behavioral transition matrix
# =====================================================================


@register(
    "win_cume_share",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, cents,
           CAST(sum(cents) OVER (
             PARTITION BY event_type ORDER BY cents DESC, day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) * 1000000 // sum(cents) OVER (PARTITION BY event_type)
           AS BIGINT) AS cume_share_micro
    FROM daily
    """,
)
def q_win_cume_share(spark, sf_dir):
    """Pareto / concentration curve per group: days ranked by volume,
    each carrying the RUNNING share of its type's total in exact
    integer micro-units (cumsum·1e6 DIV total — both window sums over
    exact cents).  Read off 'the top-k days carry X% of volume'
    directly; the ordering tie-breaks on day so the curve is
    engine-identical.  Both windows share one partitioning."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum(_cents("value")).cast("long").alias("cents")
    )
    # both window specs live inside ONE SQL expression so the exact
    # integer division composes the two sums directly
    return daily.select(
        "event_type",
        "day",
        "cents",
        F.expr(
            "CAST(sum(cents) OVER (PARTITION BY event_type"
            " ORDER BY cents DESC, day"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1000000"
            " DIV sum(cents) OVER (PARTITION BY event_type) AS BIGINT)"
        ).alias("cume_share_micro"),
    )


@register(
    "win_transition_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) * 1000000 // sum(count(*)) OVER (
             PARTITION BY event_type) AS BIGINT) AS prob_micro
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
)
def q_win_transition_matrix(spark, sf_dir):
    """First-order behavioral transition matrix: for each user the
    NEXT event type (lead over the (ts, id) total order), counted into
    from→to cells with the row-conditional probability in exact
    integer micro-units — the Markov-chain view of the event stream
    that funnels and streaks are special cases of.  One window + one
    agg + one per-row-group share window."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    counts = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count("*").alias("n"))
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.expr(
            "CAST(n * 1000000 DIV sum(n) OVER (PARTITION BY from_type)"
            " AS BIGINT)"
        ).alias("prob_micro"),
    )


