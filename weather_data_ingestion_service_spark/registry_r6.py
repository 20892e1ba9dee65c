"""Round-6 registry additions.

Cross-engine compare rules are documented at the top of registry.py —
every oracle-paired entry here follows them (exact integer arithmetic,
no float folds, deterministic tie-breaks).  All divisions in this
module have NON-NEGATIVE numerators (events.value ≥ 0, counts ≥ 0), so
DuckDB's floor `//` and Spark's truncating `DIV` agree without the
theilsen-style sign CASE.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .io import load_table
from .registry import (
    register,
)

# (round-9's agg_survival_km re-cert call removed at round-10 start:
# CORRECTNESS_r09 shows it green again.)
from .registry_r4 import _TOK_SQL, _tok

#: daily cents per event type — the shared series the trend/window
#: operators below run over (same SQL shape agg_trend_mk uses)
_DAILY_SQL = """
    d AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2)
"""


def _daily(spark, sf_dir):
    from .registry import _cents

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.sum(_cents("value")).cast("long").alias("cents"))


# =====================================================================
# A. Dyadic-weight EWMA (exact integer smoothing)
# =====================================================================


@register(
    "win_ewma_dyadic",
    f"""
    WITH {_DAILY_SQL},
    l AS (
      SELECT event_type, day,
             lag(cents, 0) OVER w AS c0, lag(cents, 1) OVER w AS c1,
             lag(cents, 2) OVER w AS c2, lag(cents, 3) OVER w AS c3,
             lag(cents, 4) OVER w AS c4, lag(cents, 5) OVER w AS c5,
             lag(cents, 6) OVER w AS c6, lag(cents, 7) OVER w AS c7,
             lag(cents, 8) OVER w AS c8, lag(cents, 9) OVER w AS c9
      FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day))
    SELECT event_type, day,
           CAST(CAST(c0 * 512 + c1 * 256 + c2 * 128 + c3 * 64 + c4 * 32
                     + c5 * 16 + c6 * 8 + c7 * 4 + c8 * 2 + c9
                AS HUGEINT) * 1000000 // 1023 AS BIGINT) AS ewma_micro
    FROM l WHERE c9 IS NOT NULL
    """,
)
def q_win_ewma_dyadic(spark, sf_dir):
    """Exponentially weighted moving average with EXACT integer state:
    dyadic weights 2⁹…2⁰ over the last 10 daily observations
    (α = 1/2 truncated at depth 10), so the weighted sum is one
    integer dot product and ewma_micro is a single exact floor-divide
    by 2¹⁰−1 — none of float EWMA's order-of-summation drift.  Rows
    need a full 10-row history (lag-9 non-null).  Scale shape: a
    per-key row window over the tiny daily aggregate; the raw-events
    pass is the only full-data scan."""
    d = _daily(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("day")
    num = F.col("cents") * (1 << 9)
    for j in range(1, 10):
        num = num + F.lag("cents", j).over(w) * (1 << (9 - j))
    return (
        d.select(
            "event_type",
            "day",
            num.alias("num"),
            F.lag("cents", 9).over(w).alias("c9"),
        )
        .filter(F.col("c9").isNotNull())
        .select(
            "event_type",
            "day",
            F.expr(
                "CAST(CAST(num AS DECIMAL(38,0)) * 1000000 DIV 1023"
                " AS BIGINT)"
            ).alias("ewma_micro"),
        )
    )


# =====================================================================
# B. Rolling exact median (order-statistic window)
# =====================================================================


@register(
    "win_rolling_median",
    f"""
    WITH {_DAILY_SQL},
    l AS (
      SELECT event_type, day,
             lag(cents, 4) OVER w AS c4,
             list_sort([lag(cents, 4) OVER w, lag(cents, 3) OVER w,
                        lag(cents, 2) OVER w, lag(cents, 1) OVER w,
                        cents]) AS arr
      FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day))
    SELECT event_type, day, CAST(arr[3] AS BIGINT) AS med5_cents
    FROM l WHERE c4 IS NOT NULL
    """,
)
def q_win_rolling_median(spark, sf_dir):
    """Rolling EXACT median of the last 5 daily cents values per key:
    the 5-element window is materialized as a sorted array and the
    median is the 3rd order statistic — selection, never
    interpolation, so the result is engine- and
    partitioning-independent (the CLAUDE.md median rule applied to a
    moving frame).  Full windows only (lag-4 non-null)."""
    d = _daily(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("day")
    arr = F.array_sort(
        F.array(
            F.lag("cents", 4).over(w),
            F.lag("cents", 3).over(w),
            F.lag("cents", 2).over(w),
            F.lag("cents", 1).over(w),
            F.col("cents"),
        )
    )
    return (
        d.select(
            "event_type",
            "day",
            arr.alias("arr"),
            F.lag("cents", 4).over(w).alias("c4"),
        )
        .filter(F.col("c4").isNotNull())
        .select(
            "event_type",
            "day",
            F.col("arr").getItem(2).cast("long").alias("med5_cents"),
        )
    )


# =====================================================================
# C. CUSUM drift detector (division-free integer deviations)
# =====================================================================


@register(
    "win_cusum",
    f"""
    WITH {_DAILY_SQL},
    t AS (
      SELECT event_type, day, cents,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
             CAST(sum(cents) OVER (PARTITION BY event_type) AS BIGINT) AS s
      FROM d)
    SELECT event_type, day,
           CAST(sum(n * cents - s) OVER (
             PARTITION BY event_type ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cusum_scaled
    FROM t
    """,
)
def q_win_cusum(spark, sf_dir):
    """CUSUM drift detector per event type, DIVISION-FREE: instead of
    accumulating float deviations from the mean, accumulate
    ``n·cᵤ − S`` (deviation scaled by the key's row count n), which is
    an exact integer and proportional to the classical CUSUM by the
    constant n — zero crossings and extrema land on the same days.
    Bound: |cusum_scaled| ≤ n·Σ|c|, inside int64 for any daily series
    whose total cents fit in ~2⁴³; the two global per-key aggregates
    ride the same window pass as the cumulative sum."""
    d = _daily(spark, sf_dir)
    wk = Window.partitionBy("event_type")
    wc = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t = d.select(
        "event_type",
        "day",
        "cents",
        F.count(F.lit(1)).over(wk).cast("long").alias("n"),
        F.sum("cents").over(wk).cast("long").alias("s"),
    )
    return t.select(
        "event_type",
        "day",
        F.sum(F.col("n") * F.col("cents") - F.col("s"))
        .over(wc)
        .cast("long")
        .alias("cusum_scaled"),
    )


# =====================================================================
# D. Lag-1 autocorrelation moments (exact DECIMAL accumulators)
# =====================================================================


@register(
    "agg_autocorr",
    f"""
    WITH {_DAILY_SQL},
    p AS (
      SELECT event_type, cents AS x,
             lead(cents) OVER (PARTITION BY event_type ORDER BY day) AS y
      FROM d),
    q AS (SELECT * FROM p WHERE y IS NOT NULL)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CAST(x AS HUGEINT)) AS VARCHAR) AS sum_x,
           CAST(sum(CAST(y AS HUGEINT)) AS VARCHAR) AS sum_y,
           CAST(sum(CAST(x AS HUGEINT) * y) AS VARCHAR) AS sum_xy,
           CAST(sum(CAST(x AS HUGEINT) * x) AS VARCHAR) AS sum_xx,
           CAST(sum(CAST(y AS HUGEINT) * y) AS VARCHAR) AS sum_yy
    FROM q GROUP BY event_type ORDER BY event_type
    """,
)
def q_agg_autocorr(spark, sf_dir):
    """Lag-1 autocorrelation of the daily cents series per event type,
    published as the EXACT integer moment table (n, Σx, Σy, Σxy, Σx²,
    Σy²) rather than the float ρ — the moments are associative
    DECIMAL(38,0) sums (cents² × days exceeds int64 at warehouse
    scale — the spearman lesson), engine-identical, and ρ is one
    driver-side formula away for any consumer.  The consecutive-day
    pairing is a lead() row window, no self-join.

    Publication rule (round 7): the DECIMAL accumulators are CAST TO
    STRING in the published projection — pandas-level canonicalizers
    hash Spark's Decimal objects differently from DuckDB's decimal
    values even when bit-identical (the ext_eval_spearman r6 red);
    digit strings are representation-proof and stay exact."""
    d = _daily(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("day")
    p = d.select(
        "event_type",
        F.col("cents").alias("x"),
        F.lead("cents").over(w).alias("y"),
    ).filter(F.col("y").isNotNull())
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    return (
        p.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(dec("x")).cast("decimal(38,0)").cast("string").alias("sum_x"),
            F.sum(dec("y")).cast("decimal(38,0)").cast("string").alias("sum_y"),
            F.sum(dec("x") * dec("y"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("sum_xy"),
            F.sum(dec("x") * dec("x"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("sum_xx"),
            F.sum(dec("y") * dec("y"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("sum_yy"),
        )
        .orderBy("event_type")
    )


# =====================================================================
# E. Gini impurity of the event-type mix per day
# =====================================================================


@register(
    "agg_gini_impurity",
    """
    WITH c AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2),
    t AS (
      SELECT day, CAST(sum(cnt) AS BIGINT) AS n,
             CAST(sum(CAST(cnt AS HUGEINT) * cnt) AS HUGEINT) AS ss
      FROM c GROUP BY day)
    SELECT day, n,
           CAST((CAST(n AS HUGEINT) * n - ss) * 1000000
                // (CAST(n AS HUGEINT) * n) AS BIGINT) AS gini_micro
    FROM t ORDER BY day
    """,
)
def q_agg_gini_impurity(spark, sf_dir):
    """Gini impurity of the event-type mix per day in exact integer
    micro-units: 1 − Σ(nᵢ/n)² = (n² − Σnᵢ²)/n², cleared of fractions
    before the single floor-divide (numerator is non-negative, so
    floor == truncate on both engines).  The mixture-health signal a
    data pipeline tracks per shard/day; two map-side-combinable
    aggregates, no window."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    t = c.groupBy("day").agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum(F.col("cnt").cast("decimal(38,0)") * F.col("cnt"))
        .cast("decimal(38,0)")
        .alias("ss"),
    )
    return t.select(
        "day",
        "n",
        F.expr(
            "CAST((CAST(n AS DECIMAL(38,0)) * n - ss) * 1000000"
            " DIV (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"
        ).alias("gini_micro"),
    ).orderBy("day")


# =====================================================================
# F. Feature-hashing term frequencies (portable hashing trick)
# =====================================================================


@register(
    "ext_text_hashtf",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOK_SQL}) AS tok FROM documents)
    SELECT doc_id,
           CAST(CAST('0x' || substr(md5(tok), 1, 13) AS BIGINT) % 16
                AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS tf
    FROM tok GROUP BY doc_id, bucket
    """,
)
def q_ext_text_hashtf(spark, sf_dir):
    """Feature-hashing term frequencies (the hashing trick behind
    Spark MLlib's HashingTF, restated with an ENGINE-PORTABLE hash):
    bucket = first 52 bits of md5(token) mod 16, counts per (doc,
    bucket) — fixed-width feature vectors with no vocabulary pass, the
    property that makes the trick work on an unbounded 100 TB token
    stream.  Entirely JVM-side (md5/conv/explode), one hash aggregate;
    same md5-prefix convention as ext_sample_contrastive."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_tok()).alias("tok"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("tok").cast("binary")), 1, 13), 16, 10)
        .cast("long")
        % 16
    )
    return tok.groupBy("doc_id", bucket.cast("int").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )


# =====================================================================
# G. PNG container metadata (chunk walk, no pixel decode)
# =====================================================================


@register(
    "ext_multimodal_meta",
    """
    SELECT doc_id,
           CAST(16 + (doc_id % 5) * 8 AS INT) AS width,
           CAST(16 AS INT) AS height,
           CAST(8 AS INT) AS bit_depth,
           CAST(2 AS INT) AS color_type,
           CAST(3 AS INT) AS n_chunks,
           CAST(13 AS INT) AS ihdr_len
    FROM documents
    """,
)
def q_ext_multimodal_meta(spark, sf_dir):
    """PNG container metadata at scan speed: walk the chunk framing
    and parse the big-endian IHDR — dimensions, bit depth, color type,
    chunk count — WITHOUT inflating any zlib stream; the validation/
    routing pass a multimodal pipeline runs before spending decode
    CPU.  Payload synthesis varies the width per doc (16 + (doc_id mod
    5)·8), so the oracle restates the parsed header as a pure function
    of doc_id — a wrong endianness, chunk-walk off-by-one, or
    signature check would hash-fail.  See ext/multimodal.png_meta."""
    from .ext.multimodal import png_meta, synth_png_payload

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    parts = [
        synth_png_payload(
            docs.filter(F.col("doc_id") % 5 == k), width=16 + k * 8
        )
        for k in range(5)
    ]
    payloads = parts[0]
    for p in parts[1:]:
        payloads = payloads.unionByName(p)
    return png_meta(payloads, "doc_id", "payload")


# =====================================================================
# H. Confusion-matrix eval of a cheap gate vs the C4 gate
# =====================================================================


@register(
    "ext_eval_confusion",
    f"""
    WITH t AS (SELECT doc_id, n_chars, {_TOK_SQL} AS w FROM documents),
    u AS (
      SELECT doc_id, n_chars, CAST(len(w) AS BIGINT) AS n_words,
             CAST(coalesce(list_sum(list_transform(w, x -> len(x))), 0)
                  AS BIGINT) AS sum_chars
      FROM t),
    fr AS (
      SELECT doc_id, CAST(max(cnt) AS BIGINT) AS max_freq FROM (
        SELECT doc_id, tok, count(*) AS cnt
        FROM (SELECT doc_id, unnest(w) AS tok FROM t)
        GROUP BY doc_id, tok) GROUP BY doc_id),
    g AS (
      SELECT u.doc_id,
             ((u.n_words BETWEEN 20 AND 80)
              AND u.sum_chars * 1000 >= 4000 * u.n_words
              AND u.sum_chars * 1000 < 4900 * u.n_words
              AND coalesce(fr.max_freq, 0) * 100 < 12 * u.n_words) AS truth,
             (u.n_chars BETWEEN 150 AND 350) AS pred
      FROM u LEFT JOIN fr ON u.doc_id = fr.doc_id),
    m AS (
      SELECT CAST(sum(CASE WHEN truth AND pred THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN NOT truth AND pred THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN truth AND NOT pred THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             CAST(sum(CASE WHEN NOT truth AND NOT pred THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM g)
    SELECT tp, fp, fn, tn,
           CAST(tp * 1000000 // greatest(tp + fp, 1) AS BIGINT)
             AS precision_micro,
           CAST(tp * 1000000 // greatest(tp + fn, 1) AS BIGINT)
             AS recall_micro,
           CAST(2 * tp * 1000000 // greatest(2 * tp + fp + fn, 1) AS BIGINT)
             AS f1_micro
    FROM m
    """,
)
def q_ext_eval_confusion(spark, sf_dir):
    """Confusion matrix + precision/recall/F1 of a CHEAP filter (char
    count in [150, 350]) against the full C4 quality gate as truth —
    the eval a pipeline runs before swapping an expensive gate for a
    cheap prefilter.  Truth comes from the SHARED quality_gate_flags
    implementation (the same one ext_filter_c4 / the curation funnel
    use, so gate semantics can't drift); all rates are exact integer
    micro-units with greatest(,1) zero guards (numerators
    non-negative, so // == DIV)."""
    from .ext.text import quality_gate_flags

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", "text"
    )
    g = quality_gate_flags(docs, "text").select(
        F.col("keep").alias("truth"),
        F.col("n_chars").between(150, 350).alias("pred"),
    )
    m = g.agg(
        F.sum(F.when(F.col("truth") & F.col("pred"), 1).otherwise(0))
        .cast("long")
        .alias("tp"),
        F.sum(F.when(~F.col("truth") & F.col("pred"), 1).otherwise(0))
        .cast("long")
        .alias("fp"),
        F.sum(F.when(F.col("truth") & ~F.col("pred"), 1).otherwise(0))
        .cast("long")
        .alias("fn"),
        F.sum(F.when(~F.col("truth") & ~F.col("pred"), 1).otherwise(0))
        .cast("long")
        .alias("tn"),
    )
    return m.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.expr("CAST(tp * 1000000 DIV greatest(tp + fp, 1) AS BIGINT)").alias(
            "precision_micro"
        ),
        F.expr("CAST(tp * 1000000 DIV greatest(tp + fn, 1) AS BIGINT)").alias(
            "recall_micro"
        ),
        F.expr(
            "CAST(2 * tp * 1000000 DIV greatest(2 * tp + fp + fn, 1)"
            " AS BIGINT)"
        ).alias("f1_micro"),
    )


# =====================================================================
# I. Deterministic content-addressed ids (md5 UUID format)
# =====================================================================


@register(
    "f_uuid_md5",
    """
    WITH h AS (
      SELECT doc_id, md5('doc:' || CAST(doc_id AS VARCHAR)) AS x
      FROM documents)
    SELECT doc_id,
           substr(x, 1, 8) || '-' || substr(x, 9, 4) || '-' ||
           substr(x, 13, 4) || '-' || substr(x, 17, 4) || '-' ||
           substr(x, 21, 12) AS doc_uuid
    FROM h
    """,
)
def q_f_uuid_md5(spark, sf_dir):
    """Deterministic content-addressed row ids: the md5 of a
    namespaced key formatted in the canonical 8-4-4-4-12 UUID
    grouping — reproducible across engines/runs/partitionings, unlike
    ``uuid()`` (random) or ``monotonically_increasing_id()``
    (partition-layout-dependent), which is what makes it usable as a
    join key written by independent pipeline stages."""
    docs = load_table(spark, sf_dir, "documents")
    x = F.md5(
        F.concat(F.lit("doc:"), F.col("doc_id").cast("string")).cast("binary")
    )
    return docs.select(
        "doc_id",
        F.concat_ws(
            "-",
            F.substring(x, 1, 8),
            F.substring(x, 9, 4),
            F.substring(x, 13, 4),
            F.substring(x, 17, 4),
            F.substring(x, 21, 12),
        ).alias("doc_uuid"),
    )


# =====================================================================
# J. Morton / Z-order spatial clustering key (exact bit interleave)
# =====================================================================

#: Σ_i ((x>>i)&1)<<2i  |  ((y>>i)&1)<<(2i+1) — spelled out so both
#: engines run the identical 16-term integer expression
_MORTON_TERMS = " + ".join(
    f"(((tile_x >> {i}) & 1) * {1 << (2 * i)})"
    f" + (((tile_y >> {i}) & 1) * {1 << (2 * i + 1)})"
    for i in range(8)
)


@register(
    "f_morton_z",
    f"""
    WITH t AS (
      SELECT c_custkey,
             CAST(floor((CAST(c_custkey % 500 AS DOUBLE) - 200.0 + 180.0)
                  / 360.0 * 256.0) AS BIGINT) AS tile_x,
             CAST(floor((90.0 - c_acctbal / 60.0) / 180.0 * 256.0)
               AS BIGINT) AS tile_y
      FROM customer
      WHERE c_acctbal / 60.0 BETWEEN -90 AND 90
        AND CAST(c_custkey % 500 AS DOUBLE) - 200.0 BETWEEN -180 AND 180)
    SELECT c_custkey, tile_x, tile_y,
           CAST({_MORTON_TERMS} AS BIGINT) AS z_key
    FROM t
    """,
)
def q_f_morton_z(spark, sf_dir):
    """Morton (Z-order) key over the zoom-8 tile grid: interleave the
    8 bits of tile_x and tile_y into one 16-bit key — the spatial
    CLUSTERING key for data skipping: range-partitioning and sorting
    writes by z_key keeps spatially-near rows in the same parquet row
    groups, so a lat/lon box predicate prunes via min/max statistics
    (the Z-ordering trick behind Delta/Iceberg OPTIMIZE, as a plain
    column).  Exact 16-term integer bit expression, identical on both
    engines; same tile derivation as f_geo_tile."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.col("c_acctbal") / 60.0).alias("lat"),
        ((F.col("c_custkey") % 500).cast("double") - 200.0).alias("lon"),
    )
    z = 256.0
    t = cust.filter(
        F.col("lat").between(-90, 90) & F.col("lon").between(-180, 180)
    ).select(
        "c_custkey",
        F.floor((F.col("lon") + 180.0) / 360.0 * z).cast("long").alias("tile_x"),
        F.floor((90.0 - F.col("lat")) / 180.0 * z).cast("long").alias("tile_y"),
    )
    return t.select(
        "c_custkey",
        "tile_x",
        "tile_y",
        F.expr(f"CAST({_MORTON_TERMS} AS BIGINT)").alias("z_key"),
    )


# =====================================================================
# K. IQR anomaly flags (exact rank-selected quartiles)
# =====================================================================


@register(
    "win_anomaly_iqr",
    f"""
    WITH {_DAILY_SQL},
    r AS (
      SELECT event_type, day, cents,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY cents, day) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM d),
    q AS (
      SELECT event_type,
             min(CASE WHEN rn = (n + 3) // 4 THEN cents END) AS q1,
             min(CASE WHEN rn = (3 * n + 3) // 4 THEN cents END) AS q3
      FROM r GROUP BY event_type)
    SELECT r.event_type, r.day, r.cents,
           (r.cents < q.q1 - 3 * (q.q3 - q.q1) // 2) AS is_low,
           (r.cents > q.q3 + 3 * (q.q3 - q.q1) // 2) AS is_high
    FROM r JOIN q ON r.event_type = q.event_type
    """,
)
def q_win_anomaly_iqr(spark, sf_dir):
    """Tukey-fence anomaly flags per key: quartiles are SELECTED at
    explicit ranks ceil(n/4) and ceil(3n/4) under the (cents, day)
    total order — never interpolated (the CLAUDE.md quantile rule) —
    and the 1.5·IQR fences are exact integers (3·IQR DIV 2, IQR ≥ 0 so
    floor == truncate).  One rank window over the tiny daily table
    plus a per-key broadcastable quartile join-back."""
    d = _daily(spark, sf_dir)
    wr = Window.partitionBy("event_type").orderBy("cents", "day")
    wn = Window.partitionBy("event_type")
    r = d.select(
        "event_type",
        "day",
        "cents",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    q = r.groupBy("event_type").agg(
        F.min(F.when(F.col("rn") == F.expr("(n + 3) DIV 4"), F.col("cents"))).alias("q1"),
        F.min(
            F.when(F.col("rn") == F.expr("(3 * n + 3) DIV 4"), F.col("cents"))
        ).alias("q3"),
    )
    fence = F.expr("3 * (q3 - q1) DIV 2")
    return r.join(F.broadcast(q), "event_type").select(
        "event_type",
        "day",
        "cents",
        (F.col("cents") < F.col("q1") - fence).alias("is_low"),
        (F.col("cents") > F.col("q3") + fence).alias("is_high"),
    )


# =====================================================================
# L. Winsorized mean (robust location, exact clamps)
# =====================================================================


@register(
    "agg_winsorized_mean",
    f"""
    WITH {_DAILY_SQL},
    r AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY cents, day) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM d),
    b AS (
      SELECT event_type,
             min(CASE WHEN rn = (n + 19) // 20 THEN cents END) AS lo,
             min(CASE WHEN rn = (19 * n + 19) // 20 THEN cents END) AS hi
      FROM r GROUP BY event_type)
    SELECT r.event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(min(b.lo) AS BIGINT) AS lo_cents,
           CAST(min(b.hi) AS BIGINT) AS hi_cents,
           CAST(sum(least(greatest(r.cents, b.lo), b.hi)) * 1000000
                // count(*) AS BIGINT) AS wmean_micro
    FROM r JOIN b ON r.event_type = b.event_type
    GROUP BY r.event_type ORDER BY r.event_type
    """,
)
def q_agg_winsorized_mean(spark, sf_dir):
    """Winsorized mean of the daily cents series per key: clamp to the
    rank-SELECTED 5th/95th percentile values (ranks ceil(n/20),
    ceil(19n/20) under the (cents, day) total order — selection, not
    interpolation) and publish the exact integer micro-mean — the
    robust location estimate a metrics pipeline prefers over the
    outlier-dragged mean.  Same rank-window + broadcast bounds shape
    as win_anomaly_iqr."""
    d = _daily(spark, sf_dir)
    wr = Window.partitionBy("event_type").orderBy("cents", "day")
    wn = Window.partitionBy("event_type")
    r = d.select(
        "event_type",
        "cents",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    b = r.groupBy("event_type").agg(
        F.min(
            F.when(F.col("rn") == F.expr("(n + 19) DIV 20"), F.col("cents"))
        ).alias("lo"),
        F.min(
            F.when(F.col("rn") == F.expr("(19 * n + 19) DIV 20"), F.col("cents"))
        ).alias("hi"),
    )
    return (
        r.join(F.broadcast(b), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.min("lo").cast("long").alias("lo_cents"),
            F.min("hi").cast("long").alias("hi_cents"),
            F.expr(
                "CAST(sum(least(greatest(cents, lo), hi)) * 1000000"
                " DIV count(*) AS BIGINT)"
            ).alias("wmean_micro"),
        )
        .orderBy("event_type")
    )


# =====================================================================
# M. Mann-Whitney U (exact doubled-rank integers)
# =====================================================================


@register(
    "agg_mannwhitney",
    f"""
    WITH {_DAILY_SQL},
    r AS (
      SELECT event_type,
             rank() OVER (ORDER BY cents) AS rmin,
             count(*) OVER (PARTITION BY cents) AS cnt
      FROM d)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(2 * rmin + cnt - 1)
                - count(*) * (count(*) + 1) AS BIGINT) AS u_x2
    FROM r GROUP BY event_type ORDER BY event_type
    """,
)
def q_agg_mannwhitney(spark, sf_dir):
    """One-vs-rest Mann-Whitney U per event type — the nonparametric
    "does this key's distribution sit higher than the rest of the
    pool" test, in EXACT integers: tie-averaged ranks are kept doubled
    (avg rank of a tie run starting at min-rank a with c members is
    (2a + c - 1)/2, so 2·R is integral) and U·2 = 2·R − n(n+1) is
    published as BIGINT — no float ranks, engine-independent.

    Scale shape: ranks come from a cumulative count over the DISTINCT
    daily-cents frequency table (bounded by days x types), never a
    row-level global sort; raw events are touched once by the daily
    rollup.  The oracle restates it with a plain rank window —
    identical by rmin = 1 + (count of strictly smaller rows)."""
    from .operators.aggregates import mannwhitney_one_vs_rest

    return mannwhitney_one_vs_rest(_daily(spark, sf_dir))


# =====================================================================
# N. Welch two-sample t (power sums -> one IEEE tree)
# =====================================================================

#: shared Spark-SQL/DuckDB expression strings — parity by construction
#: (the library operator embeds the SAME strings in its plan)
from .operators.aggregates import WELCH_MEAN_SQL as _WELCH_MEAN  # noqa: E402
from .operators.aggregates import WELCH_T_SQL as _WELCH_T  # noqa: E402
from .operators.aggregates import (  # noqa: E402
    WELCH_NONDEGENERATE_SQL as _WELCH_GUARD,
)


@register(
    "agg_ttest_welch",
    f"""
    WITH {_DAILY_SQL},
    s AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n1,
             CAST(sum(cents) AS BIGINT) AS a1,
             CAST(sum(CAST(cents AS HUGEINT) * cents) AS DECIMAL(38,0)) AS b1
      FROM d GROUP BY event_type),
    t AS (
      SELECT CAST(sum(n1) AS BIGINT) AS nn, CAST(sum(a1) AS BIGINT) AS aa,
             CAST(sum(b1) AS DECIMAL(38,0)) AS bb
      FROM s),
    x AS (
      SELECT event_type, n1, a1, b1,
             nn - n1 AS n2, aa - a1 AS a2,
             CAST(bb - b1 AS DECIMAL(38,0)) AS b2
      FROM s CROSS JOIN t)
    SELECT event_type, n1, n2,
           {_WELCH_MEAN} AS mean_diff_cents,
           {_WELCH_T} AS t_welch
    FROM x WHERE n1 >= 2 AND n2 >= 2 AND {_WELCH_GUARD}
    ORDER BY event_type
    """,
)
def q_agg_ttest_welch(spark, sf_dir):
    """Welch's unequal-variance t statistic, one event type vs the
    pooled rest, from associative integer power sums (n, Σx, Σx²) —
    the agg_variance_exact pattern extended to a two-sample test.  The
    complement group's sums are derived by subtraction from one
    broadcast one-row total, so k one-vs-rest tests cost ONE pass.
    Σx² and the n·Σx² − (Σx)² cross-products are accumulated in
    DECIMAL(38,0) end to end (a BIGINT Σx² wraps silently past ~sf10
    daily magnitudes — the spearman_rho lesson); keys where BOTH sides
    are constant (zero pooled variance → division by zero, which the
    engines disagree on) are filtered identically; the final
    mean-diff / sqrt(v1/n1 + v2/n2) is one identical correctly-rounded
    IEEE expression tree on both engines, shared as a literal string
    with the oracle."""
    from .operators.aggregates import welch_ttest_one_vs_rest

    return welch_ttest_one_vs_rest(_daily(spark, sf_dir))


# =====================================================================
# O. Gopher quality gate (Rae et al. 2021 document rules)
# =====================================================================

#: Gopher stopword requirement: >= 2 distinct hits from this list
from .ext.text import GOPHER_STOPWORDS as _GOPHER_STOPWORDS  # noqa: E402

#: derived from the library list so oracle and plan can never drift
_GOPHER_STOPS = ",".join(f"'{w}'" for w in _GOPHER_STOPWORDS)


@register(
    "ext_filter_gopher",
    f"""
    WITH t AS (
      SELECT doc_id, {_TOK_SQL} AS toks FROM documents),
    m AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0)
                  AS BIGINT) AS sum_wlen,
             CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
                  AS BIGINT) AS n_alpha,
             CAST(len(list_intersect(toks, [{_GOPHER_STOPS}]))
                  AS BIGINT) AS n_stop,
             CAST(len(list_filter(toks,
                      x -> contains(x, '#') OR contains(x, '...')))
                  AS BIGINT) AS n_sym
      FROM t)
    SELECT doc_id, n_words, sum_wlen, n_alpha, n_stop,
           (n_words BETWEEN 50 AND 100000) AS ok_words,
           (3 * n_words <= sum_wlen AND sum_wlen <= 10 * n_words)
             AS ok_wordlen,
           (100 * n_alpha >= 80 * n_words) AS ok_alpha,
           (n_stop >= 2) AS ok_stop,
           (10 * n_sym <= n_words) AS ok_symbols,
           ((n_words BETWEEN 50 AND 100000)
            AND (3 * n_words <= sum_wlen AND sum_wlen <= 10 * n_words)
            AND (100 * n_alpha >= 80 * n_words)
            AND (n_stop >= 2) AND (10 * n_sym <= n_words)) AS keep
    FROM m ORDER BY doc_id
    """,
)
def q_ext_filter_gopher(spark, sf_dir):
    """Gopher document-quality rules (Rae et al. 2021 §A.1.1) as an
    exact integer gate, the MassiveText sibling of ext_filter_c4:
    word-count band [50, 100k], mean word length in [3, 10] (stated as
    cross-multiplied integer bounds — no division), >= 80% of words
    containing an alphabetic character, >= 2 distinct stopword hits,
    and symbol-to-word ratio ('#'/'...') <= 0.1.  Per-rule flags are
    published alongside the combined keep so the funnel attribution
    per rule is one aggregation away.  The newline-dependent rules
    (bullet / ellipsis line starts) are out of scope for the
    single-line synthetic corpus and documented off.  One narrow
    projection over the token array; the whole gate is codegen'd —
    100 TB shape is scan-bound."""
    from .ext.text import gopher_flags

    return gopher_flags(load_table(spark, sf_dir, "documents"))


# =====================================================================
# P. Preference-pair construction (RLHF chosen/rejected mining)
# =====================================================================


@register(
    "ext_pref_pairs",
    f"""
    WITH t AS (
      SELECT doc_id, lang, source,
             CAST(len(list_distinct({_TOK_SQL})) AS BIGINT) AS score
      FROM documents),
    r AS (
      SELECT doc_id, lang, source, score,
             row_number() OVER (PARTITION BY lang, source
                                ORDER BY score DESC, doc_id ASC) AS rb,
             row_number() OVER (PARTITION BY lang, source
                                ORDER BY score ASC, doc_id DESC) AS rw,
             count(*) OVER (PARTITION BY lang, source) AS n
      FROM t)
    SELECT b.lang, b.source, CAST(b.rb AS BIGINT) AS pair_rank,
           b.doc_id AS chosen_id, w.doc_id AS rejected_id,
           CAST(b.score - w.score AS BIGINT) AS score_gap
    FROM r b JOIN r w
      ON b.lang = w.lang AND b.source = w.source AND b.rb = w.rw
    WHERE b.rb <= 3 AND 2 * b.rb <= b.n
    ORDER BY b.lang, b.source, pair_rank
    """,
)
def q_ext_pref_pairs(spark, sf_dir):
    """Preference-pair mining for reward-model / DPO training data:
    within each (lang, source) group, pair the i-th best document with
    the i-th worst (lexical-diversity score = distinct token count,
    deterministic id tie-breaks), up to 3 pairs, guarded by 2i <= n so
    chosen and rejected never alias.  MIRRORED tie-breaks (DESC,id ASC
    vs ASC,id DESC) make the worst-ranking the exact reverse of the
    best-ranking — the pairing is a pure total-order fold, identical
    on any engine.  Scale shape: two row_number windows over the same
    (lang, source) partitioning (one exchange, two sorts) and a
    self-join keyed by (group, rank) that touches <= 3 rows per side
    per group."""
    from .ext.sampling import preference_pairs

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "lang", "source",
        F.size(F.array_distinct(_tok())).cast("long").alias("score"),
    )
    return preference_pairs(scored, ["lang", "source"], "score", "doc_id", k=3)


# =====================================================================
# Q. Point-in-polygon region tagging (exact integer ray casting)
# =====================================================================

#: region polygons in integer micro-degrees — the chevron is CONCAVE
#: (parity crossing is what ray casting buys over bounding boxes)
_REGIONS = {
    "quad": [
        (-90_000_000, -45_000_000), (90_000_000, -45_000_000),
        (90_000_000, 45_000_000), (-90_000_000, 45_000_000),
    ],
    "tri": [
        (-150_000_000, -80_000_000), (150_000_000, -80_000_000),
        (0, 80_000_000),
    ],
    "chevron": [
        (-120_000_000, -60_000_000), (120_000_000, -60_000_000),
        (120_000_000, 60_000_000), (0, -20_000_000),
        (-120_000_000, 60_000_000),
    ],
}

#: synthetic integer micro-degree coordinates from the customer key —
#: pure int64 arithmetic, identical on both engines; the Knuth-style
#: multipliers spread even single-digit keys across the full range
#: (max product ~4e16 at sf100, inside int64)
_PX_SQL = "(c_custkey * 2654435761) % 360000000 - 180000000"
_PY_SQL = "(c_custkey * 2246822519) % 180000000 - 90000000"


def _pip_oracle_sql() -> str:
    from .operators.spatial import polygon_inside_sql

    arms = [
        f"SELECT c_custkey, px, py, '{pid}' AS poly_id FROM p"
        f" WHERE {polygon_inside_sql('px', 'py', verts)}"
        for pid, verts in sorted(_REGIONS.items())
    ]
    return (
        "WITH p AS (SELECT c_custkey,"
        f" CAST({_PX_SQL} AS BIGINT) AS px,"
        f" CAST({_PY_SQL} AS BIGINT) AS py FROM customer)\n"
        + "\nUNION ALL\n".join(arms)
    )


@register("join_point_in_polygon", _pip_oracle_sql())
def q_join_point_in_polygon(spark, sf_dir):
    """Region membership for every point: ray-casting point-in-polygon
    with EXACT int64 micro-degree arithmetic (operators/spatial.py) —
    crossing tests are cross-multiplied integer comparisons, never a
    division, so Spark and the oracle agree bit-for-bit even on
    boundary points; the chevron region is concave, which parity
    handles and bounding boxes cannot.  The polygon dimension is
    compiled into the projection as literal CASE terms
    (broadcast-as-literal): tagging is ONE narrow codegen'd map stage
    with zero exchanges — the 100 TB shape is scan-bound
    (plan-asserted in tests/test_plans.py)."""
    from .operators.spatial import tag_points_in_polygons

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.expr(_PX_SQL).cast("long").alias("px"),
        F.expr(_PY_SQL).cast("long").alias("py"),
    )
    return tag_points_in_polygons(cust, _REGIONS)


# =====================================================================
# R. Directed containment dedup (asymmetric near-dup)
# =====================================================================


def _containment_oracle_sql() -> str:
    from .registry_ext import _NEAR_DUP_CORPUS_SQL, _NGRAM_PAIRS_SQL

    return f"""
    WITH {_NEAR_DUP_CORPUS_SQL},
    {_NGRAM_PAIRS_SQL},
    dpairs AS (
      SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS inter
      FROM sh a JOIN sh b USING (shingle)
      WHERE a.id <> b.id GROUP BY 1, 2)
    SELECT id_a, id_b, CAST(ca.n_sh AS BIGINT) AS n_a, inter,
           CAST(inter * 1000000 // ca.n_sh AS BIGINT) AS containment_micro
    FROM dpairs JOIN cnt ca ON dpairs.id_a = ca.id
    WHERE inter * 10 >= 9 * ca.n_sh
    """


@register("ext_dedup_containment", _containment_oracle_sql())
def q_ext_dedup_containment(spark, sf_dir):
    """Directed set-containment near-dup pairs (|A∩B|/|A| ≥ 0.9 over
    word 3-gram shingles) on the planted prefix-copy corpus: the 80%
    truncations are ~fully CONTAINED in their originals while their
    Jaccard is only ~0.8 — the doc-inside-doc signal the symmetric
    ext_dedup_ngram threshold family misses.  Asymmetric prefix-filter
    candidates + exact array_intersect verify, integer
    cross-multiplied threshold (ext/dedup.containment_pairs); the
    oracle rebuilds the directed pair graph from the SHARED shingle
    CTE (registry_ext._NGRAM_PAIRS_SQL), so tokenization cannot
    drift."""
    from .ext.dedup import containment_pairs
    from .registry_ext import _near_dup_corpus

    return containment_pairs(
        _near_dup_corpus(spark, sf_dir), "doc_id", "text",
        n=3, t_num=9, t_den=10,
    )


# =====================================================================
# S. Exact integer Gram matrix of the quantized embedding corpus
# =====================================================================


@register(
    "ext_embed_gram",
    """
    WITH q AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
               AS mx
      FROM embeddings
    ),
    ql AS (
      SELECT vec_id,
             CASE WHEN mx > 0
                  THEN list_transform(embedding,
                         x -> CAST(floor(CAST(x AS DOUBLE) / mx * 127.0 + 0.5)
                                   AS INT))
                  ELSE list_transform(embedding, x -> 0) END AS qvec
      FROM q
    ),
    e AS (
      SELECT vec_id,
             CAST(generate_subscripts(qvec, 1) - 1 AS BIGINT) AS i,
             CAST(unnest(qvec) AS BIGINT) AS x
      FROM ql
    )
    SELECT a.i AS i, b.i AS j, CAST(sum(a.x * b.x) AS BIGINT) AS s
    FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_ext_embed_gram(spark, sf_dir):
    """Exact upper-triangular Gram matrix of the int8-quantized
    embedding corpus (ext/simsearch.gram_matrix_quantized): covariance
    /PCA/whitening's second moment with INTEGER state — per-partition
    Qᵀ·Q via one int64 matmul in an Arrow pass, then a shuffle of only
    d(d+1)/2 rows per partition.  The oracle rebuilds it from the
    shared quantization formula via an (i ≤ j) positional self-join —
    different physics, identical integers."""
    from .ext.simsearch import gram_matrix_quantized

    emb = load_table(spark, sf_dir, "embeddings")
    return gram_matrix_quantized(emb, "vec_id", "embedding")


# =====================================================================
# T. Running-peak drawdown (pure integer window)
# =====================================================================


@register(
    "win_drawdown",
    f"""
    WITH {_DAILY_SQL}
    SELECT event_type, day, cents,
           CAST(max(cents) OVER w AS BIGINT) AS peak_cents,
           CAST(max(cents) OVER w - cents AS BIGINT) AS drawdown_cents
    FROM d
    WINDOW w AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_win_drawdown(spark, sf_dir):
    """Running-peak drawdown per event type: cumulative max of the
    daily cents series minus the current value — the how-far-below-
    the-best-seen signal (equipment degradation, station dropout,
    revenue dip), exact integers end to end.  One per-key row window
    over the daily aggregate; the cumulative max and the subtraction
    ride the same window pass."""
    return drawdown_daily(_daily(spark, sf_dir))


def drawdown_daily(d):
    """Running-peak drawdown over a (event_type, day, cents) daily
    table — see q_win_drawdown."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    peak = F.max("cents").over(w).cast("long")
    return d.select(
        "event_type",
        "day",
        "cents",
        peak.alias("peak_cents"),
        (peak - F.col("cents")).cast("long").alias("drawdown_cents"),
    )


# =====================================================================
# U. Hodges-Lehmann robust location (median of Walsh averages)
# =====================================================================


def hodges_lehmann_daily(d, max_days=None):
    """Hodges-Lehmann estimator per key over a (event_type, day,
    cents) daily table: the median of all Walsh averages
    (cᵢ + cⱼ)/2, i ≤ j — published DOUBLED (hl_x2 = the selected
    pair sum) so the estimator stays an exact integer.  Selection at
    rank (m+1) DIV 2 under the (sum, day-pair) total order — never
    interpolated (the CLAUDE.md median rule).  The pairwise kernel is
    capped to the most recent ``_TREND_MAX_DAYS`` days per key, the
    agg_theilsen scale posture."""
    from .registry_r5 import _TREND_MAX_DAYS, _recent_days

    d = _recent_days(d, max_days or _TREND_MAX_DAYS)
    a = d.select(
        "event_type", F.col("day").alias("day_a"), F.col("cents").alias("c_a")
    )
    b = d.select(
        "event_type", F.col("day").alias("day_b"), F.col("cents").alias("c_b")
    )
    p = (
        a.join(b, "event_type")
        .filter(F.col("day_a") <= F.col("day_b"))
        .select(
            "event_type",
            (F.col("c_a") + F.col("c_b")).alias("w2"),
            "day_a",
            "day_b",
        )
    )
    wr = Window.partitionBy("event_type").orderBy("w2", "day_a", "day_b")
    wn = Window.partitionBy("event_type")
    return (
        p.select(
            "event_type",
            "w2",
            F.row_number().over(wr).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n_pairs"),
        )
        .filter(F.col("rn") == F.expr("(n_pairs + 1) DIV 2"))
        .select(
            "event_type",
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.col("w2").cast("long").alias("hl_x2"),
        )
        .orderBy("event_type")
    )


def _hl_oracle_sql() -> str:
    from .registry_r5 import _RECENT_DAYS_SQL

    return f"""
    WITH {_DAILY_SQL},
    {_RECENT_DAYS_SQL},
    p AS (
      SELECT a.event_type, a.cents + b.cents AS w2,
             a.day AS day_a, b.day AS day_b
      FROM dc a JOIN dc b
        ON a.event_type = b.event_type AND a.day <= b.day),
    r AS (
      SELECT event_type, w2,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY w2, day_a, day_b) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n_pairs
      FROM p)
    SELECT event_type, CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(w2 AS BIGINT) AS hl_x2
    FROM r WHERE rn = (n_pairs + 1) // 2
    ORDER BY event_type
    """


@register("agg_hodges_lehmann", _hl_oracle_sql())
def q_agg_hodges_lehmann(spark, sf_dir):
    """Hodges-Lehmann robust location per event type — the
    rank-based companion to agg_theilsen's slope and agg_mannwhitney's
    shift test: median of all pairwise Walsh averages over the daily
    cents series, exact in doubled integer units (hl_x2 DIV 2 is the
    classical estimator; keeping it doubled avoids the half-unit).
    30%-breakdown location without the mean's outlier sensitivity or
    the median's low efficiency."""
    return hodges_lehmann_daily(_daily(spark, sf_dir).persist())


# =====================================================================
# V. Append-mode watermark closure (finalized-windows stream)
# =====================================================================


@register(
    "stream_window_append_final",
    """
    WITH m AS (SELECT max(ts) AS mx FROM events),
    d AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS value_sum
      FROM events GROUP BY 1)
    SELECT bucket_start, n, value_sum
    FROM d CROSS JOIN m
    WHERE epoch_us(bucket_start) + 86400000000
          <= epoch_us(mx) - 345600000000
    """,
)
def q_stream_window_append_final(spark, sf_dir):
    """APPEND-mode streaming run of the daily tumbling aggregate: only
    windows the 4-day watermark has CLOSED are emitted — the finalized,
    immutable prefix (what a downstream sink may safely archive), while
    the complete-mode twin (stream_window_tumbling) emits everything.
    This driver-checks the LATE-DATA CLOSURE semantics relationally:
    after availableNow's final no-data micro-batch the emitted set is
    exactly the daily buckets with ``bucket_end <= max(ts) − 4 days``
    (integer epoch-µs arithmetic in the oracle; the 5 open trailing
    windows of the fixture are withheld).  Per-batch arrival and
    drop-late behavior stay pinned by tests/test_streaming.py."""
    from .streaming.jobs import (
        run_stream_to_memory,
        streamed_daily_aggregate_closed,
        streaming_events_source,
    )

    src = streaming_events_source(spark, sf_dir)
    return run_stream_to_memory(
        streamed_daily_aggregate_closed(src), "append"
    )


# =====================================================================
# W. Packing segment map (attention-mask / position-id metadata)
# =====================================================================


@register(
    "ext_pack_positions",
    """
    WITH s AS (
      SELECT doc_id, n_chars,
             md5(CAST(doc_id AS VARCHAR)) AS h,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS BIGINT)
               % 8 AS shard
      FROM documents
    ),
    o AS (
      SELECT *,
             CAST(COALESCE(sum(n_chars) OVER (
                    PARTITION BY shard ORDER BY h, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS ofs
      FROM s WHERE n_chars > 0
    ),
    seg AS (
      SELECT doc_id, shard, ofs, n_chars,
             unnest(range(ofs // 2048, (ofs + n_chars - 1) // 2048 + 1)) AS b
      FROM o),
    x AS (
      SELECT CAST(shard AS BIGINT) AS shard, CAST(b AS BIGINT) AS bin_id,
             doc_id,
             CAST(greatest(ofs - b * 2048, 0) AS BIGINT) AS seg_start,
             CAST(greatest(b * 2048 - ofs, 0) AS BIGINT) AS pos_start,
             CAST(least(ofs + n_chars, (b + 1) * 2048)
                  - greatest(ofs, b * 2048) AS BIGINT) AS seg_len
      FROM seg)
    SELECT shard, bin_id,
           CAST(row_number() OVER (PARTITION BY shard, bin_id
                                   ORDER BY seg_start) AS BIGINT) AS seg_idx,
           doc_id, seg_start, pos_start, seg_len
    FROM x
    """,
)
def q_ext_pack_positions(spark, sf_dir):
    """Per-bin segment map of the 2048-token concat-and-chunk packing
    (ext/packing.pack_segments): ordered doc segments with in-bin
    starts, document-reset position-id offsets (straddling docs carry
    their position across the bin boundary) and segment lengths — the
    block-diagonal-attention metadata trainers consume.  Straddling
    docs fan out to one row per spanned bin before the (shard, bin)
    rollup; seg_idx ranks segments within their bin by the unique
    in-bin start (scalar columns only — the driver's canonicalizer
    rejects array cells, the round-2/3 lesson)."""
    from .ext.packing import pack_segments

    docs = load_table(spark, sf_dir, "documents")
    return pack_segments(docs, "doc_id", "n_chars", budget=2048, n_shards=8)


# =====================================================================
# X. Chat-template rendering (instruction-data serialization)
# =====================================================================

#: event_type → chat role (deterministic; the render is a pure fold)
_CHAT_ROLE_SQL = (
    "CASE event_type WHEN 'signup' THEN 'system'"
    " WHEN 'purchase' THEN 'assistant' WHEN 'error' THEN 'assistant'"
    " ELSE 'user' END"
)


@register(
    "ext_chat_template",
    f"""
    WITH t AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             ts, event_id,
             '<|im_start|>' || {_CHAT_ROLE_SQL} || chr(10)
               || event_type || ' ' || props || '<|im_end|>' AS turn
      FROM events)
    SELECT user_id, day,
           CAST(count(*) AS BIGINT) AS n_turns,
           string_agg(turn, '' ORDER BY ts, event_id) AS convo
    FROM t GROUP BY user_id, day
    """,
)
def q_ext_chat_template(spark, sf_dir):
    """Chat-template rendering — the serialization step that turns an
    interaction log into instruction-tuning strings: per (user, day)
    the event turns are role-mapped, wrapped in <|im_start|>/<|im_end|>
    markers and concatenated in STRICT (ts, event_id) order.  Ordered
    concatenation needs a deterministic fold: Spark's collect_list has
    no ordering contract, so the turns collect as (ts, event_id, turn)
    structs, array_sort pins the order, and array_join folds — exactly
    the oracle's string_agg(... ORDER BY).  One hash aggregate; at
    100 TB the per-key turn lists are conversation-sized, never
    corpus-sized."""
    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        "user_id",
        F.date_trunc("day", "ts").cast("date").alias("day"),
        "ts",
        "event_id",
        F.concat(
            F.lit("<|im_start|>"),
            F.expr(_CHAT_ROLE_SQL),
            F.lit(chr(10)),
            F.col("event_type"),
            F.lit(" "),
            F.col("props"),
            F.lit("<|im_end|>"),
        ).alias("turn"),
    )
    return (
        t.groupBy("user_id", "day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "turn"))
                    ),
                    lambda s: s["turn"],
                ),
                "",
            ).alias("convo"),
        )
    )


# =====================================================================
# Y. Schema-evolution merge read (mergeSchema across generations)
# =====================================================================


@register(
    "sink_schema_merge",
    """
    WITH u AS (
      SELECT doc_id, lang, CAST(NULL AS VARCHAR) AS source,
             CAST(NULL AS BIGINT) AS n_chars
      FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id, CAST(NULL AS VARCHAR) AS lang, source, n_chars
      FROM documents WHERE doc_id % 2 = 1)
    SELECT coalesce(lang, 'missing') AS lang,
           coalesce(source, 'missing') AS source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS chars_sum
    FROM u GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_sink_schema_merge(spark, sf_dir):
    """Schema evolution at the storage layer — the contract a
    long-lived 100 TB table depends on: generation 1 files carry
    (doc_id, lang), generation 2 adds (source, n_chars) and drops
    lang; ``mergeSchema`` reads both generations as ONE table with
    NULLs for each file's missing columns (per-file pruned scans, no
    rewrite of old data).  The read-back rollup proves every row kept
    its own generation's columns; the oracle restates the merge as a
    NULL-padded union."""
    import os

    from .registry import _clean_stale_scratch, _session_tag

    _clean_stale_scratch("/tmp/wds_schmerge_*")
    out = f"/tmp/wds_schmerge_{_session_tag(spark, sf_dir)}"
    docs = load_table(spark, sf_dir, "documents")
    # guard on the LAST-written subpath: a crash between the two
    # writes must not leave a torn dir that later invocations skip
    # (review r6 finding); both writes are overwrite-idempotent
    if not os.path.exists(f"{out}/gen=2"):
        docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang").write.mode(
            "overwrite"
        ).parquet(f"{out}/gen=1")
        docs.filter(F.col("doc_id") % 2 == 1).select(
            "doc_id", "source", "n_chars"
        ).write.mode("overwrite").parquet(f"{out}/gen=2")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{out}/gen=1", f"{out}/gen=2"
    )
    return (
        merged.groupBy(
            F.coalesce("lang", F.lit("missing")).alias("lang"),
            F.coalesce("source", F.lit("missing")).alias("source"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.coalesce(F.sum("n_chars"), F.lit(0))
            .cast("long")
            .alias("chars_sum"),
        )
        .orderBy("lang", "source")
    )


# =====================================================================
# Z. Wald-Wolfowitz runs test (sign-run integer counts)
# =====================================================================


@register(
    "agg_runs_test",
    f"""
    WITH {_DAILY_SQL},
    l AS (
      SELECT event_type, day, cents,
             lag(cents) OVER (PARTITION BY event_type ORDER BY day) AS prev
      FROM d),
    sgn AS (
      SELECT event_type, day,
             CASE WHEN cents > prev THEN 1
                  WHEN cents < prev THEN -1 END AS s
      FROM l WHERE prev IS NOT NULL AND cents <> prev),
    brk AS (
      SELECT event_type, s,
             CASE WHEN lag(s) OVER w IS NULL OR s <> lag(s) OVER w
                  THEN 1 ELSE 0 END AS new_run
      FROM sgn WINDOW w AS (PARTITION BY event_type ORDER BY day))
    SELECT event_type,
           CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
           CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
           CAST(sum(new_run) AS BIGINT) AS n_runs
    FROM brk GROUP BY event_type ORDER BY event_type
    """,
)
def q_agg_runs_test(spark, sf_dir):
    """Wald-Wolfowitz runs statistic over the daily cents series'
    up/down signs (ties dropped, the standard treatment): n_up,
    n_down and the RUN count — too few runs means trending, too many
    means oscillation, and the z-score against E[R] = 2·n₊·n₋/n + 1
    is one driver formula away from these exact integers.  Completes
    the nonparametric family (Mann-Kendall direction, Theil-Sen
    magnitude, Mann-Whitney shift, Hodges-Lehmann location):
    randomness of the sequence itself.  Two per-key row windows over
    the daily aggregate sharing one partitioning."""
    return runs_test_daily(_daily(spark, sf_dir))


def runs_test_daily(d):
    """Wald-Wolfowitz sign-run counts over a (event_type, day, cents)
    daily table — see q_agg_runs_test."""
    w = Window.partitionBy("event_type").orderBy("day")
    l_ = d.select(
        "event_type", "day", "cents",
        F.lag("cents").over(w).alias("prev"),
    )
    sgn = (
        l_.filter(F.col("prev").isNotNull() & (F.col("cents") != F.col("prev")))
        .select(
            "event_type", "day",
            F.when(F.col("cents") > F.col("prev"), 1).otherwise(-1).alias("s"),
        )
    )
    prev_s = F.lag("s").over(w)
    brk = sgn.select(
        "event_type", "s",
        F.when(prev_s.isNull() | (F.col("s") != prev_s), 1)
        .otherwise(0)
        .alias("new_run"),
    )
    return (
        brk.groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("s") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_up"),
            F.sum(F.when(F.col("s") == -1, 1).otherwise(0))
            .cast("long")
            .alias("n_down"),
            F.sum("new_run").cast("long").alias("n_runs"),
        )
        .orderBy("event_type")
    )


# =====================================================================
# AA. L-moment rank-weighted sums (extreme-value statistics)
# =====================================================================


@register(
    "agg_lmoments",
    f"""
    WITH {_DAILY_SQL},
    r AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY cents, day) AS rk,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM d)
    SELECT event_type, CAST(max(n) AS BIGINT) AS n_days,
           CAST(sum(CAST(cents AS HUGEINT)) AS VARCHAR) AS s0,
           CAST(sum(CAST(rk - 1 AS HUGEINT) * cents) AS VARCHAR) AS s1,
           CAST(sum(CAST((rk - 1) * (rk - 2) AS HUGEINT) * cents)
                AS VARCHAR) AS s2,
           CAST(sum(CAST((rk - 1) * (rk - 2) * (rk - 3) AS HUGEINT) * cents)
                AS VARCHAR) AS s3
    FROM r GROUP BY event_type ORDER BY event_type
    """,
)
def q_agg_lmoments(spark, sf_dir):
    """L-moment building blocks per event type — THE extreme-value /
    hydrology statistics family (Hosking 1990): probability-weighted
    moments b_k = Σ (r−1)…(r−k)·x_(r) / (n(n−1)…(n−k)) over the
    ORDER STATISTICS x_(r), published as the exact rank-weighted
    integer sums s0..s3 (DECIMAL(38,0) — r³·cents exceeds int64 at
    warehouse scale) under the deterministic (cents, day) total
    order.  λ1 = b0, λ2 = 2b1−b0, λ3 = 6b2−6b1+b0, λ4 and the
    L-skewness/L-kurtosis ratios are one driver formula away — linear
    in order statistics, so far more outlier-robust than classical
    skewness/kurtosis.  One rank window over the daily aggregate +
    one grouped fold."""
    return lmoments_daily(_daily(spark, sf_dir))


def lmoments_daily(d):
    """Rank-weighted L-moment sums over a (event_type, day, cents)
    daily table — see q_agg_lmoments.  The rank polynomial is built
    through DECIMAL from a LONG rank (row_number is 32-bit;
    (rk−1)(rk−2)(rk−3) overflows int32 at rk ≈ 1293 — ANSI Spark
    throws where the oracle's HUGEINT doesn't; review r6 finding)."""
    wr = Window.partitionBy("event_type").orderBy("cents", "day")
    wn = Window.partitionBy("event_type")
    r = d.select(
        "event_type",
        "cents",
        F.row_number().over(wr).cast("long").alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    rk1 = F.col("rk") - 1
    rk2 = dec(rk1) * (F.col("rk") - 2)
    rk3 = rk2 * (F.col("rk") - 3)
    # DECIMAL sums published as digit strings (representation-proof
    # across pandas canonicalizers — the ext_eval_spearman r6 lesson)
    return (
        r.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_days"),
            F.sum(dec(F.col("cents")))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("s0"),
            F.sum(dec(rk1) * F.col("cents"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("s1"),
            F.sum(rk2 * F.col("cents"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("s2"),
            F.sum(rk3 * F.col("cents"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("s3"),
        )
        .orderBy("event_type")
    )


# =====================================================================
# AB. Dataset snapshot diff (corpus release accounting)
# =====================================================================

#: snapshot B derivation, shared by plan and oracle: every 10th doc
#: dropped, every 7th (surviving) doc revised, every 13th re-added
#: under a new id — the three release-delta classes
_DIFF_B_SQL = """
    b AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text,
             source
      FROM documents WHERE doc_id % 10 <> 0
      UNION ALL
      SELECT -doc_id - 1 AS doc_id, text, source
      FROM documents WHERE doc_id % 13 = 0)
"""


@register(
    "ext_dataset_diff",
    f"""
    WITH {_DIFF_B_SQL},
    a AS (SELECT doc_id, text, source FROM documents),
    j AS (
      SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
             coalesce(a.source, b.source) AS source,
             CASE WHEN a.doc_id IS NULL THEN 'added'
                  WHEN b.doc_id IS NULL THEN 'removed'
                  WHEN md5(a.text) <> md5(b.text) THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
    SELECT source, status, CAST(count(*) AS BIGINT) AS n_docs
    FROM j GROUP BY source, status ORDER BY source, status
    """,
)
def q_ext_dataset_diff(spark, sf_dir):
    """Corpus release diff — the accounting a curator publishes
    between dataset versions: FULL OUTER join of two snapshots on the
    doc key, per-doc status by content-hash comparison (added /
    removed / changed / unchanged), rolled up per source.  Snapshot B
    is derived deterministically (drop, revise, re-add-under-negative-id
    classes — a namespace disjoint from real ids at any scale) so
    the oracle reconstructs it exactly.  Scale shape: one equi-join
    on the id + one grouped rollup; content equality compares md5
    digests, never the full texts, so the join rows stay narrow at
    100 TB."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    b = (
        docs.filter(F.col("doc_id") % 10 != 0)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
            "source",
        )
        .unionByName(
            # re-added ids live in the NEGATIVE namespace, disjoint
            # from real doc_ids at any scale (doc_id + 500000 collided
            # with genuine ids past ~500k docs — review r6 finding)
            docs.filter(F.col("doc_id") % 13 == 0).select(
                (-F.col("doc_id") - 1).alias("doc_id"), "text", "source"
            )
        )
    )
    a = docs.select(
        F.col("doc_id").alias("id_a"),
        F.md5(F.col("text").cast("binary")).alias("h_a"),
        F.col("source").alias("src_a"),
    )
    b2 = b.select(
        F.col("doc_id").alias("id_b"),
        F.md5(F.col("text").cast("binary")).alias("h_b"),
        F.col("source").alias("src_b"),
    )
    j = a.join(b2, a["id_a"] == b2["id_b"], "full_outer").select(
        F.coalesce("src_a", "src_b").alias("source"),
        F.when(F.col("id_a").isNull(), "added")
        .when(F.col("id_b").isNull(), "removed")
        .when(F.col("h_a") != F.col("h_b"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )
    return (
        j.groupBy("source", "status")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("source", "status")
    )


# =====================================================================
# AC. Bollinger bands from exact rolling integer moments
# =====================================================================

#: one identical IEEE tree on both engines (variance_exact pattern in
#: a moving frame): mean and ±2σ bands from the exact integer window
#: sums (w = 10 rows)
#: DECIMAL(38,0) cross-products — ws1² wraps int64 past ~sf10 daily
#: magnitudes (the Welch/spearman lesson)
_BOLL_EXPR = (
    "CAST(ws1 AS DOUBLE) / 10.0",
    "sqrt(CAST(10 * CAST(ws2 AS DECIMAL(38,0))"
    " - CAST(ws1 AS DECIMAL(38,0)) * ws1 AS DOUBLE) / 100.0)",
)


@register(
    "win_bollinger",
    f"""
    WITH {_DAILY_SQL},
    m AS (
      SELECT event_type, day, cents,
             CAST(sum(cents) OVER w AS BIGINT) AS ws1,
             CAST(sum(cents * cents) OVER w AS BIGINT) AS ws2,
             lag(cents, 9) OVER (PARTITION BY event_type ORDER BY day) AS c9
      FROM d
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
    SELECT event_type, day, cents, ws1, ws2,
           {_BOLL_EXPR[0]} AS ma10,
           {_BOLL_EXPR[0]} - 2.0 * {_BOLL_EXPR[1]} AS band_lo,
           {_BOLL_EXPR[0]} + 2.0 * {_BOLL_EXPR[1]} AS band_hi
    FROM m WHERE c9 IS NOT NULL
    """,
)
def q_win_bollinger(spark, sf_dir):
    """Bollinger bands over the daily cents series: 10-day moving mean
    ±2σ, where σ comes from EXACT integer rolling moments (Σx, Σx² in
    the frame — the agg_variance_exact power-sum pattern inside a
    moving window) so the bands are one identical correctly-rounded
    IEEE tree on both engines; full frames only (lag-9 non-null).
    Published alongside the raw integer sums, the monitoring-band
    primitive for drift alerts.  Both rolling sums and the lag ride
    one per-key window pass."""
    d = _daily(spark, sf_dir)
    wf = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-9, 0)
    )
    wl = Window.partitionBy("event_type").orderBy("day")
    m = d.select(
        "event_type",
        "day",
        "cents",
        F.sum("cents").over(wf).cast("long").alias("ws1"),
        F.sum(F.col("cents") * F.col("cents")).over(wf).cast("long").alias("ws2"),
        F.lag("cents", 9).over(wl).alias("c9"),
    ).filter(F.col("c9").isNotNull())
    ma = F.expr(_BOLL_EXPR[0])
    sd = F.expr(_BOLL_EXPR[1])
    return m.select(
        "event_type", "day", "cents", "ws1", "ws2",
        ma.alias("ma10"),
        (ma - 2.0 * sd).alias("band_lo"),
        (ma + 2.0 * sd).alias("band_hi"),
    )


# =====================================================================
# AD. T5-style span corruption masks (denoising objectives)
# =====================================================================


@register(
    "ext_span_corruption",
    f"""
    WITH t AS (SELECT doc_id, {_TOK_SQL} AS w FROM documents),
    u AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n FROM t WHERE len(w) > 0),
    k AS (SELECT doc_id, w, n, greatest(n // 10, 1) AS k FROM u),
    e AS (SELECT doc_id, w, n, CAST(unnest(range(0, k)) AS BIGINT) AS i FROM k),
    x AS (
      SELECT doc_id, w, i AS span_idx, i * 10 AS seg_start,
             least(10, n - i * 10) AS seg_len
      FROM e WHERE i * 10 < n),
    y AS (
      SELECT doc_id, w, span_idx, seg_start, seg_len,
             least(3, seg_len) AS span_len,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                                     || CAST(span_idx AS VARCHAR)), 1, 15)
                  AS BIGINT) % (seg_len - least(3, seg_len) + 1) AS off
      FROM x)
    SELECT doc_id, span_idx,
           CAST(seg_start + off AS BIGINT) AS start_tok,
           CAST(span_len AS BIGINT) AS span_len,
           array_to_string(
             w[seg_start + off + 1 : seg_start + off + span_len], ' ')
             AS masked_text
    FROM y
    """,
)
def q_ext_span_corruption(spark, sf_dir):
    """T5/UL2-style span-corruption mask construction — the denoising-
    objective preprocessing step: one ≤3-token span per 10-token
    segment, placed at a DETERMINISTIC md5-derived offset within its
    segment (a pure function of (doc_id, span_idx) — reproducible
    masks across runs, partitionings and engines, and non-overlapping
    by the segment construction).  Emits (span_idx ≙ sentinel id,
    start token, length, masked text) per span; the targets/inputs
    split is a join away.  Scale shape: segment fan-out is n/10 rows
    per doc BEFORE any shuffle and there is no shuffle — fully narrow,
    codegen'd but for the md5."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", _tok().alias("w"))
    u = t.select(
        "doc_id", "w", F.size("w").cast("long").alias("n")
    ).filter(F.col("n") > 0)
    kf = u.withColumn("k", F.greatest(F.expr("n div 10"), F.lit(1)))
    e = kf.select(
        "doc_id", "w", "n",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("k") - 1)).alias("i"),
    ).filter(F.col("i") * 10 < F.col("n"))
    x = e.select(
        "doc_id", "w",
        F.col("i").alias("span_idx"),
        (F.col("i") * 10).alias("seg_start"),
        F.least(F.lit(10), F.col("n") - F.col("i") * 10).alias("seg_len"),
    )
    span_len = F.least(F.lit(3), F.col("seg_len"))
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("span_idx").cast("string"),
                ).cast("binary")
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    y = x.select(
        "doc_id", "w", "span_idx", "seg_start", "seg_len",
        span_len.alias("span_len"),
        (h % (F.col("seg_len") - span_len + 1)).alias("off"),
    )
    return y.select(
        "doc_id",
        "span_idx",
        (F.col("seg_start") + F.col("off")).cast("long").alias("start_tok"),
        F.col("span_len").cast("long").alias("span_len"),
        F.concat_ws(
            " ",
            F.slice(
                F.col("w"),
                (F.col("seg_start") + F.col("off") + 1).cast("int"),
                F.col("span_len").cast("int"),
            ),
        ).alias("masked_text"),
    )


# =====================================================================
# AE. Wilcoxon signed-rank (paired one-vs-rest, doubled ranks)
# =====================================================================


@register(
    "agg_wilcoxon",
    f"""
    WITH {_DAILY_SQL},
    tot AS (
      SELECT day, CAST(count(*) AS BIGINT) AS c_d,
             CAST(sum(cents) AS BIGINT) AS tot
      FROM d GROUP BY day),
    p AS (
      SELECT d.event_type, d.day, tot.c_d,
             (tot.c_d - 1) * d.cents - (tot.tot - d.cents) AS diff
      FROM d JOIN tot ON d.day = tot.day
      WHERE tot.c_d >= 2),
    nz AS (
      SELECT event_type, diff,
             abs(CAST(diff AS DECIMAL(38,0)) * (720720 // (c_d - 1)))
               AS akey
      FROM p WHERE diff <> 0),
    r AS (
      SELECT event_type, diff,
             rank() OVER (PARTITION BY event_type ORDER BY akey) AS rmin,
             count(*) OVER (PARTITION BY event_type, akey) AS cnt
      FROM nz)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN diff > 0 THEN 2 * rmin + cnt - 1 ELSE 0 END)
                AS BIGINT) AS wplus_x2
    FROM r GROUP BY event_type ORDER BY event_type
    """,
)
def q_agg_wilcoxon(spark, sf_dir):
    """Wilcoxon signed-rank, each event type PAIRED against the rest
    of the pool on the SAME day — the paired sibling of the unpaired
    agg_mannwhitney: the per-day difference is taken scale-invariantly
    in integers ((c−1)·own − rest_sum has the sign and relative
    magnitude of own − rest_mean without a division), zero diffs drop
    (the standard treatment), |diff| ranks per key with doubled
    tie-averaged ranks, and W⁺·2 = Σ ranks of positive diffs is
    published exactly.  The rank key rescales each day's diff by
    720720 DIV (c−1) — 720720 = lcm(1..16), an exact common
    denominator — so |own − rest_mean| magnitudes stay comparable
    across days with DIFFERENT pool sizes (a fixed (c−1) scaling
    would over-rank large-pool days); DECIMAL(38,0) keeps the
    product exact, and beyond 17 pool members the DIV truncates
    identically on both engines (documented bound — the events
    event-type vocabulary is far below it).  Day pairing removes the day-to-day volatility
    Mann-Whitney mixes into its pooled ranking.  Scale shape: one
    day-total aggregate joined back + per-key rank windows over the
    daily table."""
    return wilcoxon_one_vs_rest_daily(_daily(spark, sf_dir))


def wilcoxon_one_vs_rest_daily(d):
    """Paired one-vs-rest Wilcoxon signed-rank over a (event_type,
    day, cents) daily table — see q_agg_wilcoxon."""
    tot = d.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("c_d"),
        F.sum("cents").cast("long").alias("tot"),
    )
    p = (
        d.join(tot, "day")
        .filter(F.col("c_d") >= 2)
        .select(
            "event_type",
            "day",
            "c_d",
            (
                (F.col("c_d") - 1) * F.col("cents")
                - (F.col("tot") - F.col("cents"))
            ).alias("diff"),
        )
        .filter(F.col("diff") != 0)
        .select(
            "event_type",
            "diff",
            F.abs(
                F.col("diff").cast("decimal(38,0)")
                * F.expr("720720 DIV (c_d - 1)")
            ).alias("akey"),
        )
    )
    wr = Window.partitionBy("event_type").orderBy("akey")
    wc = Window.partitionBy("event_type", "akey")
    r = p.select(
        "event_type",
        "diff",
        F.rank().over(wr).alias("rmin"),
        F.count(F.lit(1)).over(wc).alias("cnt"),
    )
    return (
        r.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(
                F.when(
                    F.col("diff") > 0,
                    2 * F.col("rmin") + F.col("cnt") - 1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("wplus_x2"),
        )
        .orderBy("event_type")
    )


# =====================================================================
# AF. Streaming as-of enrichment (foreachBatch, batch-twin oracle)
# =====================================================================


@register(
    "stream_asof_enrich",
    """
    WITH prof AS (
      SELECT user_id,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS pts,
             CAST(min(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS prof_cents
      FROM events GROUP BY 1, 2),
    e AS (
      SELECT event_id, user_id, event_type, ts FROM events)
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(p.prof_cents) AS BIGINT) AS n_enriched,
           CAST(coalesce(sum(p.prof_cents), 0) AS BIGINT) AS prof_sum
    FROM e ASOF LEFT JOIN prof p
      ON e.user_id = p.user_id AND e.ts >= p.pts
    GROUP BY e.event_type ORDER BY e.event_type
    """,
)
def q_stream_asof_enrich(spark, sf_dir):
    """Streaming AS-OF enrichment: Structured Streaming has no as-of
    join, so each micro-batch enriches through the engine's batch
    asof_join inside ``foreachBatch`` against a static profile
    dimension (per-user daily minimum cents, stamped at the day
    start) — the stream-side pattern for joining late-arriving facts
    to slowly-changing reference data.  Runs the sink to completion
    (availableNow) and returns the enriched accounting per event
    type.  ORACLE (batch twin): with the static right side, per-batch
    as-of ∪ batches == as-of of the union, so the closure equals one
    DuckDB ASOF LEFT JOIN regardless of batch boundaries — the oracle
    is exact for ANY batching, not just the single-file staging."""
    import shutil

    from .operators.joins import asof_join
    from .registry import _cents, _clean_stale_scratch, _session_tag
    from .streaming.jobs import streaming_events_source

    _clean_stale_scratch("/tmp/wds_asofenr_*")
    out = f"/tmp/wds_asofenr_{_session_tag(spark, sf_dir)}"
    # A re-run in the same session may produce FEWER micro-batches than
    # the last one; per-epoch overwrite would leave stale epoch=N dirs
    # in the union read — clear our own scratch before starting.
    shutil.rmtree(out, ignore_errors=True)
    ev = load_table(spark, sf_dir, "events")
    prof = (
        ev.groupBy(
            "user_id",
            F.date_trunc("day", "ts").alias("pts"),
        )
        .agg(F.min(_cents("value")).cast("long").alias("prof_cents"))
    )

    def enrich(batch_df, epoch_id):
        enriched = asof_join(
            batch_df.select("event_id", "user_id", "event_type", "ts"),
            prof.withColumnRenamed("pts", "ts"),
            on=["user_id"],
            left_ts="ts",
            right_ts="ts",
            payload_cols=["prof_cents"],
            how="left",
            direction="backward",
        )
        enriched.write.mode("overwrite").parquet(
            f"{out}/epoch={int(epoch_id)}"
        )

    src = streaming_events_source(spark, sf_dir)
    q = (
        src.writeStream.foreachBatch(enrich)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    enriched = spark.read.parquet(out)
    return (
        enriched.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count("prof_cents").cast("long").alias("n_enriched"),
            F.coalesce(F.sum("prof_cents"), F.lit(0))
            .cast("long")
            .alias("prof_sum"),
        )
        .orderBy("event_type")
    )


# =====================================================================
# AG. Kaplan-Meier risk table (survival analysis, exact integers)
# =====================================================================


@register(
    "agg_survival_km",
    """
    WITH e AS (SELECT user_id, ts, event_id FROM events),
    b AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 21600000000
                  THEN 1 ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    g AS (
      SELECT user_id, ts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sid
      FROM b),
    sess AS (
      SELECT user_id, sid,
             epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
      FROM g GROUP BY user_id, sid),
    o AS (
      SELECT dur_us,
             CASE WHEN sid < max(sid) OVER (PARTITION BY user_id)
                  THEN 1 ELSE 0 END AS closed
      FROM sess),
    agg AS (
      SELECT dur_us, CAST(count(*) AS BIGINT) AS n_at,
             CAST(sum(closed) AS BIGINT) AS n_events
      FROM o GROUP BY dur_us),
    c AS (
      SELECT dur_us, n_events,
             CAST(sum(n_at) OVER (ORDER BY dur_us DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS n_risk
      FROM agg)
    SELECT CAST(dur_us AS BIGINT) AS dur_us, n_risk, n_events
    FROM c WHERE n_events > 0 ORDER BY dur_us
    """,
)
def q_agg_survival_km(spark, sf_dir):
    """Kaplan-Meier risk table over SESSION durations (6 h gap-island
    sessions, the stream_sessionize_stateful segmentation): every
    CLOSED session contributes a churn event at its duration; each
    user's open tail session is CENSORED — counted among those at
    risk, never as an event — the survival-analysis treatment naive
    session-length histograms get wrong.  The estimator
    Ŝ(t) = Π (1 − d/n) is a product of rationals, so the EXACT
    integer risk table (n at risk, events at t) is published and the
    product is one driver fold away (the agg_autocorr moments
    posture).  Durations are integer epoch-µs differences (the
    CLAUDE.md duration rule).  Scale shape: per-user session windows →
    per-duration aggregate → ONE descending cumulative window over
    distinct durations — no session×duration join anywhere."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    wu = Window.partitionBy("user_id").orderBy("ts")
    b = ev.select(
        "user_id",
        "ts",
        F.when(
            F.lag("ts").over(wu).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(wu))
                > 21600000000
            ),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    g = b.select(
        "user_id",
        "ts",
        F.sum("brk")
        .over(wu.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sid"),
    )
    sess = g.groupBy("user_id", "sid").agg(
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
            "dur_us"
        )
    )
    o = sess.select(
        "dur_us",
        F.when(
            F.col("sid") < F.max("sid").over(Window.partitionBy("user_id")),
            1,
        )
        .otherwise(0)
        .alias("closed"),
    )
    agg = o.groupBy("dur_us").agg(
        F.count(F.lit(1)).cast("long").alias("n_at"),
        F.sum("closed").cast("long").alias("n_events"),
    )
    w = (
        Window.orderBy(F.col("dur_us").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = agg.select(
        "dur_us",
        "n_events",
        F.sum("n_at").over(w).cast("long").alias("n_risk"),
    )
    return (
        c.filter(F.col("n_events") > 0)
        .select(
            F.col("dur_us").cast("long").alias("dur_us"), "n_risk", "n_events"
        )
        .orderBy("dur_us")
    )


# =====================================================================
# AH. Fleiss' kappa between quality gates (exact integer components)
# =====================================================================


@register(
    "ext_eval_kappa",
    f"""
    WITH t AS (SELECT doc_id, n_chars, {_TOK_SQL} AS w FROM documents),
    u AS (
      SELECT doc_id, n_chars,
             CAST(len(w) AS BIGINT) AS n_words,
             CAST(coalesce(list_sum(list_transform(w, x -> len(x))), 0)
                  AS BIGINT) AS sum_chars,
             CAST(len(list_intersect(w, [{_GOPHER_STOPS}])) AS BIGINT)
               AS n_stop,
             CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
                  AS BIGINT) AS n_alpha,
             CAST(len(list_filter(w,
                      x -> contains(x, '#') OR contains(x, '...')))
                  AS BIGINT) AS n_sym
      FROM t),
    fr AS (
      SELECT doc_id, CAST(max(cnt) AS BIGINT) AS max_freq FROM (
        SELECT doc_id, tok, count(*) AS cnt
        FROM (SELECT doc_id, unnest(w) AS tok FROM t) GROUP BY doc_id, tok
      ) GROUP BY doc_id),
    votes AS (
      SELECT u.doc_id,
             CASE WHEN (u.n_words BETWEEN 20 AND 80)
                   AND u.sum_chars * 1000 >= 4000 * u.n_words
                   AND u.sum_chars * 1000 < 4900 * u.n_words
                   AND coalesce(fr.max_freq, 0) * 100 < 12 * u.n_words
                  THEN 1 ELSE 0 END AS c4,
             CASE WHEN (u.n_words BETWEEN 50 AND 100000)
                   AND (3 * u.n_words <= u.sum_chars
                        AND u.sum_chars <= 10 * u.n_words)
                   AND (100 * u.n_alpha >= 80 * u.n_words)
                   AND (u.n_stop >= 2) AND (10 * u.n_sym <= u.n_words)
                  THEN 1 ELSE 0 END AS gopher,
             CASE WHEN u.n_chars BETWEEN 250 AND 550 THEN 1 ELSE 0 END
               AS lenband
      FROM u LEFT JOIN fr ON u.doc_id = fr.doc_id),
    per AS (
      SELECT doc_id, c4 + gopher + lenband AS k,
             c4, gopher, lenband
      FROM votes)
    SELECT CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(c4) AS BIGINT) AS c4_keep,
           CAST(sum(gopher) AS BIGINT) AS gopher_keep,
           CAST(sum(lenband) AS BIGINT) AS len_keep,
           CAST(sum(k) AS BIGINT) AS total_keep_votes,
           CAST(sum(k * (k - 1) / 2 + (3 - k) * (2 - k) / 2) AS BIGINT)
             AS agree_pairs
    FROM per
    """,
)
def q_ext_eval_kappa(spark, sf_dir):
    """Fleiss' kappa components for THREE quality raters — the C4
    gate, the Gopher gate and a raw length band — treated as
    annotators over the corpus: inter-gate agreement is the curation
    QA question "do my filters even agree on what good data is".
    κ = (P̄ − P̄ₑ)/(1 − P̄ₑ) is a ratio of rationals, so the EXACT
    integer components are published (items, per-rater keeps, total
    keep votes, Σ per-item agreeing pairs out of C(3,2) each) and κ is
    one driver formula away — the agg_autocorr moments posture.
    Both gate restatements are the SAME SQL used by their own
    oracles, so the raters here cannot drift from the registered
    gates."""
    from .ext.text import gopher_flags, quality_gate_flags

    docs = load_table(spark, sf_dir, "documents")
    c4 = quality_gate_flags(docs.select("doc_id", "text"), "text").select(
        "doc_id", F.col("keep").cast("int").alias("c4")
    )
    gop = gopher_flags(docs).select(
        "doc_id", F.col("keep").cast("int").alias("gopher")
    )
    lb = docs.select(
        "doc_id",
        F.col("n_chars").between(250, 550).cast("int").alias("lenband"),
    )
    per = (
        c4.join(gop, "doc_id")
        .join(lb, "doc_id")
        .select(
            (F.col("c4") + F.col("gopher") + F.col("lenband")).alias("k"),
            "c4", "gopher", "lenband",
        )
    )
    k = F.col("k")
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("c4").cast("long").alias("c4_keep"),
        F.sum("gopher").cast("long").alias("gopher_keep"),
        F.sum("lenband").cast("long").alias("len_keep"),
        F.sum("k").cast("long").alias("total_keep_votes"),
        F.sum(
            (k * (k - 1) / 2 + (3 - k) * (2 - k) / 2).cast("long")
        )
        .cast("long")
        .alias("agree_pairs"),
    )


# =====================================================================
# AI. Kendall tau-b components (two-variable rank association)
# =====================================================================


from .registry_r5 import _TREND_MAX_DAYS as _KT_MAX_DAYS  # noqa: E402


@register(
    "agg_kendall_tau",
    f"""
    WITH d AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2),
    dc AS (
      SELECT event_type, day, n, cents FROM (
        SELECT d.*, row_number() OVER (
          PARTITION BY event_type ORDER BY day DESC) AS rnr
        FROM d)
      WHERE rnr <= {_KT_MAX_DAYS}),
    p AS (
      SELECT a.event_type,
             CASE WHEN (a.n > b.n AND a.cents > b.cents)
                    OR (a.n < b.n AND a.cents < b.cents)
                  THEN 1 ELSE 0 END AS conc,
             CASE WHEN (a.n > b.n AND a.cents < b.cents)
                    OR (a.n < b.n AND a.cents > b.cents)
                  THEN 1 ELSE 0 END AS disc,
             CASE WHEN a.n = b.n AND a.cents <> b.cents
                  THEN 1 ELSE 0 END AS tie_x,
             CASE WHEN a.n <> b.n AND a.cents = b.cents
                  THEN 1 ELSE 0 END AS tie_y,
             CASE WHEN a.n = b.n AND a.cents = b.cents
                  THEN 1 ELSE 0 END AS tie_xy
      FROM dc a JOIN dc b
        ON a.event_type = b.event_type AND a.day < b.day)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(conc) AS BIGINT) AS concordant,
           CAST(sum(disc) AS BIGINT) AS discordant,
           CAST(sum(tie_x) AS BIGINT) AS ties_x,
           CAST(sum(tie_y) AS BIGINT) AS ties_y,
           CAST(sum(tie_xy) AS BIGINT) AS ties_xy
    FROM p GROUP BY event_type ORDER BY event_type
    """,
)
def q_agg_kendall_tau(spark, sf_dir):
    """Kendall tau-b COMPONENTS between two per-day variables of the
    same key — daily event count vs daily cents volume: over all day
    pairs, exact integer concordant / discordant / tie-on-x / tie-on-y
    / tie-on-both counts, published raw (the kappa posture) so
    τ_b = (nc−nd)/√((n₀−tx−txy)(n₀−ty−txy)) is one driver formula
    away with no float fold inside either engine.  Sign comparisons
    only — no (Δn·Δcents) product — so no overflow at any magnitude.
    The day-pair kernel is capped to the most recent 1000 days per key
    (the agg_theilsen `_recent_days` guard, restated identically in
    the oracle), keeping it O(days²)-bounded regardless of time span.
    Completes the rank-association family: Mann-Kendall (vs time),
    Spearman (vs exact ranks), tau-b (vs a second variable)."""
    from .registry import _cents
    from .registry_r5 import _recent_days

    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.groupBy(
            "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(_cents("value")).cast("long").alias("cents"),
        )
        .persist()  # both pair-join sides reuse it: one raw-events scan
    )
    return kendall_tau_components_daily(_recent_days(d))


def kendall_tau_components_daily(d):
    """Exact tau-b pair counts over a (event_type, day, n, cents)
    daily table — see q_agg_kendall_tau."""
    a = d.select(
        "event_type",
        F.col("day").alias("day_a"),
        F.col("n").alias("n_a"),
        F.col("cents").alias("c_a"),
    )
    b = d.select(
        "event_type",
        F.col("day").alias("day_b"),
        F.col("n").alias("n_b"),
        F.col("cents").alias("c_b"),
    )
    na, nb = F.col("n_a"), F.col("n_b")
    ca, cb = F.col("c_a"), F.col("c_b")
    p = (
        a.join(b, "event_type")
        .filter(F.col("day_a") < F.col("day_b"))
        .select(
            "event_type",
            F.when(
                ((na > nb) & (ca > cb)) | ((na < nb) & (ca < cb)), 1
            ).otherwise(0).alias("conc"),
            F.when(
                ((na > nb) & (ca < cb)) | ((na < nb) & (ca > cb)), 1
            ).otherwise(0).alias("disc"),
            F.when((na == nb) & (ca != cb), 1).otherwise(0).alias("tie_x"),
            F.when((na != nb) & (ca == cb), 1).otherwise(0).alias("tie_y"),
            F.when((na == nb) & (ca == cb), 1).otherwise(0).alias("tie_xy"),
        )
    )
    return (
        p.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("conc").cast("long").alias("concordant"),
            F.sum("disc").cast("long").alias("discordant"),
            F.sum("tie_x").cast("long").alias("ties_x"),
            F.sum("tie_y").cast("long").alias("ties_y"),
            F.sum("tie_xy").cast("long").alias("ties_xy"),
        )
        .orderBy("event_type")
    )


# =====================================================================
# AJ. Cutler's RSI (ratio of rolling integer gain/loss sums)
# =====================================================================


@register(
    "win_rsi",
    f"""
    WITH {_DAILY_SQL},
    l AS (
      SELECT event_type, day,
             cents - lag(cents) OVER
               (PARTITION BY event_type ORDER BY day) AS delta
      FROM d),
    g AS (
      SELECT event_type, day,
             greatest(delta, 0) AS gain, greatest(-delta, 0) AS loss
      FROM l WHERE delta IS NOT NULL),
    r AS (
      SELECT event_type, day,
             sum(gain) OVER w14 AS g14, sum(loss) OVER w14 AS l14,
             count(*) OVER w14 AS c14
      FROM g WINDOW w14 AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
    SELECT event_type, day,
           CAST(CASE WHEN g14 + l14 = 0 THEN 500000
                ELSE CAST(g14 AS HUGEINT) * 1000000 // (g14 + l14)
                END AS BIGINT) AS rsi_micro
    FROM r WHERE c14 = 14 ORDER BY event_type, day
    """,
)
def q_win_rsi(spark, sf_dir):
    """Cutler's RSI over the daily cents series: gains and losses are
    integer day-over-day deltas split by sign, summed over a 14-row
    moving frame, and RSI = 10⁶·ΣG/(ΣG+ΣL) is ONE exact floor-divide
    per row (DECIMAL/HUGEINT numerator — no smoothing recursion, no
    float state; Wilder's variant is float-recursive by construction,
    Cutler's is the order-independent form used exactly here).  A flat
    14-day frame (ΣG+ΣL = 0) pins the conventional neutral 500000.
    Rows need a full 14-delta history.  Completes the monitoring-band
    family next to win_bollinger/win_cusum.  Scale shape: two windows
    over the SAME per-key ordering — one exchange, reused."""
    return rsi_daily(_daily(spark, sf_dir))


def rsi_daily(d, periods: int = 14):
    """Cutler's RSI in exact micro-units over a (event_type, day,
    cents) daily table — see q_win_rsi."""
    w = Window.partitionBy("event_type").orderBy("day")
    lagd = (F.col("cents") - F.lag("cents").over(w)).alias("delta")
    g = (
        d.select("event_type", "day", lagd)
        .filter(F.col("delta").isNotNull())
        .select(
            "event_type",
            "day",
            F.greatest(F.col("delta"), F.lit(0)).alias("gain"),
            F.greatest(-F.col("delta"), F.lit(0)).alias("loss"),
        )
    )
    w14 = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-(periods - 1), Window.currentRow)
    )
    r = g.select(
        "event_type",
        "day",
        F.sum("gain").over(w14).alias("g14"),
        F.sum("loss").over(w14).alias("l14"),
        F.count(F.lit(1)).over(w14).alias("c14"),
    )
    return (
        r.filter(F.col("c14") == periods)
        .select(
            "event_type",
            "day",
            F.when(F.col("g14") + F.col("l14") == 0, F.lit(500000))
            .otherwise(
                F.expr(
                    "CAST(g14 AS DECIMAL(38,0)) * 1000000 DIV (g14 + l14)"
                )
            )
            .cast("long")
            .alias("rsi_micro"),
        )
        .orderBy("event_type", "day")
    )


# =====================================================================
# AK. Herfindahl-Hirschman concentration index (exact micro-units)
# =====================================================================


@register(
    "agg_herfindahl",
    f"""
    WITH {_DAILY_SQL}
    SELECT day, CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(CAST(cents AS HUGEINT) * cents) * 1000000
                // greatest(CAST(sum(cents) AS HUGEINT) * sum(cents), 1)
             AS BIGINT) AS hhi_micro
    FROM d GROUP BY day ORDER BY day
    """,
)
def q_agg_herfindahl(spark, sf_dir):
    """Herfindahl-Hirschman concentration of daily volume across event
    types — the mixture-skew monitor for a multi-source corpus (is one
    source dominating today's intake?): HHI = Σ(sᵢ/S)² published as
    10⁶·Σsᵢ²//S², one exact floor-divide over DECIMAL(38,0)/HUGEINT
    power sums (the variance_exact posture — no per-share float
    division whose summation order could drift).  10⁶/n_types = even
    split, 10⁶ = single-source day.  Scale shape: one map-side-
    combinable aggregate over the tiny daily table."""
    return herfindahl_daily(_daily(spark, sf_dir))


def herfindahl_daily(d):
    """Exact per-day HHI micro-units over a (event_type, day, cents)
    daily table — see q_agg_herfindahl."""
    s2 = F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
    s = F.sum("cents").cast("decimal(38,0)")
    return (
        d.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_types"),
            (s2 * 1000000).alias("__num"),
            F.greatest(s * F.sum("cents"), F.lit(1).cast("decimal(38,0)"))
            .alias("__den"),
        )
        .select(
            "day",
            "n_types",
            F.expr("CAST(__num DIV __den AS BIGINT)").alias("hhi_micro"),
        )
        .orderBy("day")
    )


# =====================================================================
# AL. Zipf rank-frequency head (corpus token-law diagnostics)
# =====================================================================


@register(
    "ext_text_zipf",
    f"""
    WITH t AS (
      SELECT unnest({_TOK_SQL}) AS tok FROM documents),
    f AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM t GROUP BY tok),
    r AS (
      SELECT tok, freq,
             row_number() OVER (ORDER BY freq DESC, tok) AS rnk
      FROM f)
    SELECT CAST(rnk AS BIGINT) AS rnk, tok, freq,
           CAST(rnk * freq AS BIGINT) AS zipf_product
    FROM r WHERE rnk <= 20 ORDER BY rnk
    """,
)
def q_ext_text_zipf(spark, sf_dir):
    """Zipf rank-frequency head of the corpus vocabulary: top-20
    tokens under the deterministic (freq DESC, token ASC) total order
    with rank·frequency published — Zipf's law predicts it near
    constant, so a drifting head is the cheapest whole-corpus drift
    alarm (natural text ≈ stable head; boilerplate floods or synthetic
    spam snap it).  Scale shape: explode → map-side-combinable token
    count → TakeOrderedAndProject top-k; the rank window runs on the
    20 collected survivors only, never the vocabulary."""
    docs = load_table(spark, sf_dir, "documents")
    return zipf_topk(docs, "text", k=20)


def zipf_topk(docs, col, k=20):
    """Top-``k`` (rank, token, freq, rank·freq) under (freq DESC,
    token ASC) — see q_ext_text_zipf."""
    f = (
        docs.select(F.explode(_tok(col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .orderBy(F.col("freq").desc(), "tok")
        .limit(k)
    )
    wr = Window.orderBy(F.col("freq").desc(), "tok")
    return f.select(
        F.row_number().over(wr).cast("long").alias("rnk"),
        "tok",
        "freq",
    ).select(
        "rnk", "tok", "freq",
        (F.col("rnk") * F.col("freq")).cast("long").alias("zipf_product"),
    )


# =====================================================================
# AM. Jackknife leave-one-out replicates (resampling-based error bars)
# =====================================================================


@register(
    "agg_jackknife",
    f"""
    WITH {_DAILY_SQL},
    t AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s
      FROM d GROUP BY event_type)
    SELECT d.event_type, d.day,
           CAST(CAST(t.s - d.cents AS HUGEINT) * 1000000 // (t.n - 1)
             AS BIGINT) AS loo_mean_micro
    FROM d JOIN t ON d.event_type = t.event_type
    WHERE t.n >= 2
    ORDER BY d.event_type, d.day
    """,
)
def q_agg_jackknife(spark, sf_dir):
    """Jackknife leave-one-day-out replicates of the per-key daily
    mean: θ₍ᵢ₎ = 10⁶·(S − xᵢ) // (n−1), one exact floor-divide per
    replicate from ONE total — the error-bar machinery (jackknife SE
    = √((n−1)/n · Σ(θ₍ᵢ₎ − θ̄)²)) for any corpus health metric without
    B× resampling passes; Tukey's original bias/variance estimator.
    Numerator is non-negative (cents ≥ 0), so floor `//` and DIV agree
    without a sign CASE.  Keys need n ≥ 2 days.  Scale shape: the
    per-key totals table is key-cardinality-sized → auto-broadcast
    back onto the daily table; zero window functions."""
    # persisted: the totals side reuses it — one raw-events scan
    return jackknife_daily(_daily(spark, sf_dir).persist())


def jackknife_daily(d):
    """Leave-one-day-out mean replicates over a (event_type, day,
    cents) daily table — see q_agg_jackknife."""
    t = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
    )
    return (
        d.join(t, "event_type")
        .filter(F.col("n") >= 2)
        .select(
            "event_type",
            "day",
            F.expr(
                "CAST(CAST(s - cents AS DECIMAL(38,0)) * 1000000"
                " DIV (n - 1) AS BIGINT)"
            ).alias("loo_mean_micro"),
        )
        .orderBy("event_type", "day")
    )


# =====================================================================
# AO. Pairwise cross-source covariance components
# =====================================================================


@register(
    "agg_covariance_pairs",
    f"""
    WITH {_DAILY_SQL}
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(a.cents) AS BIGINT) AS s_a,
           CAST(sum(b.cents) AS BIGINT) AS s_b,
           CAST(sum(CAST(a.cents AS HUGEINT) * b.cents) AS VARCHAR)
             AS s_ab
    FROM d a JOIN d b ON a.day = b.day AND a.event_type < b.event_type
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_agg_covariance_pairs(spark, sf_dir):
    """Cross-source covariance COMPONENTS for every event-type pair
    over their common days: n, Σa, Σb and the DECIMAL(38,0) cross
    moment Σab — cov = (n·Σab − Σa·Σb)/n² and Pearson r are one
    driver formula away (the agg_autocorr moments posture), giving
    the full k×k co-movement matrix of the intake sources from one
    query: which sources surge together is the mixture-planning
    question a per-source trend can't answer.  Exact integers
    throughout — no float accumulation order to drift.  Scale shape:
    the self-join runs on the persisted key×day daily aggregate (one
    raw scan), shuffles on day, and emits at most C(k,2) rows."""
    return covariance_pairs_daily(_daily(spark, sf_dir).persist())


def covariance_pairs_daily(d):
    """Pairwise covariance components over a (event_type, day, cents)
    daily table — see q_agg_covariance_pairs."""
    a = d.select(
        F.col("event_type").alias("type_a"),
        "day",
        F.col("cents").alias("c_a"),
    )
    b = d.select(
        F.col("event_type").alias("type_b"),
        "day",
        F.col("cents").alias("c_b"),
    )
    return (
        a.join(b, "day")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("c_a").cast("long").alias("s_a"),
            F.sum("c_b").cast("long").alias("s_b"),
            # digit string, not DECIMAL (spearman r6 canonicalizer lesson)
            F.sum(F.col("c_a").cast("decimal(38,0)") * F.col("c_b"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("s_ab"),
        )
        .orderBy("type_a", "type_b")
    )


# =====================================================================
# AP. Poisson bootstrap replicates (one-pass resampling error bars)
# =====================================================================


def poisson_boot_weight(id_col, b_col):
    """Deterministic Poisson(1) bootstrap weight for (row, replicate):
    md5('boot:<id>:<b>') mod 10⁶ against the integer Poisson CDF
    thresholds, weight capped at 4.  The single Spark-side definition
    the ext_sample_bootstrap query and the property test share (the
    oracle restates it in SQL) — see q_ext_sample_bootstrap."""
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("boot:"),
                        F.col(id_col).cast("string"),
                        F.lit(":"),
                        F.col(b_col).cast("string"),
                    ).cast("binary")
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 1000000
    )
    return (
        F.when(u < 367879, 0)
        .when(u < 735759, 1)
        .when(u < 919699, 2)
        .when(u < 981012, 3)
        .otherwise(4)
    )


@register(
    "ext_sample_bootstrap",
    """
    WITH w AS (
      SELECT b, n_chars,
             CAST('0x' || substr(md5('boot:' || CAST(doc_id AS VARCHAR)
                                     || ':' || CAST(b AS VARCHAR)), 1, 15)
                  AS BIGINT) % 1000000 AS u
      FROM documents, (SELECT unnest(range(0, 20)) AS b)),
    p AS (
      SELECT b, n_chars,
             CASE WHEN u < 367879 THEN 0
                  WHEN u < 735759 THEN 1
                  WHEN u < 919699 THEN 2
                  WHEN u < 981012 THEN 3
                  ELSE 4 END AS wgt
      FROM w)
    SELECT CAST(b AS BIGINT) AS replicate_id,
           CAST(sum(wgt) AS BIGINT) AS n_eff,
           CAST(CAST(sum(wgt * n_chars) AS HUGEINT) * 1000000
                // greatest(sum(wgt), 1) AS BIGINT) AS mean_chars_micro
    FROM p GROUP BY b ORDER BY b
    """,
)
def q_ext_sample_bootstrap(spark, sf_dir):
    """Poisson bootstrap — THE distributed bootstrap (Chamandy et al.,
    Google 2012): instead of B global multinomial resamples (which
    need coordinated sampling), each (doc, replicate) draws an iid
    Poisson(1) weight, here derived DETERMINISTICALLY from
    md5(doc:replicate) mod 10⁶ against the integer Poisson CDF
    thresholds (367879/735759/919699/981012, weight capped at 4 —
    0.4% tail mass folded into the cap, stated approximation), so
    the 20 replicate means of doc length are bit-identical on any
    engine/partitioning and the replicate spread IS the metric's
    sampling error — one pass, no data movement, B× error bars for
    free.  Complements agg_jackknife (leave-one-out) with the
    resampling family.  Scale shape: a 20× fan-out of a TWO-column
    projection into one map-side-combinable aggregate; everything
    codegen'd, no window, no join."""
    docs = load_table(spark, sf_dir, "documents")
    e = docs.select(
        "doc_id",
        "n_chars",
        F.explode(F.sequence(F.lit(0), F.lit(19))).alias("b"),
    )
    return (
        e.select(F.col("b").cast("long").alias("replicate_id"),
                 "n_chars",
                 poisson_boot_weight("doc_id", "b").alias("wgt"))
        .groupBy("replicate_id")
        .agg(
            F.sum("wgt").cast("long").alias("n_eff"),
            F.expr(
                "CAST(CAST(sum(wgt * n_chars) AS DECIMAL(38,0)) * 1000000"
                " DIV greatest(sum(wgt), 1) AS BIGINT)"
            ).alias("mean_chars_micro"),
        )
        .orderBy("replicate_id")
    )


# =====================================================================
# AQ. 2-D skyline / Pareto front (classic dominance operator)
# =====================================================================


@register(
    "agg_skyline_2d",
    f"""
    WITH t AS (
      SELECT CAST(n_chars AS BIGINT) AS x,
             CAST(len(list_distinct({_TOK_SQL})) AS BIGINT) AS y
      FROM documents),
    g AS (
      SELECT x, y, CAST(count(*) AS BIGINT) AS n_docs
      FROM t GROUP BY x, y),
    b AS (
      SELECT x, y, n_docs,
             row_number() OVER (PARTITION BY x ORDER BY y DESC) AS rb
      FROM g),
    c AS (
      SELECT x, y, n_docs,
             max(y) OVER (ORDER BY x DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS best_above
      FROM b WHERE rb = 1)
    SELECT x AS n_chars, y AS distinct_tokens, n_docs
    FROM c WHERE best_above IS NULL OR y > best_above
    ORDER BY x
    """,
)
def q_agg_skyline_2d(spark, sf_dir):
    """2-D SKYLINE (Pareto front, Börzsönyi et al. 2001) of the corpus
    under (length, lexical diversity): the documents no other document
    weakly dominates on both axes — the classic dominance operator,
    here as data-selection frontier ("the longest doc at every
    diversity level you can't beat").  Sort-based reduction: per-x
    best y, then ONE descending cumulative max over DISTINCT x — a
    point survives iff its y strictly beats every y at larger x
    (ties at larger x dominate, standard weak dominance).  n_docs
    counts the documents sitting exactly on each front point.  Scale
    shape: the quadratic dominance test collapses to a per-x
    aggregate + a window over distinct x values (bounded by the
    char-length domain, never the corpus) — the agg_survival_km
    cumulative posture."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        F.col("n_chars").cast("long").alias("x"),
        F.size(F.array_distinct(_tok("text"))).cast("long").alias("y"),
    )
    return skyline_front(t).select(
        F.col("x").alias("n_chars"),
        F.col("y").alias("distinct_tokens"),
        "n_docs",
    )


def skyline_front(t):
    """Weak-dominance 2-D Pareto front of an (x, y) table, with
    ``n_docs`` counting rows exactly on each front point, ordered by
    x ascending — see q_agg_skyline_2d."""
    g = t.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    wb = Window.partitionBy("x").orderBy(F.col("y").desc())
    b = (
        g.select("x", "y", "n_docs", F.row_number().over(wb).alias("rb"))
        .filter(F.col("rb") == 1)
    )
    wa = (
        Window.orderBy(F.col("x").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        b.select("x", "y", "n_docs", F.max("y").over(wa).alias("best_above"))
        .filter(
            F.col("best_above").isNull() | (F.col("y") > F.col("best_above"))
        )
        .select("x", "y", "n_docs")
        .orderBy("x")
    )


# =====================================================================
# AR. Character statistics via mapInArrow (Arrow-native batch kernel)
# =====================================================================


@register(
    "ext_text_charstats",
    """
    WITH ch AS (
      SELECT doc_id, unnest(string_split_regex(text, '')) AS c
      FROM documents WHERE len(text) > 0),
    f AS (
      SELECT doc_id, c, CAST(count(*) AS BIGINT) AS cnt
      FROM ch GROUP BY doc_id, c)
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_cp,
           CAST(count(*) AS BIGINT) AS n_distinct_chars,
           CAST(max(cnt) AS BIGINT) AS max_char_freq
    FROM f GROUP BY doc_id ORDER BY doc_id
    """,
)
def q_ext_text_charstats(spark, sf_dir):
    """Per-document CHARACTER-level statistics — code-point count,
    distinct characters, modal character frequency — the cheap
    mojibake / encoding-noise / key-mash signals (natural text has a
    wide char set with a flat head; a broken decode or a repeated-
    glyph flood collapses n_distinct or spikes max_freq).  Runs as a
    ``mapInArrow`` kernel: the ONE Python-UDF API surface the engine
    hadn't exercised (pandas_udf / mapInPandas / applyInPandas /
    applyInPandasWithState / UDTF are all in the registry) — Arrow
    RecordBatches stream through zero-copy with no pandas
    materialization, the right shape for byte-level feature
    extractors.  Exact and engine-independent (a Counter over code
    points), so the oracle restates it relationally with DuckDB's
    per-char unnest.  Empty documents are excluded identically on
    both sides.  Scale shape: embarrassingly parallel batch map,
    zero shuffles before the final sort."""
    docs = load_table(spark, sf_dir, "documents")
    return charstats(docs).orderBy("doc_id")


def charstats(docs):
    """mapInArrow character-statistics kernel over a (doc_id, text)
    table — see q_ext_text_charstats.  The RecordBatch schema is
    EXPLICIT: a batch where every document is empty/NULL would
    otherwise infer all-null column types and poison the Arrow stream
    when a later batch in the same partition carries real rows
    ("Tried to write record batch with different schema")."""
    import pyarrow as pa

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_cp", pa.int64()),
            ("n_distinct_chars", pa.int64()),
            ("max_char_freq", pa.int64()),
        ]
    )

    def kernel(batches):
        from collections import Counter

        for batch in batches:
            ids = batch.column("doc_id").to_pylist()
            texts = batch.column("text").to_pylist()
            out = {"doc_id": [], "n_cp": [], "n_distinct_chars": [],
                   "max_char_freq": []}
            for i, t in zip(ids, texts):
                if not t:
                    continue
                c = Counter(t)
                out["doc_id"].append(i)
                out["n_cp"].append(sum(c.values()))
                out["n_distinct_chars"].append(len(c))
                out["max_char_freq"].append(max(c.values()))
            yield pa.RecordBatch.from_pydict(out, schema=out_schema)

    return docs.select("doc_id", "text").mapInArrow(
        kernel,
        "doc_id long, n_cp long, n_distinct_chars long, "
        "max_char_freq long",
    )


# =====================================================================
# AS. Longest same-type run per user (gap-islands streak detection)
# =====================================================================


@register(
    "win_longest_streak",
    """
    WITH e AS (
      SELECT user_id, event_type, ts, event_id FROM events),
    r AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rt
      FROM e),
    runs AS (
      SELECT user_id, event_type,
             CAST(count(*) AS BIGINT) AS run_len
      FROM r GROUP BY user_id, event_type, rn - rt),
    best AS (
      SELECT user_id, event_type, run_len,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY run_len DESC, event_type)
               AS rb
      FROM runs)
    SELECT user_id, event_type AS streak_type, run_len AS longest_streak
    FROM best WHERE rb = 1 ORDER BY user_id
    """,
)
def q_win_longest_streak(spark, sf_dir):
    """Longest CONSECUTIVE same-type run per user — the classic
    gap-islands streak (row_number minus per-type row_number is
    constant within a run), the engagement/sequence question a
    per-type count can't answer (100 interleaved events ≠ a 100-run).
    Ordering is the deterministic (ts, event_id) total order; the
    winning streak per user breaks length ties by type ascending.
    Scale shape: two windows over the SAME user partitioning (one
    exchange, reused) → a run aggregate → a per-user top-1 window on
    the runs table — no self-joins, no sequence materialization."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    return longest_streak_per_user(ev)


def longest_streak_per_user(ev):
    """Gap-islands longest same-type run over a (user_id, event_type,
    ts, event_id) table — see q_win_longest_streak."""
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wt = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    r = ev.select(
        "user_id",
        "event_type",
        (F.row_number().over(wu) - F.row_number().over(wt)).alias("grp"),
    )
    runs = r.groupBy("user_id", "event_type", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("run_len")
    )
    wb = Window.partitionBy("user_id").orderBy(
        F.col("run_len").desc(), "event_type"
    )
    return (
        runs.select(
            "user_id", "event_type", "run_len",
            F.row_number().over(wb).alias("rb"),
        )
        .filter(F.col("rb") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("streak_type"),
            F.col("run_len").alias("longest_streak"),
        )
        .orderBy("user_id")
    )


# =====================================================================
# AT. Gini / Lorenz components of daily volume (intake inequality)
# =====================================================================


@register(
    "agg_gini_volume",
    f"""
    WITH {_DAILY_SQL},
    r AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY cents, day) AS rk
      FROM d)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(cents) AS BIGINT) AS s,
           CAST(sum(CAST(rk AS HUGEINT) * cents) AS VARCHAR) AS sr
    FROM r GROUP BY event_type ORDER BY event_type
    """,
)
def q_agg_gini_volume(spark, sf_dir):
    """Gini COMPONENTS of daily intake volume per source — the
    inequality sibling of agg_herfindahl (HHI asks "is one source
    dominating today"; this asks "is one DAY dominating the source"):
    ranks under the (cents, day) total order, Σcents and the
    DECIMAL(38,0) rank-weighted sum Σr·x published exactly, so
    G = (2·Σr·x − (n+1)·Σx)/(n·Σx) — and every Lorenz-curve point —
    is one driver formula away (the agg_lmoments rank-weighted
    posture; in fact Σr·x is its s1 + s0 under a different order,
    kept separate because THIS order is by magnitude, not by date).
    Scale shape: one per-key rank window over the tiny daily table +
    one aggregate."""
    return gini_volume_daily(_daily(spark, sf_dir))


def gini_volume_daily(d):
    """Gini/Lorenz components over a (event_type, day, cents) daily
    table — see q_agg_gini_volume."""
    wr = Window.partitionBy("event_type").orderBy("cents", "day")
    return (
        d.select(
            "event_type",
            "cents",
            F.row_number().over(wr).alias("rk"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("cents").cast("long").alias("s"),
            # digit string, not DECIMAL (spearman r6 canonicalizer lesson)
            F.sum(F.col("rk").cast("decimal(38,0)") * F.col("cents"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("sr"),
        )
        .orderBy("event_type")
    )


# =====================================================================
# AU. Hapax legomena / vocabulary tail mass (Heaps-law diagnostics)
# =====================================================================


@register(
    "ext_text_hapax",
    f"""
    WITH t AS (
      SELECT unnest({_TOK_SQL}) AS tok FROM documents),
    f AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM t GROUP BY tok)
    SELECT CAST(count(*) AS BIGINT) AS vocab_size,
           CAST(sum(freq) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hapax,
           CAST(sum(CASE WHEN freq = 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dis,
           CAST(sum(CASE WHEN freq = 1 THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS hapax_ratio_micro
    FROM f
    """,
)
def q_ext_text_hapax(spark, sf_dir):
    """Vocabulary TAIL mass: hapax legomena (frequency-1 types), dis
    legomena (frequency-2), vocabulary size and token total — the
    corpus-health complement of ext_text_zipf's head: natural text
    keeps ~40-60% of its vocabulary as hapax at any size (Heaps'
    law); templated or synthetic floods collapse the ratio, OCR noise
    and mojibake inflate it.  hapax_ratio_micro is one exact
    floor-divide.  Good-Turing's unseen-mass estimate (n₁/N) and
    Chao1 richness (V + n₁²/2n₂) are one driver formula away from
    the published integers.  Scale shape: explode → one
    map-side-combinable token count → a single-row rollup."""
    docs = load_table(spark, sf_dir, "documents")
    return hapax_stats(docs, "text")


def hapax_stats(docs, col):
    """Vocabulary tail-mass rollup — see q_ext_text_hapax."""
    f = (
        docs.select(F.explode(_tok(col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    one = F.sum(F.when(F.col("freq") == 1, 1).otherwise(0)).cast("long")
    return f.agg(
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        F.sum("freq").cast("long").alias("total_tokens"),
        one.alias("n_hapax"),
        F.sum(F.when(F.col("freq") == 2, 1).otherwise(0))
        .cast("long")
        .alias("n_dis"),
        F.expr(
            "CAST(CAST(sum(CASE WHEN freq = 1 THEN 1 ELSE 0 END)"
            " AS DECIMAL(38,0)) * 1000000 DIV count(*) AS BIGINT)"
        ).alias("hapax_ratio_micro"),
    )


# =====================================================================
# AV. Epoch-seeded corpus shuffle (training-loader order realization)
# =====================================================================


@register(
    "ext_epoch_shuffle",
    """
    WITH h AS (
      SELECT e.epoch, d.doc_id,
             CAST('0x' || substr(md5('ep:' || CAST(e.epoch AS VARCHAR)
                                     || ':' || CAST(d.doc_id AS VARCHAR)),
                                 1, 15) AS BIGINT) AS hk
      FROM documents d,
           (SELECT unnest(range(0, 2)) AS epoch) e)
    SELECT CAST(epoch AS BIGINT) AS epoch,
           CAST(hk % 8 AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY epoch, hk % 8
                                   ORDER BY hk, doc_id) - 1 AS BIGINT)
             AS pos,
           doc_id
    FROM h ORDER BY epoch, shard, pos
    """,
)
def q_ext_epoch_shuffle(spark, sf_dir):
    """EPOCH-SEEDED corpus shuffle — the training-loader op static
    ext_shard_assign can't express: each epoch e maps every document
    to (shard, position) via md5('ep:e:id'), so every epoch visits
    the corpus in a DIFFERENT deterministic order, reproducible
    across engines, runs and cluster sizes (resumable training needs
    exactly this bit-stability).  Shard-major reading realizes the
    global shuffle the way real loaders do: shard = hash mod S,
    position = rank within (epoch, shard) under the unique (hash, id)
    order.  Scale shape: per-(epoch, shard) rank windows over
    corpus/S-row groups — S is the scaling knob (8 here, O(1000) at
    100 TB so no window partition exceeds executor memory); NO global
    sort, no single-partition window, no dense-index pass."""
    docs = load_table(spark, sf_dir, "documents")
    return epoch_shuffle(docs, "doc_id", n_epochs=2, n_shards=8)


def epoch_shuffle(docs, id_col, n_epochs=2, n_shards=8):
    """Deterministic per-epoch (shard, position) assignment — see
    q_ext_epoch_shuffle."""
    e = docs.select(id_col).select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.sequence(F.lit(0), F.lit(n_epochs - 1))
        ).alias("epoch"),
    )
    hk = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("ep:"),
                    F.col("epoch").cast("string"),
                    F.lit(":"),
                    F.col("doc_id").cast("string"),
                ).cast("binary")
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("epoch", "shard").orderBy("hk", "doc_id")
    return (
        e.select(
            F.col("epoch").cast("long").alias("epoch"),
            "doc_id",
            hk.alias("hk"),
        )
        .withColumn("shard", (F.col("hk") % n_shards).cast("long"))
        .select(
            "epoch",
            "shard",
            (F.row_number().over(w) - 1).cast("long").alias("pos"),
            "doc_id",
        )
        .orderBy("epoch", "shard", "pos")
    )


# =====================================================================
# AW. Deseasonalized daily residuals (weekday-baseline anomalies)
# =====================================================================


@register(
    "win_seasonal_residual",
    f"""
    WITH {_DAILY_SQL},
    w AS (
      SELECT event_type, CAST(dayofweek(day) AS INT) AS dow,
             CAST(sum(cents) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM d GROUP BY 1, 2)
    SELECT d.event_type, d.day,
           CAST(d.cents * 1000000 - (w.s * 1000000 // w.n) AS BIGINT)
             AS residual_micro
    FROM d JOIN w
      ON d.event_type = w.event_type
     AND CAST(dayofweek(d.day) AS INT) = w.dow
    ORDER BY d.event_type, d.day
    """,
)
def q_win_seasonal_residual(spark, sf_dir):
    """Deseasonalized daily residuals: each day's cents minus its
    key's WEEKDAY-baseline mean (exact micro-units; the subtraction
    happens AFTER the one floor-divide, so no negative-operand
    division arises) — the series win_seasonal_profile's baseline
    exists to enable: anomalies judged against "a normal Tuesday",
    not against the week-blind mean that flags every weekend.  Both
    engines bucket the weekday from the DATE (DuckDB dayofweek(date)
    = Spark dayofweek(date) − 1; only bucket identity matters, and
    the grouping is identical because the shift is a bijection on
    0..6).  Scale shape: daily agg → tiny (key × 7) baseline joined
    back broadcast — zero windows."""
    return seasonal_residual_daily(_daily(spark, sf_dir).persist())


def seasonal_residual_daily(d):
    """Weekday-baseline residuals over a (event_type, day, cents)
    daily table — see q_win_seasonal_residual."""
    w = (
        d.select(
            "event_type",
            (F.dayofweek("day") - 1).cast("int").alias("dow"),
            "cents",
        )
        .groupBy("event_type", "dow")
        .agg(
            F.sum("cents").cast("long").alias("s"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    return (
        d.select(
            "event_type",
            "day",
            (F.dayofweek("day") - 1).cast("int").alias("dow"),
            "cents",
        )
        .join(w, ["event_type", "dow"])
        .select(
            "event_type",
            "day",
            (
                F.col("cents") * 1000000
                - F.expr("s * 1000000 DIV n")
            )
            .cast("long")
            .alias("residual_micro"),
        )
        .orderBy("event_type", "day")
    )


# =====================================================================
# AX. Count-Min Sketch (deterministic, exact-oracle sketch table)
# =====================================================================


@register(
    "ext_sketch_cms",
    f"""
    WITH t AS (
      SELECT unnest({_TOK_SQL}) AS tok FROM documents),
    f AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY tok),
    top AS (
      SELECT tok, cnt FROM f ORDER BY cnt DESC, tok LIMIT 10),
    occ AS (
      SELECT r.r,
             CAST('0x' || substr(md5('cms' || CAST(r.r AS VARCHAR)
                                     || ':' || t.tok), 1, 15) AS BIGINT)
               % 256 AS bucket
      FROM t, (SELECT unnest(range(0, 3)) AS r) r),
    cms AS (
      SELECT r, bucket, CAST(count(*) AS BIGINT) AS c
      FROM occ GROUP BY r, bucket),
    probe AS (
      SELECT top.tok, top.cnt, rr.r,
             CAST('0x' || substr(md5('cms' || CAST(rr.r AS VARCHAR)
                                     || ':' || top.tok), 1, 15) AS BIGINT)
               % 256 AS bucket
      FROM top, (SELECT unnest(range(0, 3)) AS r) rr),
    est AS (
      SELECT p.tok, p.cnt, min(c.c) AS cms_est
      FROM probe p JOIN cms c ON c.r = p.r AND c.bucket = p.bucket
      GROUP BY p.tok, p.cnt)
    SELECT tok, cnt AS true_freq, CAST(cms_est AS BIGINT) AS cms_est
    FROM est ORDER BY true_freq DESC, tok
    """,
)
def q_ext_sketch_cms(spark, sf_dir):
    """Count-Min Sketch, the 100 TB answer to "how often does X
    occur" without a full-vocabulary shuffle: d=3 salted-md5 hash
    rows × w=256 counters, each cell a map-side-combinable SUM — the
    sketch is MERGEABLE (cell-wise addition across partitions/days/
    corpora), which is the whole point at scale.  Because the hashes
    are deterministic, the sketch table and the estimates are
    bit-identical on any engine — so unlike probabilistic-seed
    sketches this one is FULLY oracle-paired, and the one-sided
    guarantee est ≥ true is pinned by test.  Published: the top-10
    true-frequent tokens with true count vs min-over-rows estimate.
    Scale shape: occurrences × 3 fan-out collapses into 768 cells;
    the probe side is 10 rows joined against those cells."""
    docs = load_table(spark, sf_dir, "documents")
    return cms_estimate_topk(docs, "text", d=3, w=256, k=10)


def _cms_bucket(tok_col, r_col, w, salt="cms"):
    """Salted-md5 CMS bucket — identical derivation on both engines."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt),
                        F.col(r_col).cast("string"),
                        F.lit(":"),
                        F.col(tok_col),
                    ).cast("binary")
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % w
    )


def cms_estimate_topk(docs, col, d=3, w=256, k=10):
    """Count-Min estimates for the top-``k`` true-frequent tokens —
    see q_ext_sketch_cms."""
    # persisted: the true-count and sketch branches share it — one
    # tokenize pass (the registry_r5 tok_tbl precedent)
    t = docs.select(F.explode(_tok(col)).alias("tok")).persist()
    f = t.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    top = f.orderBy(F.col("cnt").desc(), "tok").limit(k)
    occ = t.select(
        "tok",
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("r"),
    ).select("r", _cms_bucket("tok", "r", w).alias("bucket"))
    cms = occ.groupBy("r", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    probe = top.select(
        "tok",
        "cnt",
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("r"),
    ).select("tok", "cnt", "r", _cms_bucket("tok", "r", w).alias("bucket"))
    return (
        probe.join(cms, ["r", "bucket"])
        .groupBy("tok", F.col("cnt").alias("true_freq"))
        .agg(F.min("c").cast("long").alias("cms_est"))
        .orderBy(F.col("true_freq").desc(), "tok")
    )


# =====================================================================
# AY. Distinct-count sketch components (Linear Counting + KMV)
# =====================================================================


@register(
    "ext_sketch_distinct",
    f"""
    WITH t AS (
      SELECT unnest({_TOK_SQL}) AS tok FROM documents),
    h AS (
      SELECT DISTINCT tok,
             CAST('0x' || substr(md5('dc:' || tok), 1, 15) AS BIGINT) AS hk
      FROM t),
    lc AS (
      SELECT CAST(count(DISTINCT hk % 1024) AS BIGINT) AS lc_used
      FROM h),
    kmv AS (
      SELECT CAST(count(*) AS BIGINT) AS kmv_k,
             CAST(max(hk) AS BIGINT) AS kmv_kth_hash
      FROM (SELECT hk FROM h ORDER BY hk LIMIT 16)),
    tv AS (SELECT CAST(count(*) AS BIGINT) AS true_distinct FROM h)
    SELECT tv.true_distinct, lc.lc_used,
           CAST(1024 AS BIGINT) AS lc_buckets,
           kmv.kmv_k, kmv.kmv_kth_hash
    FROM tv, lc, kmv
    """,
)
def q_ext_sketch_distinct(spark, sf_dir):
    """Distinct-count SKETCH COMPONENTS, published exactly so the
    estimates are one driver formula away — the engine's deterministic
    alternative to the seed-dependent rows-only HLL pair
    (agg_approx_distinct / agg_hll_merge): (a) LINEAR COUNTING — used
    buckets of md5 mod 1024 (estimate −w·ln(empty/w); the bitmap
    merges by OR); (b) KMV / bottom-k — the k=16 minimum hash values'
    maximum (estimate (k−1)·2⁶⁰/h_k; merges by keeping the k smallest
    of the union).  Both components are exact integers from
    deterministic hashing, so unlike HLL this sketch row is
    bit-identical cross-engine and FULLY oracle-paired, with the true
    distinct count published beside it for error accounting.  Scale
    shape: distinct-token pass → a 1024-cell count and a 16-row
    TakeOrdered — no vocabulary-sized state on any single node."""
    docs = load_table(spark, sf_dir, "documents")
    return distinct_sketch_components(docs, "text")


def distinct_sketch_components(docs, col, w=1024, k=16):
    """Linear-counting + KMV components — see q_ext_sketch_distinct."""
    h = (
        docs.select(F.explode(_tok(col)).alias("tok"))
        .distinct()
        .select(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("dc:"), F.col("tok")).cast("binary")),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("hk")
        )
    )
    lc = h.select((F.col("hk") % w).alias("b")).distinct().agg(
        F.count(F.lit(1)).cast("long").alias("lc_used")
    )
    kmv = (
        h.orderBy("hk")
        .limit(k)
        .agg(
            F.count(F.lit(1)).cast("long").alias("kmv_k"),
            F.max("hk").cast("long").alias("kmv_kth_hash"),
        )
    )
    tv = h.agg(F.count(F.lit(1)).cast("long").alias("true_distinct"))
    return (
        tv.crossJoin(lc)
        .crossJoin(kmv)
        .select(
            "true_distinct",
            "lc_used",
            F.lit(w).cast("long").alias("lc_buckets"),
            "kmv_k",
            "kmv_kth_hash",
        )
    )


# =====================================================================
# AZ. Streaming Count-Min maintenance (mergeability, executed)
# =====================================================================


@register(
    "stream_sketch_cms",
    """
    WITH v AS (SELECT event_type FROM events),
    occ AS (
      SELECT r.r, v.event_type,
             CAST('0x' || substr(md5('scms' || CAST(r.r AS VARCHAR)
                                     || ':' || v.event_type), 1, 15)
                  AS BIGINT) % 64 AS bucket
      FROM v, (SELECT unnest(range(0, 3)) AS r) r),
    cms AS (
      SELECT r, bucket, CAST(count(*) AS BIGINT) AS c
      FROM occ GROUP BY r, bucket),
    f AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
      FROM v GROUP BY event_type),
    probe AS (
      SELECT f.event_type, f.cnt, rr.r,
             CAST('0x' || substr(md5('scms' || CAST(rr.r AS VARCHAR)
                                     || ':' || f.event_type), 1, 15)
                  AS BIGINT) % 64 AS bucket
      FROM f, (SELECT unnest(range(0, 3)) AS r) rr)
    SELECT p.event_type, p.cnt AS true_freq,
           CAST(min(c.c) AS BIGINT) AS cms_est
    FROM probe p JOIN cms c ON c.r = p.r AND c.bucket = p.bucket
    GROUP BY p.event_type, p.cnt ORDER BY p.event_type
    """,
)
def q_stream_sketch_cms(spark, sf_dir):
    """STREAMING Count-Min maintenance — the sketch family's
    mergeability claim EXECUTED, not asserted: each micro-batch
    writes its own (r, bucket) partial counts via ``foreachBatch``,
    and the closure sums cells across batches — because CMS cells
    are plain sums, per-batch-sketch ⊕ equals the one-shot sketch for
    ANY batching, so the DuckDB oracle (batch CMS over all events) is
    exact regardless of micro-batch boundaries (the
    stream_asof_enrich posture).  Probes every event type and
    publishes true count vs min-over-rows estimate (est ≥ true, the
    CMS guarantee).  d=3 × w=64 over the event-type stream; at scale
    this is the always-on frequency monitor that never holds
    vocabulary-sized state."""
    import shutil

    from .registry import _clean_stale_scratch, _session_tag
    from .streaming.jobs import streaming_events_source

    _clean_stale_scratch("/tmp/wds_scms_*")
    out = f"/tmp/wds_scms_{_session_tag(spark, sf_dir)}"
    shutil.rmtree(out, ignore_errors=True)

    def add_batch(batch_df, epoch_id):
        occ = batch_df.select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(2))).alias("r"),
        ).select(
            "r", _cms_bucket("event_type", "r", 64, salt="scms").alias("bucket")
        )
        (
            occ.groupBy("r", "bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
            .write.mode("overwrite")
            .parquet(f"{out}/epoch={int(epoch_id)}")
        )

    src = streaming_events_source(spark, sf_dir)
    q = (
        src.writeStream.foreachBatch(add_batch)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    cms = (
        spark.read.parquet(out)
        .groupBy("r", "bucket")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    probe = f.select(
        "event_type",
        "cnt",
        F.explode(F.sequence(F.lit(0), F.lit(2))).alias("r"),
    ).select(
        "event_type", "cnt", "r",
        _cms_bucket("event_type", "r", 64, salt="scms").alias("bucket"),
    )
    return (
        probe.join(cms, ["r", "bucket"])
        .groupBy("event_type", F.col("cnt").alias("true_freq"))
        .agg(F.min("c").cast("long").alias("cms_est"))
        .orderBy("event_type")
    )


# =====================================================================
# BA. Seasonal Mann-Kendall (Hirsch-Slack weekday-stratified trend)
# =====================================================================


from .registry_r5 import _RECENT_DAYS_SQL as _RD_SQL  # noqa: E402


@register(
    "agg_trend_seasonal_mk",
    f"""
    WITH {_DAILY_SQL},
    {_RD_SQL},
    p AS (
      SELECT a.event_type,
             CAST(dayofweek(a.day) AS INT) AS season,
             CASE WHEN b.cents > a.cents THEN 1
                  WHEN b.cents < a.cents THEN -1 ELSE 0 END AS sgn
      FROM dc a JOIN dc b
        ON a.event_type = b.event_type AND a.day < b.day
       AND CAST(dayofweek(a.day) AS INT) = CAST(dayofweek(b.day) AS INT))
    SELECT event_type,
           CAST(count(DISTINCT season) AS BIGINT) AS n_seasons,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(sgn) AS BIGINT) AS s_seasonal
    FROM p GROUP BY event_type ORDER BY event_type
    """,
)
def q_agg_trend_seasonal_mk(spark, sf_dir):
    """SEASONAL Mann-Kendall (Hirsch & Slack 1984) — the standard
    environmental/weather trend test agg_trend_mk's plain S
    over-rejects on: pairs are restricted to the SAME season (weekday
    stratum here), so a strong weekly cycle can't masquerade as a
    monotonic trend — S' = Σ over seasons of the same-season
    pairwise sign(x_j − x_i), exact integer sign sums, with the pair count and
    stratum count published for the variance formula.  Each engine
    buckets weekdays with its own dayofweek (the labels differ by the
    known Sunday shift; only SAME-season pairing matters and the
    shift is a bijection, so the pair sets are identical).  The
    quadratic kernel inherits the recent-days cap AND the weekday
    stratification cuts pairs ~7× vs plain MK.  Completes the trend
    family: direction (MK), magnitude (Theil-Sen), seasonality-robust
    direction (this)."""
    from .registry_r5 import _recent_days

    # persisted: both pair sides reuse it — one raw-events scan
    return seasonal_mk_daily(_recent_days(_daily(spark, sf_dir).persist()))


def seasonal_mk_daily(d):
    """Weekday-stratified Mann-Kendall sign sums over a (event_type,
    day, cents) daily table — see q_agg_trend_seasonal_mk."""
    a = d.select(
        "event_type",
        F.col("day").alias("day_a"),
        (F.dayofweek("day") - 1).cast("int").alias("season"),
        F.col("cents").alias("c_a"),
    )
    b = d.select(
        "event_type",
        F.col("day").alias("day_b"),
        (F.dayofweek("day") - 1).cast("int").alias("season"),
        F.col("cents").alias("c_b"),
    )
    p = (
        a.join(b, ["event_type", "season"])
        .filter(F.col("day_a") < F.col("day_b"))
        .select(
            "event_type",
            "season",
            F.when(F.col("c_b") > F.col("c_a"), 1)
            .when(F.col("c_b") < F.col("c_a"), -1)
            .otherwise(0)
            .alias("sgn"),
        )
    )
    return (
        p.groupBy("event_type")
        .agg(
            F.countDistinct("season").cast("long").alias("n_seasons"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("sgn").cast("long").alias("s_seasonal"),
        )
        .orderBy("event_type")
    )


# =====================================================================
# BB. Spell statistics (threshold-crossing run lengths)
# =====================================================================


@register(
    "agg_spell_lengths",
    f"""
    WITH {_DAILY_SQL},
    m AS (
      SELECT event_type, cents AS med FROM (
        SELECT event_type, cents,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY cents, day) AS rk,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM d)
      WHERE rk = (n + 1) // 2),
    fl AS (
      SELECT d.event_type, d.day,
             CASE WHEN d.cents > m.med THEN 1 ELSE 0 END AS above
      FROM d JOIN m ON d.event_type = m.event_type),
    r AS (
      SELECT event_type, above,
             row_number() OVER (PARTITION BY event_type ORDER BY day)
             - row_number() OVER (PARTITION BY event_type, above
                                  ORDER BY day) AS grp
      FROM fl),
    runs AS (
      SELECT event_type, above, CAST(count(*) AS BIGINT) AS run_len
      FROM r GROUP BY event_type, above, grp)
    SELECT event_type, CAST(above AS BIGINT) AS above,
           CAST(count(*) AS BIGINT) AS n_spells,
           CAST(max(run_len) AS BIGINT) AS max_spell,
           CAST(sum(run_len) AS BIGINT) AS total_days
    FROM runs GROUP BY event_type, above ORDER BY event_type, above
    """,
)
def q_agg_spell_lengths(spark, sf_dir):
    """SPELL statistics — the wet/dry-spell question climate series
    are analyzed with: maximal runs of consecutive observations above
    vs not-above the key's EXACT median (rank-selected at (n+1) DIV 2
    under the (cents, day) total order, never interpolated — the
    CLAUDE.md selection rule), with spell count, longest spell, and
    total days per side.  Runs are gap-islands in the OBSERVED
    day-ordered sequence (double row_number difference).  Longest-dry-
    spell is the drought index; run-count asymmetry is a persistence
    (autocorrelation-sign) signal the pointwise stats can't see.
    Scale shape: per-key rank window for the median + ONE key-hash
    exchange reused by both islands windows and the run rollup."""
    return spell_lengths_daily(_daily(spark, sf_dir))


def spell_lengths_daily(d):
    """Above/below-median run statistics over a (event_type, day,
    cents) daily table — see q_agg_spell_lengths."""
    wr = Window.partitionBy("event_type").orderBy("cents", "day")
    wn = Window.partitionBy("event_type")
    m = (
        d.select(
            "event_type",
            "cents",
            F.row_number().over(wr).alias("rk"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .filter(F.col("rk") == F.expr("(n + 1) DIV 2"))
        .select("event_type", F.col("cents").alias("med"))
    )
    fl = d.join(m, "event_type").select(
        "event_type",
        "day",
        F.when(F.col("cents") > F.col("med"), 1).otherwise(0).alias("above"),
    )
    wd = Window.partitionBy("event_type").orderBy("day")
    wf = Window.partitionBy("event_type", "above").orderBy("day")
    r = fl.select(
        "event_type",
        "above",
        (F.row_number().over(wd) - F.row_number().over(wf)).alias("grp"),
    )
    runs = r.groupBy("event_type", "above", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("run_len")
    )
    return (
        runs.groupBy("event_type", F.col("above").cast("long").alias("above"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spells"),
            F.max("run_len").cast("long").alias("max_spell"),
            F.sum("run_len").cast("long").alias("total_days"),
        )
        .orderBy("event_type", "above")
    )


# =====================================================================
# BC. Reverse geocoding (L∞-nearest anchor, broadcast-as-literal)
# =====================================================================


def _revgeo_parts():
    from .fixtures import LATS, LONS
    from .operators.spatial import nearest_anchor_sql

    anchors = [
        (i, int(round(LONS[i] * 1_000_000)), int(round(LATS[i] * 1_000_000)))
        for i in range(len(LATS))
    ]
    return nearest_anchor_sql("px", "py", anchors)


def _revgeo_oracle_sql() -> str:
    dist, aid = _revgeo_parts()
    return (
        "WITH p AS (SELECT c_custkey,"
        f" CAST({_PX_SQL} AS BIGINT) AS px,"
        f" CAST({_PY_SQL} AS BIGINT) AS py FROM customer),\n"
        f"n AS (SELECT c_custkey, px, py, {dist} AS __nd FROM p)\n"
        "SELECT c_custkey, CAST(__nd AS BIGINT) AS linf_micro,"
        f" {aid} AS nearest_id FROM n ORDER BY c_custkey"
    )


@register("join_geocode_reverse", _revgeo_oracle_sql())
def q_join_geocode_reverse(spark, sf_dir):
    """REVERSE geocoding — the missing direction of the geocode
    family (forward exact, forward fuzzy, now coords → place): each
    synthetic point snaps to the nearest fixture anchor under the L∞
    (Chebyshev) micro-degree metric, ties broken by lowest anchor id
    — all EXACT int64 (abs/greatest/least; no haversine floats, whose
    libm trig would be the one thing two engines may disagree on).
    The anchor dim is compiled into the projection as literal terms
    (the point-in-polygon broadcast-as-literal posture, shared SQL
    text verbatim with the oracle): resolving 100 TB of points is one
    narrow codegen'd map stage — no join, no exchange, no UDF.
    Reference parity: the reference snaps coordinates to the nearest
    grid point server-side (server.py geocode snap); this is that
    snap as a native operator."""
    dist, aid = _revgeo_parts()
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.expr(_PX_SQL).cast("long").alias("px"),
        F.expr(_PY_SQL).cast("long").alias("py"),
    )
    return (
        cust.select("c_custkey", "px", "py", F.expr(dist).alias("__nd"))
        .select(
            "c_custkey",
            F.col("__nd").cast("long").alias("linf_micro"),
            F.expr(aid).alias("nearest_id"),
        )
        .orderBy("c_custkey")
    )


# =====================================================================
# BD. Geohash encoding (base-32 spatial key, shared-text SQL)
# =====================================================================

_GH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"

#: synthetic degree lon/lat from the customer row (the f_morton_z /
#: f_geo_tile scheme); f_geohash derives BOTH its oracle text and its
#: DataFrame side from these strings so the family cannot diverge
_SYN_LON_SQL = "CAST(c_custkey % 500 AS DOUBLE) - 200.0"
_SYN_LAT_SQL = "c_acctbal / 60.0"


def _geohash5_parts(lon: str, lat: str):
    """5-character geohash as three STAGED SQL expressions shared
    verbatim by both engines: ``(bx, by)`` bucket terms over lon/lat,
    the 25-bit interleave ``z`` over columns named __bx/__by, and the
    base-32 concat ``chars`` over a column named __z (13 lon bits +
    12 lat bits, lon first, per the geohash spec) — pure integer bit
    arithmetic, no UDF, no subquery."""
    bx = f"least(CAST(floor(({lon} + 180.0) / 360.0 * 8192.0) AS BIGINT), 8191)"
    by = f"least(CAST(floor(({lat} + 90.0) / 180.0 * 4096.0) AS BIGINT), 4095)"
    terms = []
    for j in range(13):  # lon bits at even positions from the MSB
        terms.append(f"(((__bx >> {12 - j}) & 1) << {24 - 2 * j})")
    for j in range(12):  # lat bits at odd positions
        terms.append(f"(((__by >> {11 - j}) & 1) << {23 - 2 * j})")
    z = "(" + " + ".join(terms) + ")"
    chars = " || ".join(
        f"substr('{_GH_ALPHABET}', CAST(((__z >> {20 - 5 * i}) & 31)"
        " AS INT) + 1, 1)"
        for i in range(5)
    )
    return bx, by, z, chars


_GH_BX, _GH_BY, _GH_Z, _GH_CHARS = _geohash5_parts('lon', 'lat')


@register(
    "f_geohash",
    f"""
    WITH t AS (
      SELECT c_custkey,
             {_SYN_LON_SQL} AS lon,
             {_SYN_LAT_SQL} AS lat
      FROM customer
      WHERE {_SYN_LAT_SQL} BETWEEN -90 AND 90
        AND {_SYN_LON_SQL} BETWEEN -180 AND 180),
    b AS (SELECT c_custkey, {_GH_BX} AS __bx, {_GH_BY} AS __by FROM t),
    z AS (SELECT c_custkey, {_GH_Z} AS __z FROM b)
    SELECT c_custkey, {_GH_CHARS} AS gh5
    FROM z ORDER BY c_custkey
    """,
)
def q_f_geohash(spark, sf_dir):
    """GEOHASH-5 encoding — the interoperable string form of the
    Morton key (f_morton_z gives the int64 clustering key; external
    systems, tile caches and REST APIs speak geohash): 13 lon + 12
    lat bits interleaved lon-first per the geohash spec, emitted
    through the standard base-32 alphabet — a ~4.9 km × 4.9 km cell,
    the usual spatial-join bucketing granularity.  The bit expression
    is ONE shared SQL text on both engines (the point-in-polygon
    posture); floor/least clamp the +180/+90 edge into the last cell.
    Scale shape: pure codegen'd projection, zero exchanges before the
    sort."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.expr(_SYN_LON_SQL).alias("lon"),
        F.expr(_SYN_LAT_SQL).alias("lat"),
    )
    return (
        cust.filter(
            F.col("lat").between(-90, 90) & F.col("lon").between(-180, 180)
        )
        .select(
            "c_custkey",
            F.expr(_GH_BX).alias("__bx"),
            F.expr(_GH_BY).alias("__by"),
        )
        .select("c_custkey", F.expr(_GH_Z).alias("__z"))
        .select("c_custkey", F.expr(_GH_CHARS).alias("gh5"))
        .orderBy("c_custkey")
    )


# =====================================================================
# BE. Sequence-pair counting (CEP A-then-B matches, closed form)
# =====================================================================


@register(
    "win_sequence_count",
    """
    WITH ab AS (
      SELECT min(event_type) AS a,
             min(CASE WHEN event_type > (SELECT min(event_type)
                                         FROM events)
                      THEN event_type END) AS b
      FROM events),
    e AS (
      SELECT ev.user_id, ev.ts, ev.event_id,
             CASE WHEN ev.event_type = ab.a THEN 1 ELSE 0 END AS is_a,
             CASE WHEN ev.event_type = ab.b THEN 1 ELSE 0 END AS is_b
      FROM events ev, ab
      WHERE ev.event_type IN (ab.a, ab.b)),
    c AS (
      SELECT user_id,
             sum(is_b) OVER w - sum(is_a) OVER w AS excess,
             is_a, is_b
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT user_id,
           CAST(sum(is_a) AS BIGINT) AS n_a,
           CAST(sum(is_b) AS BIGINT) AS n_b,
           CAST(sum(is_b) - greatest(max(excess), 0) AS BIGINT)
             AS n_matched
    FROM c GROUP BY user_id ORDER BY user_id
    """,
)
def q_win_sequence_count(spark, sf_dir):
    """CEP sequence-pair counting (the ClickHouse ``sequenceCount``
    shape): per user, the number of NON-CROSSING "A then B" matches
    between the two lexicographically-first event types, each B
    consuming the earliest unmatched preceding A — funnels count a
    user once; this counts REPEATED conversions.  The greedy match
    has a closed form that needs no sequential fold:
    matched = n_b − max(0, max over prefixes of (cumB − cumA)) —
    every prefix where Bs outnumber As wastes exactly that excess —
    so ONE cumulative window + one aggregate computes it, exact
    integers, deterministic (ts, event_id) order.  Scale shape: the
    type filter prunes the scan, one user-hash exchange feeds the
    window and the rollup."""
    ev = load_table(spark, sf_dir, "events")
    return sequence_pair_counts(ev)


def sequence_pair_counts(ev):
    """Non-crossing A-then-B match counts per user for the two
    lexicographically-first event types — see q_win_sequence_count."""
    # ONE pass derives the (tiny) type dim; the two one-row aggs then
    # run over it, not over raw events — the main pipeline below is
    # the only other full scan
    types = ev.select("event_type").distinct()
    a_row = types.agg(F.min("event_type").alias("a"))
    # second-smallest type: min of types strictly above the min
    b_row = (
        types.join(F.broadcast(a_row), types["event_type"] > a_row["a"])
        .agg(F.min("event_type").alias("b"))
    )
    dim = F.broadcast(a_row.crossJoin(b_row))
    e = (
        ev.join(dim)
        .filter(
            (F.col("event_type") == F.col("a"))
            | (F.col("event_type") == F.col("b"))
        )
        .select(
            "user_id",
            "ts",
            "event_id",
            F.when(F.col("event_type") == F.col("a"), 1).otherwise(0)
            .alias("is_a"),
            F.when(F.col("event_type") == F.col("b"), 1).otherwise(0)
            .alias("is_b"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = e.select(
        "user_id",
        "is_a",
        "is_b",
        (F.sum("is_b").over(w) - F.sum("is_a").over(w)).alias("excess"),
    )
    return (
        c.groupBy("user_id")
        .agg(
            F.sum("is_a").cast("long").alias("n_a"),
            F.sum("is_b").cast("long").alias("n_b"),
            (
                F.sum("is_b")
                - F.greatest(F.max("excess"), F.lit(0))
            )
            .cast("long")
            .alias("n_matched"),
        )
        .orderBy("user_id")
    )


# =====================================================================
# BF. Rescaled-range (R/S) components (Hurst long-memory diagnostics)
# =====================================================================


@register(
    "agg_hurst_components",
    f"""
    WITH {_DAILY_SQL},
    k AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s,
             CAST(sum(CAST(cents AS HUGEINT) * cents) AS DECIMAL(38,0))
               AS sum_sq
      FROM d GROUP BY event_type),
    c AS (
      SELECT d.event_type, k.n, k.s, k.sum_sq,
             CAST(k.n AS HUGEINT)
               * sum(d.cents) OVER (PARTITION BY d.event_type
                   ORDER BY d.day ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
             - CAST(row_number() OVER (PARTITION BY d.event_type
                   ORDER BY d.day) AS HUGEINT) * k.s AS zdev
      FROM d JOIN k ON d.event_type = k.event_type)
    SELECT event_type, CAST(max(n) AS BIGINT) AS n_days,
           CAST(max(s) AS BIGINT) AS s,
           CAST(max(sum_sq) AS VARCHAR) AS sum_sq,
           CAST(CAST(greatest(max(zdev), 0) - least(min(zdev), 0)
                AS HUGEINT) AS VARCHAR) AS range_xn
    FROM c GROUP BY event_type ORDER BY event_type
    """,
)
def q_agg_hurst_components(spark, sf_dir):
    """Rescaled-range (R/S) COMPONENTS — Hurst's long-memory
    diagnostic (persistent series: R/S ~ n^H with H > 0.5; the
    statistic Mandelbrot built fractal analysis on): the cumulative
    deviation Z_t = Σ(xᵢ − x̄) is rational, so it is held as the
    EXACT integer n·P_t − t·S (scale n), the published range_xn =
    n·(max Z − min Z) with the zero start included via the
    greatest/least clamp, and R/S = range_xn/(n·σ) with σ from the
    exact power sums — every division deferred to the driver (the
    agg_autocorr moments posture).  Complements agg_autocorr (lag-1)
    with the ALL-lags long-range-dependence view.  Scale shape: one
    per-key totals aggregate broadcast back + one per-key cumulative
    window over the tiny daily table."""
    return hurst_components_daily(_daily(spark, sf_dir).persist())


def hurst_components_daily(d):
    """Exact R/S components over a (event_type, day, cents) daily
    table — see q_agg_hurst_components."""
    k = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
        .cast("decimal(38,0)")
        .alias("sum_sq"),
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wrn = Window.partitionBy("event_type").orderBy("day")
    c = d.join(k, "event_type").select(
        "event_type",
        "n",
        "s",
        "sum_sq",
        (
            F.col("n").cast("decimal(38,0)") * F.sum("cents").over(wcum)
            - F.row_number().over(wrn).cast("decimal(38,0)") * F.col("s")
        ).alias("zdev"),
    )
    zero = F.lit(0).cast("decimal(38,0)")
    return (
        c.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_days"),
            F.max("s").cast("long").alias("s"),
            # digit strings, not DECIMAL (spearman r6 canonicalizer lesson)
            F.max("sum_sq")
            .cast("decimal(38,0)")
            .cast("string")
            .alias("sum_sq"),
            (
                F.greatest(F.max("zdev"), zero)
                - F.least(F.min("zdev"), zero)
            )
            .cast("decimal(38,0)")
            .cast("string")
            .alias("range_xn"),
        )
        .orderBy("event_type")
    )


# =====================================================================
# BG. Experimental variogram (geostatistics lag structure, exact)
# =====================================================================


@register(
    "agg_variogram",
    f"""
    WITH {_DAILY_SQL},
    a1 AS (
      SELECT event_type, CAST(1 AS BIGINT) AS lag_k,
             cents - lag(cents, 1) OVER (PARTITION BY event_type
               ORDER BY day) AS dk
      FROM d),
    a2 AS (
      SELECT event_type, CAST(2 AS BIGINT) AS lag_k,
             cents - lag(cents, 2) OVER (PARTITION BY event_type
               ORDER BY day) AS dk
      FROM d),
    a3 AS (
      SELECT event_type, CAST(3 AS BIGINT) AS lag_k,
             cents - lag(cents, 3) OVER (PARTITION BY event_type
               ORDER BY day) AS dk
      FROM d),
    a4 AS (
      SELECT event_type, CAST(4 AS BIGINT) AS lag_k,
             cents - lag(cents, 4) OVER (PARTITION BY event_type
               ORDER BY day) AS dk
      FROM d),
    a5 AS (
      SELECT event_type, CAST(5 AS BIGINT) AS lag_k,
             cents - lag(cents, 5) OVER (PARTITION BY event_type
               ORDER BY day) AS dk
      FROM d),
    a6 AS (
      SELECT event_type, CAST(6 AS BIGINT) AS lag_k,
             cents - lag(cents, 6) OVER (PARTITION BY event_type
               ORDER BY day) AS dk
      FROM d),
    a7 AS (
      SELECT event_type, CAST(7 AS BIGINT) AS lag_k,
             cents - lag(cents, 7) OVER (PARTITION BY event_type
               ORDER BY day) AS dk
      FROM d),
    u AS (
    SELECT * FROM a1 WHERE dk IS NOT NULL
    UNION ALL
    SELECT * FROM a2 WHERE dk IS NOT NULL
    UNION ALL
    SELECT * FROM a3 WHERE dk IS NOT NULL
    UNION ALL
    SELECT * FROM a4 WHERE dk IS NOT NULL
    UNION ALL
    SELECT * FROM a5 WHERE dk IS NOT NULL
    UNION ALL
    SELECT * FROM a6 WHERE dk IS NOT NULL
    UNION ALL
    SELECT * FROM a7 WHERE dk IS NOT NULL)
    SELECT event_type, lag_k,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CAST(dk AS HUGEINT) * dk) AS VARCHAR)
             AS sum_sq_diff
    FROM u GROUP BY event_type, lag_k ORDER BY event_type, lag_k
    """,
)
def q_agg_variogram(spark, sf_dir):
    """EXPERIMENTAL VARIOGRAM over the daily series — the lag
    structure function geostatistics/kriging is built on (and the
    classical weather-station tool): for row-lags k = 1..7,
    semivariance gamma(k) = sum((x_{t+k} - x_t)^2) / (2*n_k), with the
    exact integer squared-difference sum published in DECIMAL(38,0)
    and both divisions left to the driver.  A flat gamma(k) in k means
    white noise; gamma rising to a sill reveals the correlation range
    — the view autocorr (one lag) and Hurst (all lags pooled) sit
    between.  Row-lags, not calendar-lags, so gaps do not create
    phantom pairs (consistent with win_* lag semantics).  Scale shape:
    ONE per-key window exchange serves all seven lag columns; the
    lag fan-out is an in-partition explode."""
    return variogram_daily(_daily(spark, sf_dir))


def variogram_daily(d, max_lag=7):
    """Exact semivariance components for row-lags 1..max_lag — see
    q_agg_variogram."""
    w = Window.partitionBy("event_type").orderBy("day")
    # window expressions can't sit inside a Generate: materialize the
    # lag diffs in a plain projection first, THEN fan out
    lagged = d.select(
        "event_type",
        *[
            (F.col("cents") - F.lag("cents", k).over(w)).alias(f"__d{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    structs = [
        F.struct(
            F.lit(k).cast("long").alias("lag_k"),
            F.col(f"__d{k}").alias("dk"),
        )
        for k in range(1, max_lag + 1)
    ]
    return (
        lagged.select("event_type", F.explode(F.array(*structs)).alias("x"))
        .select("event_type", "x.lag_k", "x.dk")
        .filter(F.col("dk").isNotNull())
        .groupBy("event_type", "lag_k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            # digit string, not DECIMAL (spearman r6 canonicalizer lesson)
            F.sum(F.col("dk").cast("decimal(38,0)") * F.col("dk"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("sum_sq_diff"),
        )
        .orderBy("event_type", "lag_k")
    )


# Round-6's two _register_new_this_round tails (58 ids) were removed at
# round-7 start (CLAUDE.md rotation checklist): those ids are now carryovers
# and outrank round-7 additions for the ~50 driver check slots.
