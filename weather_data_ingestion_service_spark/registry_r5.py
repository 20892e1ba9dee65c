"""Round-5 registry additions.

Cross-engine compare rules are documented at the top of registry.py —
every oracle-paired entry here follows them (exact integer arithmetic,
no float folds, deterministic tie-breaks).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .io import load_table
from .registry import _register_new_this_round, register  # noqa: F401
from .registry_ext import _NEAR_DUP_CORPUS_SQL, _near_dup_corpus
from .registry_r4 import _TOK_SQL


# =====================================================================
# A. Exact duplicated-substring spans (Lee et al. 2022)
# =====================================================================


@register(
    "ext_dedup_spans",
    f"""
    WITH {_NEAR_DUP_CORPUS_SQL},
    tok AS (SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '\\s+'),
                               x -> x <> '') AS w FROM corpus),
    g AS (SELECT doc_id, i - 1 AS p, array_to_string(w[i:i+4], ' ') AS gram
          FROM tok, unnest(range(1, greatest(len(w) - 4, 0) + 1)) AS u(i)),
    hot AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 1),
    m AS (SELECT doc_id, p FROM g JOIN hot USING (gram)),
    b AS (SELECT doc_id, p,
                 CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) <= 5
                      THEN 0 ELSE 1 END AS brk
          FROM m),
    s AS (SELECT doc_id, p,
                 sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS isl
          FROM b),
    sp AS (SELECT doc_id, isl, max(p) - min(p) + 5 AS len
           FROM s GROUP BY doc_id, isl),
    pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
                  CAST(sum(len) AS BIGINT) AS dup_tokens
           FROM sp GROUP BY doc_id)
    SELECT t.doc_id, CAST(len(t.w) AS BIGINT) AS n_tokens,
           CAST(coalesce(pd.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
           CAST(coalesce(pd.dup_tokens, 0) AS BIGINT) AS dup_tokens,
           CAST(coalesce(pd.dup_tokens, 0) * 1000000
                // greatest(len(t.w), 1) AS BIGINT) AS dup_frac_micro
    FROM tok t LEFT JOIN pd ON t.doc_id = pd.doc_id
    """,
)
def q_ext_dedup_spans(spark, sf_dir):
    """Exact duplicated-substring span detection (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better"): every
    word 5-gram occurring more than once in the corpus marks its token
    positions; marked windows coalesce into maximal spans per doc.
    The near-dup corpus plants real long spans (80%-prefix
    truncations), so the operator's output is structurally meaningful.
    See ext/dedup.duplicate_spans for the scale shape (int64 gram
    keys, map-side-combinable hot-gram count, per-doc gap-islands
    merge)."""
    from .ext.dedup import duplicate_spans

    corpus = _near_dup_corpus(spark, sf_dir)
    return duplicate_spans(corpus, "doc_id", "text", k=5)


# =====================================================================
# B. Mann-Kendall trend statistic (exact integer S)
# =====================================================================

#: hard ceiling on days-per-key entering the trend pair joins
#: (agg_trend_mk, agg_theilsen).  The quadratic kernel is bounded by
#: construction for a calendar year (≤366 days → ≤67k pairs/key), but a
#: multi-year series grows it quadratically unannounced (VERDICT r5 #5):
#: 1000 days → ≤500k pairs/key ≈ 12 MB of (key, slope) rows — still a
#: single in-partition kernel; beyond that the trend statistic uses the
#: MOST RECENT 1000 days, which is both the bounded and the
#: statistically current choice.  Fixture series span ≤366 days, so the
#: cap is invisible to the oracles at test scale.
_TREND_MAX_DAYS = 1000

#: oracle-side restatement of _recent_days (keep in lockstep)
_RECENT_DAYS_SQL = f"""
    dc AS (
      SELECT event_type, day, cents FROM (
        SELECT d.*, row_number() OVER (
          PARTITION BY event_type ORDER BY day DESC) AS rnr
        FROM d)
      WHERE rnr <= {_TREND_MAX_DAYS})
"""


def _recent_days(d, max_days: int = _TREND_MAX_DAYS):
    """Cap a per-key daily table to its ``max_days`` most recent rows —
    the guard that keeps the trend operators' per-key pair joins
    O(max_days²) no matter how many years the series spans.  The window
    runs per key over the (small) daily aggregate, not the raw events.
    """
    w = Window.partitionBy("event_type").orderBy(F.col("day").desc())
    return (
        d.select("*", F.row_number().over(w).alias("__rnr"))
        .filter(F.col("__rnr") <= max_days)
        .drop("__rnr")
    )


@register(
    "agg_trend_mk",
    f"""
    WITH d AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2),
    {_RECENT_DAYS_SQL},
    p AS (
      SELECT a.event_type,
             CASE WHEN b.cents > a.cents THEN 1
                  WHEN b.cents < a.cents THEN -1 ELSE 0 END AS sgn
      FROM dc a JOIN dc b
        ON a.event_type = b.event_type AND a.day < b.day)
    SELECT event_type,
           CAST((SELECT count(*) FROM dc x
                 WHERE x.event_type = p.event_type) AS BIGINT) AS n_days,
           CAST(sum(sgn) AS BIGINT) AS s_stat,
           CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS concordant,
           CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT)
             AS discordant
    FROM p GROUP BY event_type ORDER BY event_type
    """,
)
def q_agg_trend_mk(spark, sf_dir):
    """Mann-Kendall trend statistic per event type over the daily
    revenue series: S = Σ_{i<j} sign(x_j − x_i) — the standard
    nonparametric monotonic-trend test, EXACT integer state (daily
    sums in cents, sign counts).  The pair join is per-key and the
    series is capped to the most recent ``_TREND_MAX_DAYS`` days per
    key, so the quadratic stays bounded inside one partition at any
    corpus scale AND any time span; the daily pre-aggregation is the
    only full-data pass."""
    from .registry import _cents

    ev = load_table(spark, sf_dir, "events")
    cents = _cents("value")
    # the daily table feeds three branches (both pair sides + the day
    # count) — persist so the full-data aggregate runs once
    d = (
        ev.groupBy(
            "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .agg(F.sum(cents).cast("long").alias("cents"))
        .persist()
    )
    return mann_kendall_daily(d)


def mann_kendall_daily(d, max_days: int = _TREND_MAX_DAYS):
    """Mann-Kendall S over a per-key daily cents table — see
    ``q_agg_trend_mk``.  ``max_days`` is the quadratic guard
    (``_TREND_MAX_DAYS``); tests exercise the boundary directly."""
    d = _recent_days(d, max_days)
    a = d.select("event_type", F.col("day").alias("day_a"), F.col("cents").alias("c_a"))
    b = d.select("event_type", F.col("day").alias("day_b"), F.col("cents").alias("c_b"))
    sgn = (
        F.when(F.col("c_b") > F.col("c_a"), 1)
        .when(F.col("c_b") < F.col("c_a"), -1)
        .otherwise(0)
    )
    pairs = (
        a.join(b, "event_type")
        .filter(F.col("day_a") < F.col("day_b"))
        .select("event_type", sgn.alias("sgn"))
    )
    ndays = d.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    return (
        pairs.groupBy("event_type")
        .agg(
            F.sum("sgn").cast("long").alias("s_stat"),
            F.sum(F.when(F.col("sgn") == 1, 1).otherwise(0))
            .cast("long")
            .alias("concordant"),
            F.sum(F.when(F.col("sgn") == -1, 1).otherwise(0))
            .cast("long")
            .alias("discordant"),
        )
        .join(ndays, "event_type")
        .select(
            "event_type", "n_days", "s_stat", "concordant", "discordant"
        )
        .orderBy("event_type")
    )


# =====================================================================
# C. Tokenizer fertility per language
# =====================================================================


@register(
    "ext_text_fertility",
    """
    WITH t AS (
      SELECT lang,
             CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                  x -> x <> '')) AS BIGINT) AS n_tokens,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS tokens,
           CAST(sum(n_bytes) AS BIGINT) AS bytes,
           CAST(sum(n_bytes) * 1000000 // greatest(sum(n_tokens), 1)
                AS BIGINT) AS bytes_per_token_micro,
           CAST(sum(n_tokens) * 1000000 // count(*) AS BIGINT)
             AS tokens_per_doc_micro
    FROM t GROUP BY lang ORDER BY lang
    """,
)
def q_ext_text_fertility(spark, sf_dir):
    """Tokenizer fertility by language: bytes-per-token and
    tokens-per-doc in exact integer micro-units — the standard
    multilingual-corpus diagnostic (a language whose bytes/token ratio
    is far off the corpus mean is under-served by the tokenizer and
    over-pays in sequence length).  One narrow pass + one 5-row
    aggregate; runs at scan speed on 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    t = docs.select(
        "lang",
        F.size(toks).cast("long").alias("n_tokens"),
        F.octet_length("text").cast("long").alias("n_bytes"),
    )
    return (
        t.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("tokens"),
            F.sum("n_bytes").cast("long").alias("bytes"),
        )
        .select(
            "lang",
            "n_docs",
            "tokens",
            "bytes",
            F.expr(
                "CAST(bytes * 1000000 DIV greatest(tokens, 1) AS BIGINT)"
            ).alias("bytes_per_token_micro"),
            F.expr("CAST(tokens * 1000000 DIV n_docs AS BIGINT)").alias(
                "tokens_per_doc_micro"
            ),
        )
        .orderBy("lang")
    )




# =====================================================================
# D. Two-sample Kolmogorov-Smirnov distance, all type pairs, exact
# =====================================================================


@register(
    "agg_ks_stat",
    """
    WITH v AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL),
    n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1),
    sup AS (SELECT DISTINCT cents FROM v),
    grid AS (SELECT t.event_type, s.cents
             FROM (SELECT DISTINCT event_type FROM v) t CROSS JOIN sup s),
    c AS (SELECT event_type, cents, CAST(count(*) AS BIGINT) AS k
          FROM v GROUP BY 1, 2),
    e AS (
      SELECT g.event_type, g.cents,
             CAST(sum(coalesce(c.k, 0)) OVER (
               PARTITION BY g.event_type ORDER BY g.cents) AS BIGINT) AS cum
      FROM grid g LEFT JOIN c ON g.event_type = c.event_type
                              AND g.cents = c.cents),
    p AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             na.n AS n_a, nb.n AS n_b,
             CAST(max(abs(a.cum * nb.n - b.cum * na.n)) AS BIGINT) AS d_num
      FROM e a JOIN e b ON a.cents = b.cents AND a.event_type < b.event_type
      JOIN n na ON na.event_type = a.event_type
      JOIN n nb ON nb.event_type = b.event_type
      GROUP BY 1, 2, 3, 4)
    SELECT type_a, type_b, n_a, n_b, d_num,
           CAST(d_num * 1000000 // (n_a * n_b) AS BIGINT) AS d_micro
    FROM p ORDER BY type_a, type_b
    """,
)
def q_agg_ks_stat(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov distance for every pair of event
    types, EXACT: D = max |F_a − F_b| over the union support, held as
    the integer numerator ``max |cum_a·n_b − cum_b·n_a|`` with
    denominator n_a·n_b — no float ECDFs, so the result is a pure
    function of the data.  The supremum over two step functions is
    attained at a sample point, so evaluating on the shared distinct-
    cents grid is exact.  Scale note: the per-type cumulative window
    runs over DISTINCT CENTS of a bounded-range measure (≤ ~50k values
    here; quantize coarser for unbounded measures), partitioned by
    type — never over raw rows."""
    from .registry import _cents

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    v = ev.select("event_type", _cents("value").alias("cents"))
    n = v.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    sup = v.select("cents").distinct()
    types = v.select("event_type").distinct()
    grid = types.crossJoin(sup)
    c = v.groupBy("event_type", "cents").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # the ECDF table feeds BOTH sides of the pair join — persist so the
    # grid build + cumulative window run once, not per branch
    e = (
        grid.join(c, ["event_type", "cents"], "left")
        .select(
            "event_type",
            "cents",
            F.sum(F.coalesce("k", F.lit(0))).over(w).cast("long").alias("cum"),
        )
        .persist()
    )
    a = e.select(
        F.col("event_type").alias("type_a"), "cents", F.col("cum").alias("cum_a")
    )
    b = e.select(
        F.col("event_type").alias("type_b"), "cents", F.col("cum").alias("cum_b")
    )
    na = n.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    nb = n.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    pairs = (
        a.join(b, "cents")
        .filter(F.col("type_a") < F.col("type_b"))
        .join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .groupBy("type_a", "type_b", "n_a", "n_b")
        .agg(
            F.max(
                F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a"))
            )
            .cast("long")
            .alias("d_num")
        )
    )
    return pairs.select(
        "type_a",
        "type_b",
        "n_a",
        "n_b",
        "d_num",
        F.expr("CAST(d_num * 1000000 DIV (n_a * n_b) AS BIGINT)").alias(
            "d_micro"
        ),
    ).orderBy("type_a", "type_b")


# =====================================================================
# E. Equi-height histogram boundaries via exact rank selection
# =====================================================================


@register(
    "agg_histogram_eqh",
    """
    WITH v AS (
      SELECT event_type, event_id, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL),
    r AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY cents, event_id) AS rn,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM v)
    SELECT event_type, CAST(j AS INT) AS bucket, n,
           CAST(max(CASE WHEN rn = (j * n) // 4 THEN cents END) AS BIGINT)
             AS cut_cents
    FROM r, (SELECT unnest([1, 2, 3]) AS j)
    WHERE rn = (j * n) // 4
    GROUP BY event_type, j, n
    ORDER BY event_type, bucket
    """,
)
def q_agg_histogram_eqh(spark, sf_dir):
    """Equi-HEIGHT histogram boundaries per group (quartile cuts) by
    exact rank SELECTION under the (cents, event_id) total order —
    never interpolation (CLAUDE.md cross-engine rule): cut_j is the
    element at rank ⌊j·n/4⌋, an actual data value, identical in any
    engine.  Complements agg_histogram's equi-width bins; this is the
    optimizer-statistics shape (bounded output: 3 rows per group)."""
    from .registry import _cents

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    v = ev.select("event_type", "event_id", _cents("value").alias("cents"))
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    wn = Window.partitionBy("event_type")
    r = v.select(
        "event_type",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).cast("long").alias("n"),
    )
    js = r.sparkSession.range(1, 4).select(F.col("id").cast("int").alias("j"))
    return (
        r.crossJoin(F.broadcast(js))
        .filter(F.col("rn") == F.expr("CAST(j * n DIV 4 AS BIGINT)"))
        .groupBy("event_type", F.col("j").alias("bucket"), "n")
        .agg(F.max("cents").cast("long").alias("cut_cents"))
        .orderBy("event_type", "bucket")
    )

# =====================================================================
# F. Exact Spearman rank correlation (eval family)
# =====================================================================


@register(
    "ext_eval_spearman",
    """
    WITH t AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS a,
             CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                  x -> x <> '')) AS BIGINT) AS b
      FROM documents),
    ca AS (SELECT a, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY a),
    ra AS (SELECT a,
                  CAST(2 * coalesce(sum(c) OVER (
                    ORDER BY a ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) + c + 1 AS BIGINT) AS r2a
           FROM ca),
    cb AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY b),
    rb AS (SELECT b,
                  CAST(2 * coalesce(sum(c) OVER (
                    ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING
                    AND 1 PRECEDING), 0) + c + 1 AS BIGINT) AS r2b
           FROM cb),
    j AS (SELECT t.doc_id, ra.r2a, rb.r2b
          FROM t JOIN ra USING (a) JOIN rb USING (b)),
    agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(r2a - r2b AS HUGEINT) * (r2a - r2b))
                        AS DECIMAL(38,0)) AS sum_d2_x4
            FROM j)
    SELECT n, CAST(CAST(sum_d2_x4 AS HUGEINT) AS VARCHAR) AS sum_d2_x4,
           CAST(1000000 - CAST(1500000 AS HUGEINT)
                * CAST(sum_d2_x4 AS HUGEINT)
                // (CAST(n AS HUGEINT) * n * n - n) AS BIGINT)
             AS rho_micro
    FROM agg
    """,
)
def q_ext_eval_spearman(spark, sf_dir):
    """Exact Spearman rank correlation between document length in
    characters and in tokens (ties -> average ranks, d2 formula) —
    the rank-based metric-agreement check an eval pipeline runs
    between two quality signals.  Integer micro-units end to end (see
    ext/simsearch.spearman_rho: doubled ranks from distinct-value
    tables, one DECIMAL/HUGEINT floor-divide)."""
    from .ext.simsearch import spearman_rho

    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    d = docs.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("a"),
        F.size(toks).cast("long").alias("b"),
    )
    return spearman_rho(d, "doc_id", "a", "b")


# =====================================================================
# G. Duplicated-span REMOVAL (the transform half of ext_dedup_spans)
# =====================================================================


@register(
    "ext_dedup_span_removal",
    f"""
    WITH {_NEAR_DUP_CORPUS_SQL},
    tok AS (SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '\\s+'),
                               x -> x <> '') AS w FROM corpus),
    g AS (SELECT doc_id, i - 1 AS p, array_to_string(w[i:i+4], ' ') AS gram
          FROM tok, unnest(range(1, greatest(len(w) - 4, 0) + 1)) AS u(i)),
    hot AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 1),
    m AS (SELECT doc_id, p FROM g JOIN hot USING (gram)),
    cov AS (SELECT DISTINCT doc_id, p + j AS t
            FROM m, unnest(range(0, 5)) AS r(j)),
    tk AS (SELECT doc_id, i - 1 AS t, w[i] AS tok
           FROM tok, unnest(range(1, len(w) + 1)) AS u(i)),
    kept AS (SELECT tk.doc_id, tk.t, tk.tok
             FROM tk LEFT JOIN cov ON tk.doc_id = cov.doc_id
                                   AND tk.t = cov.t
             WHERE cov.t IS NULL),
    rb AS (SELECT doc_id,
                  string_agg(tok, ' ' ORDER BY t) AS text_clean,
                  CAST(count(*) AS BIGINT) AS n_kept
           FROM kept GROUP BY doc_id)
    SELECT t.doc_id,
           coalesce(rb.text_clean, '') AS text_clean,
           CAST(len(t.w) AS BIGINT) AS n_tokens,
           CAST(coalesce(rb.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(len(t.w) - coalesce(rb.n_kept, 0) AS BIGINT) AS n_removed
    FROM tok t LEFT JOIN rb ON t.doc_id = rb.doc_id
    """,
)
def q_ext_dedup_span_removal(spark, sf_dir):
    """Duplicated-span REMOVAL (Lee et al. delete the duplicated
    substrings from the training copy): tokens covered by any
    corpus-duplicated 5-gram are dropped, survivors re-joined — the
    cleaned text the packer actually consumes.  The reconstructed
    strings hash-compare exactly cross-engine (single-space joins of
    identical token streams).  See ext/dedup.remove_duplicate_spans."""
    from .ext.dedup import remove_duplicate_spans

    corpus = _near_dup_corpus(spark, sf_dir)
    return remove_duplicate_spans(corpus, "doc_id", "text", k=5)


# =====================================================================
# H. Benford first-digit diagnostic
# =====================================================================


@register(
    "agg_benford",
    """
    WITH v AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE value IS NOT NULL AND round(value * 100) >= 1),
    d AS (SELECT event_type,
                 CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit
          FROM v),
    c AS (SELECT event_type, digit, CAST(count(*) AS BIGINT) AS n
          FROM d GROUP BY 1, 2),
    t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS total
          FROM c GROUP BY 1)
    SELECT c.event_type, c.digit, c.n,
           CAST(c.n * 1000000 // t.total AS BIGINT) AS share_micro
    FROM c JOIN t USING (event_type)
    ORDER BY event_type, digit
    """,
)
def q_agg_benford(spark, sf_dir):
    """Benford first-significant-digit distribution per event type
    over the cents measure — the classic fabricated-data / unit-mixup
    diagnostic for a metrics pipeline.  The leading digit comes from
    the DECIMAL STRING of the integer cents (exact in any engine — no
    float log10), shares in integer micro-units."""
    from .registry import _cents

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    v = ev.select("event_type", _cents("value").alias("cents")).filter(
        F.col("cents") >= 1
    )
    d = v.select(
        "event_type",
        F.substring(F.col("cents").cast("string"), 1, 1).cast("int").alias("digit"),
    )
    c = d.groupBy("event_type", "digit").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    t = c.groupBy("event_type").agg(F.sum("n").cast("long").alias("total"))
    return (
        c.join(t, "event_type")
        .select(
            "event_type",
            "digit",
            "n",
            F.expr("CAST(n * 1000000 DIV total AS BIGINT)").alias(
                "share_micro"
            ),
        )
        .orderBy("event_type", "digit")
    )


# =====================================================================
# I. Mixture realization: per-source token quota fill
# =====================================================================


@register(
    "ext_mix_realize",
    """
    WITH s AS (
      SELECT source, CAST(sum(n_chars // 4) AS BIGINT) AS est FROM documents
      GROUP BY source),
    tot AS (SELECT CAST(sum(est) AS BIGINT) AS total,
                   CAST(count(*) AS BIGINT) AS n_sources FROM s),
    d AS (
      SELECT source, doc_id, CAST(n_chars // 4 AS BIGINT) AS est_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents),
    c AS (
      SELECT source, doc_id, est_tokens,
             CAST(coalesce(sum(est_tokens) OVER (
               PARTITION BY source ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_before
      FROM d),
    q AS (SELECT CAST(total // n_sources AS BIGINT) AS quota FROM tot)
    SELECT c.source, c.doc_id, c.est_tokens,
           CAST(c.cum_before + c.est_tokens AS BIGINT) AS cum_tokens,
           q.quota
    FROM c CROSS JOIN q
    WHERE c.cum_before < q.quota
    """,
)
def q_ext_mix_realize(spark, sf_dir):
    """Mixture REALIZATION: turns ext_mix_plan's uniform per-source
    token budget (total DIV n_sources) into the actual kept-document
    set — docs stream per source in id-hash order (the engine-portable
    shuffle) and fill until the pre-doc cumulative crosses the quota;
    the crossing doc is kept, so every source makes progress.  All
    exact integers; the per-source running sum is the only window and
    it partitions on source."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "source",
        "doc_id",
        F.expr("CAST(n_chars DIV 4 AS BIGINT)").alias("est_tokens"),
        F.md5(F.col("doc_id").cast("string").cast("binary")).alias("h"),
    )
    s = d.groupBy("source").agg(F.sum("est_tokens").cast("long").alias("est"))
    tot = s.agg(
        F.sum("est").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_sources"),
    ).select(F.expr("CAST(total DIV n_sources AS BIGINT)").alias("quota"))
    w = (
        Window.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = d.select(
        "source",
        "doc_id",
        "est_tokens",
        F.coalesce(F.sum("est_tokens").over(w), F.lit(0))
        .cast("long")
        .alias("cum_before"),
    )
    return (
        c.crossJoin(F.broadcast(tot))
        .filter(F.col("cum_before") < F.col("quota"))
        .select(
            "source",
            "doc_id",
            "est_tokens",
            (F.col("cum_before") + F.col("est_tokens"))
            .cast("long")
            .alias("cum_tokens"),
            "quota",
        )
    )


# =====================================================================
# J. OOV rate against the top-50 vocabulary
# =====================================================================


@register(
    "ext_tokenizer_oov",
    f"""
    WITH t AS (SELECT doc_id, {_TOK_SQL} AS w FROM documents),
    tk AS (SELECT doc_id, unnest(w) AS token FROM t),
    cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS n_occ
            FROM tk GROUP BY token),
    voc AS (SELECT token FROM cnt ORDER BY n_occ DESC, token LIMIT 50),
    per AS (
      SELECT tk.doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(count(*) FILTER (voc.token IS NULL) AS BIGINT) AS n_oov
      FROM tk LEFT JOIN voc ON tk.token = voc.token
      GROUP BY tk.doc_id)
    SELECT t.doc_id,
           CAST(coalesce(per.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(coalesce(per.n_oov, 0) AS BIGINT) AS n_oov,
           CAST(coalesce(per.n_oov, 0) * 1000000
                // greatest(coalesce(per.n_tokens, 0), 1) AS BIGINT)
             AS oov_micro
    FROM t LEFT JOIN per ON t.doc_id = per.doc_id
    """,
)
def q_ext_tokenizer_oov(spark, sf_dir):
    """Out-of-vocabulary rate per document against the corpus top-50
    vocabulary (freq desc, token asc — ext_tokenizer_vocab's exact
    selection): the coverage signal that decides whether a vocab size
    is adequate before committing to a tokenizer.  The vocab is a
    50-row broadcast; the per-doc aggregate is one hash agg over the
    exploded token stream."""
    from .registry_r4 import _tok

    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select("doc_id", F.explode(_tok()).alias("token"))
    cnt = tk.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("n_occ"))
    voc = (
        cnt.orderBy(F.col("n_occ").desc(), "token")
        .limit(50)
        .select("token", F.lit(1).alias("__in_vocab"))
    )
    per = (
        tk.join(F.broadcast(voc), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
            F.expr(
                "CAST(coalesce(n_oov, 0) * 1000000"
                " DIV greatest(coalesce(n_tokens, 0), 1) AS BIGINT)"
            ).alias("oov_micro"),
        )
    )


# =====================================================================
# K. Data-contract validation report (Deequ-style rule checks)
# =====================================================================


@register(
    "ext_data_validate",
    """
    SELECT * FROM (
      SELECT 'orders_status_enum' AS rule_id, 'orders' AS table_name,
             CAST(count(*) AS BIGINT) AS n_checked,
             CAST(count(*) FILTER (o_orderstatus NOT IN ('O', 'F', 'P'))
                  AS BIGINT) AS n_violations
      FROM orders
      UNION ALL
      SELECT 'orders_totalprice_positive', 'orders',
             CAST(count(*) AS BIGINT),
             CAST(count(*) FILTER (o_totalprice IS NULL OR o_totalprice <= 0)
                  AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'lineitem_qty_range', 'lineitem',
             CAST(count(*) AS BIGINT),
             CAST(count(*) FILTER (l_quantity < 1 OR l_quantity > 50)
                  AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'lineitem_discount_range', 'lineitem',
             CAST(count(*) AS BIGINT),
             CAST(count(*) FILTER (l_discount < 0 OR l_discount > 0.1)
                  AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'lineitem_tax_range', 'lineitem',
             CAST(count(*) AS BIGINT),
             CAST(count(*) FILTER (l_tax < 0 OR l_tax > 0.08) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'lineitem_orphan_orderkey', 'lineitem',
             CAST(count(*) AS BIGINT),
             CAST(count(*) FILTER (o.o_orderkey IS NULL) AS BIGINT)
      FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      UNION ALL
      SELECT 'documents_text_nonnull', 'documents',
             CAST(count(*) AS BIGINT),
             CAST(count(*) FILTER (text IS NULL OR text = '') AS BIGINT)
      FROM documents
    ) ORDER BY rule_id
    """,
)
def q_ext_data_validate(spark, sf_dir):
    """Data-contract validation report (the Deequ/Great-Expectations
    shape): enum membership, range, nullability, temporal-order and
    referential-integrity rules, one row per rule with checked/
    violation counts.  Each rule is a conditional count folded into
    its table's single scan; the referential check is the only join
    (orders key side broadcastable).  A pipeline gates promotion on
    n_violations = 0."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    docs = load_table(spark, sf_dir, "documents")

    def rule(df, rule_id, table_name, cond):
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n_checked"),
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias("n_violations"),
        ).select(
            F.lit(rule_id).alias("rule_id"),
            F.lit(table_name).alias("table_name"),
            "n_checked",
            "n_violations",
        )

    orphan = li.join(
        orders.select(F.col("o_orderkey").alias("l_orderkey"), F.lit(1).alias("__hit")),
        "l_orderkey",
        "left",
    )
    out = (
        rule(orders, "orders_status_enum", "orders",
             ~F.col("o_orderstatus").isin("O", "F", "P"))
        .unionByName(rule(orders, "orders_totalprice_positive", "orders",
                          F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0)))
        .unionByName(rule(li, "lineitem_qty_range", "lineitem",
                          (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)))
        .unionByName(rule(li, "lineitem_discount_range", "lineitem",
                          (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)))
        .unionByName(rule(li, "lineitem_tax_range", "lineitem",
                          (F.col("l_tax") < 0) | (F.col("l_tax") > 0.08)))
        .unionByName(rule(orphan, "lineitem_orphan_orderkey", "lineitem",
                          F.col("__hit").isNull()))
        .unionByName(rule(docs, "documents_text_nonnull", "documents",
                          F.col("text").isNull() | (F.col("text") == "")))
    )
    return out.orderBy("rule_id")


# =====================================================================
# L. Malformed-input resilience: PERMISSIVE CSV with corrupt records
# =====================================================================


@register(
    "src_csv_badrecords",
    """
    SELECT 'bad' AS bucket,
           CAST(count(*) FILTER (doc_id % 9 = 0) AS BIGINT) AS n,
           CAST(sum(doc_id) FILTER (doc_id % 9 = 0) AS BIGINT) AS id_sum
    FROM documents
    UNION ALL
    SELECT 'good',
           CAST(count(*) FILTER (doc_id % 9 <> 0) AS BIGINT),
           CAST(sum(doc_id) FILTER (doc_id % 9 <> 0) AS BIGINT)
    FROM documents
    ORDER BY bucket
    """,
)
def q_src_csv_badrecords(spark, sf_dir):
    """Malformed-input resilience at the SOURCE boundary: a CSV where
    every 9th record is deliberately corrupt (non-numeric id column)
    is read in PERMISSIVE mode with a `_corrupt_record` rescue column
    — bad rows surface as data (NULL typed fields + raw line
    captured), never as task failures, which is the only acceptable
    behavior when one bad record hides in 100 TB.  The report counts
    both buckets and checksums the good ids; the oracle restates the
    plant arithmetic."""
    import os

    from .registry import _clean_stale_scratch, _session_tag

    _clean_stale_scratch("/tmp/wds_badcsv_*")
    out = f"/tmp/wds_badcsv_{_session_tag(spark, sf_dir)}"
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    lines = docs.select(
        F.when(
            F.col("doc_id") % 9 == 0,
            F.concat(F.lit("notanumber,oops"), F.col("doc_id").cast("string")),
        )
        .otherwise(F.concat(F.col("doc_id").cast("string"), F.lit(",ok")))
        .alias("value")
    )
    lines.write.mode("overwrite").text(out)
    back = (
        spark.read.schema(
            "doc_id LONG, tag STRING, _corrupt_record STRING"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(out)
    )
    # cache before splitting on _corrupt_record: Spark's CSV rescue
    # column is only populated when the row carrying it is materialized
    # from the same parse pass (filter-pushdown on the rescue column
    # alone is unsupported), so the split must read a materialized frame
    back = back.cache()
    bad = back.filter(F.col("_corrupt_record").isNotNull()).agg(
        F.lit("bad").alias("bucket"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.regexp_extract("_corrupt_record", r"(\d+)$", 1).cast("long")
        )
        .cast("long")
        .alias("id_sum"),
    ).select("bucket", "n", "id_sum")
    good = back.filter(F.col("_corrupt_record").isNull()).agg(
        F.lit("good").alias("bucket"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("doc_id").cast("long").alias("id_sum"),
    ).select("bucket", "n", "id_sum")
    return bad.unionByName(good).orderBy("bucket")


# =====================================================================
# M. Dynamic partition overwrite (the incremental-reload sink contract)
# =====================================================================


@register(
    "sink_partition_overwrite",
    """
    WITH d AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(round(value * 100) AS BIGINT) AS cents,
             CASE WHEN CAST(date_trunc('day', ts) AS DATE) = DATE '2024-01-05'
                  THEN 1 ELSE 0 END AS revised
      FROM events)
    SELECT day,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN revised = 1 THEN cents + 100 ELSE cents END)
                AS BIGINT) AS cents_sum,
           CAST(max(revised) AS INT) AS revised
    FROM d GROUP BY day ORDER BY day
    """,
)
def q_sink_partition_overwrite(spark, sf_dir):
    """Dynamic partition overwrite — the incremental-reload contract a
    daily pipeline depends on: a day-partitioned table is fully
    written, then ONE day is re-published with revised values (cents
    +100, revised=1) using partitionOverwriteMode=dynamic; every other
    partition's files must survive untouched.  The read-back
    aggregates prove exactly one partition changed; the oracle
    restates the revision arithmetic.  At 100 TB this is the only
    sane reload story: static overwrite mode would TRUNCATE the whole
    table to republish one day."""
    import os

    from .registry import _clean_stale_scratch, _session_tag

    _clean_stale_scratch("/tmp/wds_dynpart_*")
    out = f"/tmp/wds_dynpart_{_session_tag(spark, sf_dir)}"
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        F.date_trunc("day", "ts").cast("date").alias("day"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        F.lit(0).alias("revised"),
    )
    d.write.mode("overwrite").partitionBy("day").parquet(out)
    revised = (
        d.filter(F.col("day") == F.lit("2024-01-05").cast("date"))
        .withColumn("cents", F.col("cents") + 100)
        .withColumn("revised", F.lit(1))
    )
    (
        revised.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    return (
        back.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("cents").cast("long").alias("cents_sum"),
            F.max("revised").cast("int").alias("revised"),
        )
        .orderBy("day")
    )


# =====================================================================
# N. Curation funnel: per-stage attrition report
# =====================================================================


@register(
    "ext_curation_funnel",
    f"""
    WITH t AS (SELECT doc_id, text, {_TOK_SQL} AS w FROM documents),
    u AS (
      SELECT doc_id, text, CAST(len(w) AS BIGINT) AS n_words,
             CAST(coalesce(list_sum(list_transform(w, x -> len(x))), 0)
                  AS BIGINT) AS sum_chars
      FROM t),
    fr AS (
      SELECT doc_id, CAST(max(cnt) AS BIGINT) AS max_freq FROM (
        SELECT doc_id, tok, count(*) AS cnt
        FROM (SELECT doc_id, unnest(w) AS tok FROM t) GROUP BY doc_id, tok
      ) GROUP BY doc_id),
    gated AS (
      SELECT u.* FROM u JOIN fr USING (doc_id)
      WHERE u.n_words BETWEEN 20 AND 80
        AND u.sum_chars * 1000 >= 4000 * u.n_words
        AND u.sum_chars * 1000 < 4900 * u.n_words
        AND fr.max_freq * 100 < 12 * u.n_words),
    deduped AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM gated) WHERE rn = 1)
    SELECT 1 AS stage_no, 'raw' AS stage,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS n_tokens
    FROM u
    UNION ALL
    SELECT 2, 'quality_gate', CAST(count(*) AS BIGINT),
           CAST(sum(n_words) AS BIGINT)
    FROM gated
    UNION ALL
    SELECT 3, 'exact_dedup', CAST(count(*) AS BIGINT),
           CAST(sum(n_words) AS BIGINT)
    FROM deduped
    ORDER BY stage_no
    """,
)
def q_ext_curation_funnel(spark, sf_dir):
    """Curation-funnel observability: document and token counts after
    each pipeline stage (raw → C4 quality gate → exact content dedup)
    — the attrition report every data-curation run publishes so a
    collapsed stage is caught before training, not after.  Reuses the
    ONE shared gate implementation (ext/text.quality_gate_flags) and
    the canonical-survivor dedup; each stage is a counting aggregate
    over the previous stage's frame."""
    from .ext.text import quality_gate_flags

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    g = quality_gate_flags(docs, "text").select(
        "doc_id", "n_words", "keep"
    )
    u = g.join(docs, "doc_id").select("doc_id", "text", "n_words", "keep")
    gated = u.filter(F.col("keep"))
    w = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy(
        "doc_id"
    )
    deduped = gated.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )

    def stage(df, no, name):
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_tokens"),
        ).select(
            F.lit(no).alias("stage_no"),
            F.lit(name).alias("stage"),
            "n_docs",
            "n_tokens",
        )

    return (
        stage(u, 1, "raw")
        .unionByName(stage(gated, 2, "quality_gate"))
        .unionByName(stage(deduped, 3, "exact_dedup"))
        .orderBy("stage_no")
    )


# =====================================================================
# O. Day-of-week seasonal profile (exact integer micro-means)
# =====================================================================


@register(
    "win_seasonal_profile",
    """
    WITH d AS (
      SELECT event_type, CAST(dayofweek(ts) AS INT) AS dow,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    g AS (SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(cents) AS BIGINT) AS cents_sum
          FROM d GROUP BY 1, 2),
    t AS (SELECT event_type, CAST(sum(cents_sum) AS BIGINT) AS total
          FROM g GROUP BY 1)
    SELECT g.event_type, g.dow, g.n, g.cents_sum,
           CAST(g.cents_sum * 1000000 // g.n AS BIGINT) AS mean_cents_micro,
           CAST(g.cents_sum * 1000000 // t.total AS BIGINT) AS share_micro
    FROM g JOIN t USING (event_type)
    ORDER BY event_type, dow
    """,
)
def q_win_seasonal_profile(spark, sf_dir):
    """Day-of-week seasonality profile per event type: count, exact
    cents sum, mean in integer micro-cents, and each weekday's share
    of the type's total — the weekly-pattern diagnostic behind
    anomaly baselines.  Two hash aggregates sharing the event_type
    partitioning.  (DuckDB dayofweek = Sunday 0; Spark dayofweek =
    Sunday 1 — the Spark side subtracts 1 so both publish 0-6.)"""
    from .registry import _cents

    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        "event_type",
        (F.dayofweek("ts") - 1).cast("int").alias("dow"),
        _cents("value").alias("cents"),
    )
    g = d.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("cents_sum"),
    )
    t = g.groupBy("event_type").agg(
        F.sum("cents_sum").cast("long").alias("total")
    )
    return (
        g.join(t, "event_type")
        .select(
            "event_type",
            "dow",
            "n",
            "cents_sum",
            F.expr("CAST(cents_sum * 1000000 DIV n AS BIGINT)").alias(
                "mean_cents_micro"
            ),
            F.expr("CAST(cents_sum * 1000000 DIV total AS BIGINT)").alias(
                "share_micro"
            ),
        )
        .orderBy("event_type", "dow")
    )


# =====================================================================
# P. Prefix dedup (boilerplate-header artifact) and co-occurrence lift
# =====================================================================


@register(
    "ext_dedup_prefix",
    f"""
    WITH {_NEAR_DUP_CORPUS_SQL},
    t AS (SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '\\s+'),
                             x -> x <> '') AS w FROM corpus),
    p AS (SELECT doc_id,
                 array_to_string(w[1:least(len(w), 16)], ' ') AS prefix,
                 CAST(len(w) AS BIGINT) AS n_tokens
          FROM t)
    SELECT md5(prefix) AS prefix_md5,
           CAST(min(doc_id) AS BIGINT) AS doc_id,
           CAST(count(*) AS BIGINT) AS n_copies,
           CAST(min(n_tokens) AS BIGINT) AS min_tokens,
           CAST(max(n_tokens) AS BIGINT) AS max_tokens
    FROM p GROUP BY prefix_md5
    HAVING count(*) > 1
    """,
)
def q_ext_dedup_prefix(spark, sf_dir):
    """Prefix dedup: documents sharing an identical 16-token PREFIX
    group together even when their tails differ — the Common-Crawl
    boilerplate-header artifact exact-content dedup misses (the
    near-dup corpus's 80% truncations share full prefixes with their
    originals, so the operator has real positives here).  One hash
    aggregation on the prefix digest; canonical survivor = min id."""
    from .registry_ext import _near_dup_corpus

    corpus = _near_dup_corpus(spark, sf_dir)
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    prefix = F.concat_ws(
        " ", F.slice(toks, 1, F.least(F.size(toks), F.lit(16)))
    )
    p = corpus.select(
        "doc_id",
        F.md5(prefix.cast("binary")).alias("prefix_md5"),
        F.size(toks).cast("long").alias("n_tokens"),
    )
    return (
        p.groupBy("prefix_md5")
        .agg(
            F.min("doc_id").cast("long").alias("doc_id"),
            F.count(F.lit(1)).cast("long").alias("n_copies"),
            F.min("n_tokens").cast("long").alias("min_tokens"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
        )
        .filter(F.col("n_copies") > 1)
    )


@register(
    "agg_cooccurrence",
    """
    WITH u AS (SELECT DISTINCT user_id, event_type FROM events),
    n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_users
          FROM u GROUP BY 1),
    tot AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_total
            FROM events),
    p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                 CAST(count(*) AS BIGINT) AS n_both
          FROM u a JOIN u b ON a.user_id = b.user_id
                            AND a.event_type < b.event_type
          GROUP BY 1, 2)
    SELECT p.type_a, p.type_b, p.n_both, na.n_users AS n_a,
           nb.n_users AS n_b,
           CAST(p.n_both * tot.n_total * 1000000
                // (na.n_users * nb.n_users) AS BIGINT) AS lift_micro
    FROM p JOIN n na ON na.event_type = p.type_a
           JOIN n nb ON nb.event_type = p.type_b
           CROSS JOIN tot
    ORDER BY type_a, type_b
    """,
)
def q_agg_cooccurrence(spark, sf_dir):
    """Event-type co-occurrence with exact integer lift: for every
    type pair, the users engaging with both vs the independence
    expectation (lift = P(ab)/P(a)P(b), held as n_both·N·1e6 DIV
    n_a·n_b) — the market-basket affinity diagnostic.  The pair join
    runs on the DISTINCT (user, type) table (≤ 5 rows per user), so
    the per-user quadratic is bounded by the type-universe size, not
    the event count."""
    ev = load_table(spark, sf_dir, "events")
    # the distinct (user, type) table feeds four branches (both pair
    # sides, the per-type counts, the user total) — persist it
    u = ev.select("user_id", "event_type").distinct().persist()
    n = u.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    tot = u.select("user_id").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_total")
    )
    a = u.select("user_id", F.col("event_type").alias("type_a"))
    b = u.select("user_id", F.col("event_type").alias("type_b"))
    p = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    na = n.select(F.col("event_type").alias("type_a"), F.col("n_users").alias("n_a"))
    nb = n.select(F.col("event_type").alias("type_b"), F.col("n_users").alias("n_b"))
    return (
        p.join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            F.expr(
                "CAST(n_both * n_total * 1000000 DIV (n_a * n_b) AS BIGINT)"
            ).alias("lift_micro"),
        )
        .orderBy("type_a", "type_b")
    )


# =====================================================================
# Q. Embedding outliers vs label centroid (mislabeled-data detection)
# =====================================================================


@register(
    "ext_embed_outliers",
    """
    WITH x AS (
      SELECT vec_id, label, generate_subscripts(embedding, 1) - 1 AS pos,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 16384.0)
                  AS BIGINT) AS xq
      FROM embeddings),
    c AS (SELECT label, pos,
                 CAST(sum(xq) AS BIGINT) AS s,
                 CAST(count(*) AS BIGINT) AS n
          FROM x GROUP BY 1, 2),
    m AS (SELECT label, pos,
                 CAST(CASE WHEN s >= 0 THEN s // n
                      ELSE -((-s + n - 1) // n) END AS BIGINT) AS mu
          FROM c),
    d AS (SELECT x.vec_id, x.label,
                 CAST(sum((x.xq - m.mu) * (x.xq - m.mu)) AS BIGINT) AS d2q
          FROM x JOIN m ON x.label = m.label AND x.pos = m.pos
          GROUP BY 1, 2),
    r AS (SELECT vec_id, label, d2q,
                 row_number() OVER (PARTITION BY label
                                    ORDER BY d2q DESC, vec_id) AS rk
          FROM d)
    SELECT vec_id, label, d2q, CAST(rk AS INT) AS rk
    FROM r WHERE rk <= 3 ORDER BY label, rk
    """,
)
def q_ext_embed_outliers(spark, sf_dir):
    """Embedding outliers per label: the 3 vectors farthest from
    their label centroid — the mislabeled-example / contamination
    sweep a curation pipeline runs before training on labeled data.
    EXACT integer state end to end: components quantized to 2^-14
    units (term (xq−μ)² ≤ ~1e9, so the 64-dim sum can never overflow
    int64 at ANY corpus size), centroids as floor-division means
    (truncation-toward-negative-infinity spelled identically on both
    engines), ranking under the (d2q, vec_id) total order.  One
    component aggregate + one join-back + one bounded per-label
    window."""
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "v"),
    ).select(
        "vec_id",
        "label",
        "pos",
        F.floor(F.col("v").cast("double") * 16384.0).cast("long").alias("xq"),
    )
    # persist: the component table feeds the centroid aggregate AND the
    # distance join-back
    x = x.persist()
    c = x.groupBy("label", "pos").agg(
        F.sum("xq").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    # integer division on negative sums is pinned to floor-toward-
    # negative-infinity by spelling the SAME CASE on both engines —
    # no reliance on either engine's native truncation convention
    m = c.select(
        "label",
        "pos",
        F.expr(
            "CAST(CASE WHEN s >= 0 THEN s DIV n"
            " ELSE -((-s + n - 1) DIV n) END AS BIGINT)"
        ).alias("mu"),
    )
    d = (
        x.join(m, ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum((F.col("xq") - F.col("mu")) * (F.col("xq") - F.col("mu")))
            .cast("long")
            .alias("d2q")
        )
    )
    w = Window.partitionBy("label").orderBy(F.col("d2q").desc(), "vec_id")
    return (
        d.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 3)
        .select("vec_id", "label", "d2q", "rk")
        .orderBy("label", "rk")
    )


# =====================================================================
# R. XML format round trip (Spark 4 native XML source)
# =====================================================================


@register(
    "sink_xml_roundtrip",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS value_sum,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
)
def q_sink_xml_roundtrip(spark, sf_dir):
    """XML sink/source round trip through Spark 4's NATIVE xml format
    (spark-xml merged into core): events written as <row> elements,
    read back with an explicit schema, per-type aggregates matching
    the raw parquet — completes the format matrix (parquet / csv /
    json / orc / webdataset-tar / text / xml)."""
    from .registry import _cents, _clean_stale_scratch, _session_tag

    _clean_stale_scratch("/tmp/wds_xml_*")
    out = f"/tmp/wds_xml_{_session_tag(spark, sf_dir)}"
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value"
    )
    ev.write.mode("overwrite").option("rowTag", "row").format("xml").save(out)
    back = (
        spark.read.schema(
            "event_id long, event_type string, user_id long, value double"
        )
        .option("rowTag", "row")
        .format("xml")
        .load(out)
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.sum(_cents("value")) / 100.0).alias("value_sum"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


# =====================================================================
# S. Chi-square independence cells (categorical drift diagnostic)
# =====================================================================


@register(
    "agg_chisq_cells",
    """
    WITH d AS (
      SELECT event_type, CAST(dayofweek(ts) AS INT) AS dow FROM events),
    o AS (SELECT event_type, dow, CAST(count(*) AS BIGINT) AS obs
          FROM d GROUP BY 1, 2),
    r AS (SELECT event_type, CAST(sum(obs) AS BIGINT) AS row_n
          FROM o GROUP BY 1),
    c AS (SELECT dow, CAST(sum(obs) AS BIGINT) AS col_n FROM o GROUP BY 1),
    t AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM o)
    SELECT o.event_type, o.dow, o.obs, r.row_n, c.col_n, t.n,
           CAST(CAST(o.obs * t.n - r.row_n * c.col_n AS HUGEINT)
                * CAST(o.obs * t.n - r.row_n * c.col_n AS HUGEINT) * 1000000
                // (CAST(r.row_n AS HUGEINT) * c.col_n * t.n) AS BIGINT)
             AS cell_chi2_micro
    FROM o JOIN r USING (event_type) JOIN c USING (dow) CROSS JOIN t
    ORDER BY event_type, dow
    """,
)
def q_agg_chisq_cells(spark, sf_dir):
    """Per-cell chi-square contributions for the (event_type ×
    day-of-week) contingency table — the categorical-drift diagnostic
    (a cell whose contribution spikes is where the traffic mix
    changed).  Exact integers: cell term = (O·n − r·c)²·1e6 DIV
    (r·c·n) — the classic (O−E)²/E with E = r·c/n cleared of
    fractions, floored per cell so the statistic is engine- and
    partitioning-exact.  Overflow audit: O·n ≤ n² and the square
    needs HUGEINT/DECIMAL past n ≈ 55k — both sides compute the
    square in DECIMAL(38,0)/int128.  Spark dow normalized to
    DuckDB's 0-6."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        "event_type", (F.dayofweek("ts") - 1).cast("int").alias("dow")
    )
    o = d.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("long").alias("obs")
    )
    o = o.persist()  # feeds the row, column and total aggregates
    r = o.groupBy("event_type").agg(F.sum("obs").cast("long").alias("row_n"))
    c = o.groupBy("dow").agg(F.sum("obs").cast("long").alias("col_n"))
    t = o.agg(F.sum("obs").cast("long").alias("n"))
    return (
        o.join(F.broadcast(r), "event_type")
        .join(F.broadcast(c), "dow")
        .crossJoin(F.broadcast(t))
        .select(
            "event_type",
            "dow",
            "obs",
            "row_n",
            "col_n",
            "n",
            F.expr(
                "CAST(CAST(obs * n - row_n * col_n AS DECIMAL(38,0))"
                " * CAST(obs * n - row_n * col_n AS DECIMAL(38,0))"
                " * 1000000 DIV (CAST(row_n AS DECIMAL(38,0)) * col_n * n)"
                " AS BIGINT)"
            ).alias("cell_chi2_micro"),
        )
        .orderBy("event_type", "dow")
    )


# =====================================================================
# T. Deterministic negative sampling (contrastive-training pairs)
# =====================================================================


@register(
    "ext_sample_contrastive",
    """
    WITH d AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY doc_id) - 1 AS rk,
             count(*) OVER () AS n
      FROM documents),
    k AS (SELECT unnest([1, 2, 3]) AS j),
    p AS (
      SELECT d.doc_id, k.j, d.rk, d.n,
             CAST((d.rk + 1 + CAST('0x' || substr(
               md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(k.j AS VARCHAR)),
               1, 13) AS BIGINT) % (d.n - 1)) % d.n AS BIGINT) AS neg_rk
      FROM d CROSS JOIN k)
    SELECT p.doc_id, CAST(p.j AS INT) AS j, d2.doc_id AS neg_doc_id
    FROM p JOIN d d2 ON p.neg_rk = d2.rk
    ORDER BY p.doc_id, p.j
    """,
)
def q_ext_sample_contrastive(spark, sf_dir):
    """Deterministic negative sampling for contrastive training: every
    document draws 3 pseudo-random partners via the id-hash offset
    ``(rank + 1 + h(id, j) mod (N−1)) mod N`` — never itself (the
    offset is in [1, N−1]), a pure function of (corpus, id, j), so the
    pairing is reproducible across runs/engines/partitionings.  The
    dense rank comes from ext/sampling.dense_index_by_key — the
    DISTRIBUTED zipWithIndex (range-partition + partition-offset
    counts), not a single-partition global window; its output is
    pinned equal to the window form by pytest, so the oracle's
    row_number restatement stays exact.

    Registered as ``ext_sample_contrastive`` (round 6 rename): round 5
    shipped this under ``ext_sample_negatives``, silently shadowing
    registry_ext's DPR-style ``hard_negatives`` entry and inheriting its
    round-3 driver-green row; the rename puts this query in the
    never-checked rotation tier on its own merits."""
    from .ext.sampling import dense_index_by_key

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    ranked = dense_index_by_key(docs, "doc_id", "rk")
    n_tot = ranked.agg(F.count(F.lit(1)).cast("long").alias("n"))
    d = ranked.crossJoin(F.broadcast(n_tot)).select(
        "doc_id", F.col("rk").cast("long").alias("rk"), "n"
    )
    ks = docs.sparkSession.range(1, 4).select(F.col("id").cast("int").alias("j"))
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("j").cast("string"),
                ).cast("binary")
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    p = d.crossJoin(F.broadcast(ks)).select(
        "doc_id",
        "j",
        F.expr("rk").alias("rk"),
        "n",
        ((F.col("rk") + 1 + h % (F.col("n") - 1)) % F.col("n")).alias("neg_rk"),
    )
    d2 = d.select(F.col("doc_id").alias("neg_doc_id"), F.col("rk").alias("neg_rk"))
    return (
        p.join(d2, "neg_rk")
        .select("doc_id", "j", "neg_doc_id")
        .orderBy("doc_id", "j")
    )


# Round-6's _register_new_this_round("ext_sample_contrastive") was removed
# at round-7 start (CLAUDE.md rotation checklist): it is now a carryover.


# =====================================================================
# U. Change-point flags over daily series (robust threshold)
# =====================================================================


@register(
    "win_change_points",
    """
    WITH d AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2),
    dl AS (
      SELECT event_type, day, cents,
             abs(cents - lag(cents) OVER (
               PARTITION BY event_type ORDER BY day)) AS delta
      FROM d),
    nn AS (SELECT * FROM dl WHERE delta IS NOT NULL),
    r AS (
      SELECT event_type, delta,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY delta, day) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM nn),
    med AS (SELECT event_type, CAST(delta AS BIGINT) AS med_delta
            FROM r WHERE rn = (n + 1) // 2)
    SELECT nn.event_type, nn.day, nn.cents, CAST(nn.delta AS BIGINT) AS delta,
           med.med_delta,
           (nn.delta > 3 * med.med_delta) AS is_change
    FROM nn JOIN med USING (event_type)
    ORDER BY event_type, day
    """,
)
def q_win_change_points(spark, sf_dir):
    """Robust change-point flags over the daily revenue series: a day
    is flagged when its absolute day-over-day delta exceeds 3× the
    series' MEDIAN delta — the median comes from exact rank SELECTION
    at rank (n+1) DIV 2 under the (delta, day) total order (CLAUDE.md
    rule: never interpolate, filter NULL deltas first), so the flags
    are engine-exact.  Per-type windows over calendar-bounded series;
    the daily aggregate is the only full-data pass."""
    from .registry import _cents

    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.groupBy(
            "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .agg(F.sum(_cents("value")).cast("long").alias("cents"))
    )
    wl = Window.partitionBy("event_type").orderBy("day")
    nn = d.select(
        "event_type",
        "day",
        "cents",
        F.abs(F.col("cents") - F.lag("cents").over(wl)).alias("delta"),
    ).filter(F.col("delta").isNotNull())
    nn = nn.persist()  # feeds the median selection AND the join-back
    wr = Window.partitionBy("event_type").orderBy("delta", "day")
    wn = Window.partitionBy("event_type")
    med = (
        nn.select(
            "event_type",
            "delta",
            F.row_number().over(wr).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) DIV 2"))
        .select("event_type", F.col("delta").cast("long").alias("med_delta"))
    )
    return (
        nn.join(F.broadcast(med), "event_type")
        .select(
            "event_type",
            "day",
            "cents",
            F.col("delta").cast("long").alias("delta"),
            "med_delta",
            (F.col("delta") > 3 * F.col("med_delta")).alias("is_change"),
        )
        .orderBy("event_type", "day")
    )


# =====================================================================
# V. Bigram language-model table (top continuations per head word)
# =====================================================================


@register(
    "ext_text_bigram_lm",
    f"""
    WITH tok AS (SELECT {_TOK_SQL} AS w FROM documents),
    bg AS (
      SELECT w[i] AS w1, w[i + 1] AS w2
      FROM tok, unnest(range(1, greatest(len(w) - 1, 0) + 1)) AS u(i)),
    c AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n FROM bg GROUP BY 1, 2),
    h AS (SELECT w1, CAST(sum(n) AS BIGINT) AS n_head FROM c GROUP BY 1),
    top_heads AS (
      SELECT w1, n_head,
             row_number() OVER (ORDER BY n_head DESC, w1) AS hr
      FROM h),
    cont AS (
      SELECT c.w1, c.w2, c.n, th.n_head, th.hr,
             row_number() OVER (PARTITION BY c.w1
                                ORDER BY c.n DESC, c.w2) AS cr
      FROM c JOIN top_heads th ON c.w1 = th.w1 AND th.hr <= 20)
    SELECT w1, CAST(hr AS INT) AS head_rank, w2, CAST(cr AS INT) AS cont_rank,
           n, n_head,
           CAST(n * 1000000 // n_head AS BIGINT) AS cond_micro
    FROM cont WHERE cr <= 3
    ORDER BY head_rank, cont_rank
    """,
)
def q_ext_text_bigram_lm(spark, sf_dir):
    """Bigram language-model table: for the 20 most frequent head
    words, the top-3 continuations with exact conditional frequencies
    in integer micro-units — the count-based n-gram LM slice a corpus
    analysis publishes (and the sanity check before trusting any
    perplexity-proxy filter).  One bigram aggregate, a 20-row head
    broadcast, and a bounded per-head ranking window; deterministic
    tie-breaks on the words themselves."""
    from .registry_r4 import _tok

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(_tok().alias("w"))
    # cache barrier before the bigram explode (nested higher-order
    # pattern; CLAUDE.md Generate rule)
    tok_tbl = toks.persist()
    idx = F.sequence(F.lit(1), F.size("w") - 1)
    pairs = F.when(
        F.size("w") >= 2,
        F.transform(
            idx,
            lambda i: F.struct(
                F.element_at("w", i).alias("w1"),
                F.element_at("w", i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bg = tok_tbl.select(F.explode(pairs).alias("p")).select("p.w1", "p.w2")
    c = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("n"))
    c = c.persist()  # feeds the head totals AND the continuation rank
    h = c.groupBy("w1").agg(F.sum("n").cast("long").alias("n_head"))
    # top-20 heads via orderBy+limit (TakeOrderedAndProject — a
    # distributed partial top-k), THEN the rank window over just those
    # 20 rows — never a row_number window over the full vocabulary
    th = (
        h.orderBy(F.col("n_head").desc(), "w1")
        .limit(20)
        .select(
            "w1",
            "n_head",
            F.row_number()
            .over(Window.orderBy(F.col("n_head").desc(), "w1"))
            .alias("hr"),
        )
    )
    cont = (
        c.join(F.broadcast(th), "w1")
        .withColumn(
            "cr",
            F.row_number().over(
                Window.partitionBy("w1").orderBy(F.col("n").desc(), "w2")
            ),
        )
        .filter(F.col("cr") <= 3)
    )
    return cont.select(
        "w1",
        F.col("hr").cast("int").alias("head_rank"),
        "w2",
        F.col("cr").cast("int").alias("cont_rank"),
        "n",
        "n_head",
        F.expr("CAST(n * 1000000 DIV n_head AS BIGINT)").alias("cond_micro"),
    ).orderBy("head_rank", "cont_rank")


# =====================================================================
# W. Theil-Sen robust slope (median pairwise slope, exact selection)
# =====================================================================


@register(
    "agg_theilsen",
    f"""
    WITH d AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2),
    {_RECENT_DAYS_SQL},
    p AS (
      SELECT a.event_type,
             -- negative-operand integer division is pinned to
             -- floor-toward-negative-infinity by the SAME CASE on both
             -- engines, so no reliance on either engine's native
             -- truncation convention
             CAST(CASE WHEN (b.cents - a.cents) >= 0
                  THEN (b.cents - a.cents) * 1000000
                       // date_diff('day', a.day, b.day)
                  ELSE -((-(b.cents - a.cents) * 1000000
                          + date_diff('day', a.day, b.day) - 1)
                         // date_diff('day', a.day, b.day)) END
               AS BIGINT) AS slope_micro,
             a.day AS day_a, b.day AS day_b
      FROM dc a JOIN dc b
        ON a.event_type = b.event_type AND a.day < b.day),
    r AS (
      SELECT event_type, slope_micro,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY slope_micro, day_a, day_b) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n_pairs
      FROM p)
    SELECT event_type, CAST(n_pairs AS BIGINT) AS n_pairs,
           slope_micro AS theil_sen_slope_micro
    FROM r WHERE rn = (n_pairs + 1) // 2
    ORDER BY event_type
    """,
)
def q_agg_theilsen(spark, sf_dir):
    """Theil-Sen robust trend slope per event type: the MEDIAN of all
    pairwise day-slopes over the daily cents series, each slope held
    as the exact floored integer micro-cents/day — selection at rank
    (n+1) DIV 2 under the (slope, day-pair) total order, never
    interpolated, so the estimator is engine-exact.  The pairwise join
    is per-key over the series capped at the most recent
    ``_TREND_MAX_DAYS`` days (≤ 500k pairs/key regardless of time
    span), same scale posture as agg_trend_mk — together they give
    the direction test AND the magnitude estimate."""
    from .registry import _cents

    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.groupBy(
            "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .agg(F.sum(_cents("value")).cast("long").alias("cents"))
        .persist()
    )
    return theil_sen_daily(d)


def theil_sen_daily(d, max_days: int = _TREND_MAX_DAYS):
    """Theil-Sen median pairwise slope over a per-key daily cents
    table — see ``q_agg_theilsen``.  ``max_days`` is the quadratic
    guard (``_TREND_MAX_DAYS``); tests exercise the boundary."""
    d = _recent_days(d, max_days)
    a = d.select("event_type", F.col("day").alias("day_a"), F.col("cents").alias("c_a"))
    b = d.select("event_type", F.col("day").alias("day_b"), F.col("cents").alias("c_b"))
    p = (
        a.join(b, "event_type")
        .filter(F.col("day_a") < F.col("day_b"))
        .select(
            "event_type",
            F.expr(
                "CAST(CASE WHEN (c_b - c_a) >= 0"
                " THEN (c_b - c_a) * 1000000 DIV datediff(day_b, day_a)"
                " ELSE -((-(c_b - c_a) * 1000000"
                "         + datediff(day_b, day_a) - 1)"
                "        DIV datediff(day_b, day_a)) END AS BIGINT)"
            ).alias("slope_micro"),
            "day_a",
            "day_b",
        )
    )
    wr = Window.partitionBy("event_type").orderBy("slope_micro", "day_a", "day_b")
    wn = Window.partitionBy("event_type")
    return (
        p.select(
            "event_type",
            "slope_micro",
            F.row_number().over(wr).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n_pairs"),
        )
        .filter(F.col("rn") == F.expr("(n_pairs + 1) DIV 2"))
        .select(
            "event_type",
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.col("slope_micro").alias("theil_sen_slope_micro"),
        )
        .orderBy("event_type")
    )


# Round-6 rotation reset (CLAUDE.md checklist): the closing
# _register_new_this_round call that listed every round-5 id was removed
# here — those 24 ids are now carryovers and outrank round-6 additions.
