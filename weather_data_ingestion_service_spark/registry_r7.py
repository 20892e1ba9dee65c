"""Round-7 registry additions.

Round 7 is a consolidation round (VERDICT r6): the additions are
deliberately few — nine registry ids filling genuine gaps (JSONL source
resilience, M4 downsampling, binary-code Hamming near-pairs, n-gram
novelty curves, Hampel robust outliers, lagged cross-correlation,
codec scalar functions, scan-side partition pruning) — so the driver's
~50 check slots drain the round-6 backlog first.

Cross-engine compare rules are documented at the top of registry.py —
exact integer arithmetic, no float folds, deterministic tie-breaks,
wide sums published as digit strings (never DECIMAL — the
ext_eval_spearman r6 lesson), scalar output columns only.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .io import load_table
from .registry import _cents, register

# the shared daily-cents rollup (one definition — registry_r6 owns it;
# a second copy would silently drift on the money-rounding rule)
from .registry_r6 import _DAILY_SQL, _daily


# =====================================================================
# A. JSONL source with malformed-record rescue (PERMISSIVE mode)
# =====================================================================


@register(
    "src_jsonl_scan",
    """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS id_sum,
           CAST(sum(n_chars) AS BIGINT) AS chars_sum
    FROM documents WHERE doc_id % 11 <> 0 GROUP BY lang
    UNION ALL
    SELECT '__corrupt',
           CAST(count(*) AS BIGINT),
           CAST(sum(doc_id) AS BIGINT),
           CAST(0 AS BIGINT)
    FROM documents WHERE doc_id % 11 = 0
    ORDER BY lang
    """,
)
def q_src_jsonl_scan(spark, sf_dir):
    """JSONL source boundary with malformed-record rescue: the
    documents table round-trips through newline-delimited JSON where
    every 11th record is deliberately truncated mid-object; the
    PERMISSIVE reader surfaces bad lines as data (`_corrupt_record`)
    instead of failing the task — the only acceptable posture when one
    bad line hides in a 100 TB crawl dump.  Good rows aggregate
    per-lang with id/char checksums; corrupt rows bucket under
    '__corrupt' with ids recovered from the raw line.  The oracle
    restates the plant arithmetic from the source table."""
    from .registry import _clean_stale_scratch, _session_tag

    _clean_stale_scratch("/tmp/wds_jsonl_*")
    out = f"/tmp/wds_jsonl_{_session_tag(spark, sf_dir)}"
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    lines = docs.select(
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.lit('{"doc_id": '),
                F.col("doc_id").cast("string"),
                F.lit(', "lang": '),
            ),
        )
        .otherwise(F.to_json(F.struct("doc_id", "lang", "n_chars")))
        .alias("value")
    )
    lines.write.mode("overwrite").text(out)
    back = (
        spark.read.schema(
            "doc_id LONG, lang STRING, n_chars LONG, _corrupt_record STRING"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(out)
    )
    # materialize before splitting on the rescue column (same JSON/CSV
    # parser contract as src_csv_badrecords: the rescue column is only
    # populated within the parse pass that carries it)
    back = back.cache()
    try:
        good = (
            back.filter(F.col("_corrupt_record").isNull())
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("doc_id").cast("long").alias("id_sum"),
                F.sum("n_chars").cast("long").alias("chars_sum"),
            )
        )
        bad = (
            back.filter(F.col("_corrupt_record").isNotNull())
            .agg(
                F.lit("__corrupt").alias("lang"),
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum(
                    F.regexp_extract(
                        "_corrupt_record", r'"doc_id": (\d+)', 1
                    ).cast("long")
                )
                .cast("long")
                .alias("id_sum"),
                F.lit(0).cast("long").alias("chars_sum"),
            )
            .select("lang", "n_docs", "id_sum", "chars_sum")
        )
        result = good.unionByName(bad).orderBy("lang")
        result = result.localCheckpoint()  # cut lineage off the cache
    finally:
        back.unpersist()
    return result


# =====================================================================
# B. M4 time-series downsampling (min/max/first/last per bucket)
# =====================================================================


#: the M4 oracle — shared VERBATIM by the batch entry and the
#: streaming-maintenance entry: per-bucket (n, min, max, first, last)
#: merge exactly for any batching, so stream == batch == oracle.
_M4_ORACLE_SQL = """
    WITH e AS (
      SELECT event_type, epoch_us(ts) // 14400000000 AS bucket,
             CAST(round(value * 100) AS BIGINT) AS cents,
             row_number() OVER (
               PARTITION BY event_type, epoch_us(ts) // 14400000000
               ORDER BY ts, event_id) AS ra,
             row_number() OVER (
               PARTITION BY event_type, epoch_us(ts) // 14400000000
               ORDER BY ts DESC, event_id DESC) AS rd
      FROM events)
    SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(cents) AS BIGINT) AS v_min,
           CAST(max(cents) AS BIGINT) AS v_max,
           CAST(max(CASE WHEN ra = 1 THEN cents END) AS BIGINT) AS v_first,
           CAST(max(CASE WHEN rd = 1 THEN cents END) AS BIGINT) AS v_last
    FROM e GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("win_downsample_m4", _M4_ORACLE_SQL)
def q_win_downsample_m4(spark, sf_dir):
    """M4 downsampling (Jugel et al., VLDB 2014): per series and
    fixed time bucket keep min, max, first, last — the four points
    that make a line chart of N points pixel-identical to the full
    series.  The production shape for "plot a year of 100 TB of
    telemetry": one hash aggregate after two row-number windows, no
    collect, output size = O(buckets), independent of input rows.
    First/last use the total order (ts, event_id) so duplicate
    timestamps break ties deterministically cross-engine.  4-hour
    buckets over integer epoch-µs division (the CLAUDE.md duration
    rule: never timestampdiff)."""
    ev = load_table(spark, sf_dir, "events")
    # unix_micros DIV: both engines floor (ts ≥ epoch → non-negative)
    base = ev.select(
        "event_type",
        F.expr("unix_micros(ts) DIV 14400000000").alias("bucket"),
        _cents("value").alias("cents"),
        "ts",
        "event_id",
    )
    return m4_downsample(base)


def m4_downsample(base):
    """M4 reduction over a (event_type, bucket, cents, ts, event_id)
    frame: n/min/max/first/last per (event_type, bucket) under the
    (ts, event_id) total order."""
    wa = Window.partitionBy("event_type", "bucket").orderBy("ts", "event_id")
    wd = Window.partitionBy("event_type", "bucket").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = base.select(
        "event_type",
        "bucket",
        "cents",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wd).alias("rd"),
    )
    return (
        ranked.groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("cents").cast("long").alias("v_min"),
            F.max("cents").cast("long").alias("v_max"),
            F.max(F.when(F.col("ra") == 1, F.col("cents")))
            .cast("long")
            .alias("v_first"),
            F.max(F.when(F.col("rd") == 1, F.col("cents")))
            .cast("long")
            .alias("v_last"),
        )
        .orderBy("event_type", "bucket")
    )




@register("stream_downsample_m4", _M4_ORACLE_SQL)
def q_stream_downsample_m4(spark, sf_dir):
    """STREAMING M4 maintenance — the downsampler's mergeability
    EXECUTED: each micro-batch writes per-(series, bucket) partials
    (n, min, max, and first/last tagged with their (ts_us, event_id)
    order keys) via ``foreachBatch``; the closure merges partials with
    sum/min/max and order-key-min/max — all four components are
    associative+commutative, so per-batch ⊕ equals the one-shot M4
    for ANY batching and the batch oracle is exact regardless of
    micro-batch boundaries (the stream_sketch_cms posture).  This is
    the always-on "live chart" maintenance job: state is O(buckets),
    never O(events)."""
    import shutil

    from .registry import _clean_stale_scratch, _session_tag
    from .streaming.jobs import streaming_events_source

    _clean_stale_scratch("/tmp/wds_sm4_*")
    out = f"/tmp/wds_sm4_{_session_tag(spark, sf_dir)}"
    shutil.rmtree(out, ignore_errors=True)

    def add_batch(batch_df, epoch_id):
        m4_partial(batch_df).write.mode("overwrite").parquet(
            f"{out}/epoch={int(epoch_id)}"
        )

    src = streaming_events_source(spark, sf_dir)
    q = (
        src.writeStream.foreachBatch(add_batch)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return m4_merge(spark.read.parquet(out))


def m4_partial(batch_df):
    """Per-batch M4 partial over raw event rows: (n, min, max) plus
    first/last tagged with their (ts_us, event_id) order keys."""
    base = batch_df.select(
        "event_type",
        F.expr("unix_micros(ts) DIV 14400000000").alias("bucket"),
        _cents("value").alias("cents"),
        F.unix_micros("ts").alias("tsu"),
        "event_id",
    )
    return (
        base.groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("cents").cast("long").alias("v_min"),
            F.max("cents").cast("long").alias("v_max"),
            F.min(F.struct("tsu", "event_id", "cents")).alias("f"),
            F.max(F.struct("tsu", "event_id", "cents")).alias("l"),
        )
        .select(
            "event_type", "bucket", "n", "v_min", "v_max",
            F.col("f.tsu").alias("f_tsu"),
            F.col("f.event_id").alias("f_id"),
            F.col("f.cents").alias("f_val"),
            F.col("l.tsu").alias("l_tsu"),
            F.col("l.event_id").alias("l_id"),
            F.col("l.cents").alias("l_val"),
        )
    )


def m4_merge(partials):
    """Merge M4 partials from any batching: sum/min/max plus
    order-key min/max for first/last — associative and commutative,
    so the merge result is batching-invariant."""
    merged = partials.groupBy("event_type", "bucket").agg(
        F.sum("n").cast("long").alias("n"),
        F.min("v_min").cast("long").alias("v_min"),
        F.max("v_max").cast("long").alias("v_max"),
        F.min(F.struct("f_tsu", "f_id", "f_val")).alias("f"),
        F.max(F.struct("l_tsu", "l_id", "l_val")).alias("l"),
    )
    return merged.select(
        "event_type",
        F.col("bucket").cast("long").alias("bucket"),
        "n",
        "v_min",
        "v_max",
        F.col("f.f_val").cast("long").alias("v_first"),
        F.col("l.l_val").cast("long").alias("v_last"),
    ).orderBy("event_type", "bucket")


# =====================================================================
# C. Binary embedding codes + banded Hamming near-pairs
# =====================================================================


@register(
    "ext_embed_hamming",
    """
    WITH bits AS (
      SELECT vec_id, i - 1 AS i,
             CASE WHEN embedding[i] >= 0 THEN 1 ELSE 0 END AS b
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)),
    codes AS (
      SELECT vec_id,
             sum(CASE WHEN i >= 56 THEN b << (i - 56) ELSE 0 END) AS band,
             sum(CASE WHEN i < 56 THEN b << i ELSE 0 END) AS rest
      FROM bits GROUP BY vec_id)
    SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
           CAST(a.band AS BIGINT) AS band,
           CAST(bit_count(xor(CAST(a.rest AS BIGINT), CAST(b.rest AS BIGINT)))
                AS INT) AS hamming
    FROM codes a JOIN codes b
      ON a.band = b.band AND a.vec_id < b.vec_id
    WHERE bit_count(xor(CAST(a.rest AS BIGINT), CAST(b.rest AS BIGINT))) <= 20
    ORDER BY vec_id_a, vec_id_b
    """,
)
def q_ext_embed_hamming(spark, sf_dir):
    """Binary embedding codes (sign binarization — the 64-bit codes
    behind Hamming-space ANN a la ITQ/sketching) + banded near-pair
    search: bit i = sign(embedding[i]), the top 8 bits are the
    bucketing band, candidates pair ONLY within a band (256-way
    partition of the all-pairs space), and survivors keep Hamming
    distance ≤ 20 over the remaining 56 bits.  All JVM bit arithmetic
    (shiftleft/xor/bit_count), no Python; at 100 TB the band width and
    multi-probe count are the recall/cost dials, and the pair join
    shuffles only (band, code) — 16 bytes a row.  Sign comparison on
    the raw float is bit-stable cross-engine (same parquet values)."""
    return embed_hamming_pairs(load_table(spark, sf_dir, "embeddings"))


def embed_hamming_pairs(emb, max_dist: int = 20, band_bits: int = 8, ordered: bool = True):
    """Sign-binarized 64-bit codes over a (vec_id, embedding) frame;
    near-pairs within the top-``band_bits``-bit band at Hamming ≤
    max_dist over the remaining bits.

    ``band_bits`` is the recall/cost dial: expected candidate pairs
    per band grow with (corpus / 2^band_bits)², so the band MUST widen
    as the corpus grows (measured at sf0.1 synthetic blow-up, 8-bit
    band: 20k vectors 1.5 s, 200k vectors 15.6 s — the in-band
    quadratic regime appearing on schedule; 12-bit band returns the
    200k corpus to ~linear).  8 bits keeps the sf-scale oracle twin
    cheap and non-vacuous."""
    if not 2 <= band_bits <= 32:
        raise ValueError(f"band_bits out of range: {band_bits}")
    split = 64 - band_bits
    bits = emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "x")
    ).select(
        "vec_id", "i", (F.col("x") >= 0).cast("long").alias("b")
    )
    codes = bits.groupBy("vec_id").agg(
        F.sum(
            F.expr(
                f"CASE WHEN i >= {split} THEN shiftleft(b, i - {split})"
                " ELSE 0L END"
            )
        ).alias("band"),
        F.sum(
            F.expr(f"CASE WHEN i < {split} THEN shiftleft(b, i) ELSE 0L END")
        ).alias("rest"),
    )
    a = codes.alias("a")
    b = codes.alias("b")
    pairs = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_id_a"),
        F.col("b.vec_id").alias("vec_id_b"),
        F.col("a.band").cast("long").alias("band"),
        F.expr("CAST(bit_count(a.rest ^ b.rest) AS INT)").alias("hamming"),
    )
    out = pairs.filter(F.col("hamming") <= max_dist)
    # ordered=False for graph consumers (ext_graph_triangles): a sort
    # feeding a join is pure wasted exchange
    return out.orderBy("vec_id_a", "vec_id_b") if ordered else out


# =====================================================================
# D. N-gram novelty curve (corpus-order freshness per document)
# =====================================================================


@register(
    "ext_text_ngram_novelty",
    """
    WITH tok AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\\s+'),
                         x -> x <> '') AS w
      FROM documents),
    g AS (
      SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS gram
      FROM tok, unnest(range(1, greatest(len(w) - 4, 0) + 1)) AS u(i)),
    firsts AS (
      SELECT doc_id, gram, min(doc_id) OVER (PARTITION BY gram) AS first_doc
      FROM g),
    pd AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_grams,
             CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_novel
      FROM firsts GROUP BY doc_id)
    SELECT t.doc_id AS doc_id,
           CAST(coalesce(pd.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(coalesce(pd.n_novel, 0) AS BIGINT) AS n_novel,
           CAST(coalesce(pd.n_novel, 0) * 1000000
                // greatest(coalesce(pd.n_grams, 0), 1) AS BIGINT)
             AS novelty_micro
    FROM tok t LEFT JOIN pd ON t.doc_id = pd.doc_id
    ORDER BY t.doc_id
    """,
)
def q_ext_text_ngram_novelty(spark, sf_dir):
    """N-gram novelty curve: per document, the fraction of its
    distinct word 5-grams that no EARLIER document (lower doc_id)
    contains — the freshness signal a curation pipeline tracks to
    decide when additional crawl data stops contributing new content
    (diminishing-novelty cutoffs).  Grams come from plain
    explode(split) + lead() windows — never explode-of-transform over
    a split (the CLAUDE.md Generate re-evaluation trap); first-seer
    resolution is one window min over the gram hash partition.  At
    100 TB the gram table shuffles by gram exactly once."""
    return ngram_novelty(load_table(spark, sf_dir, "documents"))


def ngram_novelty(docs, k: int = 5):
    """Distinct word k-gram novelty per doc over a (doc_id, text)
    frame: a gram is novel to the LOWEST doc_id that contains it."""
    tok = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        ).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    grams = (
        tok.select(
            "doc_id",
            F.concat_ws(
                " ",
                "tok",
                *[F.lead("tok", j).over(w) for j in range(1, k)],
            ).alias("gram"),
            F.lead("tok", k - 1).over(w).alias("__l4"),
        )
        .filter(F.col("__l4").isNotNull())
        .select("doc_id", "gram")
        .distinct()
    )
    firsts = grams.select(
        "doc_id",
        F.min("doc_id").over(Window.partitionBy("gram")).alias("first_doc"),
    )
    pd_ = firsts.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
        .cast("long")
        .alias("n_novel"),
    )
    return (
        docs.select("doc_id")
        .join(pd_, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
            F.expr(
                "CAST(coalesce(n_novel, 0) * 1000000"
                " DIV greatest(coalesce(n_grams, 0), 1) AS BIGINT)"
            ).alias("novelty_micro"),
        )
        .orderBy("doc_id")
    )


# =====================================================================
# E. Hampel filter (rolling median ± 3·MAD robust outlier flag)
# =====================================================================


@register(
    "win_hampel_mad",
    f"""
    WITH {_DAILY_SQL},
    l AS (
      SELECT event_type, day, cents,
             list(cents) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 8 PRECEDING AND CURRENT ROW) AS win,
             row_number() OVER (
               PARTITION BY event_type ORDER BY day) AS rn
      FROM d),
    m AS (
      SELECT event_type, day, cents,
             list_sort(win)[5] AS med, win
      FROM l WHERE rn >= 9),
    h AS (
      SELECT event_type, day, cents, med,
             list_sort(list_transform(win, v -> abs(v - med)))[5] AS mad
      FROM m)
    SELECT event_type, day,
           CAST(cents AS BIGINT) AS cents,
           CAST(med AS BIGINT) AS med,
           CAST(mad AS BIGINT) AS mad,
           CAST(CASE WHEN abs(cents - med) > 3 * mad THEN 1 ELSE 0 END AS INT)
             AS outlier
    FROM h ORDER BY event_type, day
    """,
)
def q_win_hampel_mad(spark, sf_dir):
    """Hampel filter over the daily series: rolling 9-day window,
    robust center = exact window median (rank-5 SELECTION, never
    interpolation — the CLAUDE.md cross-engine median rule), spread =
    median absolute deviation, flag when |x − med| > 3·MAD — the
    robust outlier test that, unlike z-scores, one spike cannot mask.
    Exact integer cents end-to-end; windows shorter than 9 days are
    not emitted (no partial-window semantics to diverge on).  The
    window array is an intermediate only — published columns stay
    scalar."""
    return hampel_daily(_daily(spark, sf_dir))


def hampel_daily(d):
    """Rolling 9-row Hampel components over a (event_type, day, cents)
    frame; exact rank-5 selection for both the median and the MAD.
    One window evaluation (VERDICT r7 #6): the MAD is a rank statistic
    of the multiset {|v − med|}, so the sorted window serves both —
    collecting a second unsorted copy would double the window state."""
    w = Window.partitionBy("event_type").orderBy("day")
    wf = w.rowsBetween(-8, 0)
    l = d.select(
        "event_type",
        "day",
        "cents",
        F.sort_array(F.collect_list("cents").over(wf)).alias("swin"),
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") >= 9)
    m = l.select(
        "event_type",
        "day",
        "cents",
        F.element_at("swin", 5).alias("med"),
        "swin",
    )
    h = m.select(
        "event_type",
        "day",
        "cents",
        "med",
        F.element_at(
            F.sort_array(
                F.transform("swin", lambda v: F.abs(v - F.col("med")))
            ),
            5,
        ).alias("mad"),
    )
    return h.select(
        "event_type",
        "day",
        F.col("cents").cast("long").alias("cents"),
        F.col("med").cast("long").alias("med"),
        F.col("mad").cast("long").alias("mad"),
        (F.abs(F.col("cents") - F.col("med")) > 3 * F.col("mad"))
        .cast("int")
        .alias("outlier"),
    ).orderBy("event_type", "day")


# =====================================================================
# F. Lagged cross-correlation components (lead-lag analysis)
# =====================================================================


#: lead-lag screen pair-space cap: the type-pair fan-out is quadratic
#: in the number of series, so the screen runs over the TOP-K types by
#: day count (deterministic: count DESC, name ASC) — K² pairs ≈ 5k at
#: the default, constant regardless of how many long-tail types a
#: 100 TB corpus accumulates.  The fixture's 5 types all pass, so the
#: guard is exercised structurally without changing test output.
_CROSSCORR_MAX_TYPES = 50


@register(
    "agg_crosscorr_lagged",
    f"""
    WITH {_DAILY_SQL},
    topt AS (
      SELECT event_type FROM (
        SELECT event_type, count(*) AS n FROM d GROUP BY 1
        ORDER BY n DESC, event_type LIMIT {_CROSSCORR_MAX_TYPES})),
    k AS (SELECT unnest(range(0, 4)) AS lag_k)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(k.lag_k AS INT) AS lag_k,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(a.cents) AS BIGINT) AS s_x,
           CAST(sum(b.cents) AS BIGINT) AS s_y,
           CAST(sum(CAST(a.cents AS HUGEINT) * b.cents) AS VARCHAR) AS s_xy
    FROM k, d a JOIN d b
      ON a.event_type < b.event_type
     AND b.day = a.day + CAST(k.lag_k AS INT)
    WHERE a.event_type IN (SELECT event_type FROM topt)
      AND b.event_type IN (SELECT event_type FROM topt)
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
)
def q_agg_crosscorr_lagged(spark, sf_dir):
    """Lagged cross-correlation components between every ordered pair
    of daily event-type series at lags 0..3 — the lead-lag screen
    ("does type A move k days before type B?").  Publishes the exact
    integer moment components (n, Σx, Σy, Σxy as a digit string — the
    DECIMAL publication rule); ρ(k) is one driver-side formula away.
    One shuffle on day for the self-join; the lag fan-out is a 4-row
    broadcast, not a recompute.  The pair space is capped to the top
    ``_CROSSCORR_MAX_TYPES`` types by day count (VERDICT r7 #7: the
    all-type-pairs join is quadratic in series count — fine at 5
    types, a blow-up at 5000), deterministically restated in the
    oracle."""
    return crosscorr_lagged(_daily(spark, sf_dir))


def crosscorr_lagged(d, max_types: int = _CROSSCORR_MAX_TYPES, n_lags: int = 4):
    """Lead-lag moment components over a (event_type, day, cents)
    daily frame, pair space capped to the top ``max_types`` series."""
    topt = (
        d.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("event_type").asc())
        .limit(max_types)
        .select("event_type")
    )
    d = d.join(F.broadcast(topt), "event_type")
    lags = F.explode(F.array(*[F.lit(k) for k in range(n_lags)])).alias("lag_k")
    a = d.alias("a").select(
        F.col("a.event_type").alias("type_a"),
        F.col("a.day").alias("day_a"),
        F.col("a.cents").alias("c_a"),
        lags,
    )
    b = d.alias("b").select(
        F.col("b.event_type").alias("type_b"),
        F.col("b.day").alias("day_b"),
        F.col("b.cents").alias("c_b"),
    )
    j = a.join(
        b,
        (F.col("type_a") < F.col("type_b"))
        & (F.col("day_b") == F.expr("date_add(day_a, lag_k)")),
    )
    return (
        j.groupBy("type_a", "type_b", F.col("lag_k").cast("int").alias("lag_k"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("c_a").cast("long").alias("s_x"),
            F.sum("c_b").cast("long").alias("s_y"),
            F.sum(F.col("c_a").cast("decimal(38,0)") * F.col("c_b"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("s_xy"),
        )
        .orderBy("type_a", "type_b", "lag_k")
    )


# =====================================================================
# G. Codec scalar functions (base64 / hex round-trips)
# =====================================================================


@register(
    "f_codec_base64",
    """
    SELECT doc_id,
           to_base64(encode(substr(text, 1, 24))) AS b64,
           lower(hex(encode(substr(text, 1, 12)))) AS hex12,
           CAST(octet_length(from_base64(
                to_base64(encode(substr(text, 1, 24))))) AS BIGINT)
             AS n_raw
    FROM documents ORDER BY doc_id
    """,
)
def q_f_codec_base64(spark, sf_dir):
    """Codec scalar family: base64-encode a text prefix, hex-encode a
    shorter one, and round-trip the base64 back to bytes to publish
    the raw length — the envelope functions every binary-column
    pipeline (multimodal payloads, wire protocols) leans on.  Both
    engines implement RFC 4648 with padding; hex case is normalized
    with lower() because the engines disagree on digit case, which is
    presentation, not value."""
    docs = load_table(spark, sf_dir, "documents")
    prefix = F.substring("text", 1, 24).cast("binary")
    return docs.select(
        "doc_id",
        F.base64(prefix).alias("b64"),
        F.lower(F.hex(F.substring("text", 1, 12).cast("binary"))).alias(
            "hex12"
        ),
        F.octet_length(F.unbase64(F.base64(prefix)))
        .cast("long")
        .alias("n_raw"),
    ).orderBy("doc_id")


# =====================================================================
# H. Scan-side partition pruning (hive-layout day partitions)
# =====================================================================


@register(
    "src_partition_pruning",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS cents_sum
    FROM events
    WHERE CAST(date_trunc('day', ts) AS DATE)
          BETWEEN DATE '2024-01-05' AND DATE '2024-01-07'
    GROUP BY event_type ORDER BY event_type
    """,
)
def q_src_partition_pruning(spark, sf_dir):
    """Scan-side partition pruning on a hive-layout day-partitioned
    copy of events: the engine writes day=yyyy-MM-dd directories once
    per session, then the 3-day read back prunes at PLANNING time —
    the scan lists only 3 of ~30 partition directories
    (PartitionFilters in the plan, asserted by tests/test_plans.py).
    At 100 TB this is the difference between touching 3 days and
    touching a year.  The oracle restates the same window from the
    unpartitioned source."""
    from .registry import _clean_stale_scratch, _session_tag

    _clean_stale_scratch("/tmp/wds_daypart_*")
    out = f"/tmp/wds_daypart_{_session_tag(spark, sf_dir)}"
    import os

    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        ev = load_table(spark, sf_dir, "events")
        (
            ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
            .write.mode("overwrite")
            .partitionBy("day")
            .parquet(out)
        )
    back = spark.read.parquet(out).filter(
        F.col("day").between("2024-01-05", "2024-01-07")
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(_cents("value")).cast("long").alias("cents_sum"),
        )
        .orderBy("event_type")
    )


# round-7 _register_new_this_round tail removed at round-8 start
# (rotation checklist, CLAUDE.md): the nine round-7 ids are now
# carryovers and rank ahead of round-8 additions automatically.
