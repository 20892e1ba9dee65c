"""Text analysis operators over document tables: tokenization, word
counts, quality scoring, language-ID heuristic, fingerprinting.

All hot paths are built-in expressions (split / explode / aggregate) —
the only candidate for Python is language ID, and even that is a
literal-array intersection, not a UDF.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

#: tiny per-language stopword lists for the n-gram/stopword heuristic
#: (public common-word lists; enough to separate the fixture's langs)
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"],
    "fr": ["le", "la", "de", "et", "est", "un", "une", "que", "pour", "dans"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "就", "不", "人"],
}


def tokens(text_col) -> F.Column:
    """Whitespace tokenization of lowercased text (empty-safe)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")


def word_counts(df: DataFrame, text_col: str, keys: Sequence[str] = ()) -> DataFrame:
    """Word frequencies (optionally per key): tokenize → explode →
    count.  The canonical two-shuffle text query; partial aggregation
    makes the explode output collapse map-side."""
    return (
        df.select(*keys, F.explode(tokens(text_col)).alias("word"))
        .groupBy(*keys, "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document token statistics: token count (whitespace + a
    BPE-ish subword estimate), char count, mean token length."""
    t = tokens(text_col)
    n_tokens = F.size(t)
    n_chars = F.length(F.col(text_col))
    mean_len = F.when(n_tokens > 0, (n_chars - n_tokens + 1) / n_tokens).otherwise(
        F.lit(0.0)
    )
    # BPE-ish estimate: ~1 subword per 4 chars, floored at word count
    bpe_est = F.greatest(F.ceil(n_chars / 4).cast("long"), n_tokens.cast("long"))
    return df.select(
        id_col,
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars_obs"),
        mean_len.cast("double").alias("mean_token_len"),
        bpe_est.alias("bpe_token_est"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic document quality: length band, punctuation ratio,
    stopword hit-rate, repetition — the standard pre-training corpus
    filters (cf. C4/Gopher rules), expressed as one projection."""
    t = tokens(text_col)
    n_tokens = F.size(t)
    n_chars = F.length(F.col(text_col))
    n_punct = n_chars - F.length(
        F.regexp_replace(F.col(text_col), r"[^\w\s]", "")
    )
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_hits = F.size(F.array_intersect(F.array_distinct(t), en_stop))
    uniq_ratio = F.when(
        n_tokens > 0, F.size(F.array_distinct(t)) / n_tokens
    ).otherwise(F.lit(0.0))
    score = (
        F.when((n_tokens >= 10) & (n_tokens <= 100000), 0.4).otherwise(0.0)
        + F.when(punct_ratio < 0.2, 0.2).otherwise(0.0)
        + F.when(stop_hits >= 2, 0.2).otherwise(0.0)
        + (uniq_ratio * 0.2)
    )
    return df.select(
        id_col,
        n_tokens.alias("n_tokens"),
        punct_ratio.cast("double").alias("punct_ratio"),
        uniq_ratio.cast("double").alias("uniq_ratio"),
        score.cast("double").alias("quality_score"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-profile language ID: score = |distinct tokens ∩
    stopwords(lang)| per language, predict the argmax (ties → lexical
    order).  A literal-array heuristic, not a model — deterministic
    and fully JVM-side; swap for fastText at the same call site when
    the library is available."""
    t = F.array_distinct(tokens(text_col))
    scores = [
        F.size(
            F.array_intersect(t, F.array(*[F.lit(w) for w in STOPWORDS[lang]]))
        ).alias(f"score_{lang}")
        for lang in sorted(STOPWORDS)
    ]
    scored = df.select(id_col, F.col(text_col).alias("__text"), *scores)
    langs = sorted(STOPWORDS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.coalesce(
        *[
            F.when((F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang))
            for lang in langs
        ],
        F.lit("und"),
    )
    return scored.select(id_col, pred.alias("lang_pred"), best.alias("lang_score"))


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str, n: int = 2
) -> DataFrame:
    """Per-document n-gram repetition: the fraction of n-gram
    occurrences that are repeats of an earlier n-gram in the same
    document — the C4/Gopher "repeated n-gram" filter signal (docs
    with a high duplicate fraction are boilerplate/spam).

    Pure expressions: one pass builds the n-gram array, the dup
    fraction is ``1 - distinct/total``.  No shuffle at all — a narrow
    projection that runs at scan speed on 100 TB.
    """
    t = tokens(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(t) - (n - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i, n)))
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    dup_frac = F.when(total > 0, (total - distinct) / total).otherwise(F.lit(0.0))
    return df.select(
        id_col,
        total.alias("n_ngrams"),
        distinct.alias("n_distinct_ngrams"),
        dup_frac.cast("double").alias("dup_ngram_frac"),
    )


def contamination_pairs(
    train: DataFrame,
    test: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: (train_id, test_id) pairs sharing at
    least one word n-gram, with the shared-gram count — the standard
    n-gram-overlap test-set contamination check (GPT-3 appendix C used
    13-grams; ``n`` is the knob).

    Scale shape is the same rare-shingle equi-join as exact Jaccard
    dedup: explode distinct n-grams per side, join on the gram, count
    per pair.  Long n-grams are near-unique, so bucket sizes stay tiny
    and the join never degenerates to all-pairs; both aggregations are
    map-side combinable.

    The join key is the COMPOSED 64-bit gram hash (each token
    xxhash64'd once, gram hash over the token hashes — same scheme as
    ``dedup.hashed_shingles``), not the joined n-gram string: at n=8
    the string key averages ~50 bytes, so hashing cuts the exploded
    shuffle ~6× and the join comparator runs on primitive longs.
    Counts can only diverge from the textual join on a 64-bit
    collision (~n²/2⁶⁴ — negligible and deterministic).
    """

    def grams(d: DataFrame, out_id: str) -> DataFrame:
        t = tokens(text_col)
        th = F.transform(t, lambda tok: F.xxhash64(tok))
        d = d.withColumn("_th", th)
        idx = F.sequence(F.lit(1), F.greatest(F.size("_th") - (n - 1), F.lit(1)))
        g = F.transform(
            idx,
            lambda i: F.xxhash64(
                *[F.try_element_at(F.col("_th"), i + k) for k in range(n)]
            ),
        )
        return d.select(
            F.col(id_col).alias(out_id),
            F.explode(F.array_distinct(g)).alias("gram"),
        )

    return (
        grams(train, "train_id")
        .join(grams(test, "test_id"), "gram")
        .groupBy("train_id", "test_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
    )


#: simple character-class PII patterns — identical semantics under
#: Java regex (Spark) and RE2 (DuckDB): no backrefs, no lookarounds
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"


def redact_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """PII scrubbing for pre-training text: replace emails/phone
    numbers with placeholder tags and count the hits (the C4-style
    cleaning step).  Pure ``regexp_replace``/``regexp_count``
    expressions — no shuffle, runs at scan speed; patterns restricted
    to constructs with identical semantics across regex engines.
    """
    t = F.col(text_col)
    n_emails = F.regexp_count(t, F.lit(EMAIL_RE))
    n_phones = F.regexp_count(t, F.lit(PHONE_RE))
    red = F.regexp_replace(
        F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return df.select(
        id_col,
        red.alias("text_redacted"),
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
    )


def fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Document fingerprints: md5 content hash + rolling polynomial
    hash of the token stream mod the Mersenne prime 2^31-1 (modular so
    the fold cannot overflow — Spark 4 runs ANSI mode and a wrapping
    multiply would throw ARITHMETIC_OVERFLOW)."""
    mersenne = F.lit(2147483647)
    rolling = F.aggregate(
        tokens(text_col),
        F.lit(0).cast("long"),
        lambda acc, tok: F.pmod(
            acc * F.lit(1000003) + F.pmod(F.xxhash64(tok), mersenne), mersenne
        ),
    )
    return df.select(
        id_col,
        F.md5(F.col(text_col)).alias("content_md5"),
        rolling.alias("rolling_hash"),
    )


def tfidf_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Top-k TF-IDF terms per document — the classic keyword/salience
    extractor over a corpus: tf from the per-doc term counts, idf =
    ln((N+1)/(df+1)) from the corpus-wide document frequencies.

    Cross-engine determinism: ``ln`` is the one operation here without
    a pinned IEEE result (engines may disagree in the final ulp), so
    the score is published as ``score_micro = floor(1e6 * tf * idf)``
    and the per-doc ranking orders by that INTEGER (term as tiebreak) —
    a last-ulp wobble cannot reorder ranks or change the hashed value
    except exactly at a 1e-6 floor boundary, which irrational ``ln``
    outputs do not sit on.

    Scale shape: term-count and doc-frequency aggs both collapse
    map-side; the doc-frequency table is vocabulary-sized and the
    corpus count is one row — both broadcast by default, so the only
    wide exchange of corpus-sized data is the tf agg and the per-doc
    window.  At web scale the vocabulary itself can outgrow a
    broadcast (same failure mode as the ngram-dedup vocab): pass
    ``broadcast_vocab=False`` to shuffle-join tf against the
    document-frequency table on the term key instead.
    """
    from pyspark.sql import Window

    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = df.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(F.broadcast(dfreq) if broadcast_vocab else dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score_micro",
            F.floor(
                1e6
                * F.col("tf")
                * F.log((F.col("__n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
            ).cast("long"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_micro").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(id_col, "term", "tf", "df", "score_micro", "rnk")
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_terms: int = 8,
    skip_head: int = 4,
    k: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 document ranking for a corpus-derived query — the
    retrieval-standard scorer (tf saturation + document-length
    normalization, the two things TF-IDF lacks) every RAG / dataset
    retrieval stack runs.

    The query is itself deterministic and corpus-derived: the
    ``n_terms`` tokens ranked ``skip_head+1 .. skip_head+n_terms``
    under (df DESC, token ASC) — the Zipf torso, past the stopword-ish
    head where idf is uninformative.  That term table is O(vocab)
    reduced to ``n_terms`` rows, so collecting it to the driver is a
    constant-size control-plane read, after which the per-doc score is
    one broadcast semi-join + one hash aggregate over the corpus.

    Cross-engine determinism: per-term idf = ln((N − df + 0.5)/
    (df + 0.5) + 1) is computed DRIVER-SIDE in CPython and injected as
    double literals — CPython and DuckDB share glibc's ln
    (probe-verified bit-identical over the full df domain) while the
    JVM's fdlibm ln may differ in the last ulp; every other operation
    (saturation quotient, fixed-order term-sum chain) is pinned IEEE
    arithmetic on identical doubles, and the published score is
    ``floor(1e6·score)``.  A grouped float SUM over term rows would
    have engine-dependent accumulation order — the chain is summed in
    fixed term-rank order like the PQ ADC chain.

    Scale shape: tokenize → per-doc tf + length (map-side combining),
    query-term tf via broadcast of ``n_terms`` terms, one groupBy(doc)
    pivot, top-k via the rank window.  Nothing corpus-sized shuffles
    except the tf aggregate itself.
    """
    import math

    from pyspark.sql import Window

    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dl = tf.groupBy(id_col).agg(F.sum("tf").cast("long").alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n_docs = df.count()
    wq = Window.orderBy(F.col("df").desc(), F.col("term").asc())
    qterms = (
        dfreq.withColumn("trank", F.row_number().over(wq))
        .filter(
            (F.col("trank") > skip_head)
            & (F.col("trank") <= skip_head + n_terms)
        )
        .collect()
    )  # O(n_terms) control-plane read — the query, not the corpus
    qterms = sorted(qterms, key=lambda r: r["trank"])
    if len(qterms) < n_terms:
        # Loud failure beats the two silent modes: an empty `order`
        # would IndexError below, and a partial one would diverge from
        # any fixed-width tf0..tf{n_terms-1} oracle (its idf literals
        # for the missing ranks become NULL while the engine just sums
        # fewer terms).
        raise ValueError(
            f"bm25_topk needs >= skip_head + n_terms = "
            f"{skip_head + n_terms} distinct terms in the corpus "
            f"vocabulary; found only {skip_head + len(qterms)} or fewer"
        )
    idf = {
        r["term"]: math.log((n_docs - r["df"] + 0.5) / (r["df"] + 0.5) + 1.0)
        for r in qterms
    }
    order = [r["term"] for r in qterms]

    # avgdl as the exact double sum(dl)/N — one scalar driver read
    _avgdl = dl.agg(F.sum("dl")).first()[0] / n_docs

    qtf = tf.filter(F.col("term").isin(order))
    pivoted = qtf.groupBy(id_col).agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("term") == t, F.col("tf"))), F.lit(0)
            )
            .cast("long")
            .alias(f"tf{i}")
            for i, t in enumerate(order)
        ]
    )
    scored = pivoted.join(dl, id_col)

    def s(i, t):
        tfc = F.col(f"tf{i}").cast("double")
        denom = tfc + F.lit(k1) * (
            F.lit(1.0 - b)
            + F.lit(b) * (F.col("dl").cast("double") / F.lit(float(_avgdl)))
        )
        return F.lit(idf[t]) * ((tfc * F.lit(k1 + 1.0)) / denom)

    chain = s(0, order[0])
    for i, t in enumerate(order[1:], start=1):
        chain = chain + s(i, t)
    w = Window.orderBy(F.col("score_micro").desc(), F.col(id_col).asc())
    return (
        scored.withColumn(
            "score_micro", F.floor(F.lit(1e6) * chain).cast("long")
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(id_col, "dl", "score_micro", "rnk")
    )


def token_diversity(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document lexical-diversity signal via the Gini–Simpson
    index: ``1 - Σ c_i² / n²`` over the token counts (probability two
    random tokens differ) — the repetition/diversity filter signal of
    quality pipelines, like Shannon entropy but EXACTLY computable:
    ``Σ c_i²`` and ``n²`` are integer aggregates (associative — no
    float-summation order to disagree on), so the index is one IEEE
    division of exact integers and ``simpson_micro = floor(1e6 * ...)``
    is bit-identical across engines (Shannon's ``Σ c ln c`` is a
    float sum with no such guarantee).

    Two map-side-combinable hash aggs (doc×term, then doc); no window.
    """
    tc = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = tc.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("c2"),
    )
    simpson = F.lit(1.0) - F.col("c2").cast("double") / (
        F.col("n_tokens") * F.col("n_tokens")
    ).cast("double")
    return agg.select(
        id_col,
        "n_tokens",
        "n_distinct",
        F.floor(simpson * 1e6).cast("long").alias("simpson_micro"),
    )


def length_percentiles(
    df: DataFrame,
    group_col: str,
    len_col: str,
    id_col: str,
    pcts: Sequence[float] = (0.5, 0.9),
) -> DataFrame:
    """Exact per-group length statistics with discrete (type-1 /
    lower-rank) percentiles — the corpus length report a pre-training
    pipeline cuts truncation budgets from.

    Discrete selection (the value AT rank ``floor((n-1)*p)+1``, ids as
    tiebreak) instead of interpolation: outputs stay INTEGER, so
    cross-engine hashing is exact with no float-interpolation rules to
    reconcile.  One window pass on the group key + one hash-agg; group
    cardinality (sources, languages) is small, and the conditional-max
    percentile picks are plain map-side aggregables.
    """
    from pyspark.sql import Window

    w_order = Window.partitionBy(group_col).orderBy(F.col(len_col), F.col(id_col))
    w_all = Window.partitionBy(group_col)
    t = (
        df.select(group_col, len_col, id_col)
        .withColumn("rn", F.row_number().over(w_order))
        .withColumn("cnt", F.count(F.lit(1)).over(w_all))
    )
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.min(len_col).alias("min_len"),
        F.max(len_col).alias("max_len"),
        F.sum(len_col).alias("total_len"),
    ]
    for p in pcts:
        sel = F.floor((F.col("cnt") - F.lit(1)) * F.lit(p)) + F.lit(1)
        aggs.append(
            F.max(F.when(F.col("rn") == sel, F.col(len_col))).alias(
                f"p{int(p * 100)}_len"
            )
        )
    return t.groupBy(group_col).agg(*aggs)


def compression_ratio(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document zlib compression ratio — the cheap
    redundancy/quality signal (Gopher filters on it: highly
    compressible text is boilerplate/repetition, incompressible text
    is noise/binary junk).  Arrow-batched mapInPandas; the ratio is
    published as exact integer milli-units (gz·1000 div raw), so the
    output is deterministic for a given zlib level."""
    import zlib

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("raw_bytes", T.LongType()),
            T.StructField("gz_bytes", T.LongType()),
            T.StructField("ratio_milli", T.LongType()),
        ]
    )

    def measure(batches):
        import pandas as pd

        for pdf in batches:
            raw, gz, ratio = [], [], []
            for t in pdf[text_col]:
                b = (t or "").encode("utf-8")
                c = zlib.compress(b, 6)
                raw.append(len(b))
                gz.append(len(c))
                ratio.append(len(c) * 1000 // len(b) if b else 0)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "raw_bytes": raw,
                    "gz_bytes": gz,
                    "ratio_milli": ratio,
                }
            )

    return df.select(id_col, text_col).mapInPandas(measure, schema)


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    min_count: int = 2,
    driver_max_words: int = 20_000,
) -> DataFrame:
    """Distributed BPE tokenizer training (the Sennrich/GPT-2 merge
    loop): learn ``n_merges`` merge rules from corpus word
    frequencies.  Returns the merge table — ``(rank, left, right,
    merged, pair_count)`` — the artifact a tokenizer ships.

    Scale shape, stage by stage:

    - **Word-freq dict** (once): tokenize + hash-agg to (word, freq).
      This is the ONLY corpus-sized pass; the loop below runs on the
      distinct-word table, which is orders of magnitude smaller (and
      the reason classic BPE trains on a word-frequency dict at all).
    - **Per merge round**: explode each word's adjacent symbol pairs,
      weighted count (map-side combinable), ``TakeOrdered(1)`` under
      the total order (count desc, pair asc) — the argmax collect is
      ONE row.  Applying the merge rewrites the symbol arrays with an
      Arrow-batched ``mapInPandas`` over the vocab table; lineage is
      cut with localCheckpoint every few rounds (the iterative-Spark
      rule, same as dedup_clusters).
    - Deterministic throughout: ties break lexicographically, so the
      merge sequence is a pure function of the corpus.

    Size-adaptive (the dedup_clusters/pagerank_int rule): after the
    corpus-sized word-freq aggregate, a dict at or under
    ``driver_max_words`` runs the merge loop on the driver over the
    collected (word, freq) list — pure integer/string arithmetic makes
    the two paths bit-identical, and per-round Spark jobs cost ~0.8 s
    scheduling each at local[32], so a 10-merge train on a small dict
    drops from ~25 jobs to one collect.  Only above the cap does the
    per-round distributed loop run (at web scale the dict is ~1e7
    rows; the loop's per-round cost is dict-sized either way, which is
    why classic BPE trains on a word-frequency dict at all).

    The fold is inherently sequential (round t+1's counts depend on
    round t's rewrite) — the micro-corpus entry
    ``ext_tokenizer_bpe_exact`` hash-verifies the full decision
    sequence against a WITH RECURSIVE replay; the full-corpus path
    stays rows-only + hand-computed pytest fixture.
    """
    import pandas as pd
    from pyspark.sql import types as T

    spark = df.sparkSession
    wf = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        # persisted across the path probe AND whichever branch follows:
        # without it the corpus tokenize+aggregate runs twice (once for
        # the capped count, once for the collect / the vocab build)
        .persist()
    )
    # capped probe (the cosine_topk guard shape): never counts more
    # than cap+1 dict rows to decide the path
    small = wf.limit(driver_max_words + 1).count() <= driver_max_words
    if small:
        word_freq = [(r["w"], int(r["freq"])) for r in wf.collect()]
        wf.unpersist()
        dvocab: dict[str, tuple[list, int]] = {
            w: (list(w), f) for w, f in word_freq
        }
        merges_d: list[tuple[int, str, str, str, int]] = []
        for rank in range(1, n_merges + 1):
            pc: dict[tuple, int] = {}
            for syms, f in dvocab.values():
                for pair in zip(syms, syms[1:]):
                    pc[pair] = pc.get(pair, 0) + f
            if not pc:
                break
            (left, right), cnt = min(
                pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            if cnt < min_count:
                break
            merged = left + right
            merges_d.append((rank, left, right, merged, cnt))
            for w, (syms, f) in dvocab.items():
                out, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == left
                        and syms[i + 1] == right
                    ):
                        out.append(merged)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                dvocab[w] = (out, f)
        from ..io import local_frame

        return local_frame(
            spark,
            merges_d,
            "rank int, left string, right string, merged string, "
            "pair_count long",
        )

    vocab = (
        wf.select(F.split("w", "").alias("syms"), "freq")
        # the merge loop re-reads this table ~3 jobs per round: right-
        # size its partitions to the DICT (distinct words), not the
        # corpus — per-round scheduling overhead otherwise dominates.
        # (At web scale the dict is still ~1e7 rows ≈ a few hundred MB;
        # 8 partitions remains conservative.)
        .coalesce(8)
    ).persist()
    vocab.count()  # materialize off wf, then drop the parent cache
    wf.unpersist()

    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pairs = (
            vocab.select(
                F.explode(
                    F.zip_with(
                        F.slice("syms", 1, F.greatest(F.size("syms") - 1, F.lit(0))),
                        F.slice("syms", 2, F.greatest(F.size("syms") - 1, F.lit(0))),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
        )
        top = pairs.orderBy(
            F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc()
        ).limit(1).collect()
        if not top or top[0]["cnt"] < min_count:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        merged = left + right
        merges.append((rank, left, right, merged, cnt))

        out_schema = T.StructType(
            [
                T.StructField("syms", T.ArrayType(T.StringType())),
                T.StructField("freq", T.LongType()),
            ]
        )

        def apply_merge(batches, _l=left, _r=right, _m=merged):
            for pdf in batches:
                rewritten = []
                for syms in pdf["syms"]:
                    s = list(syms)
                    out, i = [], 0
                    while i < len(s):
                        if i + 1 < len(s) and s[i] == _l and s[i + 1] == _r:
                            out.append(_m)
                            i += 2
                        else:
                            out.append(s[i])
                            i += 1
                    rewritten.append(out)
                yield pd.DataFrame(
                    {"syms": rewritten, "freq": pdf["freq"].values}
                )

        new_vocab = vocab.mapInPandas(apply_merge, out_schema)
        if rank % 4 == 0:
            # eager checkpoint both cuts lineage AND materializes —
            # persisting on top of it would store the table twice
            new_vocab = new_vocab.localCheckpoint(eager=True)
        else:
            new_vocab = new_vocab.persist()
            new_vocab.count()  # materialize before unpersisting the parent
        vocab.unpersist()
        vocab = new_vocab
    vocab.unpersist()

    from ..io import local_frame

    return local_frame(
        spark, merges,
        "rank int, left string, right string, merged string, pair_count long"
    )


def bpe_encode(
    df: DataFrame,
    merges: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a trained BPE merge table (``bpe_train``'s output) to
    encode documents; returns per-doc token accounting —
    ``(id, n_words, n_symbols, n_tokens, compression_micro)`` where
    ``n_symbols`` is the pre-merge character-symbol count and
    ``compression_micro = n_tokens·1e6 DIV n_symbols``.

    Scale shape: the merge table is tiny (``n_merges`` rows) and rides
    into the Arrow workers as a plain closure — no join, no shuffle;
    the encode is one narrow ``mapInPandas`` pass.  Within a batch,
    encodings are memoized per distinct word (Zipf makes the word set
    per batch far smaller than the token stream), which is the same
    trick that makes dictionary-trained BPE viable at corpus scale.

    Encoding is GREEDY-BY-RANK (the GPT-2 convention): rules apply in
    training order, each rewriting all adjacent occurrences
    left-to-right — deterministic, so the output is a pure function of
    (corpus, merge table).  The micro-corpus apply path IS
    oracle-paired since round 10 (``ext_tokenizer_bpe_apply_exact``
    replays the rank-by-rank rewrite in a DuckDB WITH RECURSIVE, hash
    green); only the full-corpus scale path (``ext_tokenizer_bpe_apply``)
    remains rows-only, backed by the hand-computed pytest fixture.
    """
    import pandas as pd
    from pyspark.sql import types as T

    rules = [
        (r["left"], r["right"], r["merged"])
        for r in sorted(merges.collect(), key=lambda r: r["rank"])
    ]

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("n_words", T.LongType()),
            T.StructField("n_symbols", T.LongType()),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("compression_micro", T.LongType()),
        ]
    )

    def encode_word(word: str) -> int:
        s = list(word)
        for left, right, merged in rules:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        return len(s)

    # tokenize EXACTLY like the engine's tokens() helper (Java regex
    # \s+ is ASCII-only): Python str.split() also breaks on Unicode
    # whitespace (NBSP etc.), which would silently disagree with the
    # training-side tokenization of the same text
    import re

    _ws = re.compile(r"\s+", re.ASCII)

    def run(batches):
        for pdf in batches:
            cache: dict[str, int] = {}
            ids, nw, ns, nt = [], [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                # NULL text is an empty doc, not the string 'None'
                words = (
                    []
                    if text is None
                    else [w for w in _ws.split(str(text).lower()) if w]
                )
                symbols = sum(len(w) for w in words)
                toks = 0
                for w in words:
                    if w not in cache:
                        cache[w] = encode_word(w)
                    toks += cache[w]
                ids.append(did)
                nw.append(len(words))
                ns.append(symbols)
                nt.append(toks)
            out = pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "n_words": pd.Series(nw, dtype="int64"),
                    "n_symbols": pd.Series(ns, dtype="int64"),
                    "n_tokens": pd.Series(nt, dtype="int64"),
                }
            )
            out["compression_micro"] = (
                out["n_tokens"] * 1_000_000 // out["n_symbols"].clip(lower=1)
            )
            yield out

    return df.select(id_col, text_col).mapInPandas(run, out_schema)


def max_run_length(w) -> F.Column:
    """Maximum run length of the SORTED array — the max single-element
    frequency as a pure expression (no explode, no shuffle): the
    zero-exchange form of the per-doc token-frequency aggregate."""
    c = F.col(w) if isinstance(w, str) else w
    return F.aggregate(
        F.array_sort(c),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1)
                .otherwise(F.lit(1).cast("long")),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )


def sum_token_chars(toks) -> F.Column:
    """Exact token-length-sum fold Σ len(tok) as ONE expression — the
    single definition shared by the C4 gate (quality_gate_flags) and
    the Gopher gate (gopher_flags), so their oracle restatements can
    never drift from two hand-maintained copies.  NULL array in →
    NULL out (callers decide whether to coalesce)."""
    return F.aggregate(
        F.transform(toks, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )


def quality_gate_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """C4/Gopher-style quality gate as ONE NARROW PROJECTION: appends
    ``n_words``, ``max_freq`` and the rule booleans (word-count band,
    mean-word-length band, repetition cap) plus the combined ``keep``
    to the input — every rule an exact cross-multiplied integer
    inequality, computed from array folds (``max_run_length``) with
    zero exchanges.  Shared by the batch gate (ext_filter_c4), the
    end-to-end pipeline and the streaming curation sink, so the gate
    semantics cannot drift between them."""
    w = tokens(text_col)
    out = df.withColumn("__w", w).select(
        "*",
        F.size("__w").cast("long").alias("n_words"),
        sum_token_chars(F.col("__w")).alias("sum_chars"),
        max_run_length(F.col("__w")).alias("max_freq"),
    ).drop("__w")
    r_wc = F.col("n_words").between(20, 80)
    r_ml = (F.col("sum_chars") * 1000 >= 4000 * F.col("n_words")) & (
        F.col("sum_chars") * 1000 < 4900 * F.col("n_words")
    )
    r_rep = F.col("max_freq") * 100 < 12 * F.col("n_words")
    return out.select(
        "*",
        r_wc.alias("r_wordcount"),
        r_ml.alias("r_meanlen"),
        r_rep.alias("r_repetition"),
        (r_wc & r_ml & r_rep).alias("keep"),
    )


#: Gopher stopword requirement: >= 2 distinct hits from this list
GOPHER_STOPWORDS = [
    "the", "be", "to", "of", "and", "that", "have", "with", "it", "is",
]


def gopher_flags(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021 §A.1.1) as an
    exact integer gate — per-rule flags plus the combined keep; see
    registry_r6 ext_filter_gopher for the oracle restatement.  One
    narrow codegen'd projection over the token array."""
    toks = tokens(text_col)
    stops = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    m = df.select(
        id_col,
        F.size(toks).cast("long").alias("n_words"),
        F.coalesce(sum_token_chars(toks), F.lit(0))
        .cast("long")
        .alias("sum_wlen"),
        F.size(F.filter(toks, lambda x: x.rlike("[a-z]")))
        .cast("long")
        .alias("n_alpha"),
        F.size(F.array_intersect(toks, stops)).cast("long").alias("n_stop"),
        F.size(F.filter(toks, lambda x: x.contains("#") | x.contains("...")))
        .cast("long")
        .alias("n_sym"),
    )
    ok_words = F.col("n_words").between(50, 100000)
    ok_wordlen = (3 * F.col("n_words") <= F.col("sum_wlen")) & (
        F.col("sum_wlen") <= 10 * F.col("n_words")
    )
    ok_alpha = 100 * F.col("n_alpha") >= 80 * F.col("n_words")
    ok_stop = F.col("n_stop") >= 2
    ok_sym = 10 * F.col("n_sym") <= F.col("n_words")
    return m.select(
        id_col, "n_words", "sum_wlen", "n_alpha", "n_stop",
        ok_words.alias("ok_words"),
        ok_wordlen.alias("ok_wordlen"),
        ok_alpha.alias("ok_alpha"),
        ok_stop.alias("ok_stop"),
        ok_sym.alias("ok_symbols"),
        (ok_words & ok_wordlen & ok_alpha & ok_stop & ok_sym).alias("keep"),
    ).orderBy(id_col)


def text_redundancy_exact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 4
) -> DataFrame:
    """Exact WITHIN-document redundancy — the engine-portable twin of
    ``compression_ratio``'s zlib signal (VERDICT r10 #5: the zlib byte
    output is inherently engine-opaque, but the redundancy it PROXIES
    — repeated k-gram mass — is exactly computable on both engines).

    Two families of per-doc integers from one positional-k-gram pass:

    - GRAM MASS: ``n_grams``, ``n_distinct_grams``, their difference
      ``dup_gram_mass`` (how many k-gram occurrences are re-sights of
      an earlier in-doc k-gram — the quantity a dictionary coder
      exploits), and ``redundancy_micro = dup_gram_mass·1e6 DIV
      n_grams``;
    - DUP SPANS: the ``ext/dedup.duplicate_spans`` discipline scoped
      WITHIN the document (hot grams counted per doc, not
      corpus-wide): coalesced maximal repeated spans → ``n_dup_spans``,
      ``dup_tokens``, ``dup_frac_micro``.

    Scale shape mirrors ``duplicate_spans``: int64 hash-composed gram
    keys (join/group keys are 8 bytes, never strings), positional
    grams behind ``persist`` barriers (explode over an uncached
    higher-order array re-evaluates the inner expression per element —
    CLAUDE.md), one map-side-combining count per (doc, gram), a
    per-doc gap-islands window.  Everything per-doc, so the shuffle
    keys are the natural document partitioning."""
    from pyspark.sql import Window

    tokens = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    th = F.transform(tokens, lambda t: F.xxhash64(t))
    tok_tbl = df.select(
        F.col(id_col).alias("__id"), th.alias("__th")
    ).persist()
    idx = F.sequence(F.lit(1), F.size("__th") - (k - 1))
    grams = F.when(
        F.size("__th") >= k,
        F.transform(
            idx,
            lambda i: F.xxhash64(
                *[F.try_element_at(F.col("__th"), i + j) for j in range(k)]
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    gram_tbl = tok_tbl.select(
        "__id", F.size("__th").alias("__n"), grams.alias("__g")
    ).persist()
    pos = gram_tbl.select(
        "__id", "__n", F.posexplode("__g").alias("__p", "__gram")
    )
    gs = pos.groupBy("__id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.countDistinct("__gram").cast("long").alias("n_distinct_grams"),
    )
    hot = (
        pos.groupBy("__id", "__gram")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") > 1)
        .select("__id", "__gram")
    )
    marked = pos.join(hot, ["__id", "__gram"]).select("__id", "__n", "__p")
    w = Window.partitionBy("__id").orderBy("__p")
    islands = marked.withColumn(
        "__brk",
        F.when(
            F.col("__p") - F.lag("__p").over(w) <= k, F.lit(0)
        ).otherwise(F.lit(1)),
    ).withColumn("__isl", F.sum("__brk").over(w))
    spans = islands.groupBy("__id", "__n", "__isl").agg(
        (F.max("__p") - F.min("__p") + k).alias("__len")
    )
    per_doc = spans.groupBy("__id").agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_spans"),
        F.sum("__len").cast("long").alias("dup_tokens"),
    )
    return (
        tok_tbl.select("__id", F.size("__th").cast("long").alias("n_tokens"))
        .join(gs, "__id", "left")
        .join(per_doc, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            "n_tokens",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_distinct_grams", F.lit(0))
            .cast("long")
            .alias("n_distinct_grams"),
            (
                F.coalesce("n_grams", F.lit(0))
                - F.coalesce("n_distinct_grams", F.lit(0))
            ).cast("long").alias("dup_gram_mass"),
            F.expr(
                "CAST((coalesce(n_grams, 0) - coalesce(n_distinct_grams, 0))"
                " * 1000000 DIV greatest(coalesce(n_grams, 0), 1) AS BIGINT)"
            ).alias("redundancy_micro"),
            F.coalesce("n_dup_spans", F.lit(0))
            .cast("long")
            .alias("n_dup_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.expr(
                "CAST(coalesce(dup_tokens, 0) * 1000000"
                " DIV greatest(n_tokens, 1) AS BIGINT)"
            ).alias("dup_frac_micro"),
        )
    )
