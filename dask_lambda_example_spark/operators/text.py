"""Text analysis over the ``documents`` table (SURVEY.md §2.C):
token counting (whitespace + BPE-ish regex), language-ID heuristic,
quality scoring, rolling-hash fingerprinting, TF-IDF, corpus term
frequencies.

North-star extension tier (BASELINE.json ``north_star``); the anchor in
the reference is its arbitrary-dataframe-compute contract
(``layer/python/dask_processing.py:26-27``, README.md:15-16).

Design notes (100 TB posture):

- Everything is built-in ``pyspark.sql.functions`` — string/regexp/HOF
  expressions inside whole-stage codegen, zero Python in the hot path.
- Per-document ops (stats, lang-ID, quality, fingerprint) are
  projection-only: no shuffle at all, trivially linear at any scale.
- Corpus-level ops (TF-IDF, term frequency) shuffle once on the token —
  the inverted-index shape — with map-side partial aggregation; document
  frequency is a broadcast-joined side table (vocabulary ≪ corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dask_lambda_example_spark.io import load_table
from dask_lambda_example_spark.registry import query

# ---------------------------------------------------------------------------
# token statistics
# ---------------------------------------------------------------------------

BPE_RE = "[a-z]+|[A-Z][a-z]*|[0-9]+|[^A-Za-z0-9 ]"


@query(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           length(text) AS n_chars,
           len(string_split(text, ' ')) AS n_ws_tokens,
           len(regexp_extract_all(text, '{BPE_RE}')) AS n_bpe_tokens,
           round(length(replace(text, ' ', '')) * 1.0
                 / len(string_split(text, ' ')), 6) AS mean_token_len
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, BPE-ish regex tokens
    (lower/Title/number/punct pieces — a deterministic stand-in for a
    real BPE vocab), chars, mean token length. Pure projection — no
    shuffle."""
    d = load_table(spark, sf_dir, "documents", parallel=True)
    n_ws = F.size(F.split(F.col("text"), " "))
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_ws.alias("n_ws_tokens"),
        F.regexp_count(F.col("text"), F.lit(BPE_RE)).alias("n_bpe_tokens"),
        F.round(F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
                / n_ws, 6).alias("mean_token_len"),
    )


# ---------------------------------------------------------------------------
# language-ID heuristic
# ---------------------------------------------------------------------------

# marker-token profiles per language (deterministic n-gram/stopword
# heuristic; a real system swaps in fastText — the operator shape is the
# deliverable). Ties resolve by profile order.
LANG_MARKERS = {
    "en": ["the", "a", "fast", "slow"],
    "de": ["der", "die", "und", "schnell"],
    "es": ["el", "la", "los", "rapido"],
}


def _count_token_sql(tok: str) -> str:
    return f"len(list_filter(string_split(text, ' '), t -> t = '{tok}'))"


def _langid_oracle() -> str:
    scores = {
        lang: " + ".join(_count_token_sql(t) for t in toks)
        for lang, toks in LANG_MARKERS.items()
    }
    s = {lang: f"score_{lang}" for lang in scores}
    case = (f"CASE WHEN {s['en']} >= {s['de']} AND {s['en']} >= {s['es']} THEN 'en' "
            f"WHEN {s['de']} >= {s['es']} THEN 'de' ELSE 'es' END")
    score_cols = ", ".join(f"{expr} AS score_{lang}" for lang, expr in scores.items())
    return f"""
    WITH scored AS (SELECT doc_id, lang, {score_cols} FROM documents)
    SELECT doc_id, {case} AS pred_lang, lang AS actual_lang,
           {s['en']} AS score_en, {s['de']} AS score_de, {s['es']} AS score_es
    FROM scored
    """


@query("text_langid_heuristic", oracle=_langid_oracle())
def text_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID by marker-token profile scoring: count stopword hits
    per language profile, argmax with deterministic tie-break. All
    codegen'd array HOFs; projection-only, no shuffle."""
    d = load_table(spark, sf_dir, "documents", parallel=True)
    toks = F.split(F.col("text"), " ")

    def score(markers: list[str]):
        expr = None
        for t in markers:
            cnt = F.size(F.filter(toks, lambda x: x == F.lit(t)))
            expr = cnt if expr is None else expr + cnt
        return expr

    s = {lang: score(m) for lang, m in LANG_MARKERS.items()}
    pred = (
        F.when((s["en"] >= s["de"]) & (s["en"] >= s["es"]), "en")
        .when(s["de"] >= s["es"], "de")
        .otherwise("es")
    )
    return d.select(
        "doc_id", pred.alias("pred_lang"), F.col("lang").alias("actual_lang"),
        s["en"].alias("score_en"), s["de"].alias("score_de"),
        s["es"].alias("score_es"),
    )


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

STOPWORDS = ["the", "a", "and", "of", "to"]


@query(
    "text_quality_score",
    oracle=f"""
    WITH q AS (
        SELECT doc_id,
               length(text) AS nc,
               length(replace(text, ' ', '')) AS nc_nospace,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_filter(string_split(text, ' '),
                   t -> list_contains({STOPWORDS!r}, t))) AS n_stop,
               len(regexp_extract_all(text, '[^a-z0-9 ]')) AS n_punct
        FROM documents)
    SELECT doc_id,
           round(n_stop * 1.0 / n_tokens, 6) AS stopword_ratio,
           round(n_punct * 1.0 / nc, 6) AS punct_ratio,
           round((nc - nc_nospace) * 1.0 / nc, 6) AS space_ratio,
           round(least(n_tokens / 50.0, 1.0) * 0.5
                 + (n_stop * 1.0 / n_tokens) * 0.3
                 + (1.0 - n_punct * 1.0 / nc) * 0.2, 6) AS quality
    FROM q
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length / punctuation / stopword signals combined
    into one bounded score — the doc-filtering primitive of a training
    data pipeline. Projection-only."""
    d = load_table(spark, sf_dir, "documents", parallel=True)
    toks = F.split(F.col("text"), " ")
    n_chars = F.length("text")
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_punct = F.regexp_count(F.col("text"), F.lit("[^a-z0-9 ]"))
    stop_ratio = n_stop / n_tokens
    punct_ratio = n_punct / n_chars
    return d.select(
        "doc_id",
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round((n_chars - F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))))
                / n_chars, 6).alias("space_ratio"),
        F.round(F.least(n_tokens / F.lit(50.0), F.lit(1.0)) * 0.5
                + stop_ratio * 0.3 + (F.lit(1.0) - punct_ratio) * 0.2, 6)
        .alias("quality"),
    )


# ---------------------------------------------------------------------------
# rolling-hash document fingerprint
# ---------------------------------------------------------------------------

GRAM = 8


@query(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           list_min(list_transform(generate_series(1, length(text) - {GRAM - 1}),
               i -> CAST(('0x' || substr(md5(substr(text, i, {GRAM})), 1, 8))
                         AS BIGINT))) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: minimum hash over all rolling character
    8-grams (winnowing's k=1 degenerate — one stable fingerprint per
    doc, robust to local edits elsewhere in the text). The window sweep
    is a ``transform`` over ``sequence`` — a codegen'd per-row loop, no
    explode, no shuffle."""
    d = load_table(spark, sf_dir, "documents", parallel=True)
    grams = F.transform(
        F.sequence(F.lit(1), F.length("text") - (GRAM - 1)),
        lambda i: F.conv(
            F.substring(F.md5(F.col("text").substr(i, F.lit(GRAM))), 1, 8),
            16, 10).cast("long"),
    )
    return d.select("doc_id", F.array_min(grams).alias("fingerprint"))


# ---------------------------------------------------------------------------
# repetition / diversity filter (Gopher-style quality rules)
# ---------------------------------------------------------------------------

REP_MIN_TOKENS = 30
REP_MIN_DISTINCT_RATIO = 0.45
REP_MAX_DUP_BIGRAM = 0.08


@query(
    "text_repetition_filter",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             length(replace(text, ' ', '')) AS nc_nospace
      FROM documents),
    m AS (
      SELECT doc_id,
             len(toks) AS n_tokens,
             round(len(list_distinct(toks)) * 1.0 / len(toks), 6)
               AS distinct_ratio,
             round(nc_nospace * 1.0 / len(toks), 6) AS mean_word_len,
             CASE WHEN len(toks) < 2 THEN 0.0 ELSE
               round(1.0 - len(list_distinct(list_transform(
                       generate_series(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i+1]))) * 1.0
                     / (len(toks) - 1), 6)
             END AS dup_bigram_frac
      FROM t)
    SELECT doc_id, n_tokens, distinct_ratio, mean_word_len, dup_bigram_frac,
           (n_tokens >= {REP_MIN_TOKENS}
            AND distinct_ratio > {REP_MIN_DISTINCT_RATIO}
            AND dup_bigram_frac < {REP_MAX_DUP_BIGRAM}) AS keep
    FROM m
    """,
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition/diversity quality rules (the Gopher-rules shape:
    document-level duplicate-n-gram fraction and lexical diversity
    gates, plus a length floor). Everything is array expressions over
    one projection — per-document, shuffle-free, linear at any corpus
    size; the bigram list is built with zip_with over two slices of the
    SAME materialized token array (never re-splitting inside the HOF
    lambda — Catalyst re-evaluates lambda-captured expressions per
    element)."""
    d = load_table(spark, sf_dir, "documents", parallel=True)
    t = d.select(
        "doc_id",
        F.split(F.col("text"), " ").alias("toks"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        .alias("nc_nospace"),
    )
    n = F.size(F.col("toks"))
    bigrams = F.zip_with(
        F.slice(F.col("toks"), 1, n - 1),
        F.slice(F.col("toks"), 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b))
    m = t.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(F.size(F.array_distinct(F.col("toks"))) * 1.0 / n, 6)
        .alias("distinct_ratio"),
        F.round(F.col("nc_nospace") * 1.0 / n, 6).alias("mean_word_len"),
        F.when(n < 2, F.lit(0.0)).otherwise(
            F.round(1.0 - F.size(F.array_distinct(bigrams)) * 1.0 / (n - 1), 6)
        ).alias("dup_bigram_frac"),
    )
    return m.withColumn(
        "keep",
        (F.col("n_tokens") >= REP_MIN_TOKENS)
        & (F.col("distinct_ratio") > REP_MIN_DISTINCT_RATIO)
        & (F.col("dup_bigram_frac") < REP_MAX_DUP_BIGRAM))


# ---------------------------------------------------------------------------
# TF-IDF top terms
# ---------------------------------------------------------------------------

TFIDF_TOP = 3


@query(
    "text_tfidf_top_terms",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               tf.tf * ln(n.n_docs * 1.0 / df.df) AS tfidf
        FROM tf JOIN df USING (term) CROSS JOIN n),
    ranked AS (
        SELECT doc_id, term, tfidf,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY tfidf DESC, term) AS rank
        FROM scored)
    SELECT doc_id, term, round(tfidf, 6) AS tfidf, rank
    FROM ranked WHERE rank <= {TFIDF_TOP}
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF with top-3 terms per document. Term frequencies shuffle
    once on (doc, term); document frequency is a small vocabulary-sized
    table broadcast back onto TF — the classic inverted-index plan that
    survives any corpus size."""
    d = load_table(spark, sf_dir, "documents", parallel=True)
    tok = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    # corpus size as a broadcast one-row aggregate, not a driver-side
    # .count() — keeps the whole query a single job (no extra pass over
    # the table before the plan can even be built)
    n = d.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "term",
                (F.col("tf") * F.log(F.col("n_docs") * 1.0 / F.col("df")))
                .alias("tfidf"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP)
        .select("doc_id", "term", F.round("tfidf", 6).alias("tfidf"), "rank")
    )


# ---------------------------------------------------------------------------
# BM25 ranked retrieval
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("hash", "merge", "vector")  # pinned query terms
BM25_TOP = 20


def _bm25_score_sql() -> str:
    """Fixed-order recombination of the per-term contributions —
    shared by the BM25 oracle and the hybrid-RRF oracle."""
    return " + ".join(
        f"coalesce(c_{i}, 0)" for i in range(len(BM25_QUERY)))


def _bm25_ctes() -> str:
    """The BM25 scoring pipeline as a reusable CTE chain ending in
    ``per_doc(doc_id, c_0..c_k)`` — nested verbatim by both the BM25
    oracle and ``sim_hybrid_rrf``'s (composition stays value-checked)."""
    terms = ", ".join(f"'{t}'" for t in BM25_QUERY)
    per_term = ", ".join(
        f"max(CASE WHEN term = '{t}' THEN contrib END) AS c_{i}"
        for i, t in enumerate(BM25_QUERY))
    return f"""
    dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl
                FROM documents),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents),
    qtok AS (SELECT doc_id, term FROM tok WHERE term IN ({terms})),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM qtok
           GROUP BY doc_id, term),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM qtok
           GROUP BY term),
    scored AS (
        SELECT tf.doc_id, tf.term,
               ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
               * tf.tf * ({BM25_K1} + 1)
               / (tf.tf + {BM25_K1}
                  * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl)) AS contrib
        FROM tf JOIN df USING (term)
        JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s),
    per_doc AS (SELECT doc_id, {per_term} FROM scored GROUP BY doc_id)"""


def _bm25_oracle() -> str:
    score = _bm25_score_sql()
    return f"""
    WITH {_bm25_ctes()}
    SELECT doc_id, round({score}, 6) AS bm25
    FROM per_doc
    ORDER BY round({score}, 6) DESC, doc_id LIMIT {BM25_TOP}
    """


def bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BM25 scores for the pinned query — the unranked
    core of ``text_bm25_ranked``, reused by the hybrid-RRF retrieval
    (`operators/similarity.py`). Returns ``doc_id, bm25`` for every
    document matching at least one query term; same inverted-index
    plan shape and fixed-order float recombination as the ranked
    query."""
    d = load_table(spark, sf_dir, "documents", parallel=True)
    dl = d.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("dl"))
    stats = dl.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    qtok = (
        d.select("doc_id",
                 F.explode(F.split(F.col("text"), " ")).alias("term"))
        .filter(F.col("term").isin(*BM25_QUERY))
    )
    tf = qtok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = qtok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    contrib = (
        F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
        * F.col("tf") * (BM25_K1 + 1)
        / (F.col("tf") + BM25_K1
           * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", contrib.alias("contrib"))
    )
    per_doc = scored.groupBy("doc_id").agg(*[
        F.max(F.when(F.col("term") == t, F.col("contrib"))).alias(f"c_{i}")
        for i, t in enumerate(BM25_QUERY)
    ])
    score = None
    for i in range(len(BM25_QUERY)):
        part = F.coalesce(F.col(f"c_{i}"), F.lit(0.0))
        score = part if score is None else score + part
    return per_doc.select("doc_id", score.alias("bm25"))


@query("text_bm25_ranked", oracle=_bm25_oracle())
def text_bm25_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 ranked retrieval (k1={k1}, b={b}) for a pinned query
    — the lexical-retrieval half of a RAG corpus build. The plan is the
    inverted-index shape that survives any corpus size: the token
    stream is filtered to the query terms IMMEDIATELY after explode (so
    the (doc, term) shuffle carries only matching postings), document
    frequency is a |query|-row broadcast, document length and corpus
    stats are one broadcast aggregate, and the top-k is TakeOrdered —
    no global sort, no window over the corpus.

    Float discipline: the per-doc score sums one contribution per query
    term in FIXED textual order (conditional aggregates recombined with
    explicit ``+``), not an arbitrary-order SUM — bit-stable against
    the oracle's identical recombination."""
    return (
        bm25_scores(spark, sf_dir)
        .select("doc_id", F.round("bm25", 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(BM25_TOP)
    )


text_bm25_ranked.__doc__ = text_bm25_ranked.__doc__.format(
    k1=BM25_K1, b=BM25_B)


# ---------------------------------------------------------------------------
# corpus term frequency
# ---------------------------------------------------------------------------


@query(
    "text_term_frequency",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
    SELECT term, count(*) AS n_occurrences,
           count(DISTINCT doc_id) AS n_docs
    FROM tok GROUP BY term
    ORDER BY n_occurrences DESC, term LIMIT 20
    """,
)
def text_term_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level term frequency top-20: explode → one token-keyed
    aggregation (map-side partial combine collapses each partition to
    vocabulary size before the shuffle) → TakeOrdered top-k."""
    d = load_table(spark, sf_dir, "documents", parallel=True)
    tok = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
    return (
        tok.groupBy("term")
        .agg(F.count("*").alias("n_occurrences"),
             F.countDistinct("doc_id").alias("n_docs"))
        .orderBy(F.desc("n_occurrences"), F.asc("term"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# PII scrubbing (regex redaction pipeline)
# ---------------------------------------------------------------------------

# the corpus is synthetic word soup with no embedded PII, so the query
# first plants deterministic PII-shaped spans (email / phone / IPv4
# derived from doc_id), then redacts them — the operator under test is
# the redaction pipeline itself, with injection making it verifiable
EMAIL_RE = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}"
PHONE_RE = "\\d{3}-\\d{3}-\\d{4}"
IPV4_RE = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"


@query(
    "text_pii_scrub",
    oracle=f"""
    WITH dirty AS (
      SELECT doc_id,
             text || ' contact user' || doc_id || '@example.com or ' ||
             '555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') ||
             '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
             ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1' AS text
      FROM documents),
    scrubbed AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '{EMAIL_RE}'))  AS n_emails,
             len(regexp_extract_all(text, '{PHONE_RE}'))  AS n_phones,
             regexp_replace(
               regexp_replace(
                 regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                 '{PHONE_RE}', '<PHONE>', 'g'),
               '{IPV4_RE}', '<IP>', 'g') AS clean
      FROM dirty)
    SELECT doc_id, n_emails, n_phones, clean,
           NOT regexp_matches(clean, '{EMAIL_RE}|{PHONE_RE}|{IPV4_RE}')
             AS is_clean
    FROM scrubbed
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: count and replace email / phone / IPv4 spans with
    typed placeholder tokens — the scrub pass every training-data
    pipeline runs before tokenization. Pure projection (regexp_count +
    chained regexp_replace, all JVM codegen — no UDF), so it is
    shuffle-free and linear at any corpus size; the verification flag
    re-scans the cleaned text for any surviving match.

    Note DuckDB replaces only the first match unless given the 'g'
    flag; Spark's regexp_replace is global by default — the oracle
    carries the flag so both sides scrub every occurrence."""
    d = load_table(spark, sf_dir, "documents", parallel=True)
    dirty = d.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" contact user"), F.col("doc_id"),
            F.lit("@example.com or 555-01"),
            F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
            F.lit("-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" from 10."), (F.col("doc_id") % 256).cast("string"),
            F.lit(".0.1"),
        ).alias("text"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), EMAIL_RE, "<EMAIL>"),
            PHONE_RE, "<PHONE>"),
        IPV4_RE, "<IP>")
    any_pii = f"{EMAIL_RE}|{PHONE_RE}|{IPV4_RE}"
    return dirty.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(F.col("text"), F.lit(PHONE_RE)).alias("n_phones"),
        clean.alias("clean"),
        (~clean.rlike(any_pii)).alias("is_clean"),
    )


# ---------------------------------------------------------------------------
# corpus vocabulary statistics (Zipf / type-token)
# ---------------------------------------------------------------------------


@query(
    "text_vocab_zipf",
    oracle="""
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS term FROM documents),
    tf AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
    ranked AS (
        SELECT c, row_number() OVER (ORDER BY c DESC, term) AS r FROM tf)
    SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
           count(*) AS n_types,
           round(count(*) * 1.0 / sum(c), 6) AS type_token_ratio,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           round(sum(CASE WHEN r <= 10 THEN c ELSE 0 END) * 1.0 / sum(c), 6)
             AS top10_coverage
    FROM ranked
    """,
)
def text_vocab_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary profile: total tokens, distinct types,
    type-token ratio, hapax legomena count, and how much of the corpus
    the 10 most frequent terms cover (the Zipf-head mass — the signal
    behind stopword lists and vocabulary truncation decisions).

    Plan: explode → ONE term-keyed aggregation (map-side combine
    collapses each partition to vocabulary size before the shuffle);
    the ranked head is a window over the vocabulary-sized aggregate,
    never over the corpus."""
    d = load_table(spark, sf_dir, "documents", parallel=True)
    tok = d.select(F.explode(F.split(F.col("text"), " ")).alias("term"))
    tf = tok.groupBy("term").agg(F.count("*").alias("c"))
    ranked = tf.withColumn(
        "r", F.row_number().over(
            Window.orderBy(F.desc("c"), F.asc("term"))))
    return ranked.agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.round(F.count("*") * 1.0 / F.sum("c"), 6).alias("type_token_ratio"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("n_hapax"),
        F.round(F.sum(F.when(F.col("r") <= 10, F.col("c")).otherwise(0))
                * 1.0 / F.sum("c"), 6).alias("top10_coverage"),
    )


# ---------------------------------------------------------------------------
# unigram language-model cross-entropy (perplexity-style quality signal)
# ---------------------------------------------------------------------------

CE_OUTLIER = 3.45  # nats/token; corpus p90 ≈ 3.41 — flags the weird tail


@query(
    "text_unigram_lm_score",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents),
    tot AS (SELECT count(*) AS n FROM tok),
    vocab AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
    s AS (
        SELECT t.doc_id, count(*) AS n_tokens,
               -avg(ln(v.c * 1.0 / tot.n)) AS ce
        FROM tok t JOIN vocab v USING (term) CROSS JOIN tot
        GROUP BY t.doc_id)
    SELECT doc_id, n_tokens,
           CAST(round(ce, 6) AS REAL) AS cross_entropy,
           ce > {CE_OUTLIER} AS is_outlier
    FROM s
    """,
)
def text_unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model quality scoring, CCNet-style: a unigram LM is fit
    on the corpus itself (term → corpus probability) and every document
    is scored by its per-token cross-entropy under that model —
    documents whose token distribution diverges from the corpus (spam,
    boilerplate, wrong-language shards) score high and get flagged.
    This is the degenerate-but-real version of the KenLM perplexity
    filter used by CCNet/RedPajama; swapping in real n-gram logprobs
    changes only the broadcast side, not the plan.

    Plan shape: one (doc, term) explode, the vocabulary aggregate comes
    back as a BROADCAST join (vocab ≪ corpus), the corpus total as a
    broadcast one-row aggregate, and the per-doc average is one
    doc-keyed shuffle with map-side partial agg — two aggregations over
    the token stream total, no driver-side scalars. Cross-entropy is
    float32-cast on both sides (avg-of-logs accumulates in
    engine-specific order; last-ulp noise exceeds 6-decimal rounding at
    hash strictness)."""
    d = load_table(spark, sf_dir, "documents", parallel=True)
    tok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
    tot = tok.agg(F.count("*").alias("n"))
    vocab = tok.groupBy("term").agg(F.count("*").alias("c"))
    return (
        tok.join(F.broadcast(vocab), "term")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            (-F.avg(F.log(F.col("c") * 1.0 / F.col("n")))).alias("ce"),
        )
        .select(
            "doc_id", "n_tokens",
            F.round("ce", 6).cast("float").alias("cross_entropy"),
            (F.col("ce") > CE_OUTLIER).alias("is_outlier"),
        )
    )


# ---------------------------------------------------------------------------
# bigram language-model cross-entropy (add-k smoothed)
# ---------------------------------------------------------------------------

BIGRAM_K = 0.5  # add-k smoothing mass


@query(
    "text_bigram_lm_score",
    oracle=f"""
    WITH ws AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    bg AS (
        SELECT doc_id, unnest(list_transform(
                   generate_series(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i+1])) AS bigram,
               unnest(list_transform(
                   generate_series(1, len(toks) - 1),
                   i -> toks[i])) AS w1
        FROM ws),
    vocab AS (
        SELECT count(DISTINCT tok) AS v FROM (
            SELECT unnest(toks) AS tok FROM ws)),
    bgc AS (SELECT bigram, count(*) AS cb FROM bg GROUP BY bigram),
    w1c AS (SELECT w1, count(*) AS cw FROM bg GROUP BY w1),
    scored AS (
        SELECT b.doc_id,
               -ln((bgc.cb + {BIGRAM_K})
                   / (w1c.cw + {BIGRAM_K} * vocab.v)) AS nll
        FROM bg b
        JOIN bgc ON bgc.bigram = b.bigram
        JOIN w1c ON w1c.w1 = b.w1
        CROSS JOIN vocab)
    SELECT doc_id, count(*) AS n_bigrams,
           CAST(round(avg(nll), 6) AS REAL) AS cross_entropy,
           CAST(round(exp(avg(nll)), 6) AS REAL) AS perplexity
    FROM scored GROUP BY doc_id
    """,
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM quality scoring with add-k smoothing — one model order
    up from `text_unigram_lm_score`, the shape real perplexity filters
    (KenLM in CCNet/RedPajama) use: P(w₂|w₁) = (c(w₁w₂)+k) /
    (c(w₁·)+k·V), per-document cross-entropy and perplexity under the
    corpus-fit model.

    Plan: bigrams are built from ONE materialized token array per doc
    (zip_with over two slices — never re-splitting inside a HOF lambda,
    which Catalyst re-evaluates per element), exploded once; the bigram
    and prefix count tables are vocabulary-sized aggregates that come
    back as BROADCAST joins; V rides a one-row broadcast. Two passes
    over the token stream total — same as any n-gram order, only the
    broadcast side grows. Scores are float32-cast (avg-of-logs
    accumulates in engine order)."""
    d = load_table(spark, sf_dir, "documents", parallel=True)
    ws = d.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    n = F.size(F.col("toks"))
    bigrams = F.zip_with(
        F.slice(F.col("toks"), 1, n - 1),
        F.slice(F.col("toks"), 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b))
    bg = (ws.select("doc_id", F.explode(bigrams).alias("bigram"))
          .withColumn("w1", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1))))
    vocab = (ws.select(F.explode("toks").alias("tok"))
             .agg(F.countDistinct("tok").alias("v")))
    bgc = bg.groupBy("bigram").agg(F.count("*").alias("cb"))
    w1c = bg.groupBy("w1").agg(F.count("*").alias("cw"))
    nll = -F.log((F.col("cb") + BIGRAM_K)
                 / (F.col("cw") + BIGRAM_K * F.col("v")))
    return (
        bg.join(F.broadcast(bgc), "bigram")
        .join(F.broadcast(w1c), "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"),
             F.round(F.avg(nll), 6).cast("float").alias("cross_entropy"),
             F.round(F.exp(F.avg(nll)), 6).cast("float").alias("perplexity"))
    )


# ---------------------------------------------------------------------------
# frequency-ranked vocabulary + token-id encoding (the tokenize step of a
# training pipeline: text -> bounded integer id sequences)
# ---------------------------------------------------------------------------

VOCAB_TOP = 200  # vocabulary budget; everything rarer maps to UNK
UNK_ID = -1
ENC_DOC_MOD = 25  # encode every 25th doc so the output stays inspectable


@query(
    "text_vocab_encode",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents),
    vocab AS (
        SELECT term,
               row_number() OVER (ORDER BY count(*) DESC, term) - 1 AS id
        FROM tok GROUP BY term
        ORDER BY count(*) DESC, term LIMIT {VOCAB_TOP}),
    enc AS (
        SELECT t.doc_id, t.pos, coalesce(v.id, {UNK_ID}) AS id
        FROM tok t LEFT JOIN vocab v ON v.term = t.term
        WHERE t.doc_id % {ENC_DOC_MOD} = 0)
    SELECT doc_id, count(*) AS n_tokens,
           CAST(sum(CASE WHEN id = {UNK_ID} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unk,
           array_to_string(list(id ORDER BY pos), ' ') AS ids
    FROM enc GROUP BY doc_id
    """,
)
def text_vocab_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-ranked vocabulary build + token-id encoding: ids are
    assigned by corpus frequency (count desc, term asc — the
    conventional "id 0 is the most common token" layout), truncated to
    a {top}-term budget; encoded documents carry ordered id sequences
    with out-of-vocabulary tokens mapped to {unk}.

    Scale shape: the vocabulary is ONE token-keyed aggregation with
    map-side combine (partition→vocab-size collapse before the
    shuffle) and the ranking window runs over the vocab-sized
    aggregate, never the corpus. Encoding is a broadcast hash join of
    the bounded vocab onto the exploded token stream, re-assembled per
    document by one doc-keyed aggregation — order restored via
    position sort inside the group, not a global sort. Output ids are
    space-joined strings so the value hash crosses engines."""
    d = load_table(spark, sf_dir, "documents", parallel=True)
    tok = (
        d.select("doc_id",
                 F.posexplode(F.split(F.col("text"), " "))
                 .alias("pos0", "term"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("term"))
    vocab = (
        tok.groupBy("term").agg(F.count("*").alias("cnt"))
        .withColumn("id", F.row_number().over(w) - 1)
        .filter(F.col("id") < VOCAB_TOP)
        .select("term", "id")
    )
    enc = (
        tok.filter(F.col("doc_id") % ENC_DOC_MOD == 0)
        .join(F.broadcast(vocab), "term", "left")
        .select("doc_id", "pos",
                F.coalesce(F.col("id"), F.lit(UNK_ID)).alias("id"))
    )
    return (
        enc.groupBy("doc_id")
        .agg(F.count("*").alias("n_tokens"),
             F.sum(F.when(F.col("id") == UNK_ID, 1).otherwise(0))
             .alias("n_unk"),
             F.array_join(
                 F.transform(
                     F.array_sort(F.collect_list(F.struct("pos", "id"))),
                     lambda s: s.getField("id").cast("string")), " ")
             .alias("ids"))
    )


text_vocab_encode.__doc__ = text_vocab_encode.__doc__.format(
    top=VOCAB_TOP, unk=UNK_ID)


CHUNK_SIZE = 48
CHUNK_STRIDE = 32  # 16-token overlap


@query(
    "text_chunk_overlap",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
        WHERE doc_id % 10 = 0),
    starts AS (
        SELECT doc_id, t,
               unnest(generate_series(1, greatest(len(t) - {CHUNK_SIZE} + 1, 1),
                                      {CHUNK_STRIDE})) AS s
        FROM toks)
    SELECT doc_id, CAST(s - 1 AS INT) AS start_tok,
           CAST(least(len(t) - s + 1, {CHUNK_SIZE}) AS INT) AS n_tok,
           array_to_string(t[s:least(s + {CHUNK_SIZE} - 1, len(t))], ' ')
               AS chunk
    FROM starts
    """,
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window chunking (the retrieval/RAG prep standard:
    {size}-token chunks, {ov}-token overlap): per document, slice the
    materialized token array at strided starts — one explode of a
    generated start-position sequence plus JVM ``slice``; the text is
    tokenized ONCE and never re-scanned per chunk. Complements
    ``pack_sequences`` (which concatenates docs to fill a budget);
    chunking preserves doc boundaries and adds overlap so retrieval
    windows never cut context at a hard edge. Tail rule: every doc
    yields at least one chunk; starts stride until fewer than a full
    chunk remains (the final partial chunk carries the remainder)."""
    d = load_table(spark, sf_dir, "documents", parallel=True).filter(
        F.col("doc_id") % 10 == 0)
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    n = F.size("t")
    starts = toks.select(
        "doc_id", "t",
        F.explode(F.sequence(
            F.lit(1), F.greatest(n - CHUNK_SIZE + 1, F.lit(1)),
            F.lit(CHUNK_STRIDE))).alias("s"))
    remaining = F.size("t") - F.col("s") + 1
    return starts.select(
        "doc_id", (F.col("s") - 1).cast("int").alias("start_tok"),
        F.least(remaining, F.lit(CHUNK_SIZE)).cast("int").alias("n_tok"),
        F.array_join(F.slice("t", F.col("s"), F.lit(CHUNK_SIZE)), " ")
        .alias("chunk"))


text_chunk_overlap.__doc__ = text_chunk_overlap.__doc__.format(
    size=CHUNK_SIZE, ov=CHUNK_SIZE - CHUNK_STRIDE)
