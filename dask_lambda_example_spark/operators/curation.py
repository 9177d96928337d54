"""Training-corpus curation operators: sequence packing and
deterministic dataset splits over the ``documents`` table.

North-star extension tier (no reference analog — the anchor is the
reference's arbitrary-dataframe-compute contract,
``layer/python/dask_processing.py:26-27``): these are the steps a
training-data pipeline runs AFTER filtering/dedup — assembling the
surviving documents into fixed-size training sequences and carving
reproducible train/val/test splits with a leakage audit.

100 TB posture: everything here is hash-bucketed — packing is
per-bucket-sequential by construction (a pack order is a total order),
so buckets are the parallelism unit and each bucket's window sort sees
1/N_BUCKETS of the corpus; splits are pure per-row hash projections
(no shuffle at all) and the leakage audit is one content-hash-keyed
aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dask_lambda_example_spark.io import load_table
from dask_lambda_example_spark.operators.dedup import HEX32_SQL, hex32
from dask_lambda_example_spark.registry import query

# ---------------------------------------------------------------------------
# sequence packing (concatenate-and-chunk)
# ---------------------------------------------------------------------------

SEQ_BUDGET = 512  # tokens per training sequence
N_PACK_BUCKETS = 32


@query(
    "pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             {HEX32_SQL.format(x="CAST(doc_id AS VARCHAR)")} % {N_PACK_BUCKETS}
               AS bucket
      FROM documents),
    packed AS (
      SELECT doc_id, bucket, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING) - n_tokens
                  AS BIGINT) AS start_off
      FROM t)
    SELECT doc_id, bucket, n_tokens, start_off,
           CAST(floor(start_off / {SEQ_BUDGET}) AS BIGINT) AS seq_id,
           floor(start_off / {SEQ_BUDGET})
             <> floor((start_off + n_tokens - 1) / {SEQ_BUDGET})
             AS crosses_boundary
    FROM packed
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing, concatenate-and-chunk style (the GPT-training
    layout): documents are concatenated in a deterministic order and the
    token stream is cut every ``SEQ_BUDGET`` tokens; each document
    reports the sequence it starts in and whether it straddles a cut —
    exactly the bookkeeping a packed-pretraining dataloader needs.

    Packing is inherently sequential (every offset depends on all
    predecessors), so the scale design makes the SEQUENTIAL UNIT small
    instead of pretending it isn't: docs are md5-hash-assigned to
    ``N_PACK_BUCKETS`` independent streams, offsets are a running-sum
    window per bucket (rows-frame cumsum — one shuffle on the bucket
    key, each sort seeing 1/N of the corpus), and (bucket, seq_id)
    identifies a training sequence. At a 1000-executor scale you raise
    N_PACK_BUCKETS to O(cores) — packing quality is unaffected because
    chunking never wastes tokens regardless of stream count."""
    d = load_table(spark, sf_dir, "documents", parallel=True)
    t = d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        F.pmod(hex32(F.col("doc_id").cast("string")),
               F.lit(N_PACK_BUCKETS)).alias("bucket"),
    )
    w = (Window.partitionBy("bucket").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    packed = t.withColumn(
        "start_off", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    seq_of = lambda off: F.floor(off / SEQ_BUDGET)  # noqa: E731
    return packed.select(
        "doc_id", "bucket", "n_tokens", "start_off",
        seq_of(F.col("start_off")).alias("seq_id"),
        (seq_of(F.col("start_off"))
         != seq_of(F.col("start_off") + F.col("n_tokens") - 1))
        .alias("crosses_boundary"),
    )


# ---------------------------------------------------------------------------
# deterministic train/val/test split + leakage audit
# ---------------------------------------------------------------------------

# md5-hash split: 90/5/5 by per-doc hash bucket out of 100 — stable
# under corpus growth (a doc's split never changes when others arrive)
VAL_LO, TEST_LO = 90, 95


@query(
    "split_train_val_test",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             {HEX32_SQL.format(x="CAST(doc_id AS VARCHAR)")} % 100 AS h,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents)
    SELECT CASE WHEN h < {VAL_LO} THEN 'train'
                WHEN h < {TEST_LO} THEN 'val'
                ELSE 'test' END AS split,
           lang,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens
    FROM t GROUP BY 1, 2
    """,
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split: each document's
    assignment is a pure function of md5(doc_id) — reproducible across
    runs, machines, and engines, and STABLE under corpus growth (new
    docs never move old ones, unlike percentile- or random()-based
    splits). The split column is a zero-shuffle projection; the output
    is the per-split × language audit table (doc and token counts) a
    dataset card reports.

    At 100 TB this is the split discipline that matters: hash-based
    assignment needs no global sort, no sampling pass, and no persisted
    assignment table — any job recomputes membership from the id."""
    d = load_table(spark, sf_dir, "documents", parallel=True)
    h = F.pmod(hex32(F.col("doc_id").cast("string")), F.lit(100))
    split = (F.when(h < VAL_LO, "train")
             .when(h < TEST_LO, "val")
             .otherwise("test"))
    return (
        d.select(
            split.alias("split"), "lang",
            F.size(F.split(F.col("text"), " ")).alias("n_tokens"))
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_tokens").alias("n_tokens"))
    )


@query(
    "split_leakage_audit",
    oracle=f"""
    WITH t AS (
      SELECT md5(text) AS content_hash,
             CASE WHEN {HEX32_SQL.format(x="CAST(doc_id AS VARCHAR)")} % 100
                       < {VAL_LO}
                  THEN 'train' ELSE 'heldout' END AS side
      FROM documents),
    g AS (
      SELECT content_hash,
             count(DISTINCT CASE WHEN side = 'train' THEN 1 END) > 0
               AS in_train,
             count(DISTINCT CASE WHEN side = 'heldout' THEN 1 END) > 0
               AS in_heldout
      FROM t GROUP BY content_hash)
    SELECT count(*) AS n_distinct_contents,
           CAST(sum(CASE WHEN in_train AND in_heldout THEN 1 ELSE 0 END)
                AS BIGINT) AS n_leaked_contents
    FROM g
    """,
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-leakage audit: count exact-duplicate contents that appear
    on BOTH sides of the train/heldout boundary — the check that
    catches evaluation contamination the split itself cannot see
    (identical text under different doc_ids lands in different splits
    because assignment hashes the ID, not the content).

    One content-hash-keyed aggregation (16-byte keys shuffle, documents
    don't) over boolean presence flags — the same shape at any scale.
    Pipelines run this AFTER dedup expecting zero; the synthetic corpus
    has planted duplicates, so the non-zero count here is the audit
    working."""
    d = load_table(spark, sf_dir, "documents", parallel=True)
    h = F.pmod(hex32(F.col("doc_id").cast("string")), F.lit(100))
    side = F.when(h < VAL_LO, "train").otherwise("heldout")
    g = (
        d.select(F.md5("text").alias("content_hash"), side.alias("side"))
        .groupBy("content_hash")
        .agg(F.max(F.col("side") == "train").alias("in_train"),
             F.max(F.col("side") == "heldout").alias("in_heldout"))
    )
    return g.agg(
        F.count("*").alias("n_distinct_contents"),
        F.sum((F.col("in_train") & F.col("in_heldout")).cast("int"))
        .alias("n_leaked_contents"),
    )


# ---------------------------------------------------------------------------
# hash-based stratified sampling
# ---------------------------------------------------------------------------

# per-language keep rates (downsample the over-represented strata) —
# assignment gate is md5(doc_id || salt), independent of the split hash
STRAT_RATES = {"en": 0.5, "de": 1.0, "es": 0.9, "fr": 0.9, "zh": 0.75}
STRAT_SALT = ":strat"


@query(
    "sample_stratified_hash",
    oracle=f"""
    WITH t AS (
      SELECT lang,
             {HEX32_SQL.format(
                 x=f"CAST(doc_id AS VARCHAR) || '{STRAT_SALT}'")} % 10000
               AS h,
             CASE lang {' '.join(
                 f"WHEN '{k}' THEN {v}" for k, v in STRAT_RATES.items())}
             END AS rate
      FROM documents)
    SELECT lang, round(rate, 6) AS target_rate,
           count(*) AS n_total,
           CAST(sum(CASE WHEN h < rate * 10000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           round(sum(CASE WHEN h < rate * 10000 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS realized_rate
    FROM t GROUP BY lang, rate
    """,
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling with per-stratum rates (rebalancing an
    over-represented language), decided by a salted content-id hash
    instead of an RNG: `keep ⇔ md5(doc_id‖salt) mod 10k < rate·10k`.
    Deterministic across runs AND engines (the oracle replicates the
    exact gate — something `sampleBy`'s engine-private RNG can never
    give you), stable under corpus growth, and independent of the
    train/val/test hash because the salt differs. Output is the
    per-stratum audit (target vs realized rate).

    The gate is a pure per-row projection — zero shuffle for the
    sampling itself; the audit is one lang-keyed aggregation. At 100 TB
    sampling therefore costs a scan, nothing more."""
    d = load_table(spark, sf_dir, "documents", parallel=True)
    rate = F.col("lang")
    expr = None
    for k, v in STRAT_RATES.items():
        expr = (F.when(rate == k, F.lit(v)) if expr is None
                else expr.when(rate == k, F.lit(v)))
    h = F.pmod(
        hex32(F.concat(F.col("doc_id").cast("string"), F.lit(STRAT_SALT))),
        F.lit(10000))
    kept = (h < expr * 10000).cast("int")
    return (
        d.select("lang", expr.alias("rate"), kept.alias("kept"))
        .groupBy("lang", "rate")
        .agg(F.count("*").alias("n_total"),
             F.sum("kept").alias("n_kept"),
             F.round(F.sum("kept") * 1.0 / F.count("*"), 6)
             .alias("realized_rate"))
        .select("lang", F.round("rate", 6).alias("target_rate"),
                "n_total", "n_kept", "realized_rate")
    )


# ---------------------------------------------------------------------------
# corpus mixture dosage (per-domain epochs for a token budget)
# ---------------------------------------------------------------------------

TOKEN_BUDGET = 1_000_000  # target training-mix size in tokens

# domain groups over the source ids, with target mixture weights
MIX_WEIGHTS = {"web": 0.6, "books": 0.25, "code": 0.15}  # src0-9/10-14/15-19


@query(
    "mix_domain_dosage",
    oracle=f"""
    WITH t AS (
      SELECT CASE WHEN CAST(substr(source, 4) AS INT) < 10 THEN 'web'
                  WHEN CAST(substr(source, 4) AS INT) < 15 THEN 'books'
                  ELSE 'code' END AS domain,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents),
    g AS (SELECT domain, count(*) AS n_docs,
                 CAST(sum(n_tokens) AS BIGINT) AS n_tokens
          FROM t GROUP BY domain),
    w AS (SELECT * FROM (VALUES {', '.join(
        f"('{k}', CAST({v} AS DOUBLE))" for k, v in MIX_WEIGHTS.items()
    )}) AS v(domain, weight))
    SELECT g.domain, g.n_docs, g.n_tokens, round(w.weight, 6) AS weight,
           CAST(round(w.weight * {TOKEN_BUDGET}) AS BIGINT)
             AS target_tokens,
           round(w.weight * {TOKEN_BUDGET} / g.n_tokens, 6) AS epochs,
           w.weight * {TOKEN_BUDGET} / g.n_tokens > 1.0 AS upsampled
    FROM g JOIN w ON g.domain = w.domain
    """,
)
def mix_domain_dosage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix dosage planning (the DoReMi/Pile-style mixture
    step): given target mixture weights per domain and a token budget,
    compute each domain's required repeat factor — ``epochs =
    weight·budget / available_tokens`` — and flag domains that must be
    UPSAMPLED (epochs > 1, i.e. the sampler will repeat documents).
    This is the table a dataloader consumes to realize a mixture; the
    weights join is a 3-row broadcast.

    One domain-keyed aggregation over a per-row projection — the same
    single-shuffle shape at any corpus size."""
    d = load_table(spark, sf_dir, "documents", parallel=True)
    srcnum = F.substring(F.col("source"), 4, 10).cast("int")
    domain = (F.when(srcnum < 10, "web")
              .when(srcnum < 15, "books")
              .otherwise("code"))
    g = (
        d.select(domain.alias("domain"),
                 F.size(F.split(F.col("text"), " ")).alias("n_tokens"))
        .groupBy("domain")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_tokens").alias("n_tokens"))
    )
    w = spark.createDataFrame(
        [(k, float(v)) for k, v in MIX_WEIGHTS.items()],
        "domain string, weight double")
    epochs = F.col("weight") * TOKEN_BUDGET / F.col("n_tokens")
    return (
        g.join(F.broadcast(w), "domain")
        .select("domain", "n_docs", "n_tokens",
                F.round("weight", 6).alias("weight"),
                F.round(F.col("weight") * TOKEN_BUDGET)
                .cast("bigint").alias("target_tokens"),
                F.round(epochs, 6).alias("epochs"),
                (epochs > 1.0).alias("upsampled"))
    )


# ---------------------------------------------------------------------------
# temperature-based mixture sampling (weights FROM the data)
# ---------------------------------------------------------------------------

MIX_ALPHA = 0.3  # p_i ∝ n_i^alpha — alpha<1 flattens toward uniform


@query(
    "mix_temperature_sampling",
    oracle=f"""
    WITH g AS (
      SELECT source,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source),
    w AS (SELECT source, n_tokens,
                 pow(n_tokens, {MIX_ALPHA}) AS wgt,
                 sum(pow(n_tokens, {MIX_ALPHA})) OVER () AS denom,
                 sum(n_tokens) OVER () AS total
          FROM g)
    SELECT source, n_tokens,
           round(n_tokens * 1.0 / total, 6) AS p_raw,
           round(wgt / denom, 6) AS p_sample,
           round((wgt / denom) * {TOKEN_BUDGET} / n_tokens, 6) AS epochs,
           (wgt / denom) * {TOKEN_BUDGET} / n_tokens > 1.0 AS upsampled
    FROM w
    """,
)
def mix_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture sampling (the mT5/UniMax multilingual
    recipe): instead of hand-set weights (``mix_domain_dosage``), the
    sampling probability is DERIVED from the corpus — ``p_i ∝
    n_i^alpha`` with alpha={a} flattens the token distribution toward
    uniform, boosting low-resource sources without drowning the head.
    Output per source: raw share, tempered share, and the epoch/repeat
    factor a dataloader needs to realize the mix for the token budget.

    Scale: one source-keyed aggregation reduces the corpus to a
    |sources|-row frame; the normalizing denominator is an unbounded
    window over THAT tiny frame (never over the corpus), so the whole
    query is one shuffle plus per-row arithmetic."""
    d = load_table(spark, sf_dir, "documents", parallel=True)
    g = (
        d.select("source",
                 F.size(F.split(F.col("text"), " ")).alias("n_tokens"))
        .groupBy("source")
        .agg(F.sum("n_tokens").alias("n_tokens"))
    )
    w_all = Window.partitionBy()
    wgt = F.pow(F.col("n_tokens"), MIX_ALPHA)
    g = g.select(
        "source", "n_tokens", wgt.alias("wgt"),
        F.sum(wgt).over(w_all).alias("denom"),
        F.sum("n_tokens").over(w_all).alias("total"))
    p_sample = F.col("wgt") / F.col("denom")
    epochs = p_sample * TOKEN_BUDGET / F.col("n_tokens")
    return g.select(
        "source", "n_tokens",
        F.round(F.col("n_tokens") / F.col("total"), 6).alias("p_raw"),
        F.round(p_sample, 6).alias("p_sample"),
        F.round(epochs, 6).alias("epochs"),
        (epochs > 1.0).alias("upsampled"))


# ---------------------------------------------------------------------------
# length-bucketed batching (padding-waste planning)
# ---------------------------------------------------------------------------

LEN_BUCKET_QS = (0.25, 0.5, 0.75)


@query(
    "curation_length_buckets",
    oracle=f"""
    WITH dl AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
                FROM documents),
    th AS (SELECT quantile_cont(n_tokens, {LEN_BUCKET_QS[0]}) AS t1,
                  quantile_cont(n_tokens, {LEN_BUCKET_QS[1]}) AS t2,
                  quantile_cont(n_tokens, {LEN_BUCKET_QS[2]}) AS t3
           FROM dl),
    b AS (SELECT dl.doc_id, dl.n_tokens,
                 CASE WHEN dl.n_tokens <= th.t1 THEN 0
                      WHEN dl.n_tokens <= th.t2 THEN 1
                      WHEN dl.n_tokens <= th.t3 THEN 2
                      ELSE 3 END AS bucket
          FROM dl CROSS JOIN th)
    SELECT bucket, count(*) AS n_docs,
           CAST(max(n_tokens) AS BIGINT) AS max_len,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
           round(1 - sum(n_tokens) * 1.0 / (count(*) * max(n_tokens)), 6)
             AS padding_frac
    FROM b GROUP BY bucket
    """,
)
def curation_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching plan: group documents into token-length
    quartiles and report each bucket's padding waste (1 − Σlen / (n ·
    max_len)) — the fraction of a padded batch spent on pad tokens if
    batches are drawn within the bucket. This is the pre-flight table
    for length-grouped batch samplers; the quartile design keeps
    per-bucket waste far below the unbucketed corpus-wide figure.

    Scale shape (same discipline as ``ml_quantile_binning``): exact
    thresholds come from ONE percentile aggregation, broadcast back,
    and bucketing is a projection — never an ntile window sorting the
    whole corpus. One further grouped aggregation (4 groups, map-side
    combined) yields the plan."""
    d = load_table(spark, sf_dir, "documents", parallel=True)
    dl = d.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tokens"))
    th = dl.agg(*[
        F.percentile("n_tokens", F.lit(q)).alias(f"t{i + 1}")
        for i, q in enumerate(LEN_BUCKET_QS)
    ])
    bucket = (F.when(F.col("n_tokens") <= F.col("t1"), 0)
              .when(F.col("n_tokens") <= F.col("t2"), 1)
              .when(F.col("n_tokens") <= F.col("t3"), 2)
              .otherwise(3))
    return (
        dl.crossJoin(F.broadcast(th))
        .select("n_tokens", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_docs"),
             F.max("n_tokens").cast("bigint").alias("max_len"),
             F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
             F.round(1 - F.sum("n_tokens")
                     / (F.count("*") * F.max("n_tokens")), 6)
             .alias("padding_frac"))
    )


# ---------------------------------------------------------------------------
# budgeted quality selection (ordered-prefix cut, distributed)
# ---------------------------------------------------------------------------

SELECT_TOKEN_BUDGET = 10_000  # absolute token budget for the selection


@query(
    "curation_quality_budget_select",
    oracle=f"""
    WITH dl AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
             len(list_distinct(string_split(text, ' '))) * 1.0
               / len(string_split(text, ' ')) AS score
      FROM documents),
    c AS (
      SELECT doc_id, n_tokens, score,
             sum(n_tokens) OVER (ORDER BY score DESC, doc_id)
               AS cum_tokens
      FROM dl)
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           round(score, 6) AS quality,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM c WHERE cum_tokens <= {SELECT_TOKEN_BUDGET}
    """,
)
def curation_quality_budget_select(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Budgeted quality selection — "take the best documents until the
    token budget is spent", the cut every curated-training-mix release
    makes. Documents are ordered by a quality score (lexical diversity
    here; any scorer slots in) and the ordered PREFIX whose cumulative
    token count fits ``SELECT_TOKEN_BUDGET`` is kept.

    The naive form is a global ``sum() OVER (ORDER BY score)`` — one
    task sorts the corpus. This is the third use of the
    distributed-selection shape (``agg_percentile_exact_distributed``,
    ``win_ntile_distributed``): ``repartitionByRange`` on (score DESC,
    doc_id) gives contiguous score slices; per-bucket token totals
    prefix-sum into bucket offsets (a P-row broadcast frame); the
    running sum inside each bucket is a local window — every task
    O(n/P), and at 100 TB the budget cut touches only the buckets the
    prefix reaches (later buckets filter out wholesale on
    ``offset > budget``)."""
    d = load_table(spark, sf_dir, "documents", parallel=True)
    toks = F.split(F.col("text"), " ")
    dl = d.select(
        "doc_id", F.size(toks).alias("n_tokens"),
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("score"))
    n_buckets = spark.sparkContext.defaultParallelism
    ranged = (dl.repartitionByRange(
        n_buckets, F.col("score").desc(), F.col("doc_id"))
        .withColumn("pid", F.spark_partition_id()))

    pc = ranged.groupBy("pid").agg(F.sum("n_tokens").alias("tok"))
    w_off = (Window.orderBy("pid")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    offsets = pc.select(
        "pid", (F.sum("tok").over(w_off) - F.col("tok")).alias("off"))

    w_local = (Window.partitionBy("pid")
               .orderBy(F.col("score").desc(), F.col("doc_id"))
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        ranged.join(F.broadcast(offsets), "pid")
        # whole later buckets are prunable before any local window work
        .filter(F.col("off") <= SELECT_TOKEN_BUDGET)
        .withColumn("cum_tokens",
                    (F.sum("n_tokens").over(w_local) + F.col("off"))
                    .cast("bigint"))
        .filter(F.col("cum_tokens") <= SELECT_TOKEN_BUDGET)
        .select("doc_id", F.col("n_tokens").cast("bigint").alias("n_tokens"),
                F.round("score", 6).alias("quality"), "cum_tokens")
    )


# ---------------------------------------------------------------------------
# end-to-end curation funnel (composed from the registered operators)
# ---------------------------------------------------------------------------

from dask_lambda_example_spark.operators.dedup import (  # noqa: E402
    dedup_exact_hash, dedup_substring_cutlist)
from dask_lambda_example_spark.operators.text import (  # noqa: E402
    text_repetition_filter, text_unigram_lm_score)
from dask_lambda_example_spark.registry import QUERIES  # noqa: E402


def _funnel_oracle() -> str:
    ex = QUERIES["dedup_exact_hash"].oracle
    rep = QUERIES["text_repetition_filter"].oracle
    lm = QUERIES["text_unigram_lm_score"].oracle
    return f"""
    WITH ex AS ({ex}), rep AS ({rep}), lm AS ({lm}),
    base AS (
      SELECT d.doc_id, len(string_split(d.text, ' ')) AS n_tokens,
             (ex.doc_id IS NOT NULL) AS p1,
             (ex.doc_id IS NOT NULL AND rep.keep) AS p2,
             (ex.doc_id IS NOT NULL AND rep.keep AND NOT lm.is_outlier)
               AS p3
      FROM documents d
      LEFT JOIN ex ON ex.doc_id = d.doc_id
      JOIN rep ON rep.doc_id = d.doc_id
      JOIN lm ON lm.doc_id = d.doc_id)
    SELECT '0_raw' AS stage, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens FROM base
    UNION ALL SELECT '1_exact_dedup', count(*),
           CAST(sum(n_tokens) AS BIGINT) FROM base WHERE p1
    UNION ALL SELECT '2_quality', count(*),
           CAST(sum(n_tokens) AS BIGINT) FROM base WHERE p2
    UNION ALL SELECT '3_lm_filter', count(*),
           CAST(sum(n_tokens) AS BIGINT) FROM base WHERE p3
    """


@query("pipeline_curation_funnel", oracle=_funnel_oracle())
def pipeline_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation pipeline as ONE composed query — exact dedup
    → Gopher repetition/diversity gates → corpus-LM outlier filter —
    reported as a funnel: documents and tokens surviving each stage.
    The stages are the REGISTERED operators called as functions
    (`dedup_exact_hash`, `text_repetition_filter`,
    `text_unigram_lm_score`), and the oracle nests those operators'
    own oracle SQL as CTEs — composition is checked end-to-end, not
    re-derived.

    Catalyst plans the composition globally: the three stage inputs
    share the one documents scan, each stage keeps its own single
    shuffle, the stage flags join back on doc_id, and the 4-stage
    report is an Expand (one row per stage gate) feeding a 4-group
    aggregate. Survivor-set semantics are cumulative-AND, so a stage
    can only shrink the funnel — the invariant a curation run reports
    to its operator."""
    d = load_table(spark, sf_dir, "documents", parallel=True)
    ex = (dedup_exact_hash(spark, sf_dir)
          .select("doc_id", F.lit(True).alias("p1")))
    rep = (text_repetition_filter(spark, sf_dir)
           .select("doc_id", F.col("keep").alias("q_keep")))
    lm = (text_unigram_lm_score(spark, sf_dir)
          .select("doc_id", F.col("is_outlier").alias("lm_out")))
    base = (
        d.select("doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tokens"))
        .join(ex, "doc_id", "left")
        .join(rep, "doc_id")
        .join(lm, "doc_id")
        .select(
            "doc_id", "n_tokens",
            F.coalesce(F.col("p1"), F.lit(False)).alias("p1"),
            (F.coalesce(F.col("p1"), F.lit(False)) & F.col("q_keep"))
            .alias("p2"),
            (F.coalesce(F.col("p1"), F.lit(False)) & F.col("q_keep")
             & ~F.col("lm_out")).alias("p3"),
        )
    )
    stages = base.select(
        "n_tokens",
        F.explode(F.array(
            F.struct(F.lit("0_raw").alias("stage"), F.lit(True).alias("ok")),
            F.struct(F.lit("1_exact_dedup").alias("stage"),
                     F.col("p1").alias("ok")),
            F.struct(F.lit("2_quality").alias("stage"),
                     F.col("p2").alias("ok")),
            F.struct(F.lit("3_lm_filter").alias("stage"),
                     F.col("p3").alias("ok")),
        )).alias("s"),
    )
    return (
        stages.filter(F.col("s.ok"))
        .groupBy(F.col("s.stage").alias("stage"))
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_tokens").alias("n_tokens"))
    )


def _funnel_cut_oracle() -> str:
    ex = QUERIES["dedup_exact_hash"].oracle
    rep = QUERIES["text_repetition_filter"].oracle
    lm = QUERIES["text_unigram_lm_score"].oracle
    cl = QUERIES["dedup_substring_cutlist"].oracle
    return f"""
    WITH ex AS ({ex}), rep AS ({rep}), lm AS ({lm}), cl AS ({cl}),
    cut AS (SELECT doc_id, sum(cut_len) AS cut_tokens
            FROM cl GROUP BY doc_id),
    base AS (
      SELECT d.doc_id, len(string_split(d.text, ' ')) AS n_tokens,
             coalesce(cut.cut_tokens, 0) AS cut_tokens,
             (ex.doc_id IS NOT NULL) AS p1,
             (ex.doc_id IS NOT NULL AND rep.keep) AS p2,
             (ex.doc_id IS NOT NULL AND rep.keep AND NOT lm.is_outlier)
               AS p3,
             (ex.doc_id IS NOT NULL AND rep.keep AND NOT lm.is_outlier
              AND coalesce(cut.cut_tokens, 0) * 2
                  <= len(string_split(d.text, ' '))) AS p4
      FROM documents d
      LEFT JOIN ex ON ex.doc_id = d.doc_id
      JOIN rep ON rep.doc_id = d.doc_id
      JOIN lm ON lm.doc_id = d.doc_id
      LEFT JOIN cut ON cut.doc_id = d.doc_id)
    SELECT '0_raw' AS stage, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens FROM base
    UNION ALL SELECT '1_exact_dedup', count(*),
           CAST(sum(n_tokens) AS BIGINT) FROM base WHERE p1
    UNION ALL SELECT '2_quality', count(*),
           CAST(sum(n_tokens) AS BIGINT) FROM base WHERE p2
    UNION ALL SELECT '3_lm_filter', count(*),
           CAST(sum(n_tokens) AS BIGINT) FROM base WHERE p3
    UNION ALL SELECT '4_substring_cut', count(*),
           CAST(sum(n_tokens - cut_tokens) AS BIGINT) FROM base WHERE p4
    """


@query("pipeline_curation_funnel_cut", oracle=_funnel_cut_oracle())
def pipeline_curation_funnel_cut(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """The curation funnel WITH the substring cut-list stage (VERDICT
    r13 item 4's consumer seam): after exact dedup → quality gates →
    LM filter, stage ``4_substring_cut`` applies the per-document cut
    ranges from ``dedup_substring_cutlist`` — its token count is the
    SURVIVING tokens (n_tokens − cut_tokens: the trim a training-data
    writer would materialize), and a document is dropped when more
    than half its tokens sit in duplicated ranges (the Lee et al.
    drop-or-trim policy with a 0.5 dial, integer-exact as
    cut_tokens·2 ≤ n_tokens). Stages 0–3 report identically to
    ``pipeline_curation_funnel``; all stage inputs remain the
    REGISTERED operators called as functions, and the oracle nests
    their SQL — composition checked end to end.

    Scale shape: one extra LEFT join of the (tiny, span-bounded)
    per-doc cut aggregate onto the funnel base; everything else is the
    funnel's existing single-shuffle-per-stage plan."""
    d = load_table(spark, sf_dir, "documents", parallel=True)
    ex = (dedup_exact_hash(spark, sf_dir)
          .select("doc_id", F.lit(True).alias("p1")))
    rep = (text_repetition_filter(spark, sf_dir)
           .select("doc_id", F.col("keep").alias("q_keep")))
    lm = (text_unigram_lm_score(spark, sf_dir)
          .select("doc_id", F.col("is_outlier").alias("lm_out")))
    cut = (dedup_substring_cutlist(spark, sf_dir)
           .groupBy("doc_id").agg(F.sum("cut_len").alias("cut_tokens")))
    p1 = F.coalesce(F.col("p1"), F.lit(False))
    p2 = p1 & F.col("q_keep")
    p3 = p2 & ~F.col("lm_out")
    base = (
        d.select("doc_id",
                 F.size(F.split(F.col("text"), " ")).alias("n_tokens"))
        .join(ex, "doc_id", "left")
        .join(rep, "doc_id")
        .join(lm, "doc_id")
        .join(cut, "doc_id", "left")
        .select(
            "doc_id", "n_tokens",
            F.coalesce(F.col("cut_tokens"), F.lit(0)).alias("cut_tokens"),
            p1.alias("p1"), p2.alias("p2"), p3.alias("p3"),
            (p3 & (F.coalesce(F.col("cut_tokens"), F.lit(0)) * 2
                   <= F.col("n_tokens"))).alias("p4"),
        )
    )
    stages = base.select(
        F.explode(F.array(
            F.struct(F.lit("0_raw").alias("stage"),
                     F.lit(True).alias("ok"),
                     F.col("n_tokens").alias("toks")),
            F.struct(F.lit("1_exact_dedup").alias("stage"),
                     F.col("p1").alias("ok"),
                     F.col("n_tokens").alias("toks")),
            F.struct(F.lit("2_quality").alias("stage"),
                     F.col("p2").alias("ok"),
                     F.col("n_tokens").alias("toks")),
            F.struct(F.lit("3_lm_filter").alias("stage"),
                     F.col("p3").alias("ok"),
                     F.col("n_tokens").alias("toks")),
            F.struct(F.lit("4_substring_cut").alias("stage"),
                     F.col("p4").alias("ok"),
                     (F.col("n_tokens") - F.col("cut_tokens"))
                     .alias("toks")),
        )).alias("s"),
    )
    return (
        stages.filter(F.col("s.ok"))
        .groupBy(F.col("s.stage").alias("stage"))
        .agg(F.count("*").alias("n_docs"),
             F.sum("s.toks").alias("n_tokens"))
    )


# ---------------------------------------------------------------------------
# corpus release report (funnel survivors × split assignment × audit)
# ---------------------------------------------------------------------------


def _release_oracle() -> str:
    from dask_lambda_example_spark.registry import QUERIES as _Q

    ex = _Q["dedup_exact_hash"].oracle
    rep = _Q["text_repetition_filter"].oracle
    lm = _Q["text_unigram_lm_score"].oracle
    h = HEX32_SQL.format(x="CAST(d.doc_id AS VARCHAR)")
    return f"""
    WITH ex AS ({ex}), rep AS ({rep}), lm AS ({lm}),
    survivors AS (
      SELECT d.doc_id, d.lang, d.source,
             len(string_split(d.text, ' ')) AS n_tokens,
             CASE WHEN {h} % 100 < {VAL_LO} THEN 'train'
                  WHEN {h} % 100 < {TEST_LO} THEN 'val'
                  ELSE 'test' END AS split
      FROM documents d
      JOIN ex ON ex.doc_id = d.doc_id
      JOIN rep ON rep.doc_id = d.doc_id AND rep.keep
      JOIN lm ON lm.doc_id = d.doc_id AND NOT lm.is_outlier)
    SELECT split, lang,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           count(DISTINCT source) AS n_sources
    FROM survivors GROUP BY split, lang
    """


@query("pipeline_release_report", oracle=_release_oracle())
def pipeline_release_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus RELEASE report — the composition a data team ships
    with every cut: curation-funnel survivors (exact dedup ∧ Gopher
    gates ∧ LM filter, the same registered operators
    ``pipeline_curation_funnel`` composes) assigned to their stable
    hash splits, audited per (split, language) with doc/token/source
    counts. The oracle nests the component operators' own oracle SQL
    as CTEs plus the split rule — the full pipeline is value-checked
    as one expression, so a regression in ANY composed stage fails
    this query too.

    Plan shape: one documents scan shared by all stages, one shuffle
    per stage flag, survivors join on doc_id, split assignment is a
    zero-shuffle hash projection, and the audit is one grouped
    aggregation over split×lang (tiny) with an exact distinct-source
    count riding the same shuffle."""
    from dask_lambda_example_spark.operators.dedup import dedup_exact_hash
    from dask_lambda_example_spark.operators.text import (
        text_repetition_filter, text_unigram_lm_score)

    d = load_table(spark, sf_dir, "documents", parallel=True)
    ex = dedup_exact_hash(spark, sf_dir).select("doc_id")
    rep = (text_repetition_filter(spark, sf_dir)
           .filter(F.col("keep")).select("doc_id"))
    lm = (text_unigram_lm_score(spark, sf_dir)
          .filter(~F.col("is_outlier")).select("doc_id"))
    h = F.pmod(hex32(F.col("doc_id").cast("string")), F.lit(100))
    split = (F.when(h < VAL_LO, "train")
             .when(h < TEST_LO, "val")
             .otherwise("test"))
    survivors = (
        d.join(ex, "doc_id").join(rep, "doc_id").join(lm, "doc_id")
        .select(split.alias("split"), "lang", "source",
                F.size(F.split(F.col("text"), " ")).alias("n_tokens")))
    return (
        survivors.groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_tokens").alias("n_tokens"),
             F.countDistinct("source").alias("n_sources"))
    )


# seeded training-order shuffle: shard count + seed are part of the
# dataset release spec — changing either is a new epoch order
SHUFFLE_SEED, N_SHARDS = 42, 16


@query(
    "curation_global_shuffle",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id,
             md5('{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)) AS okey,
             {HEX32_SQL.format(
                 x=f"'shard:{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)")}
               % {N_SHARDS} AS shard
      FROM documents)
    SELECT doc_id, shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY okey)
                AS BIGINT) AS pos
    FROM keyed
    """,
)
def curation_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic seeded global shuffle — the reproducible
    training-order pass every corpus release needs before sequence
    packing. Each doc's order key is md5(seed || doc_id): reproducible
    across runs/engines (no RNG state), and re-seedable per epoch.

    Scale shape: a TOTAL order over 100 TB would funnel into one sorted
    range anyway at write time, so real pipelines shuffle into SHARDS —
    hash-assign each doc to one of N_SHARDS shards (pure projection,
    seed-salted so shard membership reshuffles per epoch too), then
    order WITHIN each shard by the order key. One hash shuffle on
    shard, N_SHARDS-way parallel sorts, no global sort, no single-task
    window — each (shard, pos) range becomes one training file.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents", parallel=True)
    okey = F.md5(F.concat(F.lit(f"{SHUFFLE_SEED}:"),
                          F.col("doc_id").cast("string")))
    shard = F.pmod(
        hex32(F.concat(F.lit(f"shard:{SHUFFLE_SEED}:"),
                       F.col("doc_id").cast("string"))),
        F.lit(N_SHARDS))
    keyed = d.select("doc_id", okey.alias("okey"), shard.alias("shard"))
    w = Window.partitionBy("shard").orderBy("okey")
    return keyed.select(
        "doc_id", "shard",
        F.row_number().over(w).cast("long").alias("pos"))
