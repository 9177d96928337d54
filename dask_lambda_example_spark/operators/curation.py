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
    d = load_table(spark, sf_dir, "documents")
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
    d = load_table(spark, sf_dir, "documents")
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
    d = load_table(spark, sf_dir, "documents")
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
