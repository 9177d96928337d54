"""Clustering over the ``embeddings`` table: fixed-iteration Lloyd
k-means — the training-data-curation primitive behind SemDeDup cells,
IVF coarse quantizers, and topic-balanced corpus mixing.

North-star extension tier (no reference analog — the anchor is the
reference's arbitrary-dataframe-compute contract,
``layer/python/dask_processing.py:26-27``). Complements the other
iterative operators (PageRank in ``graph.py``, connected components in
``dedup.py``): driver-side loop, every round ordinary DataFrame ops.

Scale posture (100 TB): the centroid table is k rows — ALWAYS broadcast;
the corpus is scanned once per iteration and never shuffled for
assignment (broadcast cross join + grouped argmin with map-side partial
aggregation). The centroid update is one (cluster, dim)-keyed
aggregation — k×dim output rows regardless of corpus size. Per-iteration
``localCheckpoint`` of the k-row centroid frame keeps the loop's plan
constant-size instead of growing by one join tree per round.

Determinism / oracle strategy: seeded init (the k lowest vec_ids),
fixed iteration count, and centroids re-quantized to
``round(·,6) → float32 → double`` after every update so both engines
carry bit-identical centroids into the next assignment. Distances are
the three-fold dot identity ``<v,v> − 2<v,c> + <c,c>`` evaluated as
in-order folds on both sides (bit-identical to DuckDB's sequential
``list_dot_product``), so the grouped argmin is exact and the DuckDB
oracle can unroll the IDENTICAL recurrence — the whole iterative
pipeline is value-checked, not rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dask_lambda_example_spark.functions.vector import as_double, dot
from dask_lambda_example_spark.io import load_table
from dask_lambda_example_spark.registry import query

KM_K = 8
KM_ITERS = 3

_DOT = "list_dot_product({a}, {b})"


def _kmeans_oracle() -> str:
    d = (f"{_DOT.format(a='v.emb', b='v.emb')}"
         f" - 2 * {_DOT.format(a='v.emb', b='c.cen')}"
         f" + {_DOT.format(a='c.cen', b='c.cen')}")
    step = f"""
    a{{i}} AS (
        SELECT vec_id, (min({{{{'d': d, 'cl': cluster}}}})).cl AS cluster
        FROM (SELECT v.vec_id, c.cluster, {d} AS d
              FROM e v CROSS JOIN c{{prev}} c)
        GROUP BY vec_id),
    m{{i}} AS (
        SELECT a.cluster, x.pos,
               CAST(CAST(round(avg(x.val), 6) AS REAL) AS DOUBLE) AS cval
        FROM a{{i}} a JOIN expl x ON x.vec_id = a.vec_id
        GROUP BY a.cluster, x.pos),
    c{{i}} AS (SELECT cluster, list(cval ORDER BY pos) AS cen
               FROM m{{i}} GROUP BY cluster)"""
    iters = ",".join(
        step.format(i=i + 1, prev=i) for i in range(KM_ITERS))
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    expl AS (SELECT vec_id, unnest(emb) AS val,
                    generate_subscripts(emb, 1) AS pos FROM e),
    c0 AS (SELECT vec_id AS cluster, emb AS cen FROM e WHERE vec_id < {KM_K}),
    {iters},
    sizes AS (SELECT cluster, count(*) AS n FROM a{KM_ITERS} GROUP BY cluster)
    SELECT m.cluster, s.n, CAST(m.pos AS INT) AS pos,
           CAST(m.cval AS REAL) AS centroid_val
    FROM m{KM_ITERS} m JOIN sizes s ON s.cluster = m.cluster
    """


@query("ml_kmeans_lloyd", oracle=_kmeans_oracle())
def ml_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd k-means (k={k}, {n} fixed iterations, seeded init = the k
    lowest vec_ids) over the 64-dim embedding corpus, returning the
    final centroids as (cluster, size, dim, value) rows.

    Per iteration: (1) assignment — broadcast the k-row centroid table
    against the streaming corpus, squared-L2 via the dot identity
    (in-order JVM folds), grouped ``min(struct(d, cluster))`` argmin
    with deterministic low-cluster tie-break and map-side partial
    aggregation (never a window over the corpus); (2) update — one
    (cluster, dim)-keyed average over the posexploded corpus, then
    round(·,6)→float32→double re-quantization so the next round's
    distances are engine-independent. The corpus is never shuffled for
    assignment; only the k×64-row centroid state moves between rounds."""
    e = (load_table(spark, sf_dir, "embeddings")
         .select("vec_id", as_double(F.col("embedding")).alias("emb")))
    expl = (e.select("vec_id", F.posexplode("emb").alias("pos0", "val"))
            .select("vec_id", (F.col("pos0") + 1).cast("int").alias("pos"),
                    "val"))
    cen = (e.filter(F.col("vec_id") < KM_K)
           .select(F.col("vec_id").alias("cluster"), F.col("emb").alias("cen")))
    asn = None
    for _ in range(KM_ITERS):
        v, c = e.alias("v"), cen.alias("c")
        dist = (dot(F.col("v.emb"), F.col("v.emb"))
                - 2 * dot(F.col("v.emb"), F.col("c.cen"))
                + dot(F.col("c.cen"), F.col("c.cen")))
        asn = (
            v.crossJoin(F.broadcast(c))
            .select("v.vec_id", "c.cluster", dist.alias("d"))
            .groupBy("vec_id")
            .agg(F.min(F.struct("d", "cluster")).getField("cluster")
                 .alias("cluster"))
        )
        m = (
            asn.join(expl, "vec_id")
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg("val"), 6).cast("float").cast("double")
                 .alias("cval"))
        )
        cen = (
            m.groupBy("cluster")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cval"))),
                lambda s: s.getField("cval")).alias("cen"))
            .localCheckpoint(eager=True)
        )
    sizes = asn.groupBy("cluster").agg(F.count("*").alias("n"))
    return (
        m.join(sizes, "cluster")
        .select("cluster", "n", "pos",
                F.col("cval").cast("float").alias("centroid_val"))
    )


ml_kmeans_lloyd.__doc__ = ml_kmeans_lloyd.__doc__.format(k=KM_K, n=KM_ITERS)


@query(
    "ml_gram_matrix",
    oracle="""
    WITH expl AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS i,
               unnest(CAST(embedding AS DOUBLE[])) AS v
        FROM embeddings)
    SELECT a.i, b.i AS j,
           CAST(round(sum(a.v * b.v), 6) AS REAL) AS g
    FROM expl a JOIN expl b ON a.vec_id = b.vec_id AND a.i <= b.i
    GROUP BY a.i, b.i
    """,
)
def ml_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Gram matrix Eᵀ·E of the tall-skinny embedding
    matrix (n × 64) — the building block behind PCA/whitening/linear
    probes over corpus embeddings, and the canonical "fused operator"
    benchmark shape of distributed matrix engines (FuseME-style): the
    n-dimension reduces away in ONE pass, the output is dim² rows
    regardless of corpus size.

    Plan: posexplode each vector once, self-join per vec_id (64×64
    pairs per row, upper triangle only — the matrix is symmetric),
    then one (i, j)-keyed sum with map-side combine collapsing each
    partition to ≤ dim² rows before the only shuffle. No driver-side
    matrix, no collect; at 100 TB the result is still 4096 rows."""
    e = (load_table(spark, sf_dir, "embeddings")
         .select("vec_id", as_double(F.col("embedding")).alias("emb")))
    expl = (e.select("vec_id", F.posexplode("emb").alias("p", "v"))
            .select("vec_id", (F.col("p") + 1).alias("i"), "v"))
    a, b = expl.alias("a"), expl.alias("b")
    return (
        a.join(b, (F.col("a.vec_id") == F.col("b.vec_id"))
               & (F.col("a.i") <= F.col("b.i")))
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(F.round(F.sum(F.col("a.v") * F.col("b.v")), 6).cast("float")
             .alias("g"))
    )


N_BINS = 10


@query(
    "ml_quantile_binning",
    oracle=f"""
    WITH th AS (
        SELECT quantile_cont(n_chars, [{", ".join(str(i / N_BINS) for i in range(1, N_BINS))}])
               AS qs
        FROM documents)
    SELECT d.doc_id, d.n_chars,
           CAST(1 + len(list_filter(th.qs, q -> q < d.n_chars)) AS INT)
               AS bin
    FROM documents d, th
    """,
)
def ml_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile binning ({n} equal-frequency buckets over document
    length) the scale-safe way: exact interior quantile thresholds come
    from ONE aggregation (``percentile``, interpolated — both engines
    compute the same order statistic), broadcast as a tiny array, and
    each row's bin is the count of thresholds strictly below its value
    — a pure projection. Contrast with ``ntile()``, which drags the
    whole table through one ordered window partition; this shape's
    only full pass is the threshold aggregation. (MLlib's
    ``QuantileDiscretizer`` is the approximate-sketch variant of the
    same design.)"""
    d = load_table(spark, sf_dir, "documents")
    probs = [i / N_BINS for i in range(1, N_BINS)]
    th = d.agg(F.expr(
        f"percentile(n_chars, array({', '.join(map(str, probs))}))")
        .alias("qs"))
    bin_col = (1 + F.size(F.filter(
        F.col("qs"), lambda q: q < F.col("n_chars")))).cast("int")
    return (d.crossJoin(F.broadcast(th))
            .select("doc_id", "n_chars", bin_col.alias("bin")))


ml_quantile_binning.__doc__ = ml_quantile_binning.__doc__.format(n=N_BINS)
