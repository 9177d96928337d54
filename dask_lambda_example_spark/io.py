"""Table loaders / sinks over the driver-generated parquet tables.

The reference's I/O surface is: hive-partitioned S3 JSON writes
(``src/lambda_producer.py:22-27``), single-object JSON reads
(``layer/python/dask_processing.py:17-18``), and the implied
``dask.dataframe`` read/write family (SURVEY.md §2.B). Spark covers all
of it natively; this module is a thin, schema-aware convenience layer.

Scale posture: parquet scans get predicate pushdown, column pruning and
partition pruning from Catalyst for free; loaders never infer JSON
schemas (explicit ``StructType`` only — inference is a full extra pass
at 100 TB).
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Row bound under which load_table(parallel=True) skips its round-robin
# rebalance (see load_table docstring). Sized to the heaviest per-row
# work in the battery (document shingling+hashing, ~1 ms/row: 3,000
# rows ≈ the exchange's own scheduling cost on this host); numeric
# per-row work (vector folds, PQ encodes, ~15 µs/row) breaks even far
# higher. Env-tunable per deployment.
try:
    PARALLEL_MIN_ROWS = int(
        os.environ.get("SPARK_GRAFT_PARALLEL_MIN_ROWS", "3000"))
except ValueError:
    PARALLEL_MIN_ROWS = 3000

# Runtime-settable SQL confs every query needs regardless of which
# SparkSession it runs in. The verification driver (and any real user of
# this library) constructs its own bare session without session.py's
# builder confs — round 1 proved the events table is unreadable there
# (parquet TIMESTAMP(NANOS) → PARQUET_TYPE_ILLEGAL without nanosAsLong)
# and timestamp semantics drift without a pinned UTC session timezone.
# All four are dynamic SQLConf entries, so we set them defensively at
# query entry instead of relying on the builder.
_PORTABLE_CONFS = {
    # events.ts is parquet TIMESTAMP(NANOS); Spark has no nanosecond
    # timestamp type — scan as long, convert in load_table (ns → µs
    # truncation, matching DuckDB on the same file).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # the reference computes in naive UTC throughout
    # (layer/python/dask_processing.py:29); DuckDB compares in UTC.
    "spark.sql.session.timeZone": "UTC",
    # InferFiltersFromGenerate re-evaluates expensive generator inputs
    # (measured 7-10× on shingle/explode pipelines — see session.py).
    "spark.sql.optimizer.excludedRules":
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
    # full PushedFilters/ReadSchema in plan strings for plan-contract
    # checks (default 100 chars truncates them)
    "spark.sql.maxMetadataStringLength": "2000",
}


def ensure_portable_session(spark: SparkSession) -> SparkSession:
    """Set the dynamic confs every query depends on, idempotently.

    Safe to call on any session (including one that already has the
    values); memoized on the session object so repeated query dispatch
    costs nothing. Failures are swallowed per-conf so a future
    Spark-Connect session that forbids one key still gets the rest.
    """
    if getattr(spark, "_spark_graft_portable", False):
        return spark
    for k, v in _PORTABLE_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf rejected by session
            pass
    try:
        spark._spark_graft_portable = True
    except Exception:  # pragma: no cover - session forbids attributes
        pass
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str,
               parallel: bool = False) -> DataFrame:
    """Columnar scan of one driver table (pushdown/pruning-eligible).

    ``events.ts`` is parquet TIMESTAMP(NANOS): with
    ``spark.sql.legacy.parquet.nanosAsLong`` it scans as a long of
    nanoseconds; convert to a microsecond timestamp with integer
    truncation — exactly what DuckDB does reading the same file, so the
    oracle comparison stays bit-identical.

    ``parallel=True`` repartitions to the session default parallelism:
    use it for CPU-dense projection pipelines (per-row hashing, array
    transforms) whose source is a single small file — without a shuffle
    downstream they would otherwise run on the file's single input
    partition. At real scale the source has many splits and this
    becomes a cheap (or unnecessary) rebalance.

    The rebalance is GATED on the table's footer row count
    (optimization round 14, measured): below ``PARALLEL_MIN_ROWS`` the
    round-robin exchange costs a full extra stage (~0.3-0.5 s of
    scheduling on this host) while the single-partition compute it
    replaces is milliseconds — the guide §2.4 rule ("a repartition
    someone added for parallelism" is the canonical accidental
    exchange), sized from input metadata so the SAME code keeps the
    rebalance wherever the input is big enough for it to pay.

    ``parallel="force"`` rebalances UNCONDITIONALLY. The row floor is
    calibrated to per-row projection work (~1 ms/row shingling); it is
    WRONG for consumers whose downstream per-partition work is
    super-linear in the rows of THIS scan — the brute-force cosine
    joins broadcast their small side, so the stream side's input
    partitioning is the only parallelism the O(probes x corpus) fold
    work ever gets (optimization round 15, VERDICT r14 item 1: the
    global floor de-parallelized five such queries 1.5-4x at the
    driver's SF). Call sites with that shape opt out of the floor.
    """
    ensure_portable_session(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # events.ts contract: session-timezone TIMESTAMP (µs), regardless of
    # how the driver generated the file. Two observed encodings:
    #   - TIMESTAMP(NANOS): scans as bigint under nanosAsLong → truncate
    #     ns→µs (what DuckDB does on the same file).
    #   - timestamp[us] without tz: scans as TIMESTAMP_NTZ → cast to
    #     TIMESTAMP; the session is pinned UTC so the wall-clock value is
    #     preserved bit-for-bit, matching DuckDB's naive read.
    ts_type = dict(df.dtypes).get("ts")
    if name == "events" and ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif name == "events" and ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    if parallel == "force" or (
            parallel and parquet_rowcount(sf_dir, name) >= PARALLEL_MIN_ROWS):
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def table_files(sf_dir: str, name: str, pattern: str = "*.parquet") -> list:
    """List one driver table's files — single-file or directory-of-parts
    layout — failing LOUDLY on a missing/empty table. Every driver-local
    footer/column helper below goes through this one listing so a layout
    change (hive subdirs, success-marker filtering) has exactly one home,
    and so no caller can silently treat a typo'd table name as empty
    (ADVICE r5; review r9 found six divergent copies of this walk)."""
    import pathlib

    p = pathlib.Path(sf_dir) / f"{name}.parquet"
    files = ([p] if p.is_file()
             else sorted(f for f in p.rglob(pattern) if f.is_file())
             if p.is_dir() else [])
    if not files:
        raise FileNotFoundError(
            f"no parquet data for table {name!r} under {sf_dir!r}")
    return files


@lru_cache(maxsize=256)
def parquet_rowcount(sf_dir: str, name: str) -> int:
    """Exact row count of one driver table from parquet FOOTER metadata —
    a driver-local file-stat read, NO Spark job. Operators that size an
    adaptive knob to the corpus (blocking bits, broadcast-vs-shuffle
    dispatch) use this instead of an eager ``df.count()`` so that merely
    CONSTRUCTING their DataFrame never launches a job (ADVICE r4: eager
    actions at plan-build time break plan inspection and composition).
    On a real cluster the same number comes from the table catalog /
    manifest; footer num_rows is the file-system-only equivalent. A
    missing path or empty directory FAILS (ADVICE r5): a typo'd table
    name silently picking the small-scale configuration is the worst
    failure mode.

    The lru_cache assumes driver tables under an sf_dir are IMMUTABLE
    for the process lifetime (true for every current caller; the tier
    generators write to fresh directories). A future in-process writer
    must invalidate with ``parquet_rowcount.cache_clear()`` or key on
    ``table_fingerprint`` like ``parquet_column_values`` (ADVICE r14).
    """
    import pyarrow.parquet as pq

    return sum(pq.ParquetFile(f).metadata.num_rows
               for f in table_files(sf_dir, name))


def parquet_column_ndv(sf_dir: str, name: str, column: str) -> int:
    """Exact distinct count of ONE column, read driver-locally with
    pyarrow (no Spark job at plan-construction time — ADVICE r4).
    Used where an adaptive knob needs the cardinality of a small
    partitioning column (e.g. the SemDeDup quantizer-cell id). At real
    scale this number IS configuration — a quantizer's k, a partition
    count — or comes from catalog/NDV statistics; reading the column is
    the file-system-only stand-in and is only appropriate for columns
    whose table fits a driver read."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    seen: set = set()
    for f in table_files(sf_dir, name):
        col = pq.read_table(f, columns=[column])[column]
        seen.update(pc.unique(col).to_pylist())
    return len(seen)


_COLUMN_VALUES_CACHE: dict[tuple, list] = {}


def parquet_column_values(sf_dir: str, name: str, column: str) -> list:
    """Sorted distinct values of ONE small-cardinality column, read
    driver-locally with pyarrow — the value-level sibling of
    ``parquet_column_ndv`` (same contract, same ADVICE r4 no-job rule:
    operators that bake a small code/label domain into a generated
    expression need the values, not just the count). Memoized per
    (sf_dir, column, table fingerprint) — the _MERGE_CACHE pattern —
    because callers rebuild their plans repeatedly per battery run and
    the read is a full-column driver scan. Only appropriate for columns
    whose table fits a driver read; at real scale this list IS
    configuration or comes from catalog stats."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    key = (sf_dir, name, column, table_fingerprint(sf_dir, name))
    if key not in _COLUMN_VALUES_CACHE:
        seen: set = set()
        for f in table_files(sf_dir, name):
            col = pq.read_table(f, columns=[column])[column]
            seen.update(pc.unique(col).to_pylist())
        _COLUMN_VALUES_CACHE[key] = sorted(seen)
    return _COLUMN_VALUES_CACHE[key]


def table_fingerprint(sf_dir: str, name: str) -> tuple:
    """Cheap CONTENT fingerprint of one driver table — (name, size,
    mtime_ns) per file, a driver-local stat with NO Spark job. Memo
    keys that must invalidate when the data under an sf_dir is
    regenerated in-session (e.g. tools/make_skew.py rewriting a tier)
    include this alongside the path. Fails loudly on a missing table —
    same contract as ``parquet_rowcount`` (ADVICE r5/r8): a typo'd name
    silently degrading the cache key to path-only is the worst mode."""
    return tuple((f.name, (st := f.stat()).st_size, st.st_mtime_ns)
                 for f in table_files(sf_dir, name, pattern="*"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view for the SQL API."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def write_hive_partitioned_json(df: DataFrame, path: str,
                                partition_cols: list[str],
                                mode: str = "append") -> None:
    """Reference A2/A3: JSON sink under ``key=value`` partition dirs
    (``src/lambda_producer.py:22-27`` builds the same layout by hand).
    Spark's ``partitionBy`` produces it natively and keeps the layout
    partition-prunable for every later scan.
    """
    df.write.mode(mode).partitionBy(*partition_cols).json(path)
