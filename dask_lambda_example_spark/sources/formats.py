"""Format round-trips (SURVEY.md §2.B "Scans / sources / sinks"):
CSV / JSON / ORC / hive-partitioned parquet write→read, plus local-data
ingestion (``createDataFrame``, dask's ``from_pandas``).

Reference anchors: the producer writes JSON under hive-partitioned keys
(``src/lambda_producer.py:22-27``), the consumer reads single JSON
objects (``layer/python/dask_processing.py:17-18``), and the implied
``dd.read_csv/read_json/read_orc/to_*`` family (SURVEY.md §2.B).

Every round-trip query WRITES a deterministic projection of a driver
table to a scratch dir, READS it back with an explicit schema (never
inference — a full extra pass at 100 TB), and aggregates; the DuckDB
oracle computes the same aggregate from the original table, so a
value-hash match proves the sink+source pair preserved the data.

Scale posture: all four sinks shard per-partition (one file per task —
the only write shape that scales); the partitioned-parquet query proves
partition *pruning* on read-back (the layout the producer builds by
hand, ``src/lambda_producer.py:23``, is exactly ``partitionBy``'s).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dask_lambda_example_spark.io import load_table
from dask_lambda_example_spark.registry import query

# Per-process scratch (same isolation _jdbc_opts already has): format
# queries overwrite-and-read-back fixed directory names, so two
# concurrent processes sharing one scratch root race between one
# process's overwrite and the other's read-back — observed as a flaky
# fmt_compaction_small_files when pytest and a parity sweep overlap.
from dask_lambda_example_spark.session import fast_scratch_dir

_SCRATCH = os.path.join(fast_scratch_dir(), "spark_graft_formats",
                        f"pid_{os.getpid()}")
# Single source of truth for the per-PID Derby scratch root: _jdbc_opts
# builds the db path under it and the atexit cleanup removes it — one
# constant, so the two can never drift apart (ADVICE r6: the cleanup
# used to re-derive the path independently).
_JDBC_SCRATCH = os.path.join(fast_scratch_dir(), "spark_graft_jdbc",
                             f"pid_{os.getpid()}")

# Per-PID scratch must not accumulate across runs (ADVICE r5): remove
# this process's root at interpreter exit. ignore_errors — a vanished
# tmpdir or a file still held by the JVM child is not worth a traceback
# during shutdown, and the OS unlinks open files fine on Linux.
import atexit  # noqa: E402
import shutil  # noqa: E402

atexit.register(shutil.rmtree, _SCRATCH, ignore_errors=True)
atexit.register(shutil.rmtree, _JDBC_SCRATCH, ignore_errors=True)


def _dir(name: str) -> str:
    return os.path.join(_SCRATCH, name)


def _jdbc_opts() -> dict:
    """Embedded-Derby JDBC endpoint (the Spark distribution ships the
    Derby driver jars for its metastore, so this needs no install).

    The database path is per-process: Derby's embedded engine holds a
    JVM-wide boot lock on the db directory, so two concurrent test
    processes must not share one. /tmp cleanup is the container's.
    """
    db = os.path.join(_JDBC_SCRATCH, "db")
    return {
        "url": f"jdbc:derby:{db};create=true",
        "driver": "org.apache.derby.jdbc.EmbeddedDriver",
    }


def jdbc_write(df: DataFrame, dbtable: str, opts: dict,
               num_partitions: int = 4, batchsize: int = 1000,
               mode: str = "overwrite") -> DataFrame:
    """Partitioned-parallel JDBC write: ``num_partitions`` concurrent
    connections each streaming JDBC batch INSERTs of ``batchsize`` rows
    — the write-side mirror of the partitioned read. A single-connection
    write (`coalesce(1)`) is the classic JDBC-sink bottleneck: at scale
    the whole cluster funnels through one socket. Parallelism is capped,
    not defaulted to the input's partition count, because each write
    partition holds a connection for its lifetime — a 2000-partition
    frame would open 2000 connections and melt the database; right-size
    to what the target DB's connection pool and write throughput bear.

    Returns the repartitioned frame that was written (so tests can
    assert the pre-write parallelism).
    """
    out = df.repartition(num_partitions)
    (out.write.mode(mode).format("jdbc")
     .options(dbtable=dbtable, batchsize=str(batchsize),
              isolationLevel="READ_COMMITTED", **opts).save())
    return out


@query(
    "fmt_csv_roundtrip",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey,
           length(n_name) AS name_len
    FROM nation
    """,
)
def fmt_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink → CSV scan with explicit schema (``dd.read_csv`` /
    ``to_csv``). Header on, no inference on read-back."""
    path = _dir("nation_csv")
    n = load_table(spark, sf_dir, "nation")
    n.write.mode("overwrite").option("header", True).csv(path)
    back = (
        spark.read.schema("n_nationkey int, n_name string, n_regionkey int")
        .option("header", True).csv(path)
    )
    return back.select(
        "n_nationkey", "n_name", "n_regionkey",
        F.length("n_name").alias("name_len"))


@query(
    "fmt_json_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_orders,
           round(sum(o_totalprice), 6) AS total
    FROM orders WHERE o_orderkey < 500
    GROUP BY o_orderstatus
    """,
)
def fmt_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink → JSON scan with explicit schema (the producer's
    object-per-record JSON, ``src/lambda_producer.py:25``, batch form).
    Timestamps round-trip ISO-8601; the aggregate proves value fidelity."""
    path = _dir("orders_json")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    o.select("o_orderkey", "o_orderstatus", "o_totalprice") \
        .write.mode("overwrite").json(path)
    back = spark.read.schema(
        "o_orderkey bigint, o_orderstatus string, o_totalprice double"
    ).json(path)
    return (
        back.groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orders"),
             F.round(F.sum("o_totalprice"), 6).alias("total"))
    )


@query(
    "fmt_jsonl_gz_roundtrip",
    oracle="""
    SELECT lang,
           count(*)                 AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           min(doc_id)              AS first_doc
    FROM documents
    GROUP BY lang
    """,
)
def fmt_jsonl_gz_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gzip-compressed JSON-lines sink → scan: THE LLM-corpus
    interchange format (one JSON document per line, ``.jsonl.gz`` —
    what public text corpora actually ship as). Both directions stay
    JVM-side: the sink writes with ``compression=gzip``, the scan reads
    the ``.json.gz`` part files natively with an explicit schema (no
    Python, no inference pass). Complements ``src_warc_scan``: WARC is
    the custom-parser path, this is the built-in codec path.

    Scale: gzip is NOT splittable — one part file = one read task — so
    the sink's file count IS the read parallelism; writing from the
    source partitioning keeps part files bounded. (At 100 TB prefer
    zstd/parquet internally; .jsonl.gz is the interchange edge.)"""
    path = _dir("documents_jsonl_gz")
    d = load_table(spark, sf_dir, "documents")
    d.select("doc_id", "lang", "text") \
        .write.mode("overwrite").option("compression", "gzip").json(path)
    back = spark.read.schema("doc_id bigint, lang string, text string") \
        .json(path)
    return (
        back.groupBy("lang")
        .agg(F.count("*").alias("n_docs"),
             F.sum(F.length("text")).alias("total_chars"),
             F.min("doc_id").alias("first_doc"))
    )


@query(
    "fmt_orc_roundtrip",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_lines,
           round(sum(l_quantity), 6) AS sum_qty
    FROM lineitem WHERE l_orderkey < 1000
    GROUP BY l_returnflag
    """,
)
def fmt_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink → ORC scan (``dd.read_orc``): the other columnar format,
    same pushdown/pruning machinery as parquet."""
    path = _dir("lineitem_orc")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    li.select("l_orderkey", "l_returnflag", "l_quantity") \
        .write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return (
        back.groupBy("l_returnflag")
        .agg(F.count("*").alias("n_lines"),
             F.round(F.sum("l_quantity"), 6).alias("sum_qty"))
    )


@query(
    "fmt_partitioned_parquet_pruned",
    oracle="""
    SELECT user_id, count(*) AS n_views, round(sum(value), 6) AS sum_value
    FROM events WHERE event_type = 'view'
    GROUP BY user_id
    """,
)
def fmt_partitioned_parquet_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned parquet write (``partitionBy`` — the layout the
    producer hand-builds, ``src/lambda_producer.py:23``) → read-back
    where the ``event_type='view'`` predicate prunes partitions: only
    the ``event_type=view/`` directory is scanned (PartitionFilters in
    the plan; tests/test_plans.py asserts it)."""
    path = _dir("events_by_type")
    e = load_table(spark, sf_dir, "events")
    e.select("event_id", "user_id", "value", "event_type") \
        .write.mode("overwrite").partitionBy("event_type").parquet(path)
    back = spark.read.parquet(path).filter(F.col("event_type") == "view")
    return (
        back.groupBy("user_id")
        .agg(F.count("*").alias("n_views"),
             F.round(F.sum("value"), 6).alias("sum_value"))
    )


@query(
    "fmt_jdbc_roundtrip",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 6) AS total
    FROM orders WHERE o_orderkey < 2000
    GROUP BY o_orderpriority
    """,
)
def fmt_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JDBC sink → JDBC scan (``dd.read_sql_table`` / ``spark.read.jdbc``,
    SURVEY.md §2.B scans) against embedded Derby.

    Both directions are *partitioned*: the write goes through
    ``jdbc_write`` — 4 concurrent connections, batched INSERTs
    (embedded Derby row-locks, so same-JVM concurrent writers are fine)
    — and the read-back splits the key range into 4 concurrent queries
    via ``partitionColumn`` + ``numPartitions``. Those are the only
    JDBC shapes that survive scale: unpartitioned, one task pulls (or
    pushes) the whole table through one connection.
    """
    opts = _jdbc_opts()
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    jdbc_write(o.select("o_orderkey", "o_orderpriority", "o_totalprice"),
               "orders_t", opts)
    back = (
        spark.read.format("jdbc")
        .options(dbtable="orders_t", partitionColumn="o_orderkey",
                 lowerBound=0, upperBound=2000, numPartitions=4, **opts)
        .load()
    )
    return (
        back.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"),
             F.round(F.sum("o_totalprice"), 6).alias("total"))
    )


@query(
    "fmt_local_data_broadcast",
    oracle="""
    SELECT h.hemisphere, count(*) AS n_nations
    FROM nation n
    JOIN (VALUES (0, 'south'), (1, 'north'), (2, 'north'),
                 (3, 'north'), (4, 'south')) AS h(r_key, hemisphere)
      ON n.n_regionkey = h.r_key
    GROUP BY h.hemisphere
    """,
)
def fmt_local_data_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local data → DataFrame (``createDataFrame``; dask
    ``from_pandas``/``from_dict``) broadcast-joined to a table — the
    canonical small-dim enrichment: the 5-row lookup ships to every
    executor, the big side never shuffles."""
    lookup = spark.createDataFrame(
        [(0, "south"), (1, "north"), (2, "north"), (3, "north"), (4, "south")],
        schema="r_key int, hemisphere string")
    n = load_table(spark, sf_dir, "nation")
    return (
        n.join(F.broadcast(lookup), n.n_regionkey == lookup.r_key)
        .groupBy("hemisphere")
        .agg(F.count("*").alias("n_nations"))
    )


@query(
    "fmt_dynamic_partition_pruning",
    oracle="""
    WITH dim(event_type, category) AS (VALUES
        ('view', 'engagement'), ('click', 'engagement'),
        ('purchase', 'revenue'), ('signup', 'acquisition'))
    SELECT d.category, e.event_type, count(*) AS n,
           round(sum(e.value), 6) AS sum_value
    FROM events e JOIN dim d USING (event_type)
    WHERE d.category = 'engagement'
    GROUP BY d.category, e.event_type
    """,
)
def fmt_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact table is hive-partitioned on
    the join key and the partitions to read are only known AFTER the
    dim-side filter runs — Catalyst injects a runtime
    ``dynamicpruningexpression`` into the scan's PartitionFilters
    (reusing the dim's broadcast as the IN-list), so the fact scan
    reads 2 of 4 directories even though the query text never names
    them. THE mechanism that makes star-schema joins over
    date/category-partitioned 100 TB facts read only the slice the dim
    selects. Plan-asserted in tests/test_plans.py."""
    path = _dir("events_dpp")
    e = load_table(spark, sf_dir, "events")
    e.select("event_id", "user_id", "value", "event_type") \
        .write.mode("overwrite").partitionBy("event_type").parquet(path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("view", "engagement"), ("click", "engagement"),
         ("purchase", "revenue"), ("signup", "acquisition")],
        "event_type string, category string")
    return (
        fact.join(F.broadcast(dim), "event_type")
        .filter(F.col("category") == "engagement")
        .groupBy("category", "event_type")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 6).alias("sum_value"))
    )


N_SMALL_FILES = 64
N_COMPACTED = 4


@query(
    "fmt_compaction_small_files",
    oracle=f"""
    SELECT {N_SMALL_FILES} AS n_files_small, {N_COMPACTED} AS n_files_compacted,
           count(*) AS n_rows, count(DISTINCT user_id) AS n_users,
           round(sum(value), 6) AS sum_value
    FROM events
    """,
)
def fmt_compaction_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction — the maintenance job every file-based
    100 TB table needs: a fragmented write (64 shards) is rewritten to
    4 right-sized files, and the query proves BOTH the layout contract
    (``repartition(n)`` yields exactly n files — the counts in the
    output are assertions, read back from the filesystem) and bit-level
    data preservation across the rewrite. ``repartition`` gives exact
    output sizing via one round-robin shuffle; plain ``coalesce`` skips
    the shuffle but only merges within existing partitions (can't
    split, can skew) — the right default for mild compaction,
    repartition for exact file-size SLAs. ``maxRecordsPerFile`` is the
    complementary knob bounding the other direction."""
    import os

    small = _dir("compact_small")
    big = _dir("compact_big")
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value")
    e.repartition(N_SMALL_FILES).write.mode("overwrite").parquet(small)
    back = spark.read.parquet(small)
    back.repartition(N_COMPACTED).write.mode("overwrite").parquet(big)

    def count_parquet(path: str) -> int:
        return len([f for f in os.listdir(path.removeprefix("file://"))
                    if f.endswith(".parquet")])

    comp = spark.read.parquet(big)
    return comp.agg(
        F.lit(count_parquet(small)).alias("n_files_small"),
        F.lit(count_parquet(big)).alias("n_files_compacted"),
        F.count("*").alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


N_RANGE_FILES = 4


@query(
    "fmt_range_sorted_layout",
    oracle=f"""
    SELECT CAST(1 AS BOOLEAN) AS ranges_disjoint,
           {N_RANGE_FILES} AS n_files,
           count(*) AS n_rows,
           CAST(round(sum(l_extendedprice), 6) AS REAL) AS sum_price
    FROM lineitem
    """,
)
def fmt_range_sorted_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-clustered data layout ("Z-order lite", one dimension):
    ``repartitionByRange`` + ``sortWithinPartitions`` on ``l_shipdate``
    writes parquet whose files cover DISJOINT date ranges with sorted
    row groups — so every engine's footer-stats pruning (min/max zone
    maps) can skip whole files/row-groups for date predicates. The
    contract is verified from the parquet footers themselves (pyarrow):
    per-file (min, max) intervals must not overlap; the boolean in the
    output row is that assertion, alongside bit-level data preservation
    checked by the oracle. At 100 TB this is the nightly clustering
    rewrite that makes time-ranged scans cheap without a partition
    column per day."""
    import pyarrow.parquet as pq

    path = _dir("range_sorted")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice")
    (li.repartitionByRange(N_RANGE_FILES, "l_shipdate")
     .sortWithinPartitions("l_shipdate")
     .write.mode("overwrite").parquet(path))

    local = path.removeprefix("file://")
    spans = []
    for f in os.listdir(local):
        if not f.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(local, f))
        idx = md.schema.names.index("l_shipdate")
        lo = min(md.row_group(i).column(idx).statistics.min
                 for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max
                 for i in range(md.num_row_groups))
        spans.append((lo, hi))
    spans.sort()
    disjoint = all(spans[i][1] <= spans[i + 1][0]
                   for i in range(len(spans) - 1))

    back = spark.read.parquet(path)
    return back.agg(
        F.lit(bool(disjoint)).alias("ranges_disjoint"),
        F.lit(len(spans)).alias("n_files"),
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_extendedprice"), 6).cast("float")
        .alias("sum_price"),
    )


N_ZORDER_FILES = 16
ZORDER_BITS = 16        # bits per dimension; 2x16 = 32-bit z fits a long
ZORDER_BLOCK_BITS = 8   # file-boundary quantization: top-8 z bits = 16x16 grid


def _footer_minmax(sf_dir: str, table: str, column: str) -> tuple[int, int]:
    """Global (min, max) of one column from parquet FOOTER statistics —
    driver-local, no Spark job (the parquet_rowcount discipline). Fails
    loudly when a row group carries no statistics for the column (a
    stats-disabled writer): callers bake these bounds into generated
    expressions, and None silently becoming the normalization range is
    the worst mode."""
    import pyarrow.parquet as pq

    from dask_lambda_example_spark.io import table_files

    lo, hi = None, None
    for f in table_files(sf_dir, table):
        md = pq.read_metadata(f)
        idx = md.schema.names.index(column)
        for i in range(md.num_row_groups):
            st = md.row_group(i).column(idx).statistics
            if st is None or not st.has_min_max:
                raise ValueError(
                    f"no min/max statistics for column {column!r} in "
                    f"{f} row group {i} — cannot derive z-order "
                    f"normalization bounds")
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    return lo, hi


def zorder_key(a, a_range: tuple[int, int], b, b_range: tuple[int, int],
               n_bits: int = ZORDER_BITS):
    """Morton/Z-order interleave of two int columns as ONE JVM bitwise
    expression (no UDF): bit i of ``a`` lands at position 2i, bit i of
    ``b`` at 2i+1. Each column is first NORMALIZED to the full n_bits
    range using its (min, max) — without this, the column with the
    wider raw domain owns every high bit and the interleave degenerates
    to a linear sort on it (the classic Z-order pitfall; Delta's
    OPTIMIZE ZORDER normalizes via per-column range-partition ids the
    same way). Built by a Python loop over bit positions but evaluated
    entirely in whole-stage codegen."""
    top = (1 << n_bits) - 1

    def norm(col, rng):
        lo, hi = rng
        return ((col.cast("long") - F.lit(int(lo))) * top
                / F.lit(max(int(hi) - int(lo), 1))).cast("long")

    an, bn = norm(a, a_range), norm(b, b_range)
    z = F.lit(0).cast("long")
    for i in range(n_bits):
        z = (z
             .bitwiseOR(F.shiftleft(F.shiftright(an, i)
                                    .bitwiseAND(F.lit(1)), 2 * i))
             .bitwiseOR(F.shiftleft(F.shiftright(bn, i)
                                    .bitwiseAND(F.lit(1)), 2 * i + 1)))
    return z


@query(
    "fmt_zorder_layout",
    oracle=f"""
    SELECT CAST(1 AS BOOLEAN) AS both_dims_prune,
           {N_ZORDER_FILES} AS n_files,
           count(*) AS n_rows,
           CAST(round(sum(l_extendedprice), 6) AS REAL) AS sum_price
    FROM lineitem
    """,
)
def fmt_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-dimensional sort clustering: Z-order (Morton) layout on
    (l_partkey, l_suppkey) — the multi-column sibling of
    ``fmt_range_sorted_layout``. A linear sort makes footer zone maps
    tight on ONE column and useless on every other; interleaving the
    two keys' bits makes each file cover a quad-tree block of the 2-D
    key space, so min/max footer stats are tight on BOTH columns and a
    predicate on EITHER key skips most files. This is the
    Delta/Iceberg `OPTIMIZE ZORDER BY` clustering rewrite, built from
    Spark primitives: a codegen'd bit-interleave expression +
    ``repartitionByRange`` on the z-value + ``sortWithinPartitions``.

    Files are QUANTIZED z-ranges with DETERMINISTIC boundaries: the
    writer first aggregates the exact row count per top-8-bit z block
    id (a 16×16 fine quad grid — ≤256 rows, driver-safe at any corpus
    size; the stats pre-pass every production OPTIMIZE/cluster rewrite
    runs), greedily cuts the block histogram into ``N_ZORDER_FILES``
    equal-MASS contiguous runs, and routes rows to their file id with
    a generated when-chain + ``partitionBy`` — one file per id by
    construction.  The two earlier formulations both left a SAMPLER in
    the path and flaked in-battery: raw-z ``repartitionByRange``
    degenerates because the true quantiles sit exactly ON block edges
    (one straddling row poisons a file's min/max footer span — the
    r14 sf0.1 ledger's 3/16), and block-id range partitioning still
    derives its bounds from ``repartitionByRange``'s reservoir sample,
    whose seed is the exchange RDD's id — i.e. the query's position in
    the battery — which re-flaked at 3/16 in this round's sf0.1 noop
    ledger while 12/12 fresh-session runs passed.  Exact-histogram
    boundaries remove the sampler entirely: file edges land BETWEEN
    fine blocks, never inside — every file is a union of whole
    1/16-extent quad cells, its span is quantized, and the layout is a
    pure function of the data.  Equal-mass cuts also keep the writers
    busy when the two keys are CORRELATED (a diagonal key space
    populates only ~6 of the 16 coarse blocks — the replica-built sf10
    tier does exactly this): each of the 16 ids carries ~1/16 of the
    rows, so the ``repartition(N, fid)`` write runs ~10-16 concurrent
    writers (hash collisions idle a few tasks; a task holding two ids
    still emits one file per id via ``partitionBy``).

    The contract is measured from the parquet footers, not asserted
    from theory: for the central 10% band of each dimension's domain,
    the fraction of files whose per-file [min, max] excludes the band
    must be ≥ 25% for BOTH dimensions (aligned quad quarters give
    8/16 = 50% per dimension; a linear sort gives ~94% on its own
    column and 0% on the other). Violations raise — the oracle row
    additionally pins bit-level data preservation. At 100 TB this is
    the nightly clustering rewrite that serves range scans on two
    access paths from one copy of the data, with more block bits per
    tier of file count."""
    import pyarrow.parquet as pq

    path = _dir("zorder")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice")
    pk_rng = _footer_minmax(sf_dir, "lineitem", "l_partkey")
    sk_rng = _footer_minmax(sf_dir, "lineitem", "l_suppkey")
    # top-8 z bits = the 16x16 fine quad grid; DETERMINISTIC equal-mass
    # split over the DISCRETE block ids from the exact histogram (no
    # sampler in the path — see the docstring), z tie-broken within
    # each file.
    zed = (li.withColumn("z", zorder_key(F.col("l_partkey"), pk_rng,
                                         F.col("l_suppkey"), sk_rng))
             .withColumn("zb", F.shiftrightunsigned(
                 F.col("z"), 2 * ZORDER_BITS - ZORDER_BLOCK_BITS)
                 .cast("int")))
    hist = sorted(map(tuple, zed.groupBy("zb").count().collect()))
    total = sum(c for _, c in hist)
    if len(hist) < N_ZORDER_FILES:
        raise ValueError(
            f"only {len(hist)} populated z blocks < {N_ZORDER_FILES} "
            "target files — the block grid is too coarse for this "
            "corpus; raise ZORDER_BLOCK_BITS")
    # greedy equal-mass cuts AFTER whole blocks: bounds[i] = last zb of
    # file i (never inside a block), last file takes the remainder. The
    # blocks-left == cuts-left clause forces the tail cuts when a heavy
    # block swallowed more than one quota, so exactly N files result.
    bounds: list[int] = []
    cum = 0
    for idx, (zb, c) in enumerate(hist):
        cum += c
        cuts_left = (N_ZORDER_FILES - 1) - len(bounds)
        blocks_left = len(hist) - idx - 1
        if cuts_left and (
                cum >= total * (len(bounds) + 1) // N_ZORDER_FILES
                or blocks_left <= cuts_left):
            bounds.append(zb)
    fid = F.lit(len(bounds))
    for i in range(len(bounds) - 1, -1, -1):
        fid = F.when(F.col("zb") <= bounds[i], i).otherwise(fid)
    (zed.withColumn("fid", fid.cast("int"))
        .repartition(N_ZORDER_FILES, "fid")
        .sortWithinPartitions("fid", "z")
        .drop("z", "zb")
        .write.mode("overwrite").partitionBy("fid").parquet(path))

    local = path.removeprefix("file://")
    spans: dict[str, list[tuple[int, int]]] = {"l_partkey": [],
                                               "l_suppkey": []}
    part_files = sorted(
        os.path.join(r, f) for r, _, fs in os.walk(local) for f in fs
        if f.endswith(".parquet"))
    for f in part_files:
        md = pq.read_metadata(f)
        for col, acc in spans.items():
            idx = md.schema.names.index(col)
            sts = [md.row_group(i).column(idx).statistics
                   for i in range(md.num_row_groups)]
            if any(st is None or not st.has_min_max for st in sts):
                raise ValueError(f"written z-order file {f} lacks "
                                 f"min/max statistics for {col!r}")
            acc.append((min(st.min for st in sts),
                        max(st.max for st in sts)))
    n_files = len(spans["l_partkey"])
    for col, acc in spans.items():
        lo = min(s[0] for s in acc)
        hi = max(s[1] for s in acc)
        band_lo = lo + (hi - lo) * 45 // 100
        band_hi = lo + (hi - lo) * 55 // 100
        skipped = sum(1 for s in acc if s[1] < band_lo or s[0] > band_hi)
        if skipped < n_files * 0.25:
            raise ValueError(
                f"z-order zone maps too loose on {col}: only "
                f"{skipped}/{n_files} files skippable for the central "
                f"band [{band_lo}, {band_hi}]")

    back = spark.read.parquet(path)
    return back.agg(
        F.lit(True).alias("both_dims_prune"),
        F.lit(n_files).alias("n_files"),
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_extendedprice"), 6).cast("float")
        .alias("sum_price"),
    )
