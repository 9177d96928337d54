"""Graph analytics over the star schema: PageRank on the
customer↔supplier trade graph.

North-star extension tier (no reference analog — the anchor is the
reference's arbitrary-dataframe-compute contract,
``layer/python/dask_processing.py:26-27``). Together with the
connected-components clustering in ``dedup.py`` this covers the
iterative-algorithm surface: a fixed-point loop whose every round is
ordinary DataFrame joins/aggregations, driver-side control flow only.

Scale posture: the rank vector is |nodes| rows (tiny next to the edge
set); each iteration is ONE shuffle of the edge list keyed by
destination, with map-side partial aggregation of rank contributions.
Edge list and degrees are computed once and ``localCheckpoint``-ed so
the iteration's plan size stays constant. Fixed iteration count keeps
the computation deterministic and lets the DuckDB oracle run the
IDENTICAL unrolled recurrence — the whole iterative pipeline is
value-checked, not rows-only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dask_lambda_example_spark.io import load_table
from dask_lambda_example_spark.registry import query

PR_ITERS = 3
PR_DAMP = 0.85


# Non-recursive CTEs defining the trade graph: the prelude every
# trade-graph PageRank oracle shares. A different prelude (same
# edges/nodes contract) retargets the identical unrolled recurrence at
# another graph — see the crawl link graph below.
_TRADE_PR_PRELUDE = """
    e0 AS (
        SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
    nodes AS (SELECT DISTINCT src AS node FROM edges)"""


def _pagerank_oracle(prelude: str = _TRADE_PR_PRELUDE) -> str:
    """Unrolled PageRank recurrence over whatever graph ``prelude``
    defines (CTEs ``edges(src, dst)`` and ``nodes(node)``)."""
    rec = """
    r{i} AS (
        SELECT n.node,
               0.15 + {damp} * coalesce(sum(p.rank / d.outdeg), 0) AS rank
        FROM nodes n
        LEFT JOIN edges e ON e.dst = n.node
        LEFT JOIN r{prev} p ON p.node = e.src
        LEFT JOIN deg d ON d.src = e.src
        GROUP BY n.node)"""
    iters = ",".join(
        rec.format(i=i + 1, prev=i, damp=PR_DAMP) for i in range(PR_ITERS))
    return f"""
    WITH {prelude},
    deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
    r0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS rank FROM nodes),
    {iters}
    SELECT node, CAST(round(rank, 6) AS REAL) AS rank
    FROM r{PR_ITERS}
    """


# The trade-graph edge build runs a DISTINCT over the orders⋈lineitem
# pair projection — |lineitem| input rows. With the default 32 shuffle
# partitions that is a ~2M-entry string-keyed hash map per task at the
# 100×-bench tier, and 32 of them concurrently exceeded the executor
# aggregate-memory pool under the production-shape 16 g heap (measured:
# AGGREGATE_OUT_OF_MEMORY at sf10 — the round-9 90 g heap had masked
# it). Above this input bound the build repartitions on the pair key
# FIRST, sized so each post-exchange partition's dedup map holds
# ~EDGE_BUILD_ROWS_PER_PART rows: the aggregate's required distribution
# is then already satisfied, so the whole dedup runs as small
# per-partition maps and no task ever builds a giant one. Below the
# bound the plan is unchanged (map-side partial dedup stays worthwhile
# when the map fits). This is SCALE.md's partition-width rule (width ∝
# state rows) applied at plan-build time from footer metadata.
EDGE_BUILD_REPART_MIN_ROWS = 8_000_000
EDGE_BUILD_ROWS_PER_PART = 500_000


def _edge_ckpt_level(e_bound: int):
    """Storage level for a materialized edge list of ``e_bound`` row
    bound: ``None`` (Spark's memory-and-disk default) while the edges
    are broadcast-plan material, ``MEMORY_AND_DISK`` (serialized — PySpark 4's
    default-serialized level; the deserialized variant is the separate
    ``MEMORY_AND_DISK_DESER``) above the
    dispatch bound. Round-11, measured twice at sf10 under the 16 g
    production heap: a 100 M-row edge checkpoint held as
    memory-greedy blocks competes with the query's own unroll/shuffle
    memory and — standalone-green notwithstanding — OOM'd the
    SparkContext mid-battery; round 11 priced that guard as straight
    ``DISK_ONLY``, which cost PR_ITERS sequential re-reads of blocks a
    healthy session could have kept resident (the 1.454x paired rcte
    trade, VERDICT r12 item 3). ``MEMORY_AND_DISK`` keeps the OOM
    guard — blocks spill to disk under storage pressure instead of
    pinning the heap, and the serialized form keeps the resident
    footprint far below deserialized caching — while letting an idle 16 g
    session serve the recursion levels from memory
    (BENCH_ab_rcte_r13.json pairs it against the r9/DISK_ONLY forms;
    the r9-failure shape — four consecutive 100 M-edge graph queries
    at sf10/16 g — re-run green). At cluster scale the judgement is
    unchanged: a multi-TB edge list is spill-tier data, never
    PINNED executor-storage-tier.

    ROLLBACK TRIGGER (ADVICE r13: the green re-run of the r9 failure
    shape is one sample of a nondeterministic OOM, and under the
    unified memory manager cached blocks are protected from execution
    eviction up to ``spark.memory.storageFraction`` — a per-context
    core conf this query cannot lower from a ``newSession``): if ANY
    battery run OOMs the SparkContext with graph checkpoints resident,
    set ``SPARK_GRAFT_EDGE_CKPT_LEVEL=DISK_ONLY`` — that restores the
    round-11 hard guard verbatim (no storage blocks in the heap, the
    priced 1.454x rcte trade) without a code change, and the incident
    wall belongs in SCALE.md next to the env flip."""
    from pyspark import StorageLevel

    if e_bound <= PR_BROADCAST_MAX_EDGE_ROWS:
        return None
    level = os.environ.get("SPARK_GRAFT_EDGE_CKPT_LEVEL", "")
    if level:
        return getattr(StorageLevel, level)
    return StorageLevel.MEMORY_AND_DISK


def _trade_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customer↔supplier trading pairs ``(src, dst)`` from the
    order lines — the edge build shared by the PageRank family, with
    the dedup aggregate's partition count scaled from parquet footer
    row counts (no job) so its hash state fits executor memory at any
    tier."""
    from dask_lambda_example_spark.io import parquet_rowcount

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
                F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"))
    )
    n_li = parquet_rowcount(sf_dir, "lineitem")
    if n_li > EDGE_BUILD_REPART_MIN_ROWS:
        n_part = min(2048, n_li // EDGE_BUILD_ROWS_PER_PART)
        pairs = pairs.repartition(n_part, "src", "dst")
    return pairs.distinct()


def _pr_broadcast_loop(nodes: DataFrame, edges: DataFrame,
                       deg: DataFrame | None = None) -> DataFrame:
    """The broadcast-formulation recurrence shared by every PageRank
    query: rank and degree vectors are |nodes|-sized → broadcast; each
    iteration's only shuffle groups contributions by destination. The
    caller owns the edge list's materialization (``localCheckpoint``)
    and its node/edge column contract (``nodes(node)``,
    ``edges(src, dst)``).

    The degree vector and every non-final rank vector are MATERIALIZED
    (``localCheckpoint`` of |nodes|-sized frames — cheap) rather than
    left lazy (round-11, measured): un-materialized, iteration i's
    broadcast build re-executes iterations 1..i-1 inline — O(iters²)
    scans of the edge list, with every nested broadcast relation live
    in ONE job's heap — which walled the r10 sf10 run >10 min on a
    90 g heap and OOM'd the SparkContext outright on the production
    16 g heap. Materialized, each iteration is one bounded job over
    the checkpointed edges and the broadcasts build from |nodes|-row
    LogicalRDDs.

    ``deg`` may be passed in pre-materialized (the trade-graph callers
    derive the node set FROM it — deg's keys are exactly the distinct
    edge sources, so one aggregation+checkpoint serves both and the
    separate nodes-distinct job disappears); when ``None`` it is built
    and checkpointed here exactly as before (crawl graph, whose node
    set is the document corpus, not the edge sources)."""
    if deg is None:
        deg = (edges.groupBy("src").agg(F.count("*").alias("outdeg"))
               .localCheckpoint(eager=True))
    ranks = nodes.select("node", F.lit(1.0).alias("rank"))
    for i in range(PR_ITERS):
        contrib = (
            edges.join(F.broadcast(ranks),
                       edges.src == F.col("node"))
            .join(F.broadcast(deg), "src")
            .select(F.col("dst"),
                    (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select("node",
                    (0.15 + PR_DAMP * F.coalesce(F.col("in_sum"), F.lit(0.0)))
                    .alias("rank"))
        )
        if i < PR_ITERS - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(
        "node", F.round("rank", 6).cast("float").alias("rank"))


def _pr_shuffled_loop(nodes: DataFrame, edges: DataFrame,
                      deg: DataFrame) -> DataFrame:
    """The co-partitioned (nothing-broadcast) recurrence shared by the
    trade- and crawl-graph families: every per-iteration join is a
    sort-free ShuffledHashJoin (``shuffle_hash`` hints — SMJ would
    re-sort the static edge list every round and auto-broadcast would
    re-create the broadcast sibling's plan at test scale). The caller
    owns edge materialization (``repartition(n, "src")`` +
    ``localCheckpoint`` so the LogicalRDD advertises its partitioning
    and no iteration re-shuffles the edges) and the ``nodes(node)`` /
    ``edges(src, dst)`` / ``deg(src, outdeg)`` column contract."""
    ranks = nodes.select("node", F.lit(1.0).alias("rank"))
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(ranks.hint("shuffle_hash"),
                       edges.src == F.col("node"))
            .join(deg.hint("shuffle_hash"), "src")
            .select(F.col("dst"),
                    (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            nodes.join(contrib.hint("shuffle_hash"),
                       nodes.node == contrib.dst, "left")
            .select("node",
                    (0.15 + PR_DAMP * F.coalesce(F.col("in_sum"), F.lit(0.0)))
                    .alias("rank"))
        )
    return ranks.select(
        "node", F.round("rank", 6).cast("float").alias("rank"))


@query("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, {n} fixed iterations) on the bipartite
    customer↔supplier graph induced by order lines — the "who are the
    hub suppliers / anchor customers" question. Edges are the DISTINCT
    trading pairs, symmetrized so every node has out-degree ≥ 1 (no
    dangling-mass correction needed).

    Per iteration: contributions = rank/outdeg join on the edge
    source (rank and degree vectors are |nodes|-sized → broadcast),
    then one shuffle grouping contributions by destination. The edge
    list is the only large operand and it is scanned, never mutated.
    This broadcast formulation is the small-graph fast path; when the
    node set outgrows broadcast, ``graph_pagerank_copartitioned``
    (below) runs the identical recurrence with the edges
    pre-partitioned by ``src`` and nothing broadcast — ``pagerank_auto``
    dispatches between them from catalog metadata. Fixed iterations +
    REAL cast make the float fixed-point oracle-checkable
    bit-for-bit.

    Materialization discipline (round-11): the edge checkpoint builds
    with AQE off on a dedicated child session so the block width stays
    the dedup aggregate's footer-scaled partition count (AQE would
    coalesce sf10's ~240 partitions to ~24 × multi-hundred-MB blocks —
    the 16 g-heap hazard class of SCALE.md's partition-width rule),
    and the |nodes|-sized node set is checkpointed so the loop never
    re-aggregates the full edge list to re-derive it; above the
    dispatch edge bound the edge blocks persist serialized
    memory-and-disk (``_edge_ckpt_level``)."""
    from dask_lambda_example_spark.io import parquet_rowcount

    spark = spark.newSession()
    e_bound = 2 * parquet_rowcount(sf_dir, "lineitem")
    e0 = _trade_pairs(spark, sf_dir)
    aqe_prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        # the union of the two directed halves is already distinct: e0
        # is distinct and the 'c'/'s' prefixes make src/dst namespaces
        # disjoint
        edges = (e0.union(e0.select(F.col("dst").alias("src"),
                                    F.col("src").alias("dst")))
                 .localCheckpoint(eager=True,
                                  storageLevel=_edge_ckpt_level(e_bound)))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_prev)
    # ONE aggregation+checkpoint yields both loop vectors: the degree
    # table's keys ARE the distinct edge sources (= the node set of the
    # symmetrized graph), so the former separate nodes-distinct
    # checkpoint job is a projection of deg (optimization round 14).
    deg = (edges.groupBy("src").agg(F.count("*").alias("outdeg"))
           .localCheckpoint(eager=True))
    nodes = deg.select(F.col("src").alias("node"))
    return _pr_broadcast_loop(nodes, edges, deg)


graph_pagerank.__doc__ = graph_pagerank.__doc__.format(n=PR_ITERS)


@query("graph_pagerank_copartitioned", oracle=_pagerank_oracle())
def graph_pagerank_copartitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank, co-partitioned formulation — identical recurrence (and
    oracle) to ``graph_pagerank``, different physical plan: NOTHING is
    broadcast. ``graph_pagerank`` broadcasts the |nodes|-sized rank and
    degree vectors every iteration, which is the right plan while they
    fit in an executor — and a dead end on a billion-node graph (VERDICT
    r4). Here the edge list is hash-partitioned by ``src`` ONCE
    (repartition + localCheckpoint pins the partitioning in the
    LogicalRDD, so Catalyst knows every later ``src``-keyed operator is
    already satisfied), and each iteration is:

      1. shuffled-hash join edges⋈ranks on src==node — the edge side
         moves ZERO bytes (its partitioning matches the join
         requirement); only the |nodes|-sized rank vector shuffles,
      2. co-partitioned join with the degree vector (derived from the
         checkpointed edges, so it is born partitioned by ``src``),
      3. ONE aggregation shuffle of contributions keyed by ``dst``.

    ``shuffle_hash`` hints keep the per-iteration joins sort-free (SMJ
    would re-sort the static edge list every round) and suppress the
    auto-broadcast that would re-create the sibling's plan at test
    scale. Net per-iteration network cost: O(|nodes|) rank rows + the
    contribution shuffle — never O(|edges|) and never a broadcast.
    ``pagerank_auto`` dispatches between the two formulations from
    catalog metadata (footer row counts — no job) under
    ``PR_BROADCAST_MAX_NODES``.

    Session hygiene (ADVICE r5): the whole query runs on a dedicated
    ``spark.newSession()`` child (same SparkContext, ISOLATED SQLConf),
    so disabling AQE for the checkpoint build cannot de-optimize a
    query planned concurrently on the caller's session. The
    checkpointed edge blocks are reclaimed by ContextCleaner once the
    returned DataFrame (the only plan referencing them) is collected
    and released — session.py pins ``spark.cleaner.periodicGC.interval``
    to 5 min so reclamation is bounded, not session-lifetime.

    Partition-width rule (round-11, measured): the checkpoint
    MATERIALIZES the full edge list into storage blocks, one per
    partition, built concurrently by every core — at sf10's 120 M-row
    edge bound over the default 32 partitions that is 32 simultaneous
    ~3 M-row block builds, which OOM'd the 16 g production heap
    (stage-119 ``java.lang.OutOfMemoryError`` during
    ``localCheckpoint``). The CHILD session's shuffle width is
    therefore scaled from the footer edge bound (~``EDGE_BUILD_ROWS_
    PER_PART`` rows per partition, the same rule the edge-build dedup
    uses), which sizes the checkpoint blocks AND every loop exchange
    consistently — the plan shape (and its asserts) are unchanged,
    only the partition count grows with the data."""
    from dask_lambda_example_spark.io import parquet_rowcount

    spark = spark.newSession()
    try:
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    except ValueError:  # e.g. "auto" under some AQE configurations
        n_part = spark.sparkContext.defaultParallelism
    e_bound = 2 * parquet_rowcount(sf_dir, "lineitem")
    n_part = max(n_part, min(2048, e_bound // EDGE_BUILD_ROWS_PER_PART))
    spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
    e0 = _trade_pairs(spark, sf_dir)
    # AQE must be OFF while the edge list materializes: with AQE on,
    # the checkpointed LogicalRDD captures UnknownPartitioning (the
    # adaptive plan's final partitioning isn't propagated — measured: 33
    # exchanges vs 3) and every iteration re-shuffles the edges. With it
    # off for just this one bounded build, the LogicalRDD advertises
    # hashpartitioning(src, n_part) and Catalyst satisfies all later
    # src-keyed requirements for free. Restored immediately after.
    aqe_prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        edges = (e0.union(e0.select(F.col("dst").alias("src"),
                                    F.col("src").alias("dst")))
                 .repartition(n_part, "src")
                 .localCheckpoint(eager=True,
                                  storageLevel=_edge_ckpt_level(e_bound)))
        # Materialize the degree vector ONCE, exchange-free off the
        # src-partitioned edges, still under AQE-off so the |nodes|-row
        # checkpoint advertises hashpartitioning(src, n_part) and every
        # iteration's deg join stays co-partitioned. Lazy, the loop's
        # final plan re-aggregated the full edge list PR_ITERS times
        # (once per iteration's deg subtree — measured in the unrolled
        # plan); checkpointed, each iteration reads |nodes| rows. The
        # node set is deg's key projection (distinct edge sources), so
        # the former per-iteration nodes-distinct subtree disappears
        # with it (optimization round 14).
        deg = (edges.groupBy("src").agg(F.count("*").alias("outdeg"))
               .localCheckpoint(eager=True))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_prev)
    nodes = deg.select(F.col("src").alias("node"))
    return _pr_shuffled_loop(nodes, edges, deg)


# Above this many nodes the rank/degree vectors stop being broadcast
# material (1e8 string-keyed rows ≈ multiple GiB per executor copy) and
# the co-partitioned shuffle plan takes over. Tunable per cluster.
PR_BROADCAST_MAX_NODES = 100_000_000

# Edge-volume term of the dispatch (VERDICT r10 item 1): the node bound
# alone is the wrong signal when the EDGE list stresses the heap — the
# broadcast formulation re-derives each iteration's rank vector by
# re-executing the prior iterations' broadcast builds over the full
# edge list inside one driver-resident job, and under the
# production-shape 16 g heap the sf10 trade graph (120 M symmetrized
# edge-row bound) walls >10 min there while the co-partitioned plan
# (whose per-iteration joins stream the checkpointed edges through
# fixed-size shuffled-hash maps) stays at minutes-scale. Measured flip
# window on the 16 g heap: 12 M edge-row bound (sf1) healthy broadcast,
# 120 M (sf10) walls — the threshold sits 2× above the measured-good
# point, 5× under the measured wall, i.e. it flips EARLY toward the
# scale-safe plan. Scales with executor memory; tunable per cluster.
PR_BROADCAST_MAX_EDGE_ROWS = 24_000_000


def pagerank_auto(spark: SparkSession, sf_dir: str,
                  max_broadcast_nodes: int = PR_BROADCAST_MAX_NODES,
                  max_broadcast_edge_rows: int = PR_BROADCAST_MAX_EDGE_ROWS,
                  ) -> DataFrame:
    """Size-dispatched PageRank: broadcast formulation while BOTH the
    node set is safely broadcastable AND the edge volume fits the
    broadcast plan's heap posture; co-partitioned shuffle formulation
    above either threshold. Both bounds come from parquet footer
    metadata — driver-local stat reads, no Spark job at
    plan-construction time (ADVICE r4):

    - nodes: |customer| + |supplier| ≥ |nodes| (nodes are prefixed
      custkeys/suppkeys);
    - edges: 2·|lineitem| ≥ |symmetrized distinct trading pairs| (each
      order line contributes at most one directed pair; |lineitem| is
      exactly the orders⋈lineitem join's output row bound since
      l_orderkey is a foreign key)."""
    from dask_lambda_example_spark.io import parquet_rowcount

    n_bound = (parquet_rowcount(sf_dir, "customer")
               + parquet_rowcount(sf_dir, "supplier"))
    e_bound = 2 * parquet_rowcount(sf_dir, "lineitem")
    if n_bound <= max_broadcast_nodes and e_bound <= max_broadcast_edge_rows:
        return graph_pagerank(spark, sf_dir)
    return graph_pagerank_copartitioned(spark, sf_dir)


@query("graph_pagerank_auto", oracle=_pagerank_oracle())
def graph_pagerank_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered entry point for ``pagerank_auto`` — the dispatcher
    itself as a named, oracle-gated query (VERDICT r9 item 1: it was
    the only dual-formulation family whose auto name had no
    CORRECTNESS row). Both formulations share the identical unrolled
    recurrence and therefore the identical DuckDB oracle, so the
    dispatch flip can never change answers — only plans; the plan
    assert ``tests/test_plans.py::test_pagerank_auto_dispatch`` pins
    broadcast-formulation joins below ``PR_BROADCAST_MAX_NODES`` and
    the sort-free co-partitioned shuffled-hash shape (no broadcast of
    the rank vector) above it."""
    return pagerank_auto(spark, sf_dir)


RCTE_MAX_HOPS = 2
RCTE_SEED = "c1"

_RCTE_SQL = f"""
    WITH RECURSIVE reach(node, hops) AS (
        SELECT '{RCTE_SEED}' AS node, 0 AS hops
        UNION ALL
        SELECT e.dst, r.hops + 1
        FROM reach r JOIN {{edges}} e ON e.src = r.node
        WHERE r.hops < {RCTE_MAX_HOPS})
    SELECT node, CAST(min(hops) AS BIGINT) AS hops
    FROM reach GROUP BY node
"""

_RCTE_ORACLE = f"""
    WITH RECURSIVE e0 AS (
        SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
    reach(node, hops) AS (
        SELECT '{RCTE_SEED}' AS node, 0 AS hops
        UNION ALL
        SELECT e.dst, r.hops + 1
        FROM reach r JOIN edges e ON e.src = r.node
        WHERE r.hops < {RCTE_MAX_HOPS})
    SELECT node, CAST(min(hops) AS BIGINT) AS hops
    FROM reach GROUP BY node
"""


@query("graph_reachability_rcte", oracle=_RCTE_ORACLE)
def graph_reachability_rcte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive reachability by recursive CTE (Spark 4's
    ``WITH RECURSIVE``): BFS from one customer across the symmetrized
    trade graph, min-hop distance per reached node, horizon {h} hops
    (the co-buyer neighborhood). The recursion itself is the SAME SQL
    text on both engines; the edge list is materialized ONCE
    (``localCheckpoint``) before the loop — Spark inlines non-recursive
    CTEs into every recursion level, so an unmaterialized edge list
    would re-run the join+distinct per hop (measured 5×). The UNION ALL
    frontier carries duplicate paths that the final min-aggregation
    collapses; Spark does not yet support UNION (distinct) recursion,
    so the horizon is kept small — for deeper or unbounded closure
    prefer the driver-loop shape of ``dedup_cluster_cc``, which dedups
    the frontier every round."""
    # Edge build shared with the PageRank family (round-11: this query
    # had kept a private copy of the PRE-fix build and would have hit
    # the same sf10/16g dedup-aggregate OOM _trade_pairs already
    # guards); checkpoint blocks go serialized memory-and-disk above
    # the dispatch edge bound like the rest of the family.
    from dask_lambda_example_spark.io import parquet_rowcount

    e_bound = 2 * parquet_rowcount(sf_dir, "lineitem")
    e0 = _trade_pairs(spark, sf_dir)
    edges = (e0.union(e0.select(F.col("dst").alias("src"),
                                F.col("src").alias("dst")))
             .localCheckpoint(  # halves disjoint -> distinct
                 eager=True, storageLevel=_edge_ckpt_level(e_bound)))
    edges.createOrReplaceTempView("rcte_edges_v")
    return spark.sql(_RCTE_SQL.format(edges="rcte_edges_v"))


graph_reachability_rcte.__doc__ = graph_reachability_rcte.__doc__.format(
    h=RCTE_MAX_HOPS)


# The crawl link graph, as the oracle sees it: the HTML pages'
# in-content anchors target deterministic ⊕-neighbor documents
# (sources/warc.py make_html_page — xor 1 always, xor 2 for
# doc_id%3>=1, xor 4 for doc_id%3=2; the same analytic census that
# gates graph_crawl_indegree), closed over the crawled corpus (targets
# that were never fetched have no page to rank).
_CRAWL_PR_PRELUDE = """
    l0 AS (
        SELECT doc_id AS src, xor(doc_id, 1) AS dst FROM documents
        UNION ALL SELECT doc_id, xor(doc_id, 2) FROM documents
            WHERE doc_id % 3 >= 1
        UNION ALL SELECT doc_id, xor(doc_id, 4) FROM documents
            WHERE doc_id % 3 = 2),
    edges AS (SELECT l0.src, l0.dst FROM l0
              JOIN documents d ON d.doc_id = l0.dst),
    nodes AS (SELECT doc_id AS node FROM documents)"""


def _crawl_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DIRECTED crawl link graph's edge list (lazy — caller owns
    materialization/partitioning): WARC bytes → streaming HTML anchor
    census (the registered ``text_html_outlinks``) → document namespace
    filter + target parse → semi-join closure over the crawled corpus
    (a target that was never fetched has no page to rank)."""
    from dask_lambda_example_spark.sources.warc import text_html_outlinks

    docs = load_table(spark, sf_dir, "documents")
    links = text_html_outlinks(spark, sf_dir)
    return (
        links.filter(F.col("href").startswith("/doc/"))
        .select(F.col("doc_id").alias("src"),
                F.substring_index(F.col("href"), "/", -1)
                 .cast("long").alias("dst"))
        .join(docs.select(F.col("doc_id").alias("dst")), "dst", "left_semi")
    )


@query("graph_crawl_pagerank", oracle=_pagerank_oracle(_CRAWL_PR_PRELUDE))
def graph_crawl_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the EXTRACTED crawl link graph — the composition
    every web-corpus pipeline runs (CommonCrawl → link graph → rank as
    a quality prior for curation): WARC archives → streaming HTML
    anchor census (the registered ``text_html_outlinks``) → document
    namespace filter + target parse → semi-join against the crawled
    corpus (dangling targets have no page to rank) → the same
    damping-0.85 fixed-iteration recurrence as the trade-graph family.
    Unlike ``graph_pagerank`` the edge list here is DIRECTED and built
    from parsed page bytes, so the oracle (analytic ⊕-neighbor census +
    identical unrolled recurrence) value-checks extraction, parsing,
    graph closure and the iteration end-to-end.

    Scale posture: the HTML parse is the expensive operand and runs
    EXACTLY ONCE — the parsed edge list is ``localCheckpoint``-ed
    before the loop (PR_ITERS scans of a checkpointed long-pair list,
    never PR_ITERS re-parses of the archive bytes). Per iteration the
    broadcast formulation ships the |docs|-sized rank vector; on a
    billion-page graph ``crawl_pagerank_auto`` flips to the
    co-partitioned recurrence exactly as ``pagerank_auto`` does for the
    trade graph — the loops are shared (``_pr_broadcast_loop`` /
    ``_pr_shuffled_loop``), only the edge construction differs."""
    from dask_lambda_example_spark.io import parquet_rowcount

    docs = load_table(spark, sf_dir, "documents")
    e_bound = CRAWL_LINKS_PER_PAGE_BOUND * parquet_rowcount(
        sf_dir, "documents")
    edges = _crawl_edges(spark, sf_dir).localCheckpoint(
        eager=True, storageLevel=_edge_ckpt_level(e_bound))
    nodes = docs.select(F.col("doc_id").alias("node"))
    return _pr_broadcast_loop(nodes, edges)


@query("graph_crawl_pagerank_copartitioned",
       oracle=_pagerank_oracle(_CRAWL_PR_PRELUDE))
def graph_crawl_pagerank_copartitioned(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    """Crawl-graph PageRank, co-partitioned formulation — identical
    recurrence (and oracle) to ``graph_crawl_pagerank``, billion-page
    physical plan: NOTHING is broadcast. Same discipline as
    ``graph_pagerank_copartitioned`` (see its docstring for the AQE /
    checkpoint-partitioning mechanics): the parsed edge list is
    hash-partitioned by ``src`` ONCE as it materializes (still exactly
    one HTML parse), the degree vector derives from the checkpointed
    edges so it is born co-partitioned, and every iteration join is a
    sort-free ShuffledHashJoin via the shared ``_pr_shuffled_loop``.

    One difference from the trade graph: the crawl graph is DIRECTED,
    so the node set is the document corpus (a page with no inlinks
    still holds the damping floor), not the edge sources — the rank
    vector therefore shuffles once per iteration onto the edge
    partitioning instead of deriving partitioned. Per-iteration network
    cost stays O(|nodes|) rank rows + the contribution shuffle, never
    O(|edges|), never a broadcast. The child session's shuffle width
    scales from the footer edge bound exactly as the trade sibling's
    does (checkpoint block size ∝ rows/partition — see
    ``graph_pagerank_copartitioned``)."""
    from dask_lambda_example_spark.io import parquet_rowcount

    spark = spark.newSession()
    try:
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    except ValueError:
        n_part = spark.sparkContext.defaultParallelism
    e_bound = CRAWL_LINKS_PER_PAGE_BOUND * parquet_rowcount(
        sf_dir, "documents")
    n_part = max(n_part, min(2048, e_bound // EDGE_BUILD_ROWS_PER_PART))
    spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
    e0 = _crawl_edges(spark, sf_dir)
    aqe_prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        edges = (e0.repartition(n_part, "src")
                 .localCheckpoint(eager=True,
                                  storageLevel=_edge_ckpt_level(e_bound)))
        # same discipline as the trade sibling: one exchange-free
        # aggregation+checkpoint under AQE-off replaces PR_ITERS lazy
        # re-aggregations of the checkpointed edge list
        deg = (edges.groupBy("src").agg(F.count("*").alias("outdeg"))
               .localCheckpoint(eager=True))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_prev)
    nodes = (load_table(spark, sf_dir, "documents")
             .select(F.col("doc_id").alias("node")))
    return _pr_shuffled_loop(nodes, edges, deg)


# The crawl pages carry at most 3 in-content anchors each by
# construction (sources/warc.py make_html_page); a general crawl would
# plug its per-page anchor census bound (or a catalog stat) in here.
CRAWL_LINKS_PER_PAGE_BOUND = 3


def crawl_pagerank_auto(spark: SparkSession, sf_dir: str,
                        max_broadcast_nodes: int = PR_BROADCAST_MAX_NODES,
                        max_broadcast_edge_rows: int =
                        PR_BROADCAST_MAX_EDGE_ROWS,
                        ) -> DataFrame:
    """Size-dispatched crawl PageRank (VERDICT r10 item 5: the crawl
    graph gets the same footer-dispatched flip the trade graph has).
    Node bound: |documents| exactly. Edge bound:
    ``CRAWL_LINKS_PER_PAGE_BOUND``·|documents| ≥ |edges| (closure can
    only shrink it). Both are driver-local footer stats — no job at
    plan-construction time."""
    from dask_lambda_example_spark.io import parquet_rowcount

    n_bound = parquet_rowcount(sf_dir, "documents")
    e_bound = CRAWL_LINKS_PER_PAGE_BOUND * n_bound
    if n_bound <= max_broadcast_nodes and e_bound <= max_broadcast_edge_rows:
        return graph_crawl_pagerank(spark, sf_dir)
    return graph_crawl_pagerank_copartitioned(spark, sf_dir)


@query("graph_crawl_pagerank_auto", oracle=_pagerank_oracle(_CRAWL_PR_PRELUDE))
def graph_crawl_pagerank_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered entry point for ``crawl_pagerank_auto`` — the crawl
    graph's dispatcher as a named, oracle-gated query. Both
    formulations share the identical unrolled recurrence and oracle, so
    the flip can only change plans, never answers; the plan assert
    ``tests/test_plans.py::test_crawl_pagerank_auto_dispatch`` pins the
    broadcast shape below the thresholds and the nothing-broadcast
    shuffled-hash shape above them (on either axis)."""
    return crawl_pagerank_auto(spark, sf_dir)
