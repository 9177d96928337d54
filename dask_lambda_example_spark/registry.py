"""Central query registry — the correctness contract.

Every operator implemented from SURVEY.md §2 registers here as a named
query: a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) the equivalent ANSI SQL for the DuckDB oracle. The
driver runs both sides at sf0.01 and compares row count + schema +
order-insensitive value hash (``/root/repo/__spark_entry__.py``).

Float discipline (SURVEY.md §5.2-4): aggregate outputs are rounded to 6
decimals on BOTH sides and every computed column carries the same alias
in both dialects — the driver sorts columns by name before hashing.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: str | None  # DuckDB SQL, or None → driver rows-only check
    doc: str


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register ``fn`` as a named query with its oracle SQL."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")

        @functools.wraps(fn)
        def portable(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Every query must run in ANY SparkSession, not just the one
            # session.get_spark() builds — the verification driver uses a
            # bare builder. Set the dynamic confs (nanosAsLong, UTC, …)
            # before the query body touches a file.
            from dask_lambda_example_spark.io import ensure_portable_session

            ensure_portable_session(spark)
            return fn(spark, sf_dir)

        QUERIES[name] = QuerySpec(name=name, fn=portable, oracle=oracle,
                                  doc=(fn.__doc__ or "").strip())
        return fn

    return deco


# The verification driver samples the FIRST 50 entries of queries() each
# round. The cumulative union of CORRECTNESS_r01-r11 covers ALL
# oracle-gated queries green with zero never-verified names (r11: 44
# full green, the one red row being the rows-only rate-source gate —
# fixed this round) — the backlog is ZERO and REVERIFY drained with it.
# The round-12 curated head is therefore MINIMAL: just the six
# rows-only queries (no oracle → the driver records only that they
# ran; that weak signal is re-earned EVERY round, since a
# no-correctness-signal row never marks a query verified — ADVICE r3),
# leaving ~44 surplus window slots that auto-fill with the
# STALEST-verified names — regression detection. tests/test_units.py::
# test_registry_priority_rotation enforces the window invariants.
PRIORITY_QUERIES = (
    # rows-only queries: no oracle exists, so verification never sticks —
    # the driver re-runs them every round. text_bpe_train/encode joined
    # the permanent re-earn set in r7 (iterative argmax is not
    # SQL-expressible; train is pytest-exact vs a pure-Python reference,
    # encode carries a worker-side rank-replay exact gate).
    # agg_approx_sketches' invariant gate moved from the query body to
    # pytest (test_approx_sketches_within_error_bounds) in r11 —
    # VERDICT r10 item 6; the rows-only re-earn is unchanged.
    # r12: stream_rate_source_smoke was the ONE red driver row of the
    # r11 window — its first-batch wait grew from a hard-coded 8 s to
    # an env-tunable 90 s poll (VERDICT r11 item 1) and the gate is now
    # CI-exercised under a saturated scheduler
    # (test_rows_only_gates_under_load), so the re-earn holds on a
    # loaded driver host too.
    "agg_approx_sketches", "sim_mllib_brp_join", "mm_decode_fake_images",
    "stream_rate_source_smoke", "text_bpe_train", "text_bpe_encode",
    # r14 additions (never driver-verified yet — VERDICT r13 items
    # 3/4/5): the incremental-ANN serving path (ADC shortlist + exact
    # refine over the frozen+ingested index) and its recall sign-off,
    # substring-span cut lists + the funnel stage consuming them, and
    # perceptual image dedup. All five oracle-gated. (The r13 trio —
    # ingest, post-ingest recall, substring spans — earned full-green
    # rows in CORRECTNESS_r13.json and rotates out.)
    "sim_ivf_incremental_rerank_search", "sim_ivf_incremental_rerank_recall",
    "dedup_substring_cutlist", "dedup_image_phash",
    "pipeline_curation_funnel_cut",
    # r14 second wave (never driver-verified yet): the constant-output
    # canonical-assignment consumer over the image fingerprints (the
    # at-scale form GROWTH_r14_image_phash.json's output-physics note
    # calls for) and the audio × dedup intersection (real RIFF/WAVE
    # parse → 63-bit energy-sign fingerprint → the same bucket-min
    # canonicalization). Both oracle-gated.
    "dedup_image_phash_canonical", "dedup_audio_fingerprint",
    # r14 third wave: video × dedup — spatio-temporal fingerprint over
    # the REAL MJPEG demux + JPEG decode, same bucket-min canonical
    # form; closes the text/image/audio/video modality matrix.
    "dedup_video_fingerprint",
    # r14 fourth wave: the adaptive IVF probe dial (margin-of-best cell
    # keep, capped) + its recall twin + the probe-spend stats — the
    # measured answer to the fixed-dial recall commentary.
    "sim_ivf_search_adaptive", "sim_ivf_recall_adaptive",
    "sim_ivf_adaptive_probe_stats",
    # REVERIFY re-earn (saturated-encode helpers lifted to module level
    # for the rerank path — identical expressions, changed code):
    "sim_ivf_incremental_ingest",
)

# CORRECTNESS artifacts the rotation derives its state from — pinned to
# the rounds committed at HEAD, so a stray working-tree file (e.g. the
# current round's artifact, written by the driver before it re-reads
# queries()) cannot silently change the sample order between this
# checkout and a clean clone (review finding, ADVICE r3).
CORRECTNESS_ARTIFACTS = (
    "CORRECTNESS_r01.json",
    "CORRECTNESS_r02.json",
    "CORRECTNESS_r03.json",
    "CORRECTNESS_r04.json",
    "CORRECTNESS_r05.json",
    "CORRECTNESS_r06.json",
    "CORRECTNESS_r07.json",
    "CORRECTNESS_r08.json",
    "CORRECTNESS_r09.json",
    "CORRECTNESS_r10.json",
    "CORRECTNESS_r11.json",
    "CORRECTNESS_r12.json",
    "CORRECTNESS_r13.json",
)

# Names whose implementation changed materially after their last green
# driver row: listed here they are treated as unverified again and float
# back into the driver window (ADVICE r3 — a green row attests the code
# that ran THAT round, not later rewrites).
# r12: every r11 REVERIFY name earned a fresh green row in the r11
# driver window (CORRECTNESS_r11.json, 44/44 oracle-gated green), so
# the list drains. The one body change this round —
# stream_rate_source_smoke's first-batch wait — is a rows-only query
# that re-earns its row every round by construction, so it needs no
# REVERIFY entry.
# r14: sim_ivf_incremental_ingest's saturated-encode helpers were
# lifted to module level (shared with the new rerank path). The
# generated expressions are identical, but the code that earned the
# r13 green row is not the code at HEAD — re-earn (ADVICE r3).
REVERIFY: tuple[str, ...] = ("sim_ivf_incremental_ingest",)


def _verdicts() -> dict[str, bool]:
    """Per-name driver verdict from the pinned committed artifacts,
    **latest round wins** — a name green in r01 but red in r03 counts as
    unverified, so regressions rotate back into the window instead of
    being masked by a stale green (review finding, ADVICE r3).

    Green means: no error, row counts match, and — when the driver ran
    the full oracle comparison — schema + value-hash match too. A
    ``no_oracle`` row records only that the query ran (rows_match /
    schema_match / hash_match are all null); that is NOT a correctness
    signal, so it never marks the name verified — rows-only queries
    re-earn their driver row every round.
    """
    import json
    import pathlib

    verdicts: dict[str, bool] = {}
    root = pathlib.Path(__file__).resolve().parent.parent
    for fname in CORRECTNESS_ARTIFACTS:
        try:
            rows = json.loads((root / fname).read_text())
        except (OSError, ValueError):
            continue
        for name, r in rows.items():
            verdicts[name] = bool(
                r.get("err") is None and r.get("rows_match")
                and r.get("schema_match") in (True, None)
                and r.get("hash_match") in (True, None))
    return verdicts


def _last_green_round() -> dict[str, int]:
    """Name -> index of the latest pinned artifact whose row is green
    (staleness key for re-sampling: lower = longer unchecked)."""
    import json
    import pathlib

    last: dict[str, int] = {}
    root = pathlib.Path(__file__).resolve().parent.parent
    for i, fname in enumerate(CORRECTNESS_ARTIFACTS):
        try:
            rows = json.loads((root / fname).read_text())
        except (OSError, ValueError):
            continue
        for name, r in rows.items():
            if (r.get("err") is None and r.get("rows_match")
                    and r.get("schema_match") in (True, None)
                    and r.get("hash_match") in (True, None)):
                last[name] = i
    return last


def driver_verified() -> set[str]:
    """Names whose LATEST driver CORRECTNESS row (pinned committed
    artifacts only) is fully green and whose implementation has not
    changed since (``REVERIFY``)."""
    return {n for n, ok in _verdicts().items() if ok} - set(REVERIFY)


def _ordered() -> list[QuerySpec]:
    """Registry order = the driver's sample order (it checks the FIRST
    50 entries of ``queries()`` each round). Rotation is automatic and
    self-maintaining: never-driver-verified names come first —
    ``PRIORITY_QUERIES`` (the curated head for this round's window),
    then the remaining unverified names in registration order — and
    verified names re-register after them ordered stalest-green-round
    first, so when fewer than 50 unverified names remain the driver's
    surplus slots automatically re-sample the longest-unchecked green
    names (regression detection rather than dead slots).
    """
    _ensure_loaded()
    missing = [n for n in PRIORITY_QUERIES if n not in QUERIES]
    if missing:
        raise RuntimeError(f"PRIORITY_QUERIES names not registered: {missing}")
    green = driver_verified()
    pri = set(PRIORITY_QUERIES)
    head = [n for n in PRIORITY_QUERIES if n not in green]
    unverified = [n for n in QUERIES if n not in green and n not in pri]
    last = _last_green_round()
    reg_pos = {n: i for i, n in enumerate(QUERIES)}
    verified = sorted((n for n in QUERIES if n in green),
                      key=lambda n: (last.get(n, -1), reg_pos[n]))
    return [QUERIES[n] for n in (*head, *unverified, *verified)]


def spark_queries() -> dict[str, SparkQuery]:
    return {s.name: s.fn for s in _ordered()}


def oracle_queries() -> dict[str, str]:
    return {s.name: s.oracle for s in _ordered() if s.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    import dask_lambda_example_spark.operators.relational  # noqa: F401
    import dask_lambda_example_spark.operators.aggregates  # noqa: F401
    import dask_lambda_example_spark.operators.joins  # noqa: F401
    import dask_lambda_example_spark.operators.scalar_functions  # noqa: F401
    import dask_lambda_example_spark.operators.windows  # noqa: F401
    import dask_lambda_example_spark.operators.timeseries  # noqa: F401
    import dask_lambda_example_spark.operators.setops  # noqa: F401
    import dask_lambda_example_spark.operators.subqueries  # noqa: F401
    import dask_lambda_example_spark.operators.tpch_extra  # noqa: F401
    import dask_lambda_example_spark.operators.tpch_extra2  # noqa: F401
    import dask_lambda_example_spark.operators.skew  # noqa: F401
    import dask_lambda_example_spark.operators.events_analytics  # noqa: F401
    import dask_lambda_example_spark.operators.graph  # noqa: F401
    import dask_lambda_example_spark.operators.clustering  # noqa: F401
    import dask_lambda_example_spark.operators.cdc  # noqa: F401
    import dask_lambda_example_spark.operators.profiling  # noqa: F401
    import dask_lambda_example_spark.operators.dedup  # noqa: F401
    import dask_lambda_example_spark.operators.curation  # noqa: F401
    import dask_lambda_example_spark.operators.similarity  # noqa: F401
    import dask_lambda_example_spark.operators.text  # noqa: F401
    import dask_lambda_example_spark.operators.multimodal  # noqa: F401
    import dask_lambda_example_spark.operators.udf_surface  # noqa: F401
    import dask_lambda_example_spark.operators.bpe  # noqa: F401
    import dask_lambda_example_spark.sources.synthetic  # noqa: F401
    import dask_lambda_example_spark.sources.formats  # noqa: F401
    import dask_lambda_example_spark.sources.pydatasource  # noqa: F401
    import dask_lambda_example_spark.sources.warc  # noqa: F401
    import dask_lambda_example_spark.streaming.pipeline  # noqa: F401
    _LOADED = True
