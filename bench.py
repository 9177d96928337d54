"""Benchmark harness (driver contract): run every registered query at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line.

Per-query time = full plan execution to ``collect()`` (same action the
driver uses). The session is created once and reused across all queries
— the reference amortizes its cluster identically
(``src/lambda_consumer.py:31-33``; BASELINE.md budget note).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from dask_lambda_example_spark.registry import QUERIES, _ensure_loaded
from dask_lambda_example_spark.session import get_spark



# Labeled NAIVE siblings — queries kept registered and oracle-gated
# purely as the measured comparison point for their scale-safe twin
# + auto dispatcher (VERDICT r11 item 5). Above the cap tier they
# are ~14% of the sf10 battery (587 s of 4266 s at r11) while every
# user-facing path dispatches AWAY from them, so the full battery
# skips them past SPARK_GRAFT_BENCH_NAIVE_SF_CAP (default sf1) and
# their big-tier walls live in GROWTH_r12_naive_twins.json, measured
# once, instead of re-priced every battery. SPARK_GRAFT_BENCH_ONLY
# bypasses the cap (an explicit name ask is an explicit ask).
NAIVE_TWINS = {
    "graph_pagerank": "graph_pagerank_auto",
    "graph_crawl_pagerank": "graph_crawl_pagerank_auto",
    "win_rank_dense_ntile": "win_rank_auto",
    "agg_percentile_exact": "agg_percentile_auto",
}
# Output-bound physics queries under the same cost policy (VERDICT
# r12 item 4): the stream-stream pair's walls are state×output
# volume, not plan quality (r10 constant-density study: throughput
# RISES with tier, state linear), and at sf10 they were 26% of the
# capped battery (396 + 295 s). Above the cap tier they are priced
# ONCE per round in GROWTH_r13_stream_cost.json instead of
# re-measured every battery; SPARK_GRAFT_BENCH_ONLY bypasses.
OUTPUT_BOUND = {"stream_stream_join", "stream_stream_left_outer"}


def plan_battery(names: list, only, sf: str, sf_dir: str):
    """Apply the big-tier cost policy to the battery name list — pure
    (env-read, no Spark) so the cap behavior is unit-testable:
    (names, naive_capped, cost_capped, naive_cap, cap_disabled)."""
    missing = ((set(NAIVE_TWINS) | set(NAIVE_TWINS.values())
                | OUTPUT_BOUND) - set(QUERIES))
    if missing:  # explicit raise: an assert is stripped under -O
        raise RuntimeError(f"naive-cap names drifted: {missing}")
    try:
        naive_cap = float(
            os.environ.get("SPARK_GRAFT_BENCH_NAIVE_SF_CAP", "1"))
    except ValueError:
        # a malformed env var must not kill the whole battery before
        # any query runs (round-12 review)
        naive_cap = 1.0
        print("BENCH WARN unparseable SPARK_GRAFT_BENCH_NAIVE_SF_CAP="
              f"{os.environ['SPARK_GRAFT_BENCH_NAIVE_SF_CAP']!r} — "
              f"using default {naive_cap}", file=sys.stderr)
    naive_capped: list[str] = []
    cost_capped: list[str] = []
    cap_disabled = False
    try:
        sf_num = float(sf)
    except ValueError:
        # an unparseable sf dir silently disables the cap — say so in
        # the JSON line too, or a big-tier run in a custom-named dir
        # re-prices the naive twins with a ledger indistinguishable
        # from an intentional sub-cap run (round-12 review)
        sf_num = 0.0
        cap_disabled = True
        print(f"BENCH WARN sf unparseable from {sf_dir!r} — "
              f"naive-twin cap DISABLED for this run", file=sys.stderr)
    if not only and sf_num > naive_cap:
        naive_capped = sorted(n for n in names if n in NAIVE_TWINS)
        cost_capped = sorted(n for n in names if n in OUTPUT_BOUND)
        names = [n for n in names
                 if n not in NAIVE_TWINS and n not in OUTPUT_BOUND]
    return names, naive_capped, cost_capped, naive_cap, cap_disabled


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    _ensure_loaded()
    spark = get_spark("dask_lambda_example_spark-bench")

    # Warm the JVM + parquet footers with the flagship once (not timed):
    # per-session fixed cost, amortized across jobs exactly like the
    # reference's long-running cluster.
    QUERIES["flagship_groupby_mean_std"].fn(spark, sf_dir).collect()

    # Sink mode: "collect" (default — the driver's own action, includes
    # JVM→Python row materialization) or "noop" (Spark's built-in no-op
    # DataSourceV2 sink: full distributed plan execution, zero driver
    # materialization — the engine-side number a real pipeline writing
    # parquet at 100 TB would see). SCALE.md's growth study reports both.
    sink = os.environ.get("SPARK_GRAFT_BENCH_SINK", "collect")

    # Optional comma-separated name filter for targeted scale runs
    # (e.g. re-measuring one operator at sf1 without the full battery).
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    names = sorted(QUERIES)
    if only:
        wanted = {s.strip() for s in only.split(",") if s.strip()}
        unknown = wanted - set(names)
        if unknown:
            print(f"BENCH WARN unknown names in SPARK_GRAFT_BENCH_ONLY: "
                  f"{sorted(unknown)}", file=sys.stderr)
        names = [n for n in names if n in wanted]

    names, naive_capped, cost_capped, naive_cap, naive_cap_disabled = \
        plan_battery(names, only, sf, sf_dir)

    # Best-of-N reps per query (default 1 — the battery protocol is
    # unchanged). The bench-gate's fresh-session re-probe sets 3: a
    # single isolated run charges cold-JVM/codegen warm-up to the one
    # query measured, which the in-battery baseline it is compared
    # against amortized across hundreds of queries — best-of is the
    # same drift-cancelling protocol tools/ab_bench.py uses.
    try:
        reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "1")))
    except ValueError:
        reps = 1
        print("BENCH WARN unparseable SPARK_GRAFT_BENCH_REPS="
              f"{os.environ['SPARK_GRAFT_BENCH_REPS']!r} — using 1",
              file=sys.stderr)

    times: dict[str, float] = {}
    flaky: list[str] = []  # succeeded on some rep, crashed on another
    for name in names:
        spec = QUERIES[name]
        walls: list[float] = []
        for _ in range(reps):
            df = None
            t0 = time.perf_counter()
            try:
                df = spec.fn(spark, sf_dir)
                if sink == "noop":
                    df.write.format("noop").mode("overwrite").save()
                else:
                    df.collect()
                walls.append(time.perf_counter() - t0)
            except Exception as exc:  # record failures, don't kill the run
                # a failed rep doesn't discard EARLIER successful walls
                # (round-13 review): best-of over the reps that ran is
                # still a valid best-of; only an all-reps failure is a
                # failed query
                print(f"BENCH FAIL {name}: {exc}", file=sys.stderr,
                      flush=True)
                if walls:
                    # crash-under-repetition must be VISIBLE in the
                    # JSON line, not only on stderr — the bench-gate
                    # re-probe runs reps=3 and a fresh-session-flaky
                    # query would otherwise silently clear the gate
                    # with its one surviving wall (ADVICE r13)
                    flaky.append(name)
                break
        if walls:
            times[name] = round(min(walls), 4)
            # progress line per query so a stalled run is attributable
            print(f"BENCH OK {name} {times[name]}", file=sys.stderr,
                  flush=True)
        else:
            times[name] = -1.0
        # Harness hygiene, OUTSIDE the timed region: a multi-hundred-query
        # session accumulates JVM garbage (collect buffers, finished-plan
        # state) faster than G1 reclaims it under a big heap, and
        # ContextCleaner's periodic GC (30 min default) never fires inside
        # one run — so long old-gen pauses land on whichever query happens
        # to allocate next, inflating RANDOM entries 6-12× (measured at
        # sf1: fn_json_extract 56 s in-session vs 5.2 s fresh-session,
        # identical plan). Worse under the 16 g production heap (round-11,
        # measured): a checkpoint-heavy query's storage blocks stay
        # resident until Python GC detaches the py4j refs AND a JVM GC
        # lets ContextCleaner unpersist them — four consecutive
        # 100 M-edge-row graph queries at sf10 stacked their block sets
        # and OOM'd the SparkContext. Dropping the result ref and forcing
        # the full GC chain EVERY query charges reclamation to the
        # harness, not the victim query (~0.3 s/query, untimed).
        del df
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    total = round(sum(t for t in times.values() if t >= 0), 4)

    # Reference-envelope comparison (BASELINE.md): the flagship
    # computation over the reference's own workload shape — a 100-day
    # synthetic 1 s-frequency timeseries (8.64 M rows, the middle of the
    # count∈[10,1000]-days range) — reported as rows/second against the
    # reference's implied ≥288 k rows/s worst-case bound on 8 vCPUs.
    from dask_lambda_example_spark.sources.synthetic import timeseries
    from pyspark.sql import functions as F

    n_days = int(os.environ.get("SPARK_GRAFT_FLAGSHIP_DAYS", "100"))
    flagship_s = None
    for _ in range(reps):  # best-of, same protocol as the query loop
        t0 = time.perf_counter()
        ts = timeseries(spark, n_days=n_days)
        (ts.groupBy("name").agg(F.avg("y").alias("y"))
           .agg(F.stddev_samp("y")).collect())
        wall = time.perf_counter() - t0
        flagship_s = wall if flagship_s is None else min(flagship_s, wall)
    flagship_rows = n_days * 86_400

    print(json.dumps({
        "metric": "total_query_wall_time",
        "value": total,
        "unit": "sec",
        "sink": sink,
        "queries": times,
        # duplicated AFTER the (large) queries object: driver artifacts
        # keep only the tail of this line, and the sink mode must
        # survive that truncation for the bench regression gate to
        # compare like with like (ADVICE r5)
        "sink_mode": sink,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_queries": len(times),
        "failed": sorted(n for n, t in times.items() if t < 0),
        # names whose best-of wall survived but SOME rep crashed —
        # green-looking but not trustworthy (ADVICE r13)
        "flaky": sorted(flaky),
        # naive siblings skipped past the cap tier (see naive_twins
        # above); their big-tier walls are in GROWTH_r12_naive_twins.json
        "naive_capped": naive_capped,
        "naive_sf_cap": naive_cap,
        "naive_cap_disabled": naive_cap_disabled,
        # output-bound physics queries skipped past the cap tier (see
        # output_bound above); priced once in GROWTH_r13_stream_cost.json
        "cost_capped": cost_capped,
        "flagship_synth_rows": flagship_rows,
        "flagship_synth_sec": round(flagship_s, 4),
        "flagship_rows_per_sec": round(flagship_rows / flagship_s),
    }))


if __name__ == "__main__":
    main()
