"""Streaming scale audit (VERDICT r5 item 6): measure the two
streaming shapes whose scale posture was previously design-note-only —
(a) AvailableNow FILE-BACKLOG ingest through a watermarked windowed
aggregation, and (b) the watermarked stream-stream inner join — at two
data scales and two state-partition widths, reporting rows/s, micro-
batch count, and peak state rows from the engine's own progress
telemetry (StreamingQuery.recentProgress), not wall-clock guesswork.

The scale tiers come from tools/make_sf1.py (directory-of-parts
layout); ``maxFilesPerTrigger`` slices the backlog into multiple
micro-batches so a 10× tier really is a 10× longer arrival sequence —
the shape an S3-notification consumer sees after an outage, which is
the reference's trigger model (its consumer fires per arriving file).

Also validates the SPARK_GRAFT_STREAM_PARTITIONS sizing rule at both
scales: state-store count = partitions × stateful operators is a
per-batch fixed cost, so the small default should win at local scale
and the gap should NARROW as per-partition state grows.

Usage: python tools/stream_scale_audit.py [--json OUT.json]
       (CPU-exclusive — timed; run alone like bench.py)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TIERS = (
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", "/root/repo/.localdata/sf1"),
)
PARTITION_WIDTHS = (8, 32)
MAX_FILES_PER_TRIGGER = 2  # backlog slicing: sf1 -> ~5 batches


def _run_to_completion(df, output_mode: str):
    """Start an AvailableNow query on ``df``, wait, and distill the
    progress telemetry. The caller builds the stream with
    ``events_stream`` (backlog slicing included) so both disk layouts
    work."""
    from dask_lambda_example_spark.streaming.pipeline import _mem_table

    table = _mem_table("audit")
    ckpt = tempfile.mkdtemp(prefix="ckpt_audit_")
    t0 = time.perf_counter()
    q = (df.writeStream.outputMode(output_mode)
         .format("memory").queryName(table)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    wall = time.perf_counter() - t0
    def _as_dict(p):
        if isinstance(p, dict):
            return p
        if isinstance(p, str):
            return json.loads(p)
        j = p.json  # StreamingQueryProgress object (PySpark >= 3.4)
        return json.loads(j() if callable(j) else j)

    prog = [_as_dict(p) for p in (q.recentProgress or [])]
    rows_in = sum(int(p.get("numInputRows", 0)) for p in prog)
    state_rows = max(
        (int(so.get("numRowsTotal", 0))
         for p in prog for so in p.get("stateOperators", [])),
        default=0)
    n_batches = sum(1 for p in prog if int(p.get("numInputRows", 0)) > 0)
    out_rows = df.sparkSession.table(table).count()
    return {
        "wall_s": round(wall, 3),
        "rows_in": rows_in,
        "rows_out": out_rows,
        "rows_per_s": round(rows_in / wall) if wall > 0 else None,
        "n_batches": n_batches,
        "state_rows_peak": state_rows,
    }


def ingest_query(spark, sf_dir: str):
    """Backlog ingest shape: watermarked hourly windowed aggregation
    (one state store; complete mode so every window survives)."""
    from pyspark.sql import functions as F

    from dask_lambda_example_spark.streaming.pipeline import events_stream

    src = events_stream(spark, sf_dir,
                        files_per_trigger=MAX_FILES_PER_TRIGGER)
    return (src.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 6).alias("sum_v")))


def join_query(spark, sf_dir: str,
               files_per_trigger: int | None = MAX_FILES_PER_TRIGGER):
    """The registered stream-stream attribution join, re-built here so
    the audit owns the query handle (the registered version runs and
    returns the sink table). ``files_per_trigger=None`` ingests the
    whole backlog as ONE micro-batch — required when the measurement
    target is peak state (a sliced full-time-range replay advances the
    watermark after batch 1 and evicts/lateness-drops the remaining
    history, so peak state would reflect one slice, not the tier)."""
    from pyspark.sql import functions as F

    from dask_lambda_example_spark.streaming.pipeline import events_stream

    views = (events_stream(spark, sf_dir,
                           files_per_trigger=files_per_trigger)
             .filter(F.col("event_type") == "view")
             .select("user_id", F.col("event_id").alias("view_id"),
                     F.col("ts").alias("view_ts"))
             .withWatermark("view_ts", "2 hours"))
    clicks = (events_stream(spark, sf_dir,
                            files_per_trigger=files_per_trigger)
              .filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user_id"),
                      F.col("event_id").alias("click_id"),
                      F.col("ts").alias("click_ts"))
              .withWatermark("click_ts", "2 hours"))
    return (views.join(
        clicks,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("click_ts") > F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts")
           + F.expr("INTERVAL 1 HOUR")))
        .select("user_id", "view_id", "click_id"))


def main() -> int:
    out_path = None
    tiers = TIERS
    if "--json" in sys.argv:
        out_path = sys.argv[sys.argv.index("--json") + 1]
    if "--tiers" in sys.argv:
        # e.g. --tiers sf1=/root/repo/.localdata/sf1,sf10=...
        spec = sys.argv[sys.argv.index("--tiers") + 1]
        tiers = tuple(tuple(t.split("=", 1)) for t in spec.split(","))

    from dask_lambda_example_spark.session import get_spark

    spark = get_spark("stream-scale-audit")
    results = []
    for tag, sf_dir in tiers:
        if not os.path.exists(f"{sf_dir}/events.parquet"):
            print(f"SKIP {tag}: {sf_dir} missing", file=sys.stderr)
            continue
        for width in PARTITION_WIDTHS:
            prev = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set("spark.sql.shuffle.partitions", str(width))
            try:
                for audit, builder, mode in (
                        ("ingest_backlog", ingest_query, "complete"),
                        ("stream_stream_join", join_query, "append")):
                    m = _run_to_completion(builder(spark, sf_dir), mode)
                    rec = {"audit": audit, "sf": tag,
                           "partitions": width, **m}
                    results.append(rec)
                    print(json.dumps(rec), flush=True)
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", prev)
    if out_path:
        Path(out_path).write_text(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
