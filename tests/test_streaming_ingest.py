"""Streaming + ingestion tests (SURVEY.md §5.2-6): producer-layout
round-trip and foreachBatch sink — the reference pipeline shape
(producer → S3 layout → event-triggered consumer) end to end."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from dask_lambda_example_spark.sources.producer import (
    producer_payloads,
    read_producer_layout,
    write_producer_layout,
)
from dask_lambda_example_spark.streaming.pipeline import (
    events_stream,
    foreach_batch_to_parquet,
)


def test_producer_layout_roundtrip(spark):
    """A2/A3: hive-partitioned JSON write → partition-discovering read;
    counts survive and stay in the reference's [10, 1000] domain."""
    path = tempfile.mkdtemp(prefix="producer_")
    write_producer_layout(spark, path, n_files=30)
    back = read_producer_layout(spark, path)
    expected = producer_payloads(spark, 30).select("count")
    assert back.count() == 30
    assert sorted(r["count"] for r in back.select("count").collect()) == \
        sorted(r["count"] for r in expected.collect())
    lo, hi = back.agg(F.min("count"), F.max("count")).first()
    assert 10 <= lo and hi <= 1000


def test_producer_partition_pruning(spark):
    """The six-level key=value layout must partition-prune: a filter on
    the partition columns reads only matching directories."""
    path = tempfile.mkdtemp(prefix="producer_")
    write_producer_layout(spark, path, n_files=30)
    df = spark.read.option("basePath", path).json(
        f"{path}/year=*/month=*/day=*/hour=*/minute=*/second=*")
    pruned = df.filter(F.col("minute") < 10)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert pruned.count() == 10


def test_streaming_file_source_matches_batch(spark, sf_dir):
    """A19: the file-source stream over the events table sees exactly
    the batch rows (episodic AvailableNow ≙ one Lambda invocation)."""
    from dask_lambda_example_spark.streaming.pipeline import run_available_now

    total = (events_stream(spark, sf_dir)
             .groupBy().agg(F.count("*").alias("n"), F.sum("event_id").alias("s")))
    run_available_now(total, "t_stream_total")
    got = spark.table("t_stream_total").first()
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert got["n"] == batch.count()


def test_processing_time_trigger_two_ticks(spark):
    """A20: ``Trigger.ProcessingTime`` cadence over the producer layout
    — files written BEFORE and DURING the run are both picked up by
    later ticks (the reference's 1-minute producer/consumer cadence,
    app.py:131-134, compressed to 500 ms for test time). Deterministic:
    the assertion waits on exact row counts, not on sleeps."""
    import time

    from dask_lambda_example_spark.sources.producer import producer_payloads
    from dask_lambda_example_spark.streaming.pipeline import (
        producer_counts_stream,
        run_processing_time,
    )

    path = tempfile.mkdtemp(prefix="producer_pt_")
    write_producer_layout(spark, path, n_files=10)
    agg = (producer_counts_stream(spark, path)
           .groupBy().agg(F.count("*").alias("n"), F.sum("count").alias("s")))
    q = run_processing_time(agg, "t_pt_counts", "500 milliseconds")
    try:
        def wait_for(n, deadline_s=60):
            deadline = time.time() + deadline_s
            while time.time() < deadline:
                row = spark.table("t_pt_counts").first()
                if row is not None and row["n"] == n:
                    return row
                time.sleep(0.25)
            raise AssertionError(
                f"stream never reached n={n}; last={spark.table('t_pt_counts').first()}")

        wait_for(10)  # tick(s) consumed the initial files
        # second wave arrives while the query keeps running — the next
        # tick must discover the new partition directories
        (producer_payloads(spark, 20)
         .filter(F.col("minute") >= 10).repartition(1)
         .write.mode("append").partitionBy(
             "year", "month", "day", "hour", "minute", "second").json(path))
        row = wait_for(20)
        expected = sum(r["count"] for r in producer_payloads(spark, 20).collect())
        assert row["s"] == expected
    finally:
        q.stop()


def test_foreach_batch_sink(spark, sf_dir):
    """foreachBatch parquet sink writes the aggregated micro-batch."""
    out = tempfile.mkdtemp(prefix="fb_out_") + "/data"
    n = foreach_batch_to_parquet(spark, sf_dir, out)
    assert n == 5  # one row per event_type
    back = spark.read.parquet(out)
    assert {r["event_type"] for r in back.collect()} == {
        "click", "error", "purchase", "signup", "view"}


def test_transform_with_state_modern_api(spark, sf_dir):
    # Spark 4 transformWithStateInPandas needs google.protobuf in the
    # Python env for its driver worker; gate like the Connect smoke
    import pytest

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf not installed — "
                    "transformWithStateInPandas driver worker unavailable")
    from dask_lambda_example_spark.streaming.pipeline import (
        stream_transform_with_state)

    df = stream_transform_with_state(spark, sf_dir)
    rows = {r["user_id"]: r for r in df.collect()}
    import duckdb
    exp = duckdb.sql(
        f"SELECT user_id, count(*) n, round(max(value)-min(value),6) vr "
        f"FROM '{sf_dir}/events.parquet' GROUP BY user_id").fetchall()
    assert len(rows) == len(exp)
    for uid, n, vr in exp:
        assert rows[uid]["n_events"] == n
        assert abs(rows[uid]["value_range"] - vr) < 1e-6


def test_checkpoint_recovery_exactly_once(spark):
    """Restart-from-checkpoint contract: a file-source stream stopped
    after batch 1 and restarted with the SAME checkpoint must process
    only files that arrived in between — every input row lands in the
    sink exactly once across the two runs. This is the recovery
    guarantee a Lambda-style episodic consumer (A19/A20) relies on:
    the checkpoint's source offsets + the file sink's transaction log
    make re-runs idempotent."""
    src = tempfile.mkdtemp(prefix="ckpt_src_")
    sink = tempfile.mkdtemp(prefix="ckpt_sink_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_log_")
    schema = "id LONG, v LONG"

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (stream.writeStream.format("parquet")
             .option("path", sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()

    spark.range(0, 100).selectExpr("id", "id * 2 AS v").coalesce(1) \
        .write.mode("append").parquet(src)
    run_once()
    spark.range(100, 250).selectExpr("id", "id * 2 AS v").coalesce(1) \
        .write.mode("append").parquet(src)
    run_once()

    out = spark.read.parquet(sink)
    assert out.count() == 250                      # no duplicates, no loss
    assert out.select("id").distinct().count() == 250
    total = out.agg(F.sum("v")).first()[0]
    assert total == sum(2 * i for i in range(250))


def test_foreach_batch_cdc_upsert_log(spark):
    """Streaming CDC apply: each micro-batch of keyed updates is
    appended to a versioned log (seq = batch id from the checkpoint —
    monotonic across restarts); the serving view is latest-seq-per-key.
    Across two availableNow runs with overlapping key ranges, the view
    must show last-writer-wins per key — the streaming half of the
    batch cdc_apply_upsert operator, without ever rewriting the table
    in place."""
    import os

    src = tempfile.mkdtemp(prefix="cdc_src_")
    log = tempfile.mkdtemp(prefix="cdc_log_")
    ckpt = tempfile.mkdtemp(prefix="cdc_ckpt_")

    def apply_batch(batch_df, batch_id):
        (batch_df.withColumn("seq", F.lit(batch_id))
         .write.mode("append").parquet(log))

    def run_once():
        q = (spark.readStream.schema("k LONG, v LONG").parquet(src)
             .writeStream.foreachBatch(apply_batch)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    spark.range(0, 100).selectExpr("id AS k", "id * 10 AS v") \
        .coalesce(1).write.mode("append").parquet(src)
    run_once()
    spark.range(50, 150).selectExpr("id AS k", "id * 100 AS v") \
        .coalesce(1).write.mode("append").parquet(src)
    run_once()

    from pyspark.sql import Window
    w = Window.partitionBy("k").orderBy(F.desc("seq"))
    view = (spark.read.parquet(log)
            .withColumn("rn", F.row_number().over(w))
            .filter("rn = 1").select("k", "v"))
    got = {r["k"]: r["v"] for r in view.collect()}
    assert len(got) == 150
    for k in range(150):
        assert got[k] == (k * 100 if k >= 50 else k * 10), k


def test_max_files_per_trigger_rate_limit(spark):
    """Ingest rate limiting: ``maxFilesPerTrigger=1`` must split an
    N-file backlog into N micro-batches — the backpressure knob that
    bounds per-batch state and memory when a stream restarts into a
    deep backlog (the Lambda-consumer analog: one object per
    invocation)."""
    src = tempfile.mkdtemp(prefix="rate_src_")
    n_files = 4
    for i in range(n_files):
        (spark.range(i * 10, (i + 1) * 10).coalesce(1)
         .write.mode("append").parquet(src))
    batches = []

    def record(batch_df, batch_id):
        batches.append((batch_id, batch_df.count()))

    q = (spark.readStream.schema("id LONG")
         .option("maxFilesPerTrigger", 1).parquet(src)
         .writeStream.foreachBatch(record)
         .option("checkpointLocation", tempfile.mkdtemp(prefix="rate_ck_"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    assert len(batches) == n_files
    assert all(n == 10 for _, n in batches)


def test_await_first_rows_slow_batch():
    """VERDICT r11 item 1: the rate-source gate must tolerate a first
    micro-batch that takes far longer than the old hard-coded 8 s.
    Replays a simulated timeline where the first batch commits at
    t=30 s (a loaded 32-core host) against the default 90 s deadline —
    no real stream, injectable clock/sleep."""
    from dask_lambda_example_spark.streaming.pipeline import _await_first_rows

    class FakeQuery:
        def __init__(self, lands_at: float, clock):
            self.lands_at = lands_at
            self.clock = clock

        @property
        def recentProgress(self):
            if self.clock.now >= self.lands_at:
                return [{"numInputRows": 1000}]
            return [{"numInputRows": 0}]

    class FakeClock:
        def __init__(self):
            self.now = 0.0

        def time(self):
            return self.now

        def sleep(self, s):
            self.now += s

    # slow first batch (t=30) inside the default deadline → True, and
    # the wait stops the moment the batch lands (no full-deadline sleep)
    clk = FakeClock()
    q = FakeQuery(lands_at=30.0, clock=clk)
    assert _await_first_rows(q, _clock=clk.time, _sleep=clk.sleep) is True
    assert 30.0 <= clk.now < 31.0
    # a batch that never lands → False exactly at the deadline
    clk = FakeClock()
    q = FakeQuery(lands_at=1e9, clock=clk)
    assert _await_first_rows(q, deadline_s=12.0,
                             _clock=clk.time, _sleep=clk.sleep) is False
    assert clk.now >= 12.0
    # env knob overrides the default deadline
    import os
    old = os.environ.get("SPARK_GRAFT_STREAM_FIRST_BATCH_S")
    os.environ["SPARK_GRAFT_STREAM_FIRST_BATCH_S"] = "45"
    try:
        clk = FakeClock()
        q = FakeQuery(lands_at=40.0, clock=clk)
        assert _await_first_rows(q, _clock=clk.time,
                                 _sleep=clk.sleep) is True
        clk = FakeClock()
        q = FakeQuery(lands_at=50.0, clock=clk)
        assert _await_first_rows(q, _clock=clk.time,
                                 _sleep=clk.sleep) is False
        # a typo'd env value must degrade to the 90 s default instead
        # of raising before the gate can poll (round-12 review)
        os.environ["SPARK_GRAFT_STREAM_FIRST_BATCH_S"] = "ninety"
        clk = FakeClock()
        q = FakeQuery(lands_at=60.0, clock=clk)
        assert _await_first_rows(q, _clock=clk.time,
                                 _sleep=clk.sleep) is True
    finally:
        if old is None:
            del os.environ["SPARK_GRAFT_STREAM_FIRST_BATCH_S"]
        else:
            os.environ["SPARK_GRAFT_STREAM_FIRST_BATCH_S"] = old


def test_rows_only_gates_under_load(spark, sf_dir):
    """VERDICT r11 item 4: re-earn the rows-only queries' invariant
    gates under a DELIBERATELY LOADED scheduler, so a wall-clock-
    sensitive gate (the r11 driver window's one failure) fails here in
    CI before it fails in a driver round. A background thread keeps
    all task slots busy with short CPU-bound waves (the FIFO scheduler
    then delays every micro-batch and query stage, modeling the
    driver-run contention) while each rows-only query runs its body —
    every invariant gate the bodies carry must still pass."""
    import threading

    from dask_lambda_example_spark.registry import QUERIES, _ensure_loaded

    _ensure_loaded()
    rows_only = sorted(n for n, s in QUERIES.items() if s.oracle is None)
    assert "stream_rate_source_smoke" in rows_only

    stop = threading.Event()
    loader_errors: list[BaseException] = []

    def saturate():
        # waves of 64 ~0.5 s tasks: cores stay busy, slots free often.
        # Exceptions are RECORDED, not swallowed — a loader that died
        # on its first wave would silently turn this into an unloaded
        # run that verifies nothing (round-12 review).
        while not stop.is_set():
            try:
                (spark.range(0, 64 * 400_000, 1, 64)
                 .selectExpr("sha2(cast(id AS string), 256) AS h")
                 .agg(F.count("h")).collect())
            except BaseException as ex:  # noqa: BLE001
                loader_errors.append(ex)
                return

    loader = threading.Thread(target=saturate, daemon=True)
    loader.start()
    try:
        for name in rows_only:
            df = QUERIES[name].fn(spark, sf_dir)
            assert df.count() >= 0, name
        # the load must have survived the whole pass — a dead loader
        # means the gates ran on an idle scheduler
        assert loader.is_alive(), f"load thread died: {loader_errors}"
    finally:
        stop.set()
        loader.join(timeout=120)
    assert not loader.is_alive(), "load thread failed to stop"
    assert not loader_errors, loader_errors
