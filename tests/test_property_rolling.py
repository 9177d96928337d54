"""Property-based test (SURVEY.md §5) for the bucketed-overlap rolling
time-range window — the round-6 skew-battery fix. The bucketed form
must equal a pure-Python O(n²) reference (and therefore the plain
window) on generated corpora whose timestamps CLUSTER AT BUCKET
BOUNDARIES: rows exactly at multiples of the frame width, one second
either side, duplicate timestamps per entity, and entities whose whole
history lands in one bucket. These are the edge cases where an
off-by-one in the context-copy rule (which bucket a row is duplicated
into, whether the frame's closed lower bound ``ep - W`` reaches the
previous bucket's first row) silently drops or double-counts frame
members.

Each example writes an events-shaped corpus to a scratch dir and runs
the REGISTERED query end-to-end (union → (entity, bucket) shuffle →
range frame → native filter), covering the full distributed plan.
"""

from __future__ import annotations

import datetime
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

W = 3600  # must match windows.ROLL_FRAME_SECONDS

# boundary-heavy epoch domain: exact multiples of the bucket width,
# one-second neighbours, and mid-bucket values across three buckets
_EPOCHS = st.sampled_from(
    [0, 1, 1800, 3599, 3600, 3601, 5400, 7199, 7200, 7201, 10799, 10800])
_ROWS = st.lists(st.tuples(st.integers(0, 2), _EPOCHS),
                 min_size=1, max_size=24)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=_ROWS)
def test_rolling_bucketed_matches_quadratic_reference(spark, rows):
    from dask_lambda_example_spark.operators.windows import (
        ROLL_FRAME_SECONDS, win_rolling_time_range_bucketed)

    assert ROLL_FRAME_SECONDS == W
    base = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
    tmp = tempfile.mkdtemp(prefix="prop_roll_")
    try:
        pq.write_table(pa.table({
            "event_id": list(range(len(rows))),
            "user_id": [u for u, _ in rows],
            "ts": pa.array(
                [base + datetime.timedelta(seconds=ep) for _, ep in rows],
                type=pa.timestamp("us", tz="UTC")),
            "event_type": ["view"] * len(rows),
            "value": [float(i) for i in range(len(rows))],
        }), f"{tmp}/events.parquet")
        got = {r["event_id"]: (r["roll_avg_1h"], r["n_1h"])
               for r in win_rolling_time_range_bucketed(spark, tmp)
               .collect()}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    assert len(got) == len(rows)
    for i, (u, ep) in enumerate(rows):
        frame = [float(j) for j, (u2, ep2) in enumerate(rows)
                 if u2 == u and ep - W <= ep2 <= ep]
        want_avg = round(sum(frame) / len(frame), 6)
        assert got[i] == (want_avg, len(frame)), (
            i, rows, got[i], (want_avg, len(frame)))
