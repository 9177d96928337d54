"""Constant-density stream-stream join tier (VERDICT r9 item 5): run
the watermarked stream-stream attribution join over a tier ladder
whose JOIN DENSITY (events per user per hour) is held constant while
row count grows 10× per step — ``tools/make_const_density.py`` widens
the user domain in step with the rows. On the plain ladder the join's
output grows ~quadratically (density²) and wall-clock is output-bound;
on this ladder output grows ~linearly, so the ladder isolates the
STATE-MANAGEMENT cost (watermark-bounded state rows, per-batch state
store maintenance) that the output volume otherwise hides.

Reuses the stream-scale audit's query builder and telemetry distiller
(progress-derived rows/s and peak state, not wall-clock guesswork).

Usage: python tools/stream_density_tier.py --json OUT.json \
          --tiers sf0.1=/root/testdata/sf0.1,sf1=...,sf10=...
       (CPU-exclusive — timed; run alone like bench.py)
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from stream_scale_audit import _run_to_completion, join_query  # noqa: E402


def main() -> int:
    out_path = None
    if "--json" in sys.argv:
        out_path = sys.argv[sys.argv.index("--json") + 1]
    spec = sys.argv[sys.argv.index("--tiers") + 1]
    tiers = tuple(tuple(t.split("=", 1)) for t in spec.split(","))

    from dask_lambda_example_spark.session import get_spark

    spark = get_spark("stream-density-tier")
    results = []
    for tag, sf_dir in tiers:
        if not os.path.exists(f"{sf_dir}/events.parquet"):
            print(f"SKIP {tag}: {sf_dir} missing", file=sys.stderr)
            continue
        # ONE micro-batch per tier: the ladder measures STATE cost, so
        # the whole backlog must be resident in the state store at once
        # (a sliced replay would watermark-drop the later slices and
        # report batch-1 state only).
        m = _run_to_completion(
            join_query(spark, sf_dir, files_per_trigger=None), "append")
        rec = {"audit": "stream_stream_join_const_density", "sf": tag,
               "sf_dir": sf_dir, **m}
        results.append(rec)
        print(json.dumps(rec), flush=True)
    if out_path:
        Path(out_path).write_text(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
