"""Round-13 growth tiers for the two new Tier-C operators (VERDICT r12
items 5/6): time the registered queries across sf tiers with the noop
sink (full distributed plan execution, no driver materialization — the
ledger protocol) and record the operator-specific scale evidence:

- ``incr_ann``: walls for ``sim_ivf_incremental_ingest`` +
  ``sim_ivf_incremental_recall`` per tier, plus the MEAN RECALL@k of
  the post-ingest multiprobe search (the sign-off number — new vectors
  are findable) and the ingest row count.
- ``substring``: wall for ``dedup_substring_spans`` per tier, plus
  span count, input docs and total grams — sub-quadratic scaling shows
  as wall growing ~linearly with tokens while docs² grows 100×.

CPU-exclusive — timed; run alone like bench.py.

Usage: python tools/r13_growth.py --mode incr_ann \
          --tiers sf0.1=/root/testdata/sf0.1,sf1=.localdata/sf1 \
          --out GROWTH_r13_incr_ann.json
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from dask_lambda_example_spark.registry import QUERIES, _ensure_loaded  # noqa: E402
from dask_lambda_example_spark.session import get_spark  # noqa: E402


def _arg(flag: str, default: str | None = None) -> str | None:
    return (sys.argv[sys.argv.index(flag) + 1]
            if flag in sys.argv else default)


def _timed_noop(spark, name: str, sf_dir: str) -> float:
    t0 = time.perf_counter()
    QUERIES[name].fn(spark, sf_dir).write.format("noop") \
        .mode("overwrite").save()
    return round(time.perf_counter() - t0, 4)


def main() -> int:
    mode = _arg("--mode")
    if mode not in ("incr_ann", "substring"):
        raise SystemExit(f"--mode must be incr_ann|substring, got {mode!r}")
    tiers_arg = _arg("--tiers")
    if not tiers_arg:
        raise SystemExit("--tiers name=dir[,name=dir...] is required")
    tiers = dict(kv.split("=", 1)
                 for kv in tiers_arg.split(",") if "=" in kv)
    out = _arg("--out")
    _ensure_loaded()
    spark = get_spark(f"r13-growth-{mode}")
    doc: dict = {"audit": f"r13_growth_{mode}", "sink": "noop"}

    for tier, sf_dir in tiers.items():
        rec: dict = {"sf_dir": sf_dir}
        if mode == "incr_ann":
            rec["ingest_wall_s"] = _timed_noop(
                spark, "sim_ivf_incremental_ingest", sf_dir)
            rec["ingest_rows"] = QUERIES["sim_ivf_incremental_ingest"] \
                .fn(spark, sf_dir).count()
            t0 = time.perf_counter()
            rows = QUERIES["sim_ivf_incremental_recall"] \
                .fn(spark, sf_dir).collect()
            rec["recall_wall_s"] = round(time.perf_counter() - t0, 4)
            rec["n_probes"] = len(rows)
            # a tier with no probe ids (vec_id % 25 == 0 and < 2000)
            # yields no rows — record null rather than dividing by zero
            # after the timed walls were already paid
            rec["mean_recall_at_k"] = (round(
                sum(r.recall_at_k for r in rows) / len(rows), 4)
                if rows else None)
        else:
            from pyspark.sql import functions as F

            from dask_lambda_example_spark.io import load_table
            from dask_lambda_example_spark.operators.dedup import SUBSTR_K

            rec["wall_s"] = _timed_noop(
                spark, "dedup_substring_spans", sf_dir)
            rec["n_spans"] = QUERIES["dedup_substring_spans"] \
                .fn(spark, sf_dir).count()
            d = load_table(spark, sf_dir, "documents", parallel=True)
            stats = d.select(
                F.count("*").alias("docs"),
                F.sum(F.greatest(
                    F.size(F.split("text", " ")) - (SUBSTR_K - 1),
                    F.lit(0))).alias("grams")).collect()[0]
            rec["n_docs"] = stats.docs
            rec["n_grams"] = int(stats.grams)
        doc[tier] = rec
        print(json.dumps({tier: rec}), file=sys.stderr, flush=True)

    line = json.dumps(doc)
    if out:
        Path(out).write_text(line + "\n")
    print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
