"""Zipf-vocabulary growth tiers for ``dedup_fuzzy_title_pairs``
(VERDICT r9 item 2 follow-through): on tiers whose first-token
vocabulary is Zipfian (50% of titles share one hot token —
``tools/make_fuzzy_zipf.py``), measure

- the composite key's block-size / candidate-pair profile FROM THE
  QUERY'S OWN BLOCKED FRAME (df cap included — the numbers the
  registered query actually executes), vs the round-9 first-token key
  (``SPARK_GRAFT_FUZZY_SHALLOW_BLOCK=1``) whose max block grows
  linearly with n;
- wall-clock of the full query (noop sink) under the composite key at
  every tier, and under the shallow key only where its pair count is
  executable (the sf10-scale shallow count is 31.3 G pairs — counted,
  not joined).

Usage: python tools/fuzzy_zipf_tiers.py --tiers sf0.1=...,sf1=...,sf10=...
       [--time-shallow sf0.1,sf1]
       (CPU-exclusive — timed; run alone like bench.py)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    spec = sys.argv[sys.argv.index("--tiers") + 1]
    tiers = tuple(tuple(t.split("=", 1)) for t in spec.split(","))
    shallow_timed = ()
    if "--time-shallow" in sys.argv:
        shallow_timed = tuple(
            sys.argv[sys.argv.index("--time-shallow") + 1].split(","))

    from pyspark.sql import functions as F

    from dask_lambda_example_spark.operators import dedup as D
    from dask_lambda_example_spark.session import get_spark

    spark = get_spark("fuzzy-zipf-tiers")

    # This tool toggles SPARK_GRAFT_FUZZY_SHALLOW_BLOCK around its
    # shallow-key measurements; if the caller already exported it, the
    # "composite" rows would silently measure the shallow key (a
    # mislabeled artifact) and the finally-del would clobber the
    # caller's setting (ADVICE r10). Refuse the ambiguous environment.
    assert "SPARK_GRAFT_FUZZY_SHALLOW_BLOCK" not in os.environ, (
        "unset SPARK_GRAFT_FUZZY_SHALLOW_BLOCK before running this tool: "
        "it owns that toggle, and a pre-set value would mislabel the "
        "composite-key measurements")

    def block_stats(sf_dir: str) -> dict:
        row = (D._fuzzy_blocked_frame(spark, sf_dir)
               .groupBy("blk", "mh").agg(F.count("*").alias("c"))
               .agg(F.max("c").alias("max_block"),
                    F.sum(F.expr("c * (c - 1) / 2")).alias("pairs"))
               .collect()[0])
        return {"max_block": int(row["max_block"]),
                "candidate_pairs": int(row["pairs"])}

    for tag, sf_dir in tiers:
        rec = {"audit": "fuzzy_zipf_tiers", "sf": tag}
        rec["composite"] = block_stats(sf_dir)
        os.environ["SPARK_GRAFT_FUZZY_SHALLOW_BLOCK"] = "1"
        try:
            rec["shallow_first_token"] = block_stats(sf_dir)
        finally:
            del os.environ["SPARK_GRAFT_FUZZY_SHALLOW_BLOCK"]
        t0 = time.time()
        D.dedup_fuzzy_title_pairs(spark, sf_dir).write.format("noop") \
            .mode("overwrite").save()
        rec["composite"]["wall_s"] = round(time.time() - t0, 3)
        if tag in shallow_timed:
            os.environ["SPARK_GRAFT_FUZZY_SHALLOW_BLOCK"] = "1"
            try:
                t0 = time.time()
                D.dedup_fuzzy_title_pairs(spark, sf_dir) \
                    .write.format("noop").mode("overwrite").save()
                rec["shallow_first_token"]["wall_s"] = \
                    round(time.time() - t0, 3)
            finally:
                del os.environ["SPARK_GRAFT_FUZZY_SHALLOW_BLOCK"]
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
