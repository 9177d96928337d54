"""PQ growth/recall tiers (VERDICT r9 item 4 follow-through): time the
PQ-ADC and IVF-PQ searches and compute mean recall@3 from the
registered recall report, per data tier, at the CURRENT ``PQ_BITS``
(env ``SPARK_GRAFT_PQ_BITS``; the oracle and the query share the
constant, so dialed runs stay oracle-comparable). One process per
bits setting — the constant is read at import.

Usage: python tools/pq_tiers.py --tiers sf0.01=/root/testdata/sf0.01,... \
           [--recall-only]
       (output is always JSON-lines; CPU-exclusive — timed; run alone
       like bench.py)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    spec = sys.argv[sys.argv.index("--tiers") + 1]
    tiers = tuple(tuple(t.split("=", 1)) for t in spec.split(","))
    recall_only = "--recall-only" in sys.argv

    from pyspark.sql import functions as F

    from dask_lambda_example_spark.operators import similarity as S
    from dask_lambda_example_spark.session import get_spark

    spark = get_spark("pq-tiers")
    for tag, sf_dir in tiers:
        rec = {"audit": "pq_tiers", "sf": tag, "pq_bits": S.PQ_BITS}
        if not recall_only:
            for name, fn in (("sim_pq_adc_search", S.sim_pq_adc_search),
                             ("sim_ivfpq_search", S.sim_ivfpq_search)):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                rec[name + "_s"] = round(time.time() - t0, 3)
        t0 = time.time()
        row = (S.sim_pq_recall_report(spark, sf_dir)
               .agg(F.avg("recall_at_k").alias("r"),
                    F.count("*").alias("n")).collect()[0])
        rec["recall_report_s"] = round(time.time() - t0, 3)
        rec["mean_recall_at_3"] = round(row["r"], 4)
        rec["n_probes"] = row["n"]
        # the refine stage (r11): ADC shortlist -> exact re-rank
        t0 = time.time()
        rrow = (S.sim_pq_rerank_recall(spark, sf_dir)
                .agg(F.avg("recall_at_k").alias("r")).collect()[0])
        rec["rerank_recall_s"] = round(time.time() - t0, 3)
        rec["mean_rerank_recall_at_3"] = round(rrow["r"], 4)
        rec["pq_rerank"] = S.PQ_RERANK
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
