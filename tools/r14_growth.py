"""Round-14 growth tiers for the three new operators (VERDICT r13
items 3/4/5): time each registered query across sf tiers with the noop
sink (full distributed plan execution, no driver materialization — the
ledger protocol) and record the operator-specific scale evidence:

- ``incr_rerank``: walls for ``sim_ivf_incremental_rerank_search`` per
  tier plus MEAN RECALL@k (exact-L2 audit) of THREE paths: the
  incremental refined serving path, the NON-incremental corpus-path
  ``sim_ivfpq_rerank_search`` at the same 2-cell dial (the
  apples-to-apples "corpus-path level" the refine must match — cell
  membership bounds both identically), and the multiprobe-only
  ``sim_ivf_incremental_recall`` (cosine audit, the r13 0.21-0.25
  baseline row).
- ``cutlist``: wall for ``dedup_substring_cutlist`` per tier, plus
  merged-range count and total tokens cut — the consumer stage must
  stay a small constant over the span detection it nests.
- ``image_phash``: wall for ``dedup_image_phash`` per tier, plus
  image count and candidate-pair count — banded candidates must grow
  far slower than images².

CPU-exclusive — timed; run alone like bench.py.

Usage: python tools/r14_growth.py --mode incr_rerank \
          --tiers sf0.1=/root/testdata/sf0.1,sf1=.localdata/sf1 \
          --out GROWTH_r14_incr_rerank.json
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

MODES = ("incr_rerank", "cutlist", "image_phash", "audio_canonical",
         "video_fingerprint")


def _arg(flag: str, default: str | None = None) -> str | None:
    return (sys.argv[sys.argv.index(flag) + 1]
            if flag in sys.argv else default)


def _timed_noop(spark, name: str, sf_dir: str) -> float:
    t0 = time.perf_counter()
    QUERIES[name].fn(spark, sf_dir).write.format("noop") \
        .mode("overwrite").save()
    return round(time.perf_counter() - t0, 4)


def _mean_recall(spark, name: str, sf_dir: str):
    rows = QUERIES[name].fn(spark, sf_dir).collect()
    if not rows:
        return None, 0
    return round(sum(r.recall_at_k for r in rows) / len(rows), 4), len(rows)


def _mean_recall_vs_exact_l2(spark, sf_dir: str, result_df):
    """Mean recall@PQ_TOPK of a (query_id, neighbor_id) frame against
    exact squared-L2 brute force — the sim_pq_rerank_recall audit shape
    applied to an arbitrary search result (used for the corpus-path
    sim_ivfpq_rerank_search, which has no registered recall twin)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dask_lambda_example_spark.functions.vector import as_double, dot
    from dask_lambda_example_spark.io import load_table
    from dask_lambda_example_spark.operators.similarity import (
        PQ_TOPK, _probe_filter)

    e = load_table(spark, sf_dir, "embeddings", parallel=True).select(
        "vec_id", as_double(F.col("embedding")).alias("emb"))
    q = (e.filter(_probe_filter())
          .select(F.col("vec_id").alias("query_id"),
                  F.col("emb").alias("qemb"),
                  dot(F.col("emb"), F.col("emb")).alias("qq")))
    c = e.select(F.col("vec_id").alias("neighbor_id"),
                 F.col("emb").alias("cemb"),
                 dot(F.col("emb"), F.col("emb")).alias("cc"))
    d2 = (F.col("qq") - 2 * dot(F.col("qemb"), F.col("cemb"))
          + F.col("cc"))
    wrank = Window.partitionBy("query_id").orderBy(d2, F.asc("neighbor_id"))
    exact_k = (F.broadcast(q)
               .join(c, F.col("neighbor_id") != F.col("query_id"))
               .withColumn("rank", F.row_number().over(wrank))
               .filter(F.col("rank") <= PQ_TOPK)
               .select("query_id", "neighbor_id"))
    hits = result_df.select("query_id",
                            F.col("neighbor_id").alias("rn"))
    rows = (exact_k.join(
                hits, (exact_k.query_id == hits.query_id)
                & (exact_k.neighbor_id == hits.rn), "left")
            .groupBy(exact_k.query_id)
            .agg((F.count("rn") / PQ_TOPK).alias("recall"))
            .collect())
    if not rows:
        return None
    return round(sum(r.recall for r in rows) / len(rows), 4)


def main() -> int:
    mode = _arg("--mode")
    if mode not in MODES:
        raise SystemExit(f"--mode must be one of {MODES}, got {mode!r}")
    tiers_arg = _arg("--tiers")
    if not tiers_arg:
        raise SystemExit("--tiers name=dir[,name=dir...] is required")
    tiers = dict(kv.split("=", 1)
                 for kv in tiers_arg.split(",") if "=" in kv)
    out = _arg("--out")
    _ensure_loaded()
    spark = get_spark(f"r14-growth-{mode}")
    doc: dict = {"audit": f"r14_growth_{mode}", "sink": "noop"}

    for tier, sf_dir in tiers.items():
        rec: dict = {"sf_dir": sf_dir}
        if mode == "incr_rerank":
            rec["rerank_wall_s"] = _timed_noop(
                spark, "sim_ivf_incremental_rerank_search", sf_dir)
            t0 = time.perf_counter()
            rec["rerank_mean_recall_at_k"], rec["n_probes"] = _mean_recall(
                spark, "sim_ivf_incremental_rerank_recall", sf_dir)
            rec["rerank_recall_wall_s"] = round(time.perf_counter() - t0, 4)
            # the apples-to-apples sign-off: the NON-incremental
            # corpus-path rerank at the SAME 2-cell dial and metric —
            # the incremental index must serve at parity with it (cell
            # membership bounds both; the ingest must cost nothing)
            rec["corpus_path_mean_recall_at_k"] = _mean_recall_vs_exact_l2(
                spark, sf_dir,
                QUERIES["sim_ivfpq_rerank_search"].fn(spark, sf_dir))
            # the r13 baseline row: multiprobe-only (cosine audit)
            rec["multiprobe_mean_recall_at_k"], _ = _mean_recall(
                spark, "sim_ivf_incremental_recall", sf_dir)
        elif mode == "cutlist":
            rec["wall_s"] = _timed_noop(
                spark, "dedup_substring_cutlist", sf_dir)
            rows = QUERIES["dedup_substring_cutlist"].fn(
                spark, sf_dir).collect()
            rec["n_ranges"] = len(rows)
            rec["n_docs_cut"] = len({r.doc_id for r in rows})
            rec["tokens_cut"] = int(sum(r.cut_len for r in rows))
        elif mode == "video_fingerprint":
            # video × dedup: O(n) canonical output; the wall is the
            # per-clip demux + 6-frame JPEG decode, nothing corpus-wide
            from pyspark.sql import functions as F

            rec["wall_s"] = _timed_noop(
                spark, "dedup_video_fingerprint", sf_dir)
            out_df = QUERIES["dedup_video_fingerprint"].fn(spark, sf_dir)
            agg = out_df.agg(
                F.count("*").alias("n"),
                F.sum((F.col("canonical") != F.col("doc_id"))
                      .cast("long")).alias("dups")).collect()[0]
            rec["n_rows"] = int(agg["n"])
            rec["n_deduped"] = int(agg["dups"] or 0)
        elif mode == "audio_canonical":
            # round-14 second wave: both canonical-assignment consumers
            # must emit O(n) rows (one per object) at EVERY tier — the
            # contrast with the pair emitter's Σ class² output — and
            # the wall must track the decode pass, not class sizes.
            from pyspark.sql import functions as F

            for qname, key in (("dedup_image_phash_canonical", "img"),
                               ("dedup_audio_fingerprint", "audio")):
                rec[f"{key}_wall_s"] = _timed_noop(spark, qname, sf_dir)
                out_df = QUERIES[qname].fn(spark, sf_dir)
                agg = out_df.agg(
                    F.count("*").alias("n"),
                    F.sum((F.col("canonical") != F.col("doc_id"))
                          .cast("long")).alias("dups")).collect()[0]
                rec[f"{key}_n_rows"] = int(agg["n"])
                rec[f"{key}_n_deduped"] = int(agg["dups"] or 0)
        else:  # image_phash
            from pyspark.sql import functions as F

            from dask_lambda_example_spark.io import load_table
            from dask_lambda_example_spark.operators.multimodal import (
                PNG_SAMPLE_EVERY)

            rec["wall_s"] = _timed_noop(
                spark, "dedup_image_phash", sf_dir)
            rec["n_pairs"] = QUERIES["dedup_image_phash"].fn(
                spark, sf_dir).count()
            rec["n_images"] = (
                load_table(spark, sf_dir, "documents")
                .filter(F.col("doc_id") % PNG_SAMPLE_EVERY == 0).count())
        doc[tier] = rec
        print(json.dumps({tier: rec}), file=sys.stderr, flush=True)

    line = json.dumps(doc)
    if out:
        Path(out).write_text(line + "\n")
    print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
