"""Change-data-capture snapshot diff: given two snapshots of a keyed
table, emit the insert / update / delete rows that transform one into
the other — the incremental-refresh primitive behind training-data
recrawls ("what changed since the last corpus cut?") and slowly-
changing dimension maintenance.

No reference analog (the reference recomputes from scratch each
trigger, ``app.py:131-134``); this is the capability a user grows into
once recomputation stops being affordable. North-star extension tier.

Scale posture (100 TB): ONE full-outer shuffle join keyed on the table
key — both snapshots hash-partition once; with both snapshots bucketed
on the key (``operators/skew.py`` shows the layout) the diff is
exchange-free. The unchanged majority is dropped before any further
operator sees it, so downstream incremental apply touches only the
delta. Payload comparison is null-safe equality (``<=>``), never a
row-serialization detour.

The two snapshots are derived deterministically from ``orders`` by
key arithmetic (no RNG), so the DuckDB oracle reproduces them exactly:
  - keys ≡ 0 (mod 89) are missing from snapshot A  → inserts
  - keys ≡ 0 (mod 97) are missing from snapshot B  → deletes
  - keys ≡ 0 (mod 13) carry a repriced payload in B → updates
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dask_lambda_example_spark.io import load_table
from dask_lambda_example_spark.registry import query

_INS_MOD, _DEL_MOD, _UPD_MOD = 89, 97, 13


@query(
    "cdc_snapshot_diff",
    oracle=f"""
    WITH a AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        WHERE o_orderkey % {_INS_MOD} <> 0),
    b AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % {_UPD_MOD} = 0 THEN 'U'
                    ELSE o_orderstatus END AS o_orderstatus,
               CASE WHEN o_orderkey % {_UPD_MOD} = 0
                    THEN o_totalprice * 1.1
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % {_DEL_MOD} <> 0)
    SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
           CASE WHEN a.o_orderkey IS NULL THEN 'insert'
                WHEN b.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           a.o_orderstatus AS old_status, b.o_orderstatus AS new_status,
           a.o_totalprice AS old_price, b.o_totalprice AS new_price
    FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
    WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
       OR NOT (a.o_orderstatus IS NOT DISTINCT FROM b.o_orderstatus
               AND a.o_totalprice IS NOT DISTINCT FROM b.o_totalprice)
    """,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-snapshot CDC delta over ``orders``: full outer join
    on the key, classify each row insert / update / delete, drop the
    unchanged majority. Payload equality is the null-safe ``<=>`` on
    the compared columns — bit-exact because both snapshots derive from
    the same scan (the one float mutation, ``*1.1``, is a single double
    multiply — bit-identical in both engines, so no rounding is needed
    anywhere)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    snap_a = o.filter(F.col("o_orderkey") % _INS_MOD != 0)
    upd = F.col("o_orderkey") % _UPD_MOD == 0
    snap_b = (
        o.filter(F.col("o_orderkey") % _DEL_MOD != 0)
        .select(
            "o_orderkey",
            F.when(upd, F.lit("U")).otherwise(F.col("o_orderstatus"))
            .alias("o_orderstatus"),
            F.when(upd, F.col("o_totalprice") * 1.1)
            .otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        )
    )
    a, b = snap_a.alias("a"), snap_b.alias("b")
    same = (F.col("a.o_orderstatus").eqNullSafe(F.col("b.o_orderstatus"))
            & F.col("a.o_totalprice").eqNullSafe(F.col("b.o_totalprice")))
    return (
        a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"),
               "full_outer")
        .filter(F.col("a.o_orderkey").isNull()
                | F.col("b.o_orderkey").isNull() | ~same)
        .select(
            F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey"))
            .alias("o_orderkey"),
            F.when(F.col("a.o_orderkey").isNull(), "insert")
            .when(F.col("b.o_orderkey").isNull(), "delete")
            .otherwise("update").alias("change_type"),
            F.col("a.o_orderstatus").alias("old_status"),
            F.col("b.o_orderstatus").alias("new_status"),
            F.col("a.o_totalprice").alias("old_price"),
            F.col("b.o_totalprice").alias("new_price"),
        )
    )


@query(
    "cdc_apply_upsert",
    oracle=f"""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % {_UPD_MOD} = 0 THEN 'U'
                ELSE o_orderstatus END AS o_orderstatus,
           CASE WHEN o_orderkey % {_UPD_MOD} = 0
                THEN o_totalprice * 1.1
                ELSE o_totalprice END AS o_totalprice
    FROM orders WHERE o_orderkey % {_DEL_MOD} <> 0
    """,
)
def cdc_apply_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-apply: fold the CDC delta back into the old snapshot and
    reconstruct the new one — the upsert half of the reference's A17
    metadata-upsert surface, expressed as pure DataFrame algebra:

        new = (old ANTI JOIN deleted∪updated keys)
              UNION ALL (insert∪update payloads)

    The oracle is snapshot B itself, so the operator is verified by
    round-trip: diff then apply reproduces the target table exactly,
    bit-for-bit. Scale shape: the delta is small next to the snapshot —
    the anti join broadcasts the delta's key set and the union is
    scan-concatenation, no shuffle of the surviving majority."""
    delta = cdc_snapshot_diff(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    snap_a = o.filter(F.col("o_orderkey") % _INS_MOD != 0)
    touched = delta.select("o_orderkey")
    new_rows = (
        delta.filter(F.col("change_type") != "delete")
        .select("o_orderkey",
                F.col("new_status").alias("o_orderstatus"),
                F.col("new_price").alias("o_totalprice"))
    )
    return (
        snap_a.join(F.broadcast(touched), "o_orderkey", "left_anti")
        .unionByName(new_rows)
    )
