"""Generate an sf1 dataset (10x the sf0.1 bench scale) for LOCAL
scale-regression runs, without touching the read-only driver testdata.

Strategy: tile each scalable table 10x with key-shifting so referential
integrity (customer->orders->lineitem, part/supplier->lineitem) is
preserved and per-key cardinality ratios stay constant — the growth a
real 10x corpus has, not a 10x-duplicated one:

- keys shift by ``replica * (max_key + 1)`` consistently across the
  fact/dim chain;
- ``documents.text`` tokens are replica-salted (``tok~i``) so replicas
  are NOT near-duplicates of each other — shingle posting lists and
  near-dup pair counts grow linearly (10x), which is what a 10x-bigger
  real corpus does; an unperturbed copy would make every doc a 10-way
  near-dup family and blow the pair count up quadratically, testing
  output explosion rather than engine scaling;
- ``embeddings.embedding`` is component-ROLLED by the replica index
  (plus a tiny +replica*1e-4 perturbation so vectors are bitwise
  distinct).  Rolling every vector of a replica by the same offset
  preserves all norms and within-replica dot products exactly — each
  replica contributes the same near-dup pairs as the original, so
  pair counts grow linearly (10x) — while cross-replica cosines
  decorrelate (the components are iid-ish, so a rotated copy is not a
  near-duplicate of the original).  A perturbation-only copy (the
  first version of this generator) made every vector a 10-way
  near-identical family: pair-emitting queries (embedding near-dup,
  threshold join, SemDeDup cells) exploded ~100x in OUTPUT rows and
  the bench stalled pickling the collect — testing output explosion
  rather than engine scaling, the exact failure mode the documents
  token-salting avoids for shingle dedup;
- ``events.user_id`` is deliberately NOT shifted: the events tables'
  queries treat user_id as a low-cardinality hot-key dimension, so a
  10x corpus means 10x rows per user (density growth), mirroring how
  event streams actually scale;
- region/nation are fixed dimensions and copy through unchanged.

Output: ``/root/repo/.localdata/sf1/*.parquet`` (gitignored — ~200 MB).
Usage:  python tools/make_sf1.py [--reps 10]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.localdata/sf1"

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def main() -> int:
    reps = 10
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SRC}/{t}.parquet')")

    # key strides, shared across the referential chain
    k = {
        "c": con.sql("SELECT max(c_custkey)+1 FROM customer").fetchone()[0],
        "s": con.sql("SELECT max(s_suppkey)+1 FROM supplier").fetchone()[0],
        "p": con.sql("SELECT max(p_partkey)+1 FROM part").fetchone()[0],
        "o": con.sql("SELECT max(o_orderkey)+1 FROM orders").fetchone()[0],
        "e": con.sql("SELECT max(event_id)+1 FROM events").fetchone()[0],
        "d": con.sql("SELECT max(doc_id)+1 FROM documents").fetchone()[0],
        "v": con.sql("SELECT max(vec_id)+1 FROM embeddings").fetchone()[0],
    }

    def tiled(select_for_replica) -> str:
        return " UNION ALL ".join(select_for_replica(i) for i in range(reps))

    sql = {
        "region": "SELECT * FROM region",
        "nation": "SELECT * FROM nation",
        "customer": tiled(lambda i: f"""
            SELECT c_custkey + {i * k['c']} AS c_custkey, c_name,
                   c_nationkey, c_acctbal, c_mktsegment FROM customer"""),
        "supplier": tiled(lambda i: f"""
            SELECT s_suppkey + {i * k['s']} AS s_suppkey, s_name,
                   s_nationkey, s_acctbal FROM supplier"""),
        "part": tiled(lambda i: f"""
            SELECT p_partkey + {i * k['p']} AS p_partkey, p_name, p_brand,
                   p_type, p_size, p_retailprice FROM part"""),
        "orders": tiled(lambda i: f"""
            SELECT o_orderkey + {i * k['o']} AS o_orderkey,
                   o_custkey + {i * k['c']} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate,
                   o_orderpriority FROM orders"""),
        "lineitem": tiled(lambda i: f"""
            SELECT l_orderkey + {i * k['o']} AS l_orderkey,
                   l_partkey + {i * k['p']} AS l_partkey,
                   l_suppkey + {i * k['s']} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM lineitem"""),
        "events": tiled(lambda i: f"""
            SELECT event_id + {i * k['e']} AS event_id, ts, user_id,
                   event_type, value, props FROM events"""),
        "documents": tiled(lambda i: f"""
            SELECT doc_id + {i * k['d']} AS doc_id,
                   {"text" if i == 0 else
                    f"array_to_string(list_transform(string_split(text, ' '),"
                    f" t -> t || '~{i}'), ' ')"} AS text,
                   lang, source,
                   {"n_chars" if i == 0 else
                    "length(array_to_string(list_transform("
                    f"string_split(text, ' '), t -> t || '~{i}'), ' '))"}
                   AS n_chars
            FROM documents"""),
        "embeddings": tiled(lambda i: f"""
            SELECT vec_id + {i * k['v']} AS vec_id,
                   CAST(list_transform(
                        list_concat(
                            list_slice(embedding, {i} + 1, len(embedding)),
                            list_slice(embedding, 1, {i})),
                        x -> x + {i} * 1e-4) AS FLOAT[]) AS embedding,
                   label FROM embeddings"""),
    }

    for t in TABLES:
        out = os.path.join(DST, f"{t}.parquet")
        con.execute(f"COPY ({sql[t]}) TO '{out}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{t}: {n} rows -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
