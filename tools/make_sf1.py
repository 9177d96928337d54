"""Generate scaled datasets (sf1 = 10x, sf10 = 100x the sf0.1 bench
scale) for LOCAL scale-regression runs, without touching the read-only
driver testdata.

Strategy: tile each scalable table ``reps``x with key-shifting so
referential integrity (customer->orders->lineitem, part/supplier->
lineitem) is preserved and per-key cardinality ratios stay constant —
the growth a real bigger corpus has, not a duplicated one:

- keys shift by ``replica * (max_key + 1)`` consistently across the
  fact/dim chain;
- ``documents.text`` tokens are replica-salted (``tok~i``) so replicas
  are NOT near-duplicates of each other — shingle posting lists and
  near-dup pair counts grow linearly, which is what a bigger real
  corpus does; an unperturbed copy would make every doc an N-way
  near-dup family and blow the pair count up quadratically, testing
  output explosion rather than engine scaling;
- ``embeddings.embedding`` is component-ROLLED by ``replica % dim``
  (plus a tiny +replica*1e-4 perturbation so vectors are bitwise
  distinct), and SIGN-FLIPPED once the roll wraps (replica >= dim).
  Rolling/negating every vector of a replica identically preserves all
  norms and within-replica dot products exactly — each replica
  contributes the same near-dup pairs as the original, so pair counts
  grow linearly — while cross-replica cosines decorrelate: different
  roll → iid-ish components; same roll but opposite sign → cosine
  ≈ -1, far below any similarity threshold. (Without the flip,
  replicas i and i+dim would be near-identical at reps > dim and
  pair-emitting queries would explode ~reps²; valid for
  reps <= 2*dim = 128.)
- ``events.user_id`` is deliberately NOT shifted: the events tables'
  queries treat user_id as a low-cardinality hot-key dimension, so a
  bigger corpus means more rows per user (density growth), mirroring
  how event streams actually scale;
- region/nation are fixed dimensions and copy through unchanged.

Layout (VERDICT r5 item 1): every tiled table is a DIRECTORY of one
parquet part-file per replica with ROW_GROUP_SIZE=65536 — Spark can
only split a parquet file at row-group boundaries, so the old
single-file artifact serialized CPU-dense scans; this layout gives
``reps`` independent splits per table plus ~10 row groups per lineitem
part. ``io.load_table`` and ``io.parquet_rowcount`` already handle the
directory-of-parts shape.

Output: ``/root/repo/.localdata/sf{N}/`` (gitignored; sf1 ~200 MB,
sf10 ~2 GB).
Usage:  python tools/make_sf1.py [--reps 10] [--dst DIR]
        reps=100 --dst .localdata/sf10 builds the 100x tier.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.localdata/sf1"

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")
FIXED = ("region", "nation")  # fixed dims: copied once, single file

ROW_GROUP_SIZE = 65536


def main() -> int:
    reps = 10
    dst = DST
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    if "--dst" in sys.argv:
        dst = sys.argv[sys.argv.index("--dst") + 1]
    os.makedirs(dst, exist_ok=True)
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
    dim = con.sql("SELECT len(embedding) FROM embeddings LIMIT 1").fetchone()[0]
    if reps > 2 * dim:
        raise SystemExit(f"reps={reps} > 2*dim={2 * dim}: the roll+flip "
                         "decorrelation scheme would alias replicas")

    def replica_sql(t: str, i: int) -> str:
        if t == "customer":
            return f"""
            SELECT c_custkey + {i * k['c']} AS c_custkey, c_name,
                   c_nationkey, c_acctbal, c_mktsegment FROM customer"""
        if t == "supplier":
            return f"""
            SELECT s_suppkey + {i * k['s']} AS s_suppkey, s_name,
                   s_nationkey, s_acctbal FROM supplier"""
        if t == "part":
            return f"""
            SELECT p_partkey + {i * k['p']} AS p_partkey, p_name, p_brand,
                   p_type, p_size, p_retailprice FROM part"""
        if t == "orders":
            return f"""
            SELECT o_orderkey + {i * k['o']} AS o_orderkey,
                   o_custkey + {i * k['c']} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate,
                   o_orderpriority FROM orders"""
        if t == "lineitem":
            return f"""
            SELECT l_orderkey + {i * k['o']} AS l_orderkey,
                   l_partkey + {i * k['p']} AS l_partkey,
                   l_suppkey + {i * k['s']} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM lineitem"""
        if t == "events":
            return f"""
            SELECT event_id + {i * k['e']} AS event_id, ts, user_id,
                   event_type, value, props FROM events"""
        if t == "documents":
            salted = ("text" if i == 0 else
                      f"array_to_string(list_transform(string_split(text, ' '),"
                      f" t -> t || '~{i}'), ' ')")
            return f"""
            SELECT doc_id + {i * k['d']} AS doc_id, {salted} AS text,
                   lang, source,
                   {"n_chars" if i == 0 else f"length({salted})"} AS n_chars
            FROM documents"""
        if t == "embeddings":
            roll, sign = i % dim, (-1.0 if i >= dim else 1.0)
            return f"""
            SELECT vec_id + {i * k['v']} AS vec_id,
                   CAST(list_transform(
                        list_concat(
                            list_slice(embedding, {roll} + 1, len(embedding)),
                            list_slice(embedding, 1, {roll})),
                        x -> {sign} * (x + {i} * 1e-4)) AS FLOAT[])
                     AS embedding,
                   label FROM embeddings"""
        raise ValueError(t)

    for t in TABLES:
        if t in FIXED:
            out = os.path.join(dst, f"{t}.parquet")
            con.execute(f"COPY (SELECT * FROM {t}) TO '{out}' "
                        f"(FORMAT PARQUET, ROW_GROUP_SIZE {ROW_GROUP_SIZE})")
        else:
            out = os.path.join(dst, f"{t}.parquet")
            os.makedirs(out, exist_ok=True)
            for i in range(reps):
                part = os.path.join(out, f"part-{i:05d}.parquet")
                con.execute(
                    f"COPY ({replica_sql(t, i)}) TO '{part}' "
                    f"(FORMAT PARQUET, ROW_GROUP_SIZE {ROW_GROUP_SIZE})")
        n = con.sql(
            "SELECT count(*) FROM read_parquet("
            f"'{out}{'/*.parquet' if t not in FIXED else ''}')").fetchone()[0]
        print(f"{t}: {n} rows -> {out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
