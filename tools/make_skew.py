"""Derive a seeded ZIPF-SKEWED variant of a scaled dataset (VERDICT r5
item 3): the driver's TPC-H-ish testdata is near-uniform, so the skew
machinery (AQE skew-split, salting, two-phase aggs, stop-shingle caps)
only ever saw synthetic micro-cases. This tool rewrites the two
hot-key-prone tables of an existing ``.localdata/sf*`` tier:

- ``events.user_id``: one hot user (id 0) receives ~20% of all rows;
  the rest follow a power-law (Zipf-ish) over the original 1500-user
  domain — ``floor(N * u^3)`` gives P(idx)<k ∝ k^(1/3), i.e. a heavy
  head and a long tail. The reference's skewed ``groupby("name")``
  (layer/python/dask_processing.py:32) is the toy version of exactly
  this shape.
- ``documents.lang``: the hot language ('en') is pushed to ~70% of
  docs (from ~41%). Only the LABEL column is skewed — text content is
  untouched, so near-dup/shingle statistics stay identical and any
  measured delta in dedup queries isolates the hot-key group effect,
  not a changed pair structure.

Assignment is seeded/deterministic (``hash(event_id)`` / ``hash(doc_id)``),
so two generations produce bit-identical tables. Every other table is
hard-linked from the source tier (zero extra bytes).

Usage: python tools/make_skew.py [--src .localdata/sf1] [--dst .localdata/sf1_skew]
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/repo/.localdata/sf1"
DST = "/root/repo/.localdata/sf1_skew"

HOT_USER_PCT = 20       # % of event rows landing on user_id 0
HOT_LANG_PCT = 70       # % of documents labeled with the hot language
HOT_LANG = "en"
ZIPF_EXP = 3            # user = floor(N * u^ZIPF_EXP): bigger = more skew

ROW_GROUP_SIZE = 65536


def _link_tree(src: str, dst: str) -> None:
    if os.path.isfile(src):
        os.link(src, dst)
        return
    os.makedirs(dst, exist_ok=True)
    for f in sorted(os.listdir(src)):
        os.link(os.path.join(src, f), os.path.join(dst, f))


def main() -> int:
    src, dst = SRC, DST
    if "--src" in sys.argv:
        src = sys.argv[sys.argv.index("--src") + 1]
    if "--dst" in sys.argv:
        dst = sys.argv[sys.argv.index("--dst") + 1]
    if os.path.exists(dst):
        shutil.rmtree(dst)
    os.makedirs(dst)

    con = duckdb.connect()
    n_users = con.sql(
        "SELECT count(DISTINCT user_id) FROM "
        f"read_parquet('{src}/events.parquet{_glob(src, 'events')}')"
    ).fetchone()[0]

    for t in os.listdir(src):
        name = t.split(".parquet")[0]
        if name not in ("events", "documents"):
            _link_tree(os.path.join(src, t), os.path.join(dst, t))

    # events: deterministic per-row draw from hash(event_id); u in [0,1)
    ev_sql = f"""
        SELECT event_id, ts,
               CASE WHEN (hash(event_id) % 1000) < {HOT_USER_PCT * 10}
                    THEN CAST(0 AS BIGINT)
                    ELSE CAST(floor({n_users} *
                         pow((hash(event_id * 7919) % 1000000) / 1000000.0,
                             {ZIPF_EXP})) AS BIGINT)
               END AS user_id,
               event_type, value, props
        FROM read_parquet('{src}/events.parquet{_glob(src, 'events')}')
    """
    doc_sql = f"""
        SELECT doc_id, text,
               CASE WHEN (hash(doc_id) % 100) < {HOT_LANG_PCT}
                    THEN '{HOT_LANG}' ELSE lang END AS lang,
               source, n_chars
        FROM read_parquet('{src}/documents.parquet{_glob(src, 'documents')}')
    """
    for name, sql in (("events", ev_sql), ("documents", doc_sql)):
        out = os.path.join(dst, f"{name}.parquet")
        src_path = os.path.join(src, f"{name}.parquet")
        if os.path.isdir(src_path):
            # preserve the multi-part layout (split parallelism) by
            # bucketing on a stable key hash, one part per source part
            n_parts = len(os.listdir(src_path))
            os.makedirs(out, exist_ok=True)
            key = "event_id" if name == "events" else "doc_id"
            for i in range(n_parts):
                part_sql = (f"SELECT * FROM ({sql}) "
                            f"WHERE hash({key} * 31) % {n_parts} = {i}")
                con.execute(
                    f"COPY ({part_sql}) TO "
                    f"'{os.path.join(out, f'part-{i:05d}.parquet')}' "
                    f"(FORMAT PARQUET, ROW_GROUP_SIZE {ROW_GROUP_SIZE})")
        else:
            con.execute(f"COPY ({sql}) TO '{out}' "
                        f"(FORMAT PARQUET, ROW_GROUP_SIZE {ROW_GROUP_SIZE})")
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out}"
                    f"{_glob(dst, name)}')").fetchone()[0]
        print(f"{name}: {n} rows -> {out}", flush=True)

    # report the achieved skew so SCALE.md can cite it
    top = con.sql(f"""
        SELECT user_id, count(*) AS n,
               round(100.0 * count(*) / sum(count(*)) OVER (), 1) AS pct
        FROM read_parquet('{dst}/events.parquet{_glob(dst, 'events')}')
        GROUP BY 1 ORDER BY 2 DESC LIMIT 3""").fetchall()
    print(f"top event users (id, rows, pct): {top}")
    langs = con.sql(f"""
        SELECT lang, round(100.0 * count(*) / sum(count(*)) OVER (), 1)
        FROM read_parquet('{dst}/documents.parquet{_glob(dst, 'documents')}')
        GROUP BY 1 ORDER BY 2 DESC LIMIT 3""").fetchall()
    print(f"top langs (lang, pct): {langs}")
    return 0


def _glob(root: str, name: str) -> str:
    return ("/*.parquet"
            if os.path.isdir(os.path.join(root, f"{name}.parquet")) else "")


if __name__ == "__main__":
    raise SystemExit(main())
