"""Derive a Zipf-FIRST-TOKEN variant of a scaled tier's documents table
(VERDICT r9 item 2): the driver testdata's first-token vocabulary grows
with SF (~30 → 3000 types, max block constant), so the round-9 fuzzy
join's first-token blocking key never saw the regime it fails in — a
Zipfian vocabulary where one hot token heads a constant FRACTION of all
titles and the max block therefore grows linearly with n.

This tool rewrites ONLY the first token of ``documents.text``:

- ``HOT_PCT``% of documents get the hot token ('the');
- the rest draw from a power-law tail over ``VOCAB`` types
  (``w<floor(VOCAB * u^ZIPF_EXP)>``), the same ``floor(N * u^a)`` shape
  ``make_skew.py`` uses for events.user_id;
- everything AFTER the first token is byte-identical to the source
  tier, so title tails (the content the composite key's min-gram part
  hashes) keep their original diversity and the measured delta
  isolates the blocking-key effect.

Assignment is seeded/deterministic (``hash(doc_id)``); all other tables
hard-link from the source tier.

Usage: python tools/make_fuzzy_zipf.py [--src .localdata/sf1]
                                       [--dst .localdata/sf1_fuzzy]
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/repo/.localdata/sf1"
DST = "/root/repo/.localdata/sf1_fuzzy"

HOT_PCT = 50            # % of documents whose title starts with the hot token
HOT_TOKEN = "the"
VOCAB = 3000            # tail vocabulary size
ZIPF_EXP = 3            # w = floor(VOCAB * u^ZIPF_EXP): bigger = more skew

ROW_GROUP_SIZE = 65536


def _link_tree(src: str, dst: str) -> None:
    if os.path.isfile(src):
        os.link(src, dst)
        return
    os.makedirs(dst, exist_ok=True)
    for f in sorted(os.listdir(src)):
        os.link(os.path.join(src, f), os.path.join(dst, f))


def _glob(root: str, name: str) -> str:
    return ("/*.parquet"
            if os.path.isdir(os.path.join(root, f"{name}.parquet")) else "")


def main() -> int:
    src, dst = SRC, DST
    if "--src" in sys.argv:
        src = sys.argv[sys.argv.index("--src") + 1]
    if "--dst" in sys.argv:
        dst = sys.argv[sys.argv.index("--dst") + 1]
    if os.path.exists(dst):
        shutil.rmtree(dst)
    os.makedirs(dst)

    for t in os.listdir(src):
        name = t.split(".parquet")[0]
        if name != "documents":
            _link_tree(os.path.join(src, t), os.path.join(dst, t))

    con = duckdb.connect()
    # new first token, rest of the text untouched (substr from the end
    # of the original first token keeps the separating space)
    doc_sql = f"""
        SELECT doc_id,
               CASE WHEN (hash(doc_id) % 100) < {HOT_PCT}
                    THEN '{HOT_TOKEN}'
                    ELSE 'w' || CAST(floor({VOCAB} *
                         pow((hash(doc_id * 7919) % 1000000) / 1000000.0,
                             {ZIPF_EXP})) AS BIGINT)
               END || substr(text, strlen(string_split(text, ' ')[1]) + 1)
               AS text,
               lang, source, n_chars
        FROM read_parquet('{src}/documents.parquet{_glob(src, 'documents')}')
    """
    out = os.path.join(dst, "documents.parquet")
    src_path = os.path.join(src, "documents.parquet")
    if os.path.isdir(src_path):
        n_parts = len(os.listdir(src_path))
        os.makedirs(out, exist_ok=True)
        for i in range(n_parts):
            part_sql = (f"SELECT * FROM ({doc_sql}) "
                        f"WHERE hash(doc_id * 31) % {n_parts} = {i}")
            con.execute(
                f"COPY ({part_sql}) TO "
                f"'{os.path.join(out, f'part-{i:05d}.parquet')}' "
                f"(FORMAT PARQUET, ROW_GROUP_SIZE {ROW_GROUP_SIZE})")
    else:
        con.execute(f"COPY ({doc_sql}) TO '{out}' "
                    f"(FORMAT PARQUET, ROW_GROUP_SIZE {ROW_GROUP_SIZE})")

    # report the achieved skew + the two keys' max block sizes so the
    # growth artifact can cite them
    stats = con.sql(f"""
        WITH t AS (SELECT string_split(text, ' ')[1] AS blk,
                          array_to_string(list_slice(
                              string_split(text, ' '), 1, 3), ' ') AS title
                   FROM read_parquet('{out}{_glob(dst, 'documents')}')),
        tt AS (SELECT blk, substr(title, strlen(blk) + 2) AS ttail FROM t),
        tb AS (SELECT blk,
                      list_min(list_transform(
                          generate_series(1, greatest(strlen(ttail)-3, 1)),
                          i -> CAST(('0x' || substr(md5(substr(ttail,
                               CAST(i AS INT), 4)), 1, 8)) AS BIGINT)))
                      AS mh
               FROM tt)
        SELECT count(*) AS n_docs,
               (SELECT max(c) FROM (SELECT count(*) AS c FROM tb
                                    GROUP BY blk)) AS max_block_token,
               (SELECT max(c) FROM (SELECT count(*) AS c FROM tb
                                    GROUP BY blk, mh)) AS max_block_composite,
               (SELECT sum(c * (c - 1) / 2) FROM (SELECT count(*) AS c
                    FROM tb GROUP BY blk)) AS pairs_token,
               (SELECT sum(c * (c - 1) / 2) FROM (SELECT count(*) AS c
                    FROM tb GROUP BY blk, mh)) AS pairs_composite
        FROM tb
        """).fetchone()
    print(f"docs={stats[0]} max_block(first-token)={stats[1]} "
          f"max_block(composite)={stats[2]} "
          f"pairs(first-token)={int(stats[3])} "
          f"pairs(composite)={int(stats[4])}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
