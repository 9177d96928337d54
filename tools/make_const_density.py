"""Derive a CONSTANT-JOIN-DENSITY variant of a scaled tier's events
table (VERDICT r9 item 5): the stream-stream join's output is
Ω(pairs), and pairs grow with the square of per-key density — scaling
rows 10× over the SAME 1500-user domain (what ``make_sf1.py`` tiers do)
multiplies matching (view, click) pairs ~100×, so the sf10 wall-clock
is dominated by output volume, not by state management. This tool
widens the user domain by ``--fanout`` K as the rows scale, keeping
events per (user, hour) — and therefore join density — constant across
tiers, so a tier ladder built from it isolates the state-store cost the
watermark bounds.

Rewrite: ``user_id' = user_id * K + hash(event_id) % K`` — splits every
user into K deterministic shards (seeded, reproducible) while
preserving timestamps, types and values; all other tables hard-link
from the source tier.

Usage: python tools/make_const_density.py --src .localdata/sf1 \
          --dst .localdata/sf1_cdens --fanout 10
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

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
    src = sys.argv[sys.argv.index("--src") + 1]
    dst = sys.argv[sys.argv.index("--dst") + 1]
    fanout = int(sys.argv[sys.argv.index("--fanout") + 1])
    if os.path.exists(dst):
        shutil.rmtree(dst)
    os.makedirs(dst)

    for t in os.listdir(src):
        name = t.split(".parquet")[0]
        if name != "events":
            _link_tree(os.path.join(src, t), os.path.join(dst, t))

    con = duckdb.connect()
    ev_sql = f"""
        SELECT event_id, ts,
               CAST(user_id * {fanout}
                    + hash(event_id) % {fanout} AS BIGINT) AS user_id,
               event_type, value, props
        FROM read_parquet('{src}/events.parquet{_glob(src, 'events')}')
    """
    out = os.path.join(dst, "events.parquet")
    src_path = os.path.join(src, "events.parquet")
    if os.path.isdir(src_path):
        n_parts = len(os.listdir(src_path))
        os.makedirs(out, exist_ok=True)
        for i in range(n_parts):
            part_sql = (f"SELECT * FROM ({ev_sql}) "
                        f"WHERE hash(event_id * 31) % {n_parts} = {i}")
            con.execute(
                f"COPY ({part_sql}) TO "
                f"'{os.path.join(out, f'part-{i:05d}.parquet')}' "
                f"(FORMAT PARQUET, ROW_GROUP_SIZE {ROW_GROUP_SIZE})")
    else:
        con.execute(f"COPY ({ev_sql}) TO '{out}' "
                    f"(FORMAT PARQUET, ROW_GROUP_SIZE {ROW_GROUP_SIZE})")

    stats = con.sql(f"""
        SELECT count(*) AS n,
               count(DISTINCT user_id) AS n_users,
               count(*) * 1.0 / count(DISTINCT user_id) AS rows_per_user
        FROM read_parquet('{out}{_glob(dst, 'events')}')""").fetchone()
    print(f"events={stats[0]} users={stats[1]} "
          f"rows/user={stats[2]:.1f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
