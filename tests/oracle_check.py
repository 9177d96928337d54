"""Order-insensitive Spark-vs-DuckDB comparison, modeled on the driver's
correctness gate (row count + column names + value hash with columns
sorted by name).

Strictness contract (round-2 tightening): the driver hashes RAW values
after a pandas conversion — bit-exact floats, int64 23 distinct from
float64 23.0, lists unhashable. ``_norm`` therefore uses shortest-
roundtrip ``repr`` for floats (bit-exact) and type-prefixes every value
so cross-type coincidences (bool vs int, int vs float) fail locally the
way they would fail at the driver."""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal


def _norm(v):
    if v is None:
        return "<NULL>"
    # bool before int: bool is an int subclass
    if isinstance(v, bool):
        return f"b:{int(v)}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:NaN"
        if v == 0:  # collapse -0.0 / 0.0 (pandas equality treats them equal)
            return "f:0.0"
        return f"f:{v!r}"  # shortest roundtrip — bit-exact
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, Decimal):
        # driver-side pandas turns DuckDB DECIMAL into float64; Spark
        # DecimalType stays Decimal — hash parity between them is not
        # guaranteed, so flag by normalizing at float bit-precision
        return f"f:{float(v)!r}"
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        # the driver's hasher CRASHES on list cells — keep local compare
        # functional for debugging, but parity_sweep flags these
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def canonical_rows(columns: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("|".join(_norm(r[i]) for i in order) for r in rows)


def compare(spark_df, duck_con, sql: str) -> None:
    """Assert the Spark DataFrame and the DuckDB result agree."""
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = duck_con.sql(sql)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols), (
        f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    )
    s_canon = canonical_rows(s_cols, s_rows)
    d_canon = canonical_rows(d_cols, d_rows)
    if s_canon != d_canon:
        diffs = [
            (a, b) for a, b in zip(s_canon, d_canon) if a != b
        ][:5]
        raise AssertionError(f"value mismatch, first diffs: {diffs}")
