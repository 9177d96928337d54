"""Property-based tests (SURVEY.md §5, VERDICT r5 item 7) for the three
distributed-selection shapes — ``win_ntile_distributed``,
``agg_percentile_exact_distributed`` and
``curation_quality_budget_select`` — against pure-Python ordered
references on generated corpora. The generators force the edge cases a
fixed fixture misses: ties at range-bucket boundaries (duplicate rows /
duplicate scores), empty buckets (32-way range shuffle over a handful
of rows), single-element groups, and budget cuts that land EXACTLY on
the cumulative-token boundary.

Each example writes a corpus shaped like the driver tables to a scratch
dir and runs the REGISTERED query end-to-end (range shuffle → offsets →
local windows), so the property covers the full distributed plan, not
an extracted kernel.
"""

from __future__ import annotations

import math
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _write_table(tmp: str, name: str, cols: dict) -> None:
    pq.write_table(pa.table(cols), f"{tmp}/{name}.parquet")


# ---------------------------------------------------------------------------
# global ntile via range-bucket distributed selection
# ---------------------------------------------------------------------------

# tiny domains → duplicate full rows, which are exactly the ties that
# straddle range-bucket boundaries; for indistinguishable rows only the
# (row, quartile) MULTISET is well-defined, so that is what we compare
_li_row = st.tuples(st.integers(0, 3), st.integers(0, 2), st.integers(0, 2),
                    st.integers(0, 1), st.integers(0, 4), st.integers(0, 5))
_li_rows = st.lists(_li_row, min_size=1, max_size=24)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=_li_rows)
def test_ntile_distributed_matches_ordered_reference(spark, rows):
    from dask_lambda_example_spark.operators.windows import (
        NTILE_K, _NTILE_ORDER, win_ntile_distributed)

    tmp = tempfile.mkdtemp(prefix="prop_ntile_")
    try:
        _write_table(tmp, "lineitem", {
            c: [r[i] for r in rows] for i, c in enumerate(_NTILE_ORDER)})
        got = sorted(
            (tuple(r) for r in win_ntile_distributed(spark, tmp)
             .collect()))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # pure-Python SQL-standard ntile over the totally ordered rows:
    # the first n mod k tiles take ceil(n/k) rows, the rest floor(n/k)
    n, k = len(rows), NTILE_K
    base, rem = divmod(n, k)
    expected = []
    for pos, r in enumerate(sorted(rows)):  # 0-based global position
        big_span = rem * (base + 1)
        if n < k:
            tile = pos + 1
        elif pos < big_span:
            tile = pos // (base + 1) + 1
        else:
            tile = rem + (pos - big_span) // base + 1
        expected.append((r[0], r[1], tile))
    assert got == sorted(expected), (rows, got)


# ---------------------------------------------------------------------------
# exact grouped percentiles via range-bucket distributed selection
# ---------------------------------------------------------------------------

_grp_rows = st.lists(
    st.tuples(st.sampled_from(["A", "B", "C"]), st.integers(0, 100)),
    min_size=1, max_size=24)


def _quantile_cont(xs: list[float], q: float) -> float:
    """DuckDB/NumPy 'linear' interpolation — the contract both the
    buffered and the distributed operator implement."""
    xs = sorted(xs)
    pos = q * (len(xs) - 1)
    frn, crn = math.floor(pos), math.ceil(pos)
    if frn == crn:
        return float(xs[frn])
    return (crn - pos) * xs[frn] + (pos - frn) * xs[crn]


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=_grp_rows)
def test_percentile_distributed_matches_reference(spark, rows):
    from dask_lambda_example_spark.operators.aggregates import (
        agg_percentile_exact_distributed)

    tmp = tempfile.mkdtemp(prefix="prop_pct_")
    try:
        _write_table(tmp, "lineitem", {
            "l_linestatus": [g for g, _ in rows],
            "l_extendedprice": [float(v) for _, v in rows]})
        got = {r["l_linestatus"]: (r["p50"], r["p90"], r["p99"])
               for r in agg_percentile_exact_distributed(spark, tmp)
               .collect()}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    groups: dict[str, list[float]] = {}
    for g, v in rows:
        groups.setdefault(g, []).append(float(v))
    assert set(got) == set(groups)
    for g, xs in groups.items():
        for have, q in zip(got[g], (0.5, 0.9, 0.99)):
            want = _quantile_cont(xs, q)
            # the operator sums two CASE contributions in double — last-
            # ulp noise vs the direct formula; both sides round to 6
            assert abs(have - round(want, 6)) <= 1e-6, (g, q, have, want)


# ---------------------------------------------------------------------------
# budgeted quality selection (ordered-prefix cut)
# ---------------------------------------------------------------------------

# token counts chosen so cumulative sums frequently land exactly ON the
# 10_000 budget (edge-exact cut: cum == budget is KEPT) and often
# overshoot mid-document; n_distinct <= n_tokens gives the score spread
# plus deliberate score ties (same (d, n) pair → tie broken by doc_id)
_doc = st.tuples(
    st.sampled_from([1, 3, 100, 2500, 5000, 9_999, 10_000]),  # n_tokens
    st.integers(1, 3))                                        # distinct id
_docs = st.lists(_doc, min_size=1, max_size=10)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(docs=_docs)
def test_quality_budget_select_matches_reference(spark, docs):
    from dask_lambda_example_spark.operators.curation import (
        SELECT_TOKEN_BUDGET, curation_quality_budget_select)

    texts = []
    for n_tokens, d_id in docs:
        d = min(d_id, n_tokens)  # d distinct tokens, rest repeat t0
        toks = [f"t{j}" for j in range(d)] + ["t0"] * (n_tokens - d)
        texts.append(" ".join(toks))

    tmp = tempfile.mkdtemp(prefix="prop_budget_")
    try:
        _write_table(tmp, "documents", {
            "doc_id": list(range(len(docs))), "text": texts})
        got = {r["doc_id"]: (r["n_tokens"], r["quality"], r["cum_tokens"])
               for r in curation_quality_budget_select(spark, tmp)
               .collect()}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # pure-Python ordered-prefix reference: sort by (score DESC, doc_id),
    # keep while the running token sum stays within the budget
    scored = []
    for i, (n_tokens, d_id) in enumerate(docs):
        d = min(d_id, n_tokens)
        scored.append((i, n_tokens, d / n_tokens))
    scored.sort(key=lambda t: (-t[2], t[0]))
    expected, cum = {}, 0
    for i, n_tokens, score in scored:
        cum += n_tokens
        if cum > SELECT_TOKEN_BUDGET:
            break  # prefix semantics: the first overshoot ends the cut
        expected[i] = (n_tokens, score, cum)

    assert set(got) == set(expected), (docs, got, expected)
    for i, (n_tokens, score, cum) in expected.items():
        g_tok, g_quality, g_cum = got[i]
        assert (g_tok, g_cum) == (n_tokens, cum), (i, got[i], expected[i])
        assert abs(g_quality - round(score, 6)) <= 1e-6, (i, g_quality, score)
