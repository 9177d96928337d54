"""Property-based test (SURVEY.md §5): the binned band join must find
EXACTLY the brute-force pair set on arbitrary generated inputs — the
property at risk is candidate-set completeness (a value within the band
whose partner lands two bins away would be silently dropped; the 3-bin
explode plus ``w ≤ bin width`` is the invariant that makes that
impossible), including negative values (the floor-vs-truncation
pitfall ADVICE r6 found in the rolling windows) and exact-boundary
values ``|Δ| = w``."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dask_lambda_example_spark.operators.joins import binned_band_join

# values straddle zero and bin boundaries on purpose; quarters make the
# |Δ| = w boundary exactly representable so the boundary case actually
# fires instead of washing out in float noise
vals = st.integers(min_value=-40, max_value=40).map(lambda q: q / 4.0)
rows = st.lists(vals, min_size=1, max_size=14)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(probe_vals=rows, corpus_vals=rows,
       w=st.sampled_from([0.5, 1.0, 2.5]))
def test_binned_band_join_matches_bruteforce(spark, probe_vals,
                                             corpus_vals, w):
    probes = spark.createDataFrame(
        [(i, v) for i, v in enumerate(probe_vals)], "ka long, va double")
    corpus = spark.createDataFrame(
        [(1000 + j, v) for j, v in enumerate(corpus_vals)],
        "kb long, vb double")
    got = {(r.ka, r.kb) for r in
           binned_band_join(probes, corpus, "ka", "va", "kb", "vb", w)
           .collect()}
    want = {(i, 1000 + j)
            for i, a in enumerate(probe_vals)
            for j, b in enumerate(corpus_vals)
            if abs(b - a) <= w}
    assert got == want, (probe_vals, corpus_vals, w)
