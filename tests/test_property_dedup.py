"""Property-based test (SURVEY.md §5): the inverted-index Jaccard
near-dup join must match a brute-force all-pairs reference on arbitrary
generated corpora — seeded hypothesis search over shingle collisions,
identical docs, sub-shingle-length docs, empty docs, and singleton
corpora (the edge cases a fixed fixture misses). The query's scalable
formulation (posting-list equi-join, no cross product) and the O(n²)
reference must be EXTENSIONALLY equal wherever Jaccard ≥ threshold.
"""

from __future__ import annotations

import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dask_lambda_example_spark.operators.dedup import JACCARD_THRESHOLD

# tiny alphabet → forced shingle collisions; short docs → boundary cases
_word = st.sampled_from(["aa", "bb", "cc", "dd"])
_doc = st.lists(_word, min_size=0, max_size=8)
_corpus = st.lists(_doc, min_size=1, max_size=7)


def _shingles(tokens: list[str]) -> set[str]:
    # mirror operators.dedup.shingles: DISTINCT word 3-grams; <3 tokens
    # yield none (the sequence() guard)
    return {" ".join(tokens[i:i + 3]) for i in range(len(tokens) - 2)}


def _reference_pairs(corpus: list[list[str]]) -> dict[tuple[int, int], float]:
    sh = {i: _shingles(toks) for i, toks in enumerate(corpus)}
    out = {}
    for a in range(len(corpus)):
        for b in range(a + 1, len(corpus)):
            if not sh[a] or not sh[b]:
                continue  # no shingles → absent from the inverted index
            inter = len(sh[a] & sh[b])
            if inter == 0:
                continue
            jac = inter / len(sh[a] | sh[b])
            if jac >= JACCARD_THRESHOLD:
                out[(a, b)] = round(jac, 6)
    return out


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpus=_corpus)
def test_jaccard_pairs_match_bruteforce(spark, corpus):
    from dask_lambda_example_spark.registry import QUERIES, _ensure_loaded

    _ensure_loaded()
    sf = tempfile.mkdtemp(prefix="jacprop_")
    rows = [(i, " ".join(toks), "en", "prop", len(" ".join(toks)))
            for i, toks in enumerate(corpus)]
    (spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long")
     .coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet"))

    got = {(r.doc_a, r.doc_b): r.jaccard
           for r in QUERIES["dedup_jaccard_pairs"].fn(spark, sf).collect()}
    assert got == _reference_pairs(corpus)
