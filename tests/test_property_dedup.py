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


def _hex32(token: str) -> int:
    import hashlib

    return int(hashlib.md5(token.encode()).hexdigest()[:8], 16)


def _reference_minhash_pairs(
        corpus: list[list[str]]) -> dict[tuple[int, int], float]:
    """Pure-Python replica of the FULL minhash→band→verify pipeline
    (16 universal hashes from two md5-derived values, 8 bands of 2) —
    including LSH's false negatives, which are part of the contract."""
    sh = {i: _shingles(toks) for i, toks in enumerate(corpus)}
    sigs = {}
    for i, s in sh.items():
        if not s:
            continue
        hs = [(_hex32(t), _hex32(t + "#")) for t in s]
        sigs[i] = [min((h1 + j * h2) % 4_294_967_296 for h1, h2 in hs)
                   for j in range(16)]
    buckets: dict[tuple[int, str], list[int]] = {}
    for i, sig in sigs.items():
        for b in range(8):
            buckets.setdefault(
                (b, f"{sig[2 * b]}|{sig[2 * b + 1]}"), []).append(i)
    cands = {tuple(sorted((x, y)))
             for ids in buckets.values() if len(ids) > 1
             for xi, x in enumerate(ids) for y in ids[xi + 1:]}
    out = {}
    for a, b in sorted(cands):
        jac = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
        if jac >= JACCARD_THRESHOLD:
            out[(a, b)] = round(jac, 6)
    return out


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpus=_corpus)
def test_minhash_lsh_pairs_match_reference(spark, corpus):
    from dask_lambda_example_spark.registry import QUERIES, _ensure_loaded

    _ensure_loaded()
    sf = tempfile.mkdtemp(prefix="mhprop_")
    rows = [(i, " ".join(toks), "en", "prop", len(" ".join(toks)))
            for i, toks in enumerate(corpus)]
    (spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long")
     .coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet"))

    got = {(r.doc_a, r.doc_b): r.jaccard for r in
           QUERIES["dedup_minhash_lsh_pairs"].fn(spark, sf).collect()}
    assert got == _reference_minhash_pairs(corpus)


def _reference_simhash(tokens: list[str]) -> int:
    """Pure-Python replica of dedup_simhash: DISTINCT unigrams vote ±1
    per bit of their 32-bit md5-derived hash; bit set iff the vote sum
    is STRICTLY positive (ties → 0, the documented convention)."""
    votes = [0] * 32
    for t in set(tokens):
        h = _hex32(t)
        for i in range(32):
            votes[i] += 1 if (h >> i) & 1 else -1
    return sum(1 << i for i in range(32) if votes[i] > 0)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpus=_corpus)
def test_simhash_matches_reference(spark, corpus):
    from dask_lambda_example_spark.registry import QUERIES, _ensure_loaded

    _ensure_loaded()
    sf = tempfile.mkdtemp(prefix="shprop_")
    rows = [(i, " ".join(toks), "en", "prop", len(" ".join(toks)))
            for i, toks in enumerate(corpus)]
    (spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long")
     .coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet"))

    got = {r.doc_id: r.simhash for r in
           QUERIES["dedup_simhash"].fn(spark, sf).collect()}
    # the query tokenizes the JOINED text, so the reference must split
    # identically (an empty doc becomes the single empty-string token)
    exp = {i: _reference_simhash(" ".join(toks).split(" "))
           for i, toks in enumerate(corpus)}
    assert got == exp


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
