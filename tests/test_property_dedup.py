"""Hypothesis equivalence tests for the EXACT dedup operators: the
PPJoin prefix/positional-filter pipeline (ngram_jaccard_pairs) claims
losslessness vs naive all-pairs Jaccard, and the 4x15-bit SimHash
banding claims full recall for hamming <= 3 (pigeonhole). Both claims
are proved in docstrings; these tests search random corpora for a
counterexample.

Brute-force references replicate the operators' exact arithmetic:
shingle fallback for <k-token docs, the md5-derived portable 60-bit
hash, and Spark's HALF_UP rounding of the Jaccard value.
"""

from __future__ import annotations

import hashlib
from decimal import ROUND_HALF_UP, Decimal
from fractions import Fraction

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from scalable_etl_spark.operators.dedup import (
    SIMHASH_BITS,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)

SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)

VOCAB = ["red", "blue", "fox", "jump", "key", "scan", "row", "agg"]
DOC = st.lists(st.sampled_from(VOCAB), min_size=0, max_size=12).map(" ".join)
CORPUS = st.lists(DOC, min_size=2, max_size=10)


def _shingles(text: str, k: int = 3) -> frozenset[str]:
    """Replicates word_shingles_text: distinct k-word windows; docs with
    fewer than k tokens fall back to the whole collapsed text ('' for
    empty docs)."""
    toks = text.split()
    if len(toks) < k:
        return frozenset({" ".join(toks)})
    return frozenset(
        " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
    )


def _round4_half_up(fr: Fraction) -> float:
    # Spark's F.round is HALF_UP; Python's round() is banker's.
    return float(
        (Decimal(fr.numerator) / Decimal(fr.denominator)).quantize(
            Decimal("0.0001"), rounding=ROUND_HALF_UP
        )
    )


@given(corpus=CORPUS, threshold=st.sampled_from([0.5, 0.8]))
@settings(**SETTINGS)
def test_ngram_jaccard_prefix_filter_is_lossless(spark, corpus, threshold):
    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id INT, text STRING"
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            df, threshold=threshold, k=3
        ).collect()
    }
    expect = {}
    sh = {i: _shingles(t) for i, t in enumerate(corpus)}
    for a in range(len(corpus)):
        for b in range(a + 1, len(corpus)):
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            j = _round4_half_up(Fraction(inter, union))
            if j >= threshold:
                expect[(a, b)] = j
    assert got == expect


@given(
    xs=st.sets(st.integers(0, 50), max_size=30),
    ys=st.sets(st.integers(0, 50), max_size=30),
    depth=st.integers(0, 6),
)
@settings(max_examples=300, deadline=None, derandomize=True)
def test_suffix_probe_lower_bounds_hamming(xs, ys, depth):
    """The suffix-filter probe must NEVER exceed the true set-hamming
    distance — that inequality is the whole losslessness argument for
    pruning on it (ngram_jaccard_pairs suffix_filter=True). Pure-python
    property over random sets at every probe depth."""
    from scalable_etl_spark.operators.dedup import _suffix_ham_lb

    x, y = sorted(xs), sorted(ys)
    lb = _suffix_ham_lb(x, y, 0, len(x), 0, len(y), depth)
    true_ham = len(xs ^ ys)
    assert lb <= true_ham
    if depth >= 6:  # deep probe on tiny sets resolves exactly
        assert lb == true_ham


def _p64(s: str) -> int:
    return int(hashlib.md5(f"0:{s}".encode()).hexdigest()[:15], 16)


def _simhash(text: str) -> int | None:
    toks = set(text.split())
    if not toks:
        return None  # tokenless docs never enter the signature table
    sig = 0
    for b in range(SIMHASH_BITS):
        votes = sum(1 if (_p64(t) >> b) & 1 else -1 for t in toks)
        if votes > 0:
            sig |= 1 << b
    return sig


@given(corpus=CORPUS, max_hamming=st.sampled_from([0, 1, 3]))
@settings(**SETTINGS)
def test_simhash_banding_full_recall(spark, corpus, max_hamming):
    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id INT, text STRING"
    )
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_pairs(df, max_hamming=max_hamming).collect()
    }
    sigs = {i: _simhash(t) for i, t in enumerate(corpus)}
    expect = {}
    for a in range(len(corpus)):
        for b in range(a + 1, len(corpus)):
            if sigs[a] is None or sigs[b] is None:
                continue
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= max_hamming:
                expect[(a, b)] = h
    assert got == expect


@given(corpus=CORPUS)
@settings(**SETTINGS)
def test_minhash_lsh_invariants(spark, corpus):
    """MinHash LSH is approximate by DESIGN (recall < 1 for borderline
    pairs), so the property is one-sided: (a) NO false positives —
    every emitted pair's Jaccard (replayed exactly) clears the
    threshold; (b) exact duplicates are ALWAYS found — identical
    shingle sets minhash identically, so they collide in every band."""
    from scalable_etl_spark.operators.dedup import minhash_lsh_pairs

    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id INT, text STRING"
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(df, threshold=0.5).collect()
    }
    sh = {i: _shingles(t) for i, t in enumerate(corpus)}
    for (a, b), j in got.items():
        inter, union = len(sh[a] & sh[b]), len(sh[a] | sh[b])
        assert _round4_half_up(Fraction(inter, union)) == j >= 0.5
    for a in range(len(corpus)):
        for b in range(a + 1, len(corpus)):
            if sh[a] == sh[b]:
                assert (a, b) in got, "exact duplicate missed by LSH"


# ---------------------------------------------- hot-bucket cap property


@given(
    corpus=st.lists(DOC, min_size=2, max_size=12),
    cap=st.integers(min_value=1, max_value=6),
)
@settings(**SETTINGS)
def test_capped_bucket_pairs_subset_and_hub_coverage(spark, corpus, cap):
    """For ANY corpus and cap: capped candidates are a SUBSET of the
    exact banded self-join's candidates (core pairs and star edges
    are all genuine bucket cohabitants), and every member of an
    over-cap bucket still appears in >= 1 candidate pair (hub
    connectivity). With cap >= the largest bucket, capped == exact."""
    from pyspark.sql import functions as F

    from scalable_etl_spark.operators.dedup import (
        capped_bucket_pairs,
        minhash_band_table,
    )

    df = spark.createDataFrame(
        list(enumerate(corpus)), ["doc_id", "text"]
    )
    banded = minhash_band_table(df, 8, 4)
    exact = {
        (r.id_a, r.id_b)
        for r in capped_bucket_pairs(
            banded, ("band", "bucket"), "doc_id", None
        ).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in capped_bucket_pairs(
            banded, ("band", "bucket"), "doc_id", cap
        ).collect()
    }
    assert capped <= exact
    per = {}
    for r in banded.collect():
        per.setdefault((r.band, r.bucket), set()).add(r.doc_id)
    max_bucket = max((len(v) for v in per.values()), default=0)
    if max_bucket <= cap:
        assert capped == exact
    covered = {i for p in capped for i in p}
    for members in per.values():
        if len(members) > cap:
            assert members <= covered
