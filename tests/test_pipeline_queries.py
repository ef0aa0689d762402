"""Corpus-curation query tests (queries_pipeline.py): repetition
metrics, deterministic stratified sampling, sequence packing, centroid
assignment, and token-length histograms — hand-reasoned fixtures plus
numpy ground truth for the Arrow-batched centroid argmax.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from scalable_etl_spark.functions.vectors import (
    centroid,
    nearest_centroid_pandas,
)
from scalable_etl_spark.queries_pipeline import (
    benchmark_contamination,
    doc_repetition,
    hash_rank_sample,
    sequence_packing,
    stratified_sample,
    token_len_histogram,
)

SF001 = "/root/testdata/sf0.001"


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_doc_repetition_degenerate_doc_flagged(spark, tmp_path):
    sf = _write_docs(
        spark,
        tmp_path,
        [
            # "a a a a a": bigrams = ['a a'] x 4 -> top frac 1.0;
            # trigrams = ['a a a'] x 3 -> dup frac 1 - 1/3 = 0.6667.
            (1, "a a a a a", "en", "s", 9),
            # All-distinct tokens: top bigram frac 1/4, dup trigrams 0.
            (2, "one two three four five", "en", "s", 23),
            # Single token: no bigrams/trigrams -> 0.0 / 0.0, not null.
            (3, "solo", "en", "s", 4),
        ],
    )
    out = {r.doc_id: r for r in doc_repetition(spark, sf).collect()}
    assert out[1].top_bigram_frac == pytest.approx(1.0)
    assert out[1].dup_trigram_frac == pytest.approx(0.6667, abs=1e-4)
    assert out[1].repetitive == 1
    assert out[2].top_bigram_frac == pytest.approx(0.25)
    assert out[2].dup_trigram_frac == 0.0
    assert out[2].repetitive == 1  # 0.25 >= 0.1 top-bigram threshold
    assert out[3].top_bigram_frac == 0.0
    assert out[3].dup_trigram_frac == 0.0
    assert out[3].repetitive == 0


def test_sequence_packing_hand_computed_bins(spark, tmp_path):
    # Three 300-token docs in one source: start offsets 0/300/600 ->
    # bins 0, 0, 1 for 512-token windows. Second source: one doc.
    t300 = " ".join(f"w{i}" for i in range(300))
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, t300, "en", "sA", len(t300)),
            (2, t300, "en", "sA", len(t300)),
            (3, t300, "en", "sA", len(t300)),
            (4, "x y z", "en", "sB", 5),
        ],
    )
    out = {
        (r.source, r.bin): (r.n_docs, r.bin_tokens)
        for r in sequence_packing(spark, sf).collect()
    }
    assert out == {
        ("sA", 0): (2, 600),
        ("sA", 1): (1, 300),
        ("sB", 0): (1, 3),
    }


def test_stratified_sample_deterministic_and_en_only_downsampled(spark):
    a = {r.lang: r for r in stratified_sample(spark, SF001).collect()}
    b = {r.lang: r for r in stratified_sample(spark, SF001).collect()}
    assert {k: (v.n_docs, v.n_kept) for k, v in a.items()} == {
        k: (v.n_docs, v.n_kept) for k, v in b.items()
    }
    for lang, r in a.items():
        if lang == "en":
            assert r.n_kept < r.n_docs  # ~35% keep rate
        else:
            assert r.n_kept == r.n_docs  # non-dominant strata untouched


def test_token_len_histogram_buckets(spark, tmp_path):
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, " ".join(["t"] * 10), "en", "s", 1),  # <16
            (2, " ".join(["t"] * 16), "en", "s", 1),  # <32
            (3, " ".join(["t"] * 300), "de", "s", 1),  # >=256
        ],
    )
    out = {
        (r.lang, r.len_bucket): (r.n_docs, r.sum_tokens)
        for r in token_len_histogram(spark, sf).collect()
    }
    assert out == {
        ("en", "<16"): (1, 10),
        ("en", "<32"): (1, 16),
        ("de", ">=256"): (1, 300),
    }


def test_benchmark_contamination_detects_copy(spark, tmp_path):
    # doc 0 (bench: 0 % 97 == 0) is a verbatim copy of train doc 1 ->
    # every one of its 4 distinct 5-gram shingles (8 tokens) is shared.
    # Train doc 2 shares no shingle; doc 97 is bench with no match.
    leaked = "alpha beta gamma delta epsilon zeta eta theta"
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, leaked, "en", "s", len(leaked)),
            (1, leaked, "en", "s", len(leaked)),
            (2, "totally unrelated words here", "en", "s", 28),
            (97, "isolated benchmark document text", "en", "s", 32),
        ],
    )
    out = {r.bench_id: r for r in benchmark_contamination(spark, sf).collect()}
    assert set(out) == {0}  # doc 97 clean -> absent
    assert out[0].n_contaminated == 1
    assert out[0].max_overlap == 4
    assert out[0].total_overlap == 4


def test_hash_rank_sample_exact_k_and_deterministic(spark):
    a = hash_rank_sample(spark, SF001).collect()
    b = hash_rank_sample(spark, SF001).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    from collections import Counter

    per_lang = Counter(r.lang for r in a)
    # sf0.001 has ~50 docs across 5 langs; every stratum with >= 25
    # docs yields exactly 25, smaller strata yield all their docs.
    for lang, n in per_lang.items():
        assert n <= 25
        ranks = sorted(r.rk for r in a if r.lang == lang)
        assert ranks == list(range(1, n + 1))


def test_mixture_weights_sum_to_one_and_favor_small(spark):
    from scalable_etl_spark.queries_pipeline import mixture_weights

    rows = mixture_weights(spark, SF001).collect()
    assert sum(r.mix_weight for r in rows) == pytest.approx(1.0, abs=2e-3)
    # alpha < 1 compresses the range: every source's weight share must
    # sit closer to uniform than its raw token share.
    total = sum(r.n_tokens for r in rows)
    uniform = 1.0 / len(rows)
    for r in rows:
        share = r.n_tokens / total
        assert (
            min(share, uniform) - 1e-9
            <= r.mix_weight
            <= max(share, uniform) + 1e-9
        )


def test_vocab_coverage_bounds(spark, tmp_path):
    from scalable_etl_spark.queries_pipeline import vocab_coverage

    # 2-word vocab corpus: every token is in the top-64 vocab.
    sf = _write_docs(
        spark,
        tmp_path,
        [(1, "a b a b a", "en", "s", 9), (2, "b a b", "de", "s", 5)],
    )
    out = {r.lang: r for r in vocab_coverage(spark, sf).collect()}
    assert out["en"].total_tokens == 5
    assert out["en"].covered_tokens == 5
    assert out["en"].coverage == 1.0
    assert out["de"].coverage == 1.0


def test_nearest_centroid_matches_numpy_argmax(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 64)).astype(np.float64)
    cents = np.array([centroid(k) for k in range(8)])
    expected = np.argmax(vecs @ cents.T, axis=1)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)], ["vec_id", "embedding"]
    )
    got = {
        r.vec_id: r.cluster
        for r in df.select(
            "vec_id",
            nearest_centroid_pandas("embedding", 8, 64).alias("cluster"),
        ).collect()
    }
    assert got == {i: int(expected[i]) for i in range(40)}


def test_nearest_centroid_tie_breaks_low(spark):
    # The zero vector has dot 0 with every centroid -> ties across all
    # eight clusters must resolve to cluster 0 (matches the SQL ladder).
    df = spark.createDataFrame([(0, [0.0] * 64)], ["vec_id", "embedding"])
    [row] = df.select(
        nearest_centroid_pandas("embedding", 8, 64).alias("cluster")
    ).collect()
    assert row.cluster == 0


def test_pii_redaction_scrubs_completely(spark):
    from scalable_etl_spark.queries_pipeline import pii_redaction

    rows = pii_redaction(spark, "/root/testdata/sf0.001").collect()
    assert rows, "expected per-source output"
    for r in rows:
        # Completeness proof: zero residual pattern hits post-redaction.
        assert r.n_clean_after == r.n_docs
        # doc_id % 3 / % 5 injection -> both PII kinds must appear.
    assert sum(r.n_emails for r in rows) > 0
    assert sum(r.n_phones for r in rows) > 0


def test_passage_dedup_invariants(spark):
    from scalable_etl_spark.queries_pipeline import passage_dedup

    rows = passage_dedup(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 0 < r.n_distinct_chunks <= r.n_chunks
        assert 0.0 <= r.dup_chunk_pct <= 100.0


def test_passage_chunking_exact(spark):
    """45 tokens at 20 words/passage -> chunks of 20/20/5; a repeated
    20-token block across two docs dedups to one distinct chunk."""
    from scalable_etl_spark.queries_pipeline import passage_dedup
    import tempfile

    block = " ".join(f"w{i}" for i in range(20))
    df = spark.createDataFrame(
        [
            (1, block + " " + block + " tail1 tail2 tail3 tail4 tail5",
             "en", "s1", 0),
            (2, block, "en", "s1", 0),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    d = tempfile.mkdtemp(prefix="passage_")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    [r] = passage_dedup(spark, d).collect()
    # doc1 -> [block, block, 5-word tail], doc2 -> [block]
    assert r.n_chunks == 4
    assert r.n_distinct_chunks == 2
