"""Text-function unit tests (tokens/shingles/hashes/stats edge cases)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scalable_etl_spark.functions.text import (
    STOPWORDS,
    content_hash,
    portable_hash64,
    stopword_count,
    token_count,
    tokens,
    unique_token_count,
    word_shingles,
)


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], ["text"]).select(
        col.alias("v")
    ).first().v


def test_tokens_empty_and_whitespace(spark):
    assert _one(spark, "", tokens("text")) == []
    assert _one(spark, "   ", tokens("text")) == []
    assert _one(spark, " a  b\tc ", tokens("text")) == ["a", "b", "c"]


def test_token_counts(spark):
    assert _one(spark, "a b a", token_count("text")) == 3
    assert _one(spark, "a b a", unique_token_count("text")) == 2
    assert _one(spark, "", token_count("text")) == 0


def test_stopword_count(spark):
    text = "the cat and the hat"
    assert _one(spark, text, stopword_count(tokens("text"))) == 3
    assert "the" in STOPWORDS and "and" in STOPWORDS


def test_word_shingles_short_text(spark):
    # Fewer than k tokens -> single whole-text shingle.
    assert _one(spark, "a b", word_shingles(tokens("text"), 3)) == ["a b"]
    assert _one(spark, "a b c d", word_shingles(tokens("text"), 3)) == [
        "a b c",
        "b c d",
    ]


def test_content_hash_normalizes(spark):
    df = spark.createDataFrame(
        [("Hello  World",), ("hello world",), ("HELLO WORLD ",)], ["text"]
    )
    assert df.select(content_hash("text").alias("h")).distinct().count() == 1


def test_portable_hash64_matches_duckdb(spark):
    import duckdb

    vals = ["alpha", "beta", "", "multi word string"]
    got = (
        spark.createDataFrame([(v,) for v in vals], ["s"])
        .select("s", portable_hash64(F.col("s")).alias("h"))
        .collect()
    )
    con = duckdb.connect()
    for r in got:
        want = con.execute(
            "SELECT CAST(('0x' || substr(md5('0:' || ?), 1, 15)) AS BIGINT)",
            [r.s],
        ).fetchone()[0]
        assert r.h == want, r.s
