"""Randomized cross-engine parity: the deterministic hash family and
tokenizers must agree with their documented DuckDB spellings on
adversarial strings (unicode, regex metacharacters, whitespace runs) —
these spellings are what every approximate-dedup oracle builds on.

One batched Spark job for all samples (a per-example Spark round trip
would be prohibitively slow), fixed seed for reproducibility.
"""

from __future__ import annotations

import random
import string

import duckdb
import pytest
from pyspark.sql import functions as F

from scalable_etl_spark.functions.text import (
    BPE_TOKEN_RE,
    bpe_tokens,
    normalized_text,
    portable_hash64,
    tokens,
)

ALPHABET = (
    string.ascii_letters
    + string.digits
    + "     \t\n"
    + ".,;:!?()[]|\\^$*+-'\"/#@&%"
    + "äöüßéñ中文🙂"
)


def _samples(n=120, seed=11):
    rng = random.Random(seed)
    out = ["", " ", "\t\n ", "a", "..."]
    for _ in range(n):
        out.append(
            "".join(rng.choice(ALPHABET) for _ in range(rng.randrange(0, 60)))
        )
    return out


@pytest.fixture(scope="module")
def parity(spark):
    vals = _samples()
    sdf = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], ["i", "s"])
    got = {
        r.i: r
        for r in sdf.select(
            "i",
            portable_hash64(F.col("s")).alias("h"),
            tokens("s").alias("toks"),
            bpe_tokens("s").alias("bpe"),
            F.sha2(normalized_text("s"), 256).alias("sha"),
        ).collect()
    }
    con = duckdb.connect()
    return vals, got, con


def test_portable_hash_parity(parity):
    vals, got, con = parity
    for i, v in enumerate(vals):
        want = con.execute(
            "SELECT CAST(('0x' || substr(md5('0:' || ?), 1, 15)) AS BIGINT)",
            [v],
        ).fetchone()[0]
        assert got[i].h == want, repr(v)


def test_tokens_parity(parity):
    vals, got, con = parity
    for i, v in enumerate(vals):
        want = con.execute(
            "SELECT CASE WHEN trim(?) = '' THEN []::VARCHAR[] "
            "ELSE regexp_split_to_array(trim(?), '\\s+') END",
            [v, v],
        ).fetchone()[0]
        assert got[i].toks == want, repr(v)


def test_bpe_tokens_parity(parity):
    vals, got, con = parity
    for i, v in enumerate(vals):
        want = con.execute(
            "SELECT regexp_extract_all(coalesce(?, ''), ?)",
            [v, BPE_TOKEN_RE],
        ).fetchone()[0]
        assert got[i].bpe == want, repr(v)


def test_content_sha_parity(parity):
    vals, got, con = parity
    for i, v in enumerate(vals):
        want = con.execute(
            "SELECT sha256(regexp_replace(lower(trim(?)), '\\s+', ' ', 'g'))",
            [v],
        ).fetchone()[0]
        assert got[i].sha == want, repr(v)
