"""Approximate-nearest-neighbor search over an embedding column.

Two strategies:
- brute_force_topk: exact cosine top-k. Query side is broadcast; the
  corpus streams through one narrow stage (no shuffle of the corpus).
  Right answer for <~10^4 queries against any corpus size.
- lsh_topk: sign-LSH bucket prefilter, then cosine only within the
  query's bucket — the 100 TB path (bucket count grows 2^bits, each
  join is equi-key and AQE-skew-splittable).

Cosines are computed in float64 (cast from float32 storage) and rounded
to 6 dp *before* ranking so ranking ties are resolved identically in
Spark and the DuckDB oracle (tiebreak: neighbor id asc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import (
    as_double,
    cosine_pandas,
    dot_pandas,
    multi_table_buckets_pandas,
    norm_pandas,
)


def _ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, cos_sim, rank). Self-matches are
    excluded by id inequality. Norms are computed once per vector (not
    per pair), and with ``dim`` the dot product is an unrolled codegen
    expression — pair scoring is a single fused dot per (q, c)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")
    ).withColumn("qn", norm_pandas(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv")
    ).withColumn("cn", norm_pandas(F.col("cv")))
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_pandas(F.col("qv"), F.col("cv"))
                / (F.col("qn") * F.col("cn")),
                6,
            ).alias("cos_sim"),
        )
    )
    return _ranked_topk(scored, k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition the corpus into
    ``n_cells`` Voronoi cells, search only the query's ``n_probe``
    nearest cells.

    Centroids are the ``n_cells`` corpus vectors with the smallest
    ``portable_hash64(id)`` — a deterministic pseudo-random sample, so
    the DuckDB oracle replays the identical cells (a k-means refinement
    would improve cell balance but break exact replay; at 100 TB you'd
    train centroids offline and broadcast them exactly the same way).

    Scale shape: assignment = corpus x n_cells cosines against a
    broadcast centroid table (narrow map stage + top-1 window per row);
    probing = candidates restricted to n_probe cells, equi-joined on
    cell id. Corpus never self-joins; raising n_cells keeps per-cell
    scan size ~ |corpus| / n_cells.
    """
    from ..functions.text import portable_hash64

    cents = (
        corpus.select(
            F.col(id_col).alias("centroid_id"),
            as_double(vec_col).alias("centv"),
            portable_hash64(F.col(id_col).cast("string")).alias("__h"),
        )
        .orderBy(F.col("__h").asc(), F.col("centroid_id").asc())
        .limit(n_cells)
        .drop("__h")
    )

    def assign(side: DataFrame, out_id: str, vec_out: str, top: int) -> DataFrame:
        v = side.select(
            F.col(id_col).alias(out_id), as_double(vec_col).alias(vec_out)
        )
        scored = v.join(F.broadcast(cents)).select(
            out_id,
            vec_out,
            "centroid_id",
            F.round(
                cosine_pandas(F.col(vec_out), F.col("centv")), 6
            ).alias("__c"),
        )
        w = Window.partitionBy(out_id).orderBy(
            F.col("__c").desc(), F.col("centroid_id").asc()
        )
        return (
            scored.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= top)
            .select(out_id, vec_out, "centroid_id")
        )

    c_cells = assign(corpus, "neighbor_id", "cv", 1)
    q_cells = assign(queries, "query_id", "qv", n_probe)
    scored = (
        c_cells.join(F.broadcast(q_cells), "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_pandas(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    return _ranked_topk(scored, k)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lsh_bits: int = 2,
    n_tables: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k via multi-table sign-LSH (OR-construction):
    candidates = union over ``n_tables`` independent bucketings, then
    exact cosine only on candidates. Same output shape as
    brute_force_topk.

    Recall = 1 - (1 - p^b)^L with p = 1 - theta/pi per plane; the
    defaults (b=2, L=8) give ~0.95+ even for theta ~ 70deg neighbors.
    Scale: corpus explodes x L into (table, bucket) keys — the join
    stays equi-key; per-bucket population ~ |corpus| / 2^b per table,
    so raise ``n_lsh_bits`` as the corpus grows to keep buckets bounded.
    """
    from ..functions.vectors import EMBEDDING_DIM

    hp_dim = dim or EMBEDDING_DIM
    # Candidate ids first, vectors later: a pair colliding in several
    # tables must score its 64-dim cosine exactly once, and the
    # (tbl, bucket) join should move ids, not embedding arrays.
    q_keyed = queries.select(
        F.col(id_col).alias("query_id"),
        F.posexplode(
            multi_table_buckets_pandas(vec_col, n_lsh_bits, n_tables, hp_dim)
        ).alias("tbl", "bucket"),
    )
    c_keyed = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode(
            multi_table_buckets_pandas(vec_col, n_lsh_bits, n_tables, hp_dim)
        ).alias("tbl", "bucket"),
    )
    cand = (
        c_keyed.join(F.broadcast(q_keyed), ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")
    ).withColumn("qn", norm_pandas(F.col("qv")))
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv")
    ).withColumn("cn", norm_pandas(F.col("cv")))
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_pandas(F.col("qv"), F.col("cv"))
                / (F.col("qn") * F.col("cn")),
                6,
            ).alias("cos_sim"),
        )
    )
    return _ranked_topk(scored, k)
