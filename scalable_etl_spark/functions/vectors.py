"""Vector (embedding) column expressions — JVM-side, no UDFs.

Embeddings arrive as array<float>; every helper casts to array<double>
first so Spark and the DuckDB oracle (list_dot_product on DOUBLE[])
accumulate at the same precision.

The sign-LSH here uses *fixed-seed pseudo-random hyperplanes* rather
than raw leading-dimension signs (real embeddings have correlated,
mostly-same-sign leading dims -> one hot bucket + lost recall). The
hyperplane weights are derived from md5 at plan-build time and embedded
as literals, so the plan does zero per-row hashing and the DuckDB
oracle can embed the identical literals (see ``hyperplane_sql``).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

EMBEDDING_DIM = 64  # driver testdata embeddings.parquet: FLOAT[64]


def l2_norm_pandas(col: str | Column) -> Column:
    """L2 norm via a scalar ``@pandas_udf`` — the Arrow scalar-UDF
    surface. Numerically identical to the JVM ``norm`` expression
    (both accumulate float64), so it sits under the oracle gate; use
    the JVM ``norm`` in hot paths, this form when the per-value logic
    outgrows SQL expressions (numpy/scipy per element)."""
    from .arrow import arrow_udf

    def _norm_fn(v):
        import numpy as np

        return v.map(
            lambda a: float(np.sqrt(np.dot(a, a)))
            if a is not None
            else None
        )

    _norm = arrow_udf(_norm_fn, "double")

    c = F.col(col) if isinstance(col, str) else col
    return _norm(c.cast("array<double>"))


def as_double(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Dot product of two array<double> columns via the higher-order
    ``aggregate(zip_with(...))`` form — left-to-right float64
    accumulation, bit-identical to DuckDB's ``list_dot_product``.

    ``dim`` is accepted for call-site documentation but ignored: an
    unrolled ``element_at`` spelling was measured 8x SLOWER than the
    higher-order form at dim=64 (the per-element null-check codegen
    defeats JIT vectorization), so the HOF path is always used.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_prenormed(
    a: Column, b: Column, norm_a: Column, norm_b: Column, dim: int | None = None
) -> Column:
    """Cosine with per-vector norms computed once upstream instead of
    per candidate pair (pair scoring drops from 3 dot products to 1).
    ``norm_a``/``norm_b`` must be ``norm(v)`` of the same vectors,
    so the float64 value is identical to ``cosine(a, b)``."""
    return dot(a, b) / (norm_a * norm_b)


def hyperplane(plane: int, dim: int = EMBEDDING_DIM) -> list[float]:
    """Deterministic pseudo-random hyperplane: weight (plane, i) =
    ((md5_60bit(f"{plane}:{i}") mod 2001) - 1000) / 1000 in [-1, 1].

    Exact thousandths -> bit-identical as SQL literals on both engines.
    """
    out = []
    for i in range(dim):
        h = int(hashlib.md5(f"{plane}:{i}".encode()).hexdigest()[:15], 16)
        out.append(((h % 2001) - 1000) / 1000.0)
    return out


def hyperplane_sql(plane: int, dim: int = EMBEDDING_DIM) -> str:
    """The same hyperplane as a DuckDB DOUBLE[] literal."""
    return "[" + ", ".join(repr(w) for w in hyperplane(plane, dim)) + "]::DOUBLE[]"


def sign_lsh_bucket(
    col: str | Column,
    n_bits: int = 8,
    dim: int = EMBEDDING_DIM,
    plane_offset: int = 0,
) -> Column:
    """Random-hyperplane sign-LSH: bit p of the bucket = (v . h_p >= 0).

    ``plane_offset`` selects an independent plane family — table t of a
    multi-table (OR-construction) LSH uses ``plane_offset = t * n_bits``.

    Oracle spelling per bit p (see ``hyperplane_sql``):
      CASE WHEN list_dot_product(v::DOUBLE[], <h_{offset+p} literal>) >= 0
           THEN 1 << p ELSE 0 END
    """
    v = as_double(col)
    bucket = F.lit(0)
    for p in range(n_bits):
        w = F.lit(hyperplane(plane_offset + p, dim)).cast("array<double>")
        bucket = bucket + F.when(dot(v, w) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket.cast("int")


# ----------------------------------------------- Arrow-batched variants
#
# The higher-order-function dot evaluates its lambda INTERPRETED —
# measured ~100 us per 64-dim dot, which makes corpus-wide bucket
# assignment the hot spot of every LSH query. The pandas_udf variants
# below compute the SAME left-to-right float64 accumulation with
# numpy (loop over dim, vectorized across rows): each partial sum is
# one IEEE double add in the same order, so results are bit-identical
# to the HOF spelling and to DuckDB's list_dot_product — the oracle
# contract survives. Inputs must be non-null fixed-dim vectors.


def _lr_dot_np(va, vb):
    """Left-to-right dot of two (n, dim) float64 matrices -> (n,).
    Sequential adds over dim, vectorized over rows — the accumulation
    order of aggregate(zip_with(...)) exactly."""
    acc = va[:, 0] * vb[:, 0]
    for i in range(1, va.shape[1]):
        acc = acc + va[:, i] * vb[:, i]
    return acc


def multi_table_buckets_pandas(
    col: str | Column,
    n_bits: int = 2,
    n_tables: int = 8,
    dim: int = EMBEDDING_DIM,
) -> Column:
    """``multi_table_buckets`` computed in one Arrow batch — identical
    bucket values (see ``_lr_dot_np``), ~100x less per-row cost."""
    import numpy as np
    import pandas as pd

    from .arrow import arrow_udf

    planes = np.array(
        [
            [hyperplane(t * n_bits + p, dim) for p in range(n_bits)]
            for t in range(n_tables)
        ],
        dtype=np.float64,
    )  # (tables, bits, dim)

    def _buckets(s: "pd.Series") -> "pd.Series":
        if len(s) == 0:
            return pd.Series([], dtype=object)
        v = np.stack(s.to_numpy()).astype(np.float64)  # (n, dim)
        out = np.zeros((v.shape[0], n_tables), dtype=np.int32)
        for t in range(n_tables):
            for p in range(n_bits):
                w = np.broadcast_to(planes[t, p], v.shape)
                out[:, t] |= (_lr_dot_np(v, w) >= 0).astype(np.int32) << p
        return pd.Series(list(out))

    udf = arrow_udf(_buckets, "array<int>")
    c = F.col(col) if isinstance(col, str) else col
    return udf(c.cast("array<double>"))


def dot_pandas(a: Column, b: Column) -> Column:
    """Pair dot product in one Arrow batch — bit-identical to
    ``dot(a, b)`` (left-to-right accumulation, see ``_lr_dot_np``)."""
    import numpy as np
    import pandas as pd

    from .arrow import arrow_udf

    def _dot(sa: "pd.Series", sb: "pd.Series") -> "pd.Series":
        if len(sa) == 0:
            return pd.Series([], dtype=float)
        va = np.stack(sa.to_numpy()).astype(np.float64)
        vb = np.stack(sb.to_numpy()).astype(np.float64)
        return pd.Series(_lr_dot_np(va, vb))

    udf = arrow_udf(_dot, "double")
    return udf(a.cast("array<double>"), b.cast("array<double>"))


def norm_pandas(col: str | Column) -> Column:
    """sqrt(dot(v, v)) in one Arrow batch — bit-identical to ``norm``."""
    c = F.col(col) if isinstance(col, str) else col
    v = c.cast("array<double>")
    return F.sqrt(dot_pandas(v, v))


def cosine_pandas(a: Column, b: Column) -> Column:
    """Arrow-batched cosine — bit-identical to ``cosine(a, b)``."""
    return dot_pandas(a, b) / (norm_pandas(a) * norm_pandas(b))


CENTROID_PLANE_OFFSET = 1000  # plane family disjoint from LSH tables


def centroid(k: int, dim: int = EMBEDDING_DIM) -> list[float]:
    """Deterministic synthetic centroid k — the ``hyperplane`` family
    shifted to a disjoint offset so clustering and LSH never share
    planes. Real pipelines would load trained centroids; the assignment
    operator below is identical either way."""
    return hyperplane(CENTROID_PLANE_OFFSET + k, dim)


def centroid_sql(k: int, dim: int = EMBEDDING_DIM) -> str:
    return hyperplane_sql(CENTROID_PLANE_OFFSET + k, dim)


def nearest_centroid_pandas(
    col: str | Column, n_clusters: int = 8, dim: int = EMBEDDING_DIM
) -> Column:
    """Argmax-affinity cluster id in one Arrow batch: cluster =
    first k maximizing dot(v, centroid_k) (ties -> lowest k, matching
    a ``d_k >= d_j for all j > k`` CASE ladder in SQL). Dots use the
    left-to-right accumulation (``_lr_dot_np``), so the DuckDB oracle
    (list_dot_product against ``centroid_sql`` literals) sees the
    bit-identical affinities.

    Scale shape: centroid matrix is a closure constant broadcast with
    the UDF; assignment is a pure map — no shuffle, linear in rows.
    """
    import numpy as np
    import pandas as pd

    from .arrow import arrow_udf

    cents = np.array(
        [centroid(k, dim) for k in range(n_clusters)], dtype=np.float64
    )  # (k, dim)

    def _assign(s: "pd.Series") -> "pd.Series":
        if len(s) == 0:
            return pd.Series([], dtype="int32")
        v = np.stack(s.to_numpy()).astype(np.float64)  # (n, dim)
        dots = np.empty((v.shape[0], cents.shape[0]), dtype=np.float64)
        for k in range(cents.shape[0]):
            dots[:, k] = _lr_dot_np(v, np.broadcast_to(cents[k], v.shape))
        return pd.Series(np.argmax(dots, axis=1).astype(np.int32))

    udf = arrow_udf(_assign, "int")
    c = F.col(col) if isinstance(col, str) else col
    return udf(c.cast("array<double>"))


def centroid_affinity_pandas(
    col: str | Column, cluster: Column, n_clusters: int = 8, dim: int = EMBEDDING_DIM
) -> Column:
    """dot(v, centroid_{cluster}) in one Arrow batch — the affinity of a
    vector to its (already assigned) centroid, same accumulation order
    as ``nearest_centroid_pandas``."""
    import numpy as np
    import pandas as pd

    from .arrow import arrow_udf

    cents = np.array(
        [centroid(k, dim) for k in range(n_clusters)], dtype=np.float64
    )

    def _aff(s: "pd.Series", ks: "pd.Series") -> "pd.Series":
        if len(s) == 0:
            return pd.Series([], dtype=float)
        v = np.stack(s.to_numpy()).astype(np.float64)
        w = cents[ks.to_numpy().astype(np.int64)]
        return pd.Series(_lr_dot_np(v, w))

    udf = arrow_udf(_aff, "double")
    c = F.col(col) if isinstance(col, str) else col
    return udf(c.cast("array<double>"), cluster)


def multi_table_buckets(
    col: str | Column,
    n_bits: int = 2,
    n_tables: int = 8,
    dim: int = EMBEDDING_DIM,
) -> Column:
    """Array of ``n_tables`` independent sign-LSH buckets (table t uses
    planes t*n_bits .. t*n_bits+n_bits-1). posexplode the result to get
    (table, bucket) join keys — candidates are the union over tables,
    the standard OR-construction that trades one corpus-explosion factor
    of L for recall 1-(1-p^b)^L instead of p^b."""
    return F.array(
        *[
            sign_lsh_bucket(col, n_bits, dim, plane_offset=t * n_bits)
            for t in range(n_tables)
        ]
    )


def lsh_bucket_sql(
    vec_expr: str,
    n_bits: int = 8,
    dim: int = EMBEDDING_DIM,
    plane_offset: int = 0,
) -> str:
    """DuckDB expression computing the identical sign-LSH bucket."""
    terms = [
        f"(CASE WHEN list_dot_product({vec_expr}::DOUBLE[], "
        f"{hyperplane_sql(plane_offset + p, dim)}) >= 0 THEN {1 << p} ELSE 0 END)"
        for p in range(n_bits)
    ]
    return "(" + " + ".join(terms) + ")"


def multi_table_buckets_sql(
    vec_expr: str,
    n_bits: int = 2,
    n_tables: int = 8,
    dim: int = EMBEDDING_DIM,
) -> str:
    """DuckDB DOUBLE[]-of-buckets literal matching multi_table_buckets;
    unnest WITH ORDINALITY (or generate_subscripts) yields (table, bucket)."""
    return (
        "["
        + ", ".join(
            lsh_bucket_sql(vec_expr, n_bits, dim, plane_offset=t * n_bits)
            for t in range(n_tables)
        )
        + "]"
    )
