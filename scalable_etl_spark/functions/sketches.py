"""Deterministic distinct-count sketch (HyperLogLog) replayable in SQL.

Spark's built-in ``approx_count_distinct`` and DuckDB's
``approx_distinct`` use different internal sketches, so they can never
hash-match across engines. This module implements classic HLL (Flajolet
et al. 2007, public algorithm) from first principles on the portable
md5-derived hash, with every arithmetic step chosen to be bit-exact on
both engines:

- register index / remainder: integer shift + mask of a 32-bit hash;
- rank (leading-zero count): via ``length(bin(x))`` — both engines
  print minimal-width binary;
- the harmonic sum: scaled to EXACT integers (sum of 2^(Q-r) as
  BIGINT, max ~2^33 — no float-order nondeterminism);
- the final estimate: one float division (and one ``ln`` in the
  linear-counting branch) — identical libm on both engines, rounded
  to 4 decimals for the gate.

Scale: a per-group sketch is two hash aggregations (group x register,
then group) — fixed 2^p registers per group regardless of cardinality,
the standard way to count distinct users per key over 100 TB without a
distinct shuffle of the raw keys.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_P = 8  # 2^8 = 256 registers
HLL_M = 1 << HLL_P
HLL_W = 32 - HLL_P  # remainder bits
HLL_Q = HLL_W + 1  # max rank
# alpha_m for m >= 128 (Flajolet et al. Fig. 3)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# scaled numerator: alpha * m^2 * 2^Q (exact in double: alpha * 2^41)
_HLL_K = HLL_ALPHA * HLL_M * HLL_M * (1 << HLL_Q)


def _hash32(col: Column) -> Column:
    """First 8 md5 hex digits -> uniform 32-bit integer (same '0:' seed
    framing as portable_hash64)."""
    keyed = F.concat_ws(":", F.lit("0"), col)
    return F.conv(F.substring(F.md5(keyed), 1, 8), 16, 10).cast("long")


def hll_distinct(
    df: DataFrame, key_col: str, group_cols: list[str]
) -> DataFrame:
    """Per-group HLL distinct-count estimate of ``key_col``.

    Output: group_cols + (n_registers, est_distinct). Deterministic:
    the same rows always produce the same estimate, on any engine that
    replays the register computation (see ``hll_sql``).
    """
    h = _hash32(F.col(key_col).cast("string"))
    idx = F.shiftright(h, HLL_W)
    rem = h.bitwiseAND(F.lit((1 << HLL_W) - 1))
    rho = (
        F.when(rem == 0, F.lit(HLL_Q))
        .otherwise(F.lit(HLL_Q) - F.length(F.bin(rem)))
        .cast("int")
    )
    regs = (
        df.select(*group_cols, idx.alias("__reg"), rho.alias("__rho"))
        .groupBy(*group_cols, "__reg")
        .agg(F.max("__rho").alias("__r"))
    )
    # pow(2, k) is exactly representable and correctly rounded -> the
    # BIGINT cast is exact; the register sum is pure integer arithmetic.
    term = F.pow(F.lit(2.0), F.lit(HLL_Q) - F.col("__r")).cast("long")
    per_group = regs.groupBy(*group_cols).agg(
        F.count("*").alias("n_registers"),
        F.sum(term).alias("__s_present"),
    )
    v0 = F.lit(HLL_M) - F.col("n_registers")  # empty registers
    s_total = F.col("__s_present") + v0 * F.lit(1 << HLL_Q)
    raw = F.lit(_HLL_K) / s_total
    lc = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v0)
    est = F.when((v0 > 0) & (raw <= F.lit(2.5 * HLL_M)), lc).otherwise(raw)
    return per_group.select(
        *group_cols,
        "n_registers",
        F.round(est, 4).alias("est_distinct"),
    )


def hll_sql(key_expr: str, table: str, group_cols: list[str]) -> str:
    """The identical per-group estimate as a DuckDB query."""
    g = ", ".join(group_cols)
    mask = (1 << HLL_W) - 1
    return f"""
    WITH h AS (
      SELECT {g},
             CAST(('0x' || substr(md5('0:' || CAST({key_expr} AS VARCHAR)), 1, 8)) AS BIGINT) AS h32
      FROM {table}),
    regs AS (
      SELECT {g}, h32 >> {HLL_W} AS reg,
             MAX(CASE WHEN (h32 & {mask}) = 0 THEN {HLL_Q}
                      ELSE {HLL_Q} - length(bin(h32 & {mask})) END) AS r
      FROM h GROUP BY {g}, reg),
    agg AS (
      SELECT {g}, COUNT(*) AS n_registers,
             SUM(CAST(pow(2, {HLL_Q} - r) AS BIGINT)) AS s_present
      FROM regs GROUP BY {g})
    SELECT {g}, n_registers,
           ROUND(CASE WHEN ({HLL_M} - n_registers) > 0
                       AND {_HLL_K!r} / (s_present + ({HLL_M} - n_registers) * {1 << HLL_Q}) <= {2.5 * HLL_M}
                      THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / ({HLL_M} - n_registers))
                      ELSE {_HLL_K!r} / (s_present + ({HLL_M} - n_registers) * {1 << HLL_Q})
                 END, 4) AS est_distinct
    FROM agg
    """


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
    bin_width: float = 1.0,
) -> DataFrame:
    """Deterministic approximate quantiles via a fixed-width histogram.

    Built-in approx sketches (GK in Spark, t-digest in DuckDB) can't
    cross-match; this one can: bin = floor(value / w), and the
    p-quantile estimate is the lower edge of the first bin whose
    cumulative count reaches p * total. Error is bounded by one
    ``bin_width``; every step is integer arithmetic plus one float
    multiply per quantile, so both engines agree bit-for-bit.

    Scale: one hash aggregation to (group, bin) — cardinality is
    value_range/w per group regardless of row count — then a per-group
    sorted cumulative pass over those few bins. The 100 TB shape for
    p99-latency style dashboards.
    """
    from pyspark.sql import Window

    w = float(bin_width)
    binned = (
        df.select(*group_cols, F.col(value_col).alias("__v"))
        .withColumn("__bin", F.floor(F.col("__v") / F.lit(w)).cast("long"))
        .groupBy(*group_cols, "__bin")
        .agg(F.count("*").alias("__n"))
    )
    cum_w = (
        Window.partitionBy(*group_cols)
        .orderBy("__bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot_w = Window.partitionBy(*group_cols)
    cum = binned.withColumn("__cum", F.sum("__n").over(cum_w)).withColumn(
        "__total", F.sum("__n").over(tot_w)
    )
    aggs = [
        F.round(
            F.min(
                F.when(
                    F.col("__cum") >= F.lit(q) * F.col("__total"),
                    F.col("__bin"),
                )
            )
            * F.lit(w),
            4,
        ).alias(f"p{int(q * 100)}")
        for q in quantiles
    ]
    return cum.groupBy(*group_cols).agg(
        F.max("__total").alias("n_rows"), *aggs
    )


def histogram_quantiles_sql(
    value_expr: str,
    table: str,
    group_cols: list[str],
    quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
    bin_width: float = 1.0,
) -> str:
    """The identical histogram-quantile estimate as a DuckDB query."""
    g = ", ".join(group_cols)
    w = float(bin_width)
    # CAST before the arithmetic: DuckDB parses the {w!r} literal as
    # DECIMAL, and BIGINT*DECIMAL yields DECIMAL128 — which the driver's
    # pandas fetch renders as float-with-.0 / object, hash-mismatching
    # Spark's DOUBLE. Same reason for the BIGINT cast on n_rows below
    # (SUM(BIGINT) window -> HUGEINT).
    qcols = ", ".join(
        f"ROUND(CAST(MIN(CASE WHEN cum >= {q!r} * total THEN bin END)"
        f" AS DOUBLE) * {w!r}, 4)"
        f" AS p{int(q * 100)}"
        for q in quantiles
    )
    return f"""
    WITH binned AS (
      SELECT {g}, CAST(floor({value_expr} / {w!r}) AS BIGINT) AS bin,
             COUNT(*) AS n
      FROM {table} GROUP BY {g}, bin),
    cum AS (
      SELECT {g}, bin, n,
             SUM(n) OVER (PARTITION BY {g} ORDER BY bin
                          ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(n) OVER (PARTITION BY {g}) AS total
      FROM binned)
    SELECT {g}, CAST(MAX(total) AS BIGINT) AS n_rows, {qcols}
    FROM cum GROUP BY {g}
    """


def hll_registers(df: DataFrame, key_col: str) -> DataFrame:
    """Global (ungrouped) HLL register table: (__reg, __r). The
    mergeable representation — sketches of different slices union by
    register-wise MAX, which is exactly the sketch of the slices'
    union. This is what a 100 TB pipeline persists per partition/day
    and folds at query time instead of re-scanning raw keys."""
    h = _hash32(F.col(key_col).cast("string"))
    idx = F.shiftright(h, HLL_W)
    rem = h.bitwiseAND(F.lit((1 << HLL_W) - 1))
    rho = (
        F.when(rem == 0, F.lit(HLL_Q))
        .otherwise(F.lit(HLL_Q) - F.length(F.bin(rem)))
        .cast("int")
    )
    return (
        df.select(idx.alias("__reg"), rho.alias("__rho"))
        .groupBy("__reg")
        .agg(F.max("__rho").alias("__r"))
    )


def hll_estimate_from_registers(regs: DataFrame) -> DataFrame:
    """(n_registers, est_distinct) from a (__reg, __r) register table —
    same estimator arithmetic as ``hll_distinct``."""
    term = F.pow(F.lit(2.0), F.lit(HLL_Q) - F.col("__r")).cast("long")
    agg = regs.agg(
        F.count("*").alias("n_registers"),
        F.sum(term).alias("__s_present"),
    )
    v0 = F.lit(HLL_M) - F.col("n_registers")
    s_total = F.col("__s_present") + v0 * F.lit(1 << HLL_Q)
    raw = F.lit(_HLL_K) / s_total
    lc = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v0)
    est = F.when((v0 > 0) & (raw <= F.lit(2.5 * HLL_M)), lc).otherwise(raw)
    return agg.select(
        "n_registers", F.round(est, 4).alias("est_distinct")
    )


def hll_merge_estimate(*register_tables: DataFrame) -> DataFrame:
    """Union-cardinality estimate from merged sketches: register-wise
    MAX across the tables, then the standard estimator. Bit-identical
    to sketching the underlying union directly."""
    merged = register_tables[0]
    for t in register_tables[1:]:
        merged = merged.unionByName(t)
    folded = merged.groupBy("__reg").agg(F.max("__r").alias("__r"))
    return hll_estimate_from_registers(folded)
