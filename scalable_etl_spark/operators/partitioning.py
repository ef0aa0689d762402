"""Physical-layout operators for 100 TB shuffle hygiene: bucketed
co-located joins and salted skew handling.

The reference never needs these (its largest in-repo input is 4 rows);
at the target scale they are the difference between a join that moves
terabytes and one that moves nothing:

- **Bucketing**: persist both sides of a repeated equi-join bucketed by
  the join key -> Spark plans a SortMergeJoin with NO Exchange on
  either side (verified by test_partitioning.py asserting the plan).
  The shuffle is paid once at write time, amortized over every
  downstream join/aggregation on that key.
- **Salting**: a hot key (the reference's single-user skew, or a
  dedup corpus where one template dominates) lands on one reducer and
  stalls the stage. Salted two-phase aggregation splits each key into
  ``n_salts`` partial groups, aggregates, then merges — bounded reducer
  input at the cost of one extra (tiny) shuffle. AQE's skew-join
  handles *join* skew at runtime; aggregation skew still needs salt.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by the join key.

    Both sides of a later equi-join on ``bucket_cols`` with the same
    ``n_buckets`` join shuffle-free. Pick ``n_buckets`` ~ total data /
    (target 128 MB x growth headroom); buckets are fixed at write time.
    """
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation for skewed group keys.

    ``aggs`` maps column -> 'sum' | 'count' | 'min' | 'max' (the
    re-aggregable functions; avg must be decomposed by the caller into
    sum+count). Phase 1 groups by (key, salt) — hot keys spread over
    ``n_salts`` reducers; phase 2 merges the partials per key.
    """
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for c, how in aggs.items():
        if how not in first_fn:
            raise ValueError(f"non-re-aggregable function {how!r} for {c!r}")
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    phase1 = salted.groupBy(*group_cols, "__salt").agg(
        *[first_fn[how](c).alias(f"__p_{c}") for c, how in aggs.items()]
    )
    return phase1.groupBy(*group_cols).agg(
        *[
            merge_fn[how](f"__p_{c}").alias(f"{c}_{how}")
            for c, how in aggs.items()
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key_cols: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the big side deterministically,
    replicate the small side across all ``n_salts`` salt values, and
    join on (key, salt). Result is row-identical to the plain join; the
    hot key's rows are spread over ``n_salts`` reducers instead of
    stalling one.

    The big-side salt is ``xxhash64(ALL big-side columns + a marker)
    % n`` — per-ROW, so a hot key's rows genuinely spread over
    ``n_salts`` reducers (a key-derived salt would assign the whole hot
    key ONE salt and spread nothing — a defect tools/bench_skew.py's
    straggler profile caught in round 6: max-task ratio stayed 184:1
    until the salt became row-level). Still deterministic: re-runs and
    retries land every row on the same reducer, as exactly-once sinks
    downstream require; fully-identical rows sharing a salt is
    harmless. Replication multiplies the SMALL side only (n_salts x
    |small| rows) — use for skewed big-to-modest joins; AQE's
    skew-join split covers the big-to-big case at runtime.
    """
    keys = list(key_cols)
    salted_big = big.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(*big.columns, F.lit("__salt__")), F.lit(n_salts)
        ).cast("int"),
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salts - 1))
    ).alias("__salt")
    replicated = small.select("*", salts)
    out = salted_big.join(replicated, keys + ["__salt"], how)
    return out.drop("__salt")


def zorder_cluster(
    df: DataFrame,
    cols: Sequence[str],
    n_files: int = 32,
    bits: int = 6,
) -> DataFrame:
    """Multi-dimension clustering via a Morton (Z-order) key, so
    per-file [min, max] stats prune on EVERY clustered column — the
    jar-free spelling of Delta's ``OPTIMIZE ZORDER BY`` (public docs /
    Databricks engineering blog; the underlying curve is Morton 1966).

    Single-column range clustering gives perfect skipping on that
    column and NONE on the others; interleaving the bits of per-column
    bucket ids makes each output file cover a small hyper-rectangle of
    the value space, so a predicate on ANY clustered column excludes
    most files. The trade: per-column ranges are ~sqrt-loose for 2
    dims vs perfect 1-dim clustering — use ``cluster_by`` when one
    column dominates, zorder when two+ matter.

    Mechanics (all JVM-side expressions; one sampling pass):
    1. Each column is rank-bucketed into ``2**bits`` equal-frequency
       buckets — bounds from one ``approxQuantile`` call over all
       columns (sampled, the same design as Delta's
       ``range_partition_id``); rank-bucketing makes the curve
       skew-proof where linear min/max scaling would collapse.
    2. Bucket ids are bit-interleaved into one z key
       (``shiftright/bitwiseAND/shiftleft`` terms, codegen-friendly).
    3. ``repartitionByRange`` + ``sortWithinPartitions`` on z.

    Nulls land in bucket 0 (parquet footer min/max ignores nulls, so
    stats stay tight and range predicates drop null rows anyway).
    Columns must be numeric (approxQuantile's domain)."""
    from functools import reduce as _reduce

    names = list(cols)
    n_buckets = 1 << bits
    qs = [i / n_buckets for i in range(1, n_buckets)]
    all_bounds = df.approxQuantile(names, qs, 1.0 / (4 * n_buckets))
    z = F.lit(0)
    for ci, (c, bounds) in enumerate(zip(names, all_bounds)):
        uniq = sorted(set(bounds))
        bucket = _reduce(
            lambda acc, b: acc
            + F.when(F.col(c) > F.lit(b), 1).otherwise(0),
            uniq,
            F.lit(0),
        )
        for bit in range(bits):
            z = z + F.shiftleft(
                F.shiftright(bucket, bit).bitwiseAND(F.lit(1)),
                bit * len(names) + ci,
            )
    zc = "__zorder"
    return (
        df.withColumn(zc, z)
        .repartitionByRange(int(n_files), F.col(zc))
        .sortWithinPartitions(zc)
        .drop(zc)
    )


def explain_str(df: DataFrame) -> str:
    """Executed-plan string (for plan assertions in tests/audits)."""
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    """Number of SHUFFLE Exchange operators in the physical plan
    (executedPlan: in Spark 4 ``sparkPlan`` precedes EnsureRequirements,
    so exchanges only exist in the executed/adaptive plan).
    BroadcastExchange is excluded: it ships one small side to every
    executor, not a repartitioning of the data."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange") - plan.count("BroadcastExchange")
