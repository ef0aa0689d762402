"""Connected components over a pair/edge table — the step that turns
pair-wise near-dup output into dedup GROUPS (keep one doc per
component, not per pair: pairs a-b and b-c must collapse to ONE
surviving doc, which a pair-at-a-time greedy can get wrong on long
chains).

Algorithm: iterative min-label propagation. Every node starts labeled
with its own id; each round every node takes the min of its label and
its neighbors' labels; fixpoint = per-component minimum id everywhere.
Rounds needed = graph diameter — near-dup components are tiny dense
clusters (diameter 2-4) in practice, so the loop converges in a
handful of rounds.

Scale shape (100 TB):
- Each round is ONE equi-join (edges x labels on src, both
  pre-partitionable on the same key) + one groupBy(dst) min — no
  all-pairs work, no driver-side graph.
- ``localCheckpoint`` truncates the growing lineage each round (the
  standard iterative-DataFrame pattern; swap for reliable
  ``checkpoint`` on a real cluster so a lost executor doesn't
  recompute the whole history).
- The convergence probe is a LIMIT 1 existence job on changed labels
  — one tiny boolean action per round, not a full count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iters: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` is the minimum node id reachable from the node
    (undirected). Raises if ``max_iters`` rounds don't reach the
    fixpoint — a diameter that large means the input is not a dedup
    pair table and needs the alternating large-star/small-star
    formulation instead."""
    fwd = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    sym = sym.localCheckpoint(eager=False)
    # Round 0 as a bare aggregation: label(n) = min(n, min(neighbors)).
    # Every node appears as dst in the symmetric edge table, so one
    # groupBy replaces the identity-label initialization AND the first
    # join round — pair/star components (the bulk of a near-dup graph)
    # converge here, leaving the loop a single confirming pass.
    labels = (
        sym.groupBy("dst")
        .agg(F.least(F.col("dst"), F.min("src")).alias("comp"))
        .select(F.col("dst").alias("node"), "comp")
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iters):
        nbr = (
            sym.join(labels, sym["src"] == labels["node"])
            .groupBy("dst")
            .agg(F.min("comp").alias("nbr_comp"))
            .withColumnRenamed("dst", "node")
        )
        # Carry the changed flag inside the checkpointed frame: the
        # convergence probe is then a trivial filter-limit over already
        # materialized partitions instead of a second join job per round.
        new = (
            labels.join(nbr, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
                ).alias("comp"),
                (
                    F.coalesce("nbr_comp", F.col("comp")) < F.col("comp")
                ).alias("__changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new.filter(F.col("__changed")).limit(1).count()
        labels = new.drop("__changed")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds"
    )


def dedup_keep_per_component(
    df: DataFrame, components: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Materialize the deduplicated corpus: keep exactly the rows whose
    id IS its component's minimum (transitively correct on chains,
    unlike pair-greedy)."""
    losers = (
        components.filter(F.col("node") != F.col("comp"))
        .select(F.col("node").alias(id_col))
    )
    return df.join(losers, id_col, "left_anti")
