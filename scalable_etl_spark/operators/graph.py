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
    (undirected). Min-label propagation needs diameter-many rounds, the
    right trade for dedup graphs (tiny dense cliques, diameter 2-4); if
    ``max_iters`` rounds don't reach the fixpoint the graph is
    long-diameter-shaped and the loop hands off to
    ``star_contraction_components`` (O(log^2 n) rounds regardless of
    diameter) instead of raising."""
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
    return star_contraction_components(edges, src, dst)


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round (Kiveris et al. 2014, public algorithm): for
    each node u, attach every STRICTLY LARGER neighbor to the minimum
    of u's closed neighborhood. One groupBy + one equi-join."""
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    mins = sym.groupBy("a").agg(
        F.least(F.col("a"), F.min("b")).alias("m")
    )
    return (
        sym.join(mins, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: direct each edge large->small; every node u
    attaches its smaller neighbors AND ITSELF to the minimum of that
    in-neighborhood. The self edge (u, m) is what contracts stars."""
    d = e.select(
        F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
    ).filter(F.col("a") != F.col("b"))
    mins = d.groupBy("a").agg(F.least(F.col("a"), F.min("b")).alias("m"))
    nbrs = d.join(mins, "a").select(
        F.col("b").alias("a"), F.col("m").alias("b")
    )
    self_edges = mins.select("a", F.col("m").alias("b"))
    return (
        nbrs.union(self_edges)
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def star_contraction_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 50,
) -> DataFrame:
    """Connected components by alternating large-star/small-star
    contraction (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii —
    "Connected Components in MapReduce and Beyond", SoCC 2014):
    converges in O(log^2 n) rounds on ANY graph, independent of
    diameter — the scale fallback for long-chain graphs where
    min-label propagation (rounds = diameter) stalls.

    Each round is two groupBy-min + equi-join stages over the current
    edge set (which only shrinks toward the star forest); lineage is
    truncated per round with ``localCheckpoint`` like the min-label
    loop. The convergence probe is a LIMIT-1 anti-join (any edge
    changed?). At the fixpoint the edge set IS the component map:
    every non-root points straight at its component's minimum id.

    Output schema matches ``connected_components``: (node, comp),
    one row per node appearing in ``edges`` (roots map to themselves).
    """
    raw = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # Node universe BEFORE dropping self-loops: a node appearing only
    # as (x, x) is still a (singleton) component.
    nodes = (
        raw.select(F.col("a").alias("node"))
        .union(raw.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    e = (
        raw.filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    for _ in range(max_rounds):
        new = _small_star(_large_star(e)).localCheckpoint(eager=True)
        changed = (
            new.join(e, ["a", "b"], "left_anti").limit(1).count()
            + e.join(new, ["a", "b"], "left_anti").limit(1).count()
        )
        e = new
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"star contraction did not converge in {max_rounds} rounds"
        )
    comp = e.select(F.col("a").alias("node"), F.col("b").alias("comp"))
    # Fail-loud audit: the fixpoint must be a star forest — every node
    # has exactly one parent, and every parent is a root. Two LIMIT-1
    # probes over node-sized data; a silent non-star fixpoint would
    # otherwise emit wrong components.
    multi_parent = (
        comp.groupBy("node")
        .agg(F.count_distinct("comp").alias("k"))
        .filter(F.col("k") > 1)
        .limit(1)
        .count()
    )
    nonroot_parent = (
        comp.alias("c")
        .join(comp.alias("p"), F.col("c.comp") == F.col("p.node"))
        .filter(F.col("p.comp") != F.col("p.node"))
        .limit(1)
        .count()
    )
    if multi_parent or nonroot_parent:
        raise RuntimeError("star contraction fixpoint is not a star forest")
    roots = nodes.join(
        comp.select("node"), "node", "left_anti"
    ).select("node", F.col("node").alias("comp"))
    return comp.union(roots)


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
