"""Unit tests for operators/timeseries.py (gap-fill) and
operators/graph.py (connected components over dedup pairs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scalable_etl_spark.operators.graph import (
    connected_components,
    dedup_keep_per_component,
)
from scalable_etl_spark.operators.timeseries import gap_fill_daily


def test_gap_fill_scaffold_and_forward_fill(spark):
    # user 1: days 10, 13 -> scaffold 10..13 with 11, 12 gap-filled
    # user 2: single day -> single row, no gaps
    df = spark.createDataFrame(
        [(1, 10, 5.0), (1, 10, 3.0), (1, 13, 7.0), (2, 20, 1.0)],
        ["uid", "d", "v"],
    )
    out = gap_fill_daily(df, ["uid"], "d", F.sum("v")).orderBy("uid", "d")
    rows = [(r.uid, r.d, r.day_value, r.filled, r.is_gap) for r in out.collect()]
    assert rows == [
        (1, 10, 8.0, 8.0, False),
        (1, 11, None, 8.0, True),
        (1, 12, None, 8.0, True),
        (1, 13, 7.0, 7.0, False),
        (2, 20, 1.0, 1.0, False),
    ]


def test_gap_fill_value_change_resets_fill(spark):
    df = spark.createDataFrame(
        [(1, 1, 2.0), (1, 4, 9.0), (1, 6, 1.0)], ["uid", "d", "v"]
    )
    out = gap_fill_daily(df, ["uid"], "d", F.sum("v")).orderBy("d")
    filled = [r.filled for r in out.collect()]
    assert filled == [2.0, 2.0, 2.0, 9.0, 9.0, 1.0]


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3-4 (diameter 3, needs multiple propagation rounds),
    # pair 10-11, and 20-21-22 triangle
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["id_a", "id_b"],
    )
    comp = {
        r.node: r.comp for r in connected_components(edges).collect()
    }
    assert comp == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
    }


def test_connected_components_long_chain_converges(spark):
    n = 12  # diameter 11: several rounds, still < max_iters
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], ["id_a", "id_b"]
    )
    comp = {r.node: r.comp for r in connected_components(edges).collect()}
    assert set(comp.values()) == {0}
    assert len(comp) == n + 1


def test_star_contraction_path_diameter_beyond_min_label_cap(spark):
    """A 31-node path (diameter 30 > max_iters=25) exceeds min-label
    propagation's round budget; connected_components must hand off to
    star contraction and still return the exact components."""
    n = 30
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], ["id_a", "id_b"]
    )
    comp = {r.node: r.comp for r in connected_components(edges).collect()}
    assert set(comp.values()) == {0}
    assert len(comp) == n + 1


def test_star_contraction_direct(spark):
    from scalable_etl_spark.operators.graph import (
        star_contraction_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["id_a", "id_b"],
    )
    comp = {
        r.node: r.comp
        for r in star_contraction_components(edges).collect()
    }
    assert comp == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
    }


def _union_find_components(edge_list):
    """Reference components via union-find (pure python)."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_star_contraction_matches_union_find_property(spark):
    """Hypothesis: star contraction == union-find on random graphs
    (mixes chains, cliques, isolated pairs, self-loops)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from scalable_etl_spark.operators.graph import (
        star_contraction_components,
    )

    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 30), st.integers(0, 30)),
            min_size=1,
            max_size=25,
        )
    )
    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
        derandomize=True,
    )
    def run(edges):
        df = spark.createDataFrame(edges, "id_a INT, id_b INT")
        got = {
            r.node: r.comp
            for r in star_contraction_components(df).collect()
        }
        # union-find reference ignores nothing: self-loops only add
        # the node itself
        expect = _union_find_components(edges)
        assert got == expect

    run()


def test_dedup_keep_per_component(spark):
    df = spark.createDataFrame(
        [(i, f"doc{i}") for i in (1, 2, 3, 10, 11, 99)], ["doc_id", "text"]
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    comp = connected_components(edges)
    kept = sorted(
        r.doc_id for r in dedup_keep_per_component(df, comp).collect()
    )
    # one survivor per component (min id) + untouched singleton 99
    assert kept == [1, 10, 99]
