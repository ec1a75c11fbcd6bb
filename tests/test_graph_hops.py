"""BFS hop-distance over the near-dup graph (dedup.q_neardup_hop_distance)
and the recursive-CTE SQL-text parity rows — graph semantics pinned
against the component/canonical relations they derive from.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import (
    dedup,
    relational_ext,
)


def test_hop_distance_semantics(spark, sf_dir):
    hops = {r["doc_id"]: (r["component"], r["hops"])
            for r in dedup.q_neardup_hop_distance(spark, sf_dir).collect()}
    canon = {r["component"]: r["kept_doc"]
             for r in dedup.q_canonical_selection(spark, sf_dir).collect()}
    comp = {r["doc_id"]: r["component"]
            for r in dedup.q_neardup_components(spark, sf_dir).collect()}
    pairs = {(r["doc_a"], r["doc_b"])
             for r in dedup.q_minhash_lsh_pairs(spark, sf_dir).collect()}
    adj = pairs | {(b, a) for a, b in pairs}

    # every canonical sits at hop 0; nothing else does
    zero = {d for d, (_c, h) in hops.items() if h == 0}
    assert zero == set(canon.values())
    # the pair graph's components are connected with tiny diameters, so the
    # bounded BFS reaches every member
    assert set(hops) == set(comp)
    assert all(0 <= h <= dedup.MAX_HOPS for _c, h in hops.values())
    # component labels carried through unchanged
    assert all(hops[d][0] == c for d, c in comp.items())
    # BFS invariant: every hop-h>0 doc's nearest neighbor is at exactly h-1
    for d, (_c, h) in hops.items():
        if h > 0:
            neigh = [n for a, n in adj if a == d]
            assert min(hops[n][1] for n in neigh) == h - 1


def test_hop_distance_plan_is_edge_sized(spark, sf_dir):
    """The sweep loop must join edge-sized relations only — the documents
    table appears nowhere in the final BFS plan (the pair/canonical
    inputs are memoized checkpoints)."""
    df = dedup.q_neardup_hop_distance(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "documents" not in plan
    assert "parquet" not in plan.lower()


def test_recursive_spine_text_runs_on_spark(spark, sf_dir):
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.tables import (
        register_views,
    )

    register_views(spark, sf_dir)
    rows = spark.sql(
        relational_ext.SQL_TEXTS["sql_text_recursive_spine"]).collect()
    # one row per day of the 14-day spine, present even when no orders fall
    # on the day (LEFT JOIN gap-fill semantics)
    assert len(rows) == 14
    assert {r["day"][:7] for r in rows} == {"1996-01"}
    assert all(r["orders"] >= 0 and r["day_revenue"] >= 0 for r in rows)


def test_recursive_walk_text_runs_on_spark(spark, sf_dir):
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.tables import (
        register_views,
    )

    register_views(spark, sf_dir)
    rows = spark.sql(
        relational_ext.SQL_TEXTS["sql_text_recursive_walk"]).collect()
    assert len(rows) == 5  # one per start node
    # depth bound honored: 7 visits each (depth 0..6), bounded distinct set
    assert all(r["visits"] == 7 and r["max_depth"] == 6 for r in rows)


def test_triangle_plan_no_cartesian(spark, sf_dir):
    """The wedge enumeration must stay equi-join only — a cartesian or
    nested-loop node here means the orientation trick regressed."""
    df = dedup.q_triangle_stats(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_triangle_counts_match_bruteforce(spark, sf_dir):
    """Exact triangle check: enumerate triangles in driver Python over the
    collected (tiny at sf0.001) pair set and compare per-node counts."""
    pairs = {(r["doc_a"], r["doc_b"])
             for r in dedup.q_minhash_lsh_pairs(spark, sf_dir).collect()}
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri_count = {n: 0 for n in adj}
    for a, b in pairs:
        for _c in adj[a] & adj[b]:
            # a triangle's three edges each credit their two endpoints
            # once -> every node of the triangle ends at exactly 2
            tri_count[a] += 1
            tri_count[b] += 1
    expected = {n: t // 2 for n, t in tri_count.items()}
    got = {r["doc_id"]: (r["deg"], r["triangles"], r["clustering"])
           for r in dedup.q_triangle_stats(spark, sf_dir).collect()}
    assert set(got) == set(adj)
    for n, (deg, tri, coeff) in got.items():
        assert deg == len(adj[n])
        assert tri == expected[n]
        if deg >= 2:
            assert abs(coeff - 2.0 * tri / (deg * (deg - 1))) < 1e-3
        else:
            assert coeff == 0.0
