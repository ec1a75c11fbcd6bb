"""Mongo filter-dict compiler (functions/filter_compiler.py): operator
semantics pinned against hand-built predicates and driver-side Python
mirrors; the compiled expression must stay pushdown-friendly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.functions import predicates as P
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.functions.filter_compiler import (
    compile_filter,
)

ROWS = [
    (1, "a", 10.0, [{"k": "x", "direct": True}]),
    (2, "b", 20.0, [{"k": "x", "direct": False}]),
    (3, None, 30.0, [{"k": "y", "direct": True}]),
    (4, "a", None, []),
    (5, "c", 50.0, None),
]
SCHEMA = ("id long, status string, price double, "
          "hops array<struct<k: string, direct: boolean>>")


def _ids(df, filt):
    return sorted(r["id"] for r in df.filter(compile_filter(filt)).collect())


@pytest.fixture(scope="module")
def t(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    df.cache().count()
    return df


def test_equality_and_eq(t):
    assert _ids(t, {"status": "a"}) == [1, 4]
    assert _ids(t, {"status": {"$eq": "a"}}) == [1, 4]


def test_ne_keeps_null(t):
    """The reference's deleted-exclusion semantics: NULL matches $ne."""
    assert _ids(t, {"status": {"$ne": "a"}}) == [2, 3, 5]
    # equivalence with the hand-built helper
    via_helper = sorted(
        r["id"] for r in t.filter(P.ne_keep_null("status", "a")).collect())
    assert _ids(t, {"status": {"$ne": "a"}}) == via_helper


def test_in_nin(t):
    assert _ids(t, {"status": {"$in": ["a", "b"]}}) == [1, 2, 4]
    assert _ids(t, {"status": {"$in": []}}) == []
    # $nin matches NULL (Mongo)
    assert _ids(t, {"status": {"$nin": ["a"]}}) == [2, 3, 5]


def test_range_multi_op_spec(t):
    assert _ids(t, {"price": {"$gte": 20.0, "$lt": 50.0}}) == [2, 3]
    assert _ids(t, {"price": {"$lte": 10.0}}) == [1]


def test_exists(t):
    assert _ids(t, {"price": {"$exists": True}}) == [1, 2, 3, 5]
    assert _ids(t, {"price": {"$exists": False}}) == [4]


def test_not_matches_missing(t):
    """Mongo negation matches docs where the field is missing (id 4)."""
    assert _ids(t, {"price": {"$not": {"$gte": 20.0}}}) == [1, 4]


def test_logical_operators(t):
    f = {"$or": [{"status": "a"}, {"price": {"$gte": 50.0}}]}
    assert _ids(t, f) == [1, 4, 5]
    f = {"$and": [{"status": {"$ne": "b"}}, {"price": {"$exists": True}}]}
    assert _ids(t, f) == [1, 3, 5]
    # row 3's status is NULL: both equality clauses evaluate NULL, which
    # $nor must read as "failed", so the row matches (Mongo semantics)
    f = {"$nor": [{"status": "a"}, {"status": "b"}]}
    assert _ids(t, f) == [3, 5]


def test_implicit_and_across_keys(t):
    assert _ids(t, {"status": "a", "price": {"$exists": True}}) == [1]
    assert _ids(t, {}) == [1, 2, 3, 4, 5]


def test_elem_match_struct_and_scalar(t, spark):
    # the reference's source-set shape: base_url eq AND direct flag
    f = {"hops": {"$elemMatch": {"k": "x", "direct": True}}}
    assert _ids(t, f) == [1]
    # equivalence with the hand-built elem_match helper
    via_helper = sorted(r["id"] for r in t.filter(
        P.elem_match("hops", lambda h: h["k"] == "x",
                     lambda h: h["direct"])).collect())
    assert _ids(t, f) == via_helper
    # $exists inside elemMatch
    f = {"hops": {"$elemMatch": {"k": {"$exists": True}}}}
    assert _ids(t, f) == [1, 2, 3]
    # scalar arrays take a bare operator spec
    s = spark.createDataFrame([(1, [1, 5]), (2, [9]), (3, [])],
                              "id long, xs array<int>")
    got = sorted(r["id"] for r in s.filter(
        compile_filter({"xs": {"$elemMatch": {"$gte": 5}}})).collect())
    assert got == [1, 2]


def test_isodate_wrapper(spark, sf_dir):
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.tables import (
        load_table,
    )

    o = load_table(spark, "orders", sf_dir)
    f = {"o_orderdate": {"$gte": {"$isodate": "1996-01-01T00:00:00"},
                         "$lt": {"$isodate": "1996-02-01T00:00:00"}}}
    got = o.filter(compile_filter(f)).count()
    ref = o.filter((F.col("o_orderdate") >= "1996-01-01")
                   & (F.col("o_orderdate") < "1996-02-01")).count()
    assert got == ref > 0


def test_compiled_filter_pushes_down(spark, sf_dir):
    """A compiled simple predicate must reach the parquet scan as a
    PushedFilter — the compiler emits plain Columns, nothing opaque."""
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.tables import (
        load_table,
    )

    o = load_table(spark, "orders", sf_dir)
    df = o.filter(compile_filter(
        {"o_orderpriority": {"$in": ["1-URGENT", "2-HIGH"]},
         "o_totalprice": {"$gte": 100000.0}}))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "In(o_orderpriority" in plan
    assert "GreaterThanOrEqual(o_totalprice" in plan


def test_unsupported_operators_raise():
    with pytest.raises(ValueError, match="unsupported"):
        compile_filter({"x": {"$regex": "a.*"}})
    with pytest.raises(ValueError, match="unsupported"):
        compile_filter({"$where": "1"})


def test_fuzz_compiler_vs_python_mirror(spark):
    """200 seeded random filter dicts over a 48-row table, all evaluated
    in ONE Spark job (each compiled filter becomes a boolean projection
    column) and compared against a driver-side Mongo-semantics evaluator.
    NULL collapse: a filter predicate evaluating to SQL NULL rejects the
    row, and the compiler coalesces NULL to FALSE under $not/$nor — so
    the Python mirror can work in plain booleans throughout."""
    import random

    rng = random.Random(4)
    rows = []
    for i in range(48):
        rows.append((
            i,
            rng.choice([None, 1, 2, 3, 5, 8, 13]),
            rng.choice([None, "a", "b", "c", "d"]),
            rng.choice([None, [], [{"k": "x", "n": 1}], [{"k": "y", "n": 2}],
                        [{"k": "x", "n": 3}, {"k": "y", "n": 1}]]),
        ))
    schema = "id long, a long, s string, hops array<struct<k: string, n: long>>"
    df = spark.createDataFrame(rows, schema)

    def gen_spec(field):
        kind = rng.randrange(8)
        if field == "a":
            v = rng.choice([1, 2, 3, 5, 8])
            if kind == 0:
                return v
            if kind == 1:
                return {"$ne": v}
            if kind == 2:
                return {"$in": rng.sample([1, 2, 3, 5, 8, 13], rng.randrange(1, 4))}
            if kind == 3:
                return {"$nin": rng.sample([1, 2, 3], rng.randrange(1, 3))}
            if kind == 4:
                return {rng.choice(["$lt", "$lte", "$gt", "$gte"]): v}
            if kind == 5:
                return {"$exists": rng.random() < 0.5}
            if kind == 6:
                return {"$not": {rng.choice(["$lt", "$gte"]): v}}
            return {"$gte": 2, "$lt": 9}
        v = rng.choice(["a", "b", "c"])
        if kind in (0, 1):
            return v
        if kind == 2:
            return {"$ne": v}
        if kind == 3:
            return {"$in": rng.sample(["a", "b", "c", "d"], rng.randrange(1, 3))}
        return {"$exists": rng.random() < 0.5}

    def gen_filter(depth=0):
        r = rng.random()
        if depth < 2 and r < 0.3:
            op = rng.choice(["$and", "$or", "$nor"])
            return {op: [gen_filter(depth + 1)
                         for _ in range(rng.randrange(1, 3))]}
        if r < 0.4:
            return {"hops": {"$elemMatch": {"k": rng.choice(["x", "y"]),
                                            "n": {"$gte": rng.randrange(1, 4)}}}}
        out = {}
        for field in rng.sample(["a", "s"], rng.randrange(1, 3)):
            out[field] = gen_spec(field)
        return out

    def ev_spec(val, spec):
        if not isinstance(spec, dict):
            return val is not None and val == spec
        ok = True
        for op, arg in spec.items():
            if op == "$eq":
                ok &= val is not None and val == arg
            elif op == "$ne":
                ok &= val is None or val != arg
            elif op == "$in":
                ok &= val is not None and val in arg
            elif op == "$nin":
                ok &= val is None or val not in arg
            elif op == "$lt":
                ok &= val is not None and val < arg
            elif op == "$lte":
                ok &= val is not None and val <= arg
            elif op == "$gt":
                ok &= val is not None and val > arg
            elif op == "$gte":
                ok &= val is not None and val >= arg
            elif op == "$exists":
                ok &= (val is not None) == arg
            elif op == "$not":
                ok &= not ev_spec(val, arg)
            else:
                raise AssertionError(op)
        return ok

    def ev_elem(e, cond):
        return all(ev_spec(e[k] if e else None, v) for k, v in cond.items())

    def ev(row, filt):
        out = True
        for k, v in filt.items():
            if k == "$and":
                out &= all(ev(row, f) for f in v)
            elif k == "$or":
                out &= any(ev(row, f) for f in v)
            elif k == "$nor":
                out &= not any(ev(row, f) for f in v)
            elif isinstance(v, dict) and "$elemMatch" in v:
                arr = row[k]
                out &= arr is not None and any(
                    ev_elem(e, v["$elemMatch"]) for e in arr)
            else:
                out &= ev_spec(row[k], v)
        return out

    filters = [gen_filter() for _ in range(200)]
    proj = df.select(
        "id", *[F.coalesce(compile_filter(f), F.lit(False)).alias(f"f{i}")
                for i, f in enumerate(filters)])
    got = {r["id"]: r for r in proj.collect()}
    by_id = {r[0]: {"id": r[0], "a": r[1], "s": r[2], "hops": r[3]}
             for r in rows}
    for i, f in enumerate(filters):
        for rid, row in by_id.items():
            expected = ev(row, f)
            assert bool(got[rid][f"f{i}"]) == expected, (f, row)


def test_all_and_size_operators(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b", "c"]), (2, ["a"]), (3, []), (4, None)],
        "id long, xs array<string>")
    assert sorted(r["id"] for r in df.filter(
        compile_filter({"xs": {"$all": ["a", "b"]}})).collect()) == [1]
    assert sorted(r["id"] for r in df.filter(
        compile_filter({"xs": {"$all": []}})).collect()) == [1, 2, 3, 4]
    assert sorted(r["id"] for r in df.filter(
        compile_filter({"xs": {"$size": 1}})).collect()) == [2]
    assert sorted(r["id"] for r in df.filter(
        compile_filter({"xs": {"$size": 0}})).collect()) == [3]


def test_compiler_matches_oai_planner_predicates(spark):
    """The reference's actual wire filters, fed to the compiler, select
    the SAME records as the hand-built predicate helpers the OAI planner
    uses (predicates.not_deleted / direct_hop_from) — a user can port
    their DocStore query dict verbatim."""
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.studies import (
        FSD_URL, fixture_studies,
    )

    studies = fixture_studies(spark)

    # deleted-exclusion (cdcagg_oai metrics shape)
    via_dict = studies.filter(compile_filter(
        {"metadata.status": {"$ne": "deleted"}}))
    via_helper = studies.filter(P.not_deleted())
    ids_d = {r["aggregator_identifier"] for r in via_dict.collect()}
    ids_h = {r["aggregator_identifier"] for r in via_helper.collect()}
    assert ids_d == ids_h and ids_h

    # source-set membership (test_serve.py:1342-1345 wire shape)
    f = {"provenance": {"$elemMatch": {"base_url": FSD_URL, "direct": True}}}
    ids_d = {r["aggregator_identifier"]
             for r in studies.filter(compile_filter(f)).collect()}
    ids_h = {r["aggregator_identifier"] for r in studies.filter(
        P.direct_hop_from(FSD_URL)).collect()}
    assert ids_d == ids_h and ids_h
