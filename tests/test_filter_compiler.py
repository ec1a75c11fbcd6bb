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
