"""Oracle-exactness lint gate (r9 verdict #1).

The cross-engine float-hash bug class recurred three rounds running (r7
lateral_alias money-round, r8 ridge wide-int cast, r9 gini/kendall/
trimmed-mean casts); tools/oracle_lint.py converts the per-round human
catch into structure. This test (a) pins the three historical bugs as
must-fail fixtures so a rule regression is caught, (b) pins a sanctioned
example per rule as must-PASS so the rules don't creep into noise, and
(c) requires the full live oracle corpus — every oracle_sql() entry plus
every suite sub-operator inner_sql — to lint clean.

No SparkSession needed: the lint is pure string analysis over
import-time oracle text.
"""

from __future__ import annotations

import pytest

from tools import oracle_lint as OL


@pytest.mark.parametrize("fx_name", sorted(OL.FIXTURES))
def test_historical_bug_fixtures_must_fail(fx_name):
    sql, want_rule = OL.FIXTURES[fx_name]
    rules = {f.rule for f in OL.lint_sql(fx_name, sql)}
    assert want_rule in rules, (
        f"fixture {fx_name} (a real past gate red) no longer triggers "
        f"{want_rule}; the linter has lost the rule that caught it")


SANCTIONED = {
    # DECIMAL fold before round + cast: the TPC-H money discipline
    "decimal_fold": """
        SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                              * (1 - CAST(l_discount AS DECIMAL(12,2)))),
                          2) AS DOUBLE) AS revenue
        FROM lineitem GROUP BY l_returnflag
    """,
    # VARCHAR-routed HUGEINT: the sanctioned strtod path
    "varchar_route": """
        SELECT CAST(CAST(sum(CAST(xi AS HUGEINT) * yi) AS VARCHAR)
                    AS DOUBLE) AS xty
        FROM obs
    """,
    # '//' pair counts stay exact HUGEINT
    "floor_div_pairs": """
        SELECT sum(t * (t - 1) // 2) AS n1 FROM m
    """,
    # integer-cents scale step: round() with no digits arg
    "cents_scale": """
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    """,
    # value-selecting fns: no accumulation reaches the round
    "value_select": """
        SELECT round(quantile_cont(l_extendedprice, 0.5), 3) AS p50,
               round(max(c_acctbal), 4) AS max_bal
        FROM lineitem
    """,
}


@pytest.mark.parametrize("name", sorted(SANCTIONED))
def test_sanctioned_patterns_must_pass(name):
    findings = OL.lint_sql(name, SANCTIONED[name])
    assert findings == [], [str(f) for f in findings]


def test_live_oracle_corpus_lints_clean():
    findings = OL.lint_all()
    assert findings == [], "\n".join(str(f) for f in findings)


def test_corpus_collection_is_complete():
    """The lint must see BOTH surfaces: the 50 gate oracles and the
    per-sub-op inner SQL (a rule that only scanned one would miss half
    the historical bugs — gini/kendall were sub-ops, lateral_alias a
    verbatim text)."""
    oracles = OL.collect_oracles()
    assert len(oracles) >= 270
    assert "kmeans_clusters" in oracles  # singleton gate entry
    assert any(k.endswith(".kendall_tau") for k in oracles)  # sub-op
