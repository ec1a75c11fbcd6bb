"""Chaos test for the suite-mismatch auto-drill (r6 verdict #4): a forced
sub-op mismatch must produce an attribution naming exactly that sub-op —
round 6 had the sidecar tool but the driver's red row still named no
culprit because the gate mirror never invoked it."""

from __future__ import annotations

import dataclasses

import duckdb

from tools.drill import drill_suite
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import suites
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.tables import (
    TABLES,
)

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def test_forced_mismatch_names_the_culprit_sub_op(spark, monkeypatch):
    subs = suites.SUITE_SUBS["set_ops"]
    poisoned = tuple(
        dataclasses.replace(
            s, inner_sql="SELECT 0 AS distinct_keys, 0 AS key_sum")
        if s.op == "union_dedup" else s
        for s in subs)
    monkeypatch.setitem(suites.SUITE_SUBS, "set_ops", poisoned)
    culprits = drill_suite(spark, _con(), "set_ops", SF)
    assert [c["op"] for c in culprits] == ["union_dedup"]
    for c in culprits:
        assert len(c["spark"]) == 16 and len(c["oracle"]) == 16
        assert c["spark"] != c["oracle"]


def test_clean_suite_drills_to_empty(spark):
    assert drill_suite(spark, _con(), "set_ops", SF) == []


def test_unknown_suite_is_a_noop(spark):
    assert drill_suite(spark, _con(), "not_a_suite", SF) == []
