"""PII scrub: Spark (Java regex) vs Python ``re`` on identical inputs."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import pii


def test_redacted_strings_match_python_re(spark):
    got = {r["pii_id"]: r["clean"]
           for r in pii.synthetic_pii_docs(spark)
           .select("pii_id", pii.redact("text").alias("clean")).collect()}
    for pii_id, text in pii._pii_rows():
        expect = text
        for _, pat, tag in pii.PII_PATTERNS:
            expect = re.sub(pat, tag, expect)
        assert got[pii_id] == expect, pii_id


def test_counts_match_python_re_and_residual_zero(spark):
    rows = {r["pii_id"]: r for r in pii.q_pii_scrub(spark, "").collect()}
    for pii_id, email, phone, ipv4, residual in pii.expected_pii_rows():
        r = rows[pii_id]
        assert (r["email"], r["phone"], r["ipv4"]) == (email, phone, ipv4)
        assert r["residual"] == 0


def test_pii_scrub_plan_is_pure_projection(spark):
    plan = pii.q_pii_scrub(spark, "")._jdf.queryExecution() \
        .executedPlan().toString()
    # no shuffle, no Python: redaction must ride the scan at 100 TB
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_redact_on_documents_table_no_shuffle(spark, sf_dir):
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.tables import load_table
    d = load_table(spark, "documents", sf_dir)
    out = d.select("doc_id", pii.redact("text").alias("clean"),
                   *pii.pii_counts("text"))
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
    assert out.count() == d.count()
