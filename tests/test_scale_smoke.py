"""Scale smoke: the OAI stack over a generated 100k-record corpus — deep
keyset pagination, one-pass metrics, set filters — beyond the 8-row
fixtures. Generation reuses the synthetic source's Column-only transform."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators.metrics import compute_metrics
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.plans.query_builder import (
    OAIQueryPlanner, finalize_token,
)
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.studies import (
    FSD_URL, GESIS_URL, STUDY_DDL,
)
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.streaming.synthetic_source import (
    events_from_rate,
)

N = 100_000
SNAPSHOT = "2030-01-01 00:00:00"


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    rate_like = (
        spark.range(N)
        .withColumn("timestamp",
                    F.lit("2024-01-01 00:00:00").cast("timestamp")
                    + F.make_interval(secs=F.col("id").cast("double")))
        .withColumn("value", F.col("id"))
        # distinct ids (no REHARVEST_MOD wrap): override after transform
    )
    ev = events_from_rate(rate_like)
    ident = F.concat(F.lit("rec_"), F.lpad(F.col("study_number").substr(5, 20), 7, "0"))
    study_cols = [name for name, _ in STUDY_DDL]
    corpus = (
        ev.withColumn("aggregator_identifier", ident)
        .withColumn(
            "metadata",
            F.struct(
                F.when(F.col("action") == "delete", "deleted")
                .otherwise("created").alias("status"),
                F.col("harvest_ts").alias("created"),
                F.col("harvest_ts").alias("updated"),
                F.when(F.col("action") == "delete", F.col("harvest_ts")).alias("deleted"),
            ),
        )
        .withColumn("direct_base_url", F.col("provenance")[0]["base_url"])
        .select(*study_cols)
    )
    path = str(tmp_path_factory.mktemp("scale") / "corpus")
    corpus.write.parquet(path)
    return spark.read.parquet(path)


def test_corpus_shape(corpus):
    assert corpus.count() == N
    assert corpus.select("aggregator_identifier").distinct().count() == N


def test_deep_keyset_pagination(corpus):
    """Jump deep into the list via a synthesized token: the keyset filter
    makes page N+1 cost O(page), not O(cursor)."""
    planner = OAIQueryPlanner(corpus, page_size=500)
    page1 = planner.list_page("oai_dc", request_ts=SNAPSHOT)
    assert page1.complete_list_size == N
    rows = page1.df.collect()
    assert len(rows) == 500
    token = finalize_token(page1, rows)

    page2 = planner.list_page("oai_dc", token=token)
    rows2 = page2.df.collect()
    assert rows2[0]["aggregator_identifier"] > rows[-1]["aggregator_identifier"]
    assert len(rows2) == 500
    # ids are zero-padded so keyset order == numeric order
    assert rows2[0]["aggregator_identifier"] == "rec_0000500"


def test_metrics_one_pass_at_scale(corpus):
    m = compute_metrics(corpus)
    assert m["records_total"] == N
    assert m["publishers_total"] == 2
    assert m["publishers_counts"][FSD_URL] + m["publishers_counts"][GESIS_URL] == N
    deleted = N // 10
    assert m["records_total_without_deleted"] == N - deleted


def test_set_filter_at_scale(corpus):
    planner = OAIQueryPlanner(
        corpus,
        source_defs=[{"url": FSD_URL, "source": "FSD", "setname": "FSD"},
                     {"url": GESIS_URL, "source": "GESIS", "setname": "GESIS"}],
    )
    fsd = corpus.filter(planner.set_filter("source:FSD")).count()
    gesis = corpus.filter(planner.set_filter("source:GESIS")).count()
    assert fsd + gesis == N and fsd == N // 2
