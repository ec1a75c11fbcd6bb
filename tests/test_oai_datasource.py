"""The `oaipmh` Python Data Source: an OAI-PMH endpoint read as a table
(batch) and polled as a stream — `spark.read.format("oaipmh")` over the
engine's own HTTP serving tier."""

from __future__ import annotations

import time

import pytest

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.oai.facade import OAIFacade
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.oai.server import OAIHTTPServer
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.plans.query_builder import OAIQueryPlanner
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.studies import fixture_studies
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.streaming.ingest import (
    harvest_event_schema,
)
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.streaming.oai_datasource import (
    OAIPMHDataSource,
)

HARVEST_TS = "2024-03-01T12:00:00"


@pytest.fixture(scope="module")
def source_server(spark):
    planner = OAIQueryPlanner(fixture_studies(spark), page_size=3)
    srv = OAIHTTPServer(OAIFacade(planner), port=0).start()
    yield srv
    srv.stop()


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(OAIPMHDataSource)
    return spark


def test_batch_read_full_sweep(registered, source_server):
    df = (registered.read.format("oaipmh")
          .option("url", f"http://127.0.0.1:{source_server.port}/v0/oai")
          .option("metadataPrefix", "oai_dc")
          .option("harvestTs", HARVEST_TS)
          .load())
    # same fields/types as the ingest event schema (nullability flags
    # differ: DDL strings default to nullable)
    expect = harvest_event_schema()
    assert [(f.name, f.dataType) for f in df.schema.fields] == [
        (f.name, f.dataType) for f in expect.fields]
    rows = {r["aggregator_identifier"]: r for r in df.collect()}
    assert set(rows) == {f"agg_id_{i}" for i in range(1, 9)}
    assert rows["agg_id_2"]["action"] == "delete"
    assert rows["agg_id_1"]["provenance"][0]["direct"] is True
    titles = {t["value"] for t in rows["agg_id_1"]["study_titles"]}
    assert "Title of agg_id_1" in titles


def test_batch_read_multiple_endpoints_partitioned(registered, source_server):
    """Two endpoints (same server twice) → one input partition each; the
    union carries both sweeps."""
    url = f"http://127.0.0.1:{source_server.port}/v0/oai"
    df = (registered.read.format("oaipmh")
          .option("urls", f"{url},{url}")
          .option("harvestTs", HARVEST_TS)
          .load())
    assert df.rdd.getNumPartitions() == 2
    assert df.count() == 16  # 8 records from each "endpoint"


def test_batch_read_selective_harvest_window(registered, source_server):
    df = (registered.read.format("oaipmh")
          .option("url", f"http://127.0.0.1:{source_server.port}/v0/oai")
          .option("harvestTs", HARVEST_TS)
          .option("from", "2031-01-01").option("until", "2031-12-31")
          .load())
    assert df.count() == 0  # noRecordsMatch → empty, not an error


def test_stream_polls_endpoint(registered, source_server, tmp_path):
    stream = (registered.readStream.format("oaipmh")
              .option("url", f"http://127.0.0.1:{source_server.port}/v0/oai")
              .option("harvestTs", HARVEST_TS)
              .load())
    q = (stream.writeStream.format("memory").queryName("oaipmh_poll")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(processingTime="1 second")
         .start())
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if registered.sql("SELECT count(*) c FROM oaipmh_poll").first()["c"] >= 8:
                break
            time.sleep(0.5)
        got = registered.sql(
            "SELECT DISTINCT aggregator_identifier FROM oaipmh_poll").collect()
        assert {r[0] for r in got} == {f"agg_id_{i}" for i in range(1, 9)}
    finally:
        q.stop()


def test_stream_offsets_advance_incremental_cursor(registered, source_server):
    """The stream offset carries the max upstream datestamp; the next sweep
    polls with `from = cursor`, shrinking full re-lists to boundary-or-newer
    records (driven directly through the reader, no engine needed)."""
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.streaming.oai_datasource import (
        OAIPMHDataSource,
    )

    ds = OAIPMHDataSource({
        "url": f"http://127.0.0.1:{source_server.port}/v0/oai",
        "metadataprefix": "oai_dc",
        "harvestts": HARVEST_TS,
    })
    reader = ds.simpleStreamReader(harvest_event_schema())
    rows1, off1 = reader.read(reader.initialOffset())
    rows1 = list(rows1)
    assert len(rows1) == 8
    assert off1["sweeps"] == 1 and off1["from"] is not None

    rows2, off2 = reader.read(off1)
    rows2 = list(rows2)
    # inclusive lower bound: only boundary-or-newer records return
    assert 1 <= len(rows2) < len(rows1)
    assert off2["from"] >= off1["from"]

    # replay of a committed range re-polls the same cursor window
    replay = list(reader.readBetweenOffsets(off1, off2))
    assert {r[0] for r in replay} == {r[0] for r in rows2}
