"""The complete reference lifecycle in ONE test (round-4 verdict item 6):

    live OAI-PMH endpoint (3 resumption pages)
      → poller lands events
      → streaming merge builds the corpus
      → a SECOND sweep carries an UPDATE and a DELETE
      → incremental merge (same checkpoint, only new files)
      → the merged corpus serves ListRecords pages over HTTP,
        /metrics moves, and oai_ddi25 XML carries the updated field,
        with deletes visible as header-only deleted records.

Mirrors the reference ecosystem's harvester → DocStore → serve cycle
(/root/reference README: the aggregator sits between harvested sources
and OAI consumers)."""

from __future__ import annotations

import datetime
import urllib.request
import xml.etree.ElementTree as ET

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.oai.facade import OAIFacade
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.oai.server import OAIHTTPServer
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.plans.query_builder import (
    OAIQueryPlanner,
)
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.studies import (
    _record, _ts, fixture_records, fixture_studies, studies_schema,
)
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.streaming.ingest import (
    harvest_event_schema, read_bucketed_corpus, start_ingest,
)
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.streaming.oai_source import (
    OAIPMHPoller,
)

NS = {"oai": "http://www.openarchives.org/OAI/2.0/",
      "ddi": "ddi:codebook:2_5"}
T1 = datetime.datetime(2024, 3, 1, 12, 0, 0)
T2 = datetime.datetime(2024, 3, 2, 12, 0, 0)


def _http(port, path, ua="lifecycle-harvester"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", headers={"User-Agent": ua})
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.status, resp.read().decode()


def _sweep2_records() -> list[dict]:
    """The source a day later: agg_id_3's title changed, agg_id_1 deleted."""
    recs = {r["aggregator_identifier"]: r for r in fixture_records()}
    recs["agg_id_3"] = _record(
        "agg_id_3",
        study_titles=[{"value": "Updated title 3", "language": "en"}],
        metadata={"status": "updated", "created": _ts("2019-01-01T00:00:00Z"),
                  "updated": _ts("2020-01-02T00:00:00Z"), "deleted": None},
        identifiers=[{"value": "local-3", "language": "en",
                      "agency": "Unknown"}],
    )
    recs["agg_id_1"] = _record(
        "agg_id_1",
        metadata={"status": "deleted", "created": _ts("2019-01-01T00:00:00Z"),
                  "updated": _ts("2020-01-01T00:00:00Z"),
                  "deleted": _ts("2020-01-01T00:00:00Z")},
        identifiers=[], study_titles=[], abstracts=[], publishers=[],
    )
    return list(recs.values())


def test_full_lifecycle_harvest_update_delete_serve(spark, tmp_path):
    events_dir = str(tmp_path / "events")
    corpus_path = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    # --- sweep 1: harvest the 8 fixtures over 3 resumption pages ---------
    src = OAIHTTPServer(
        OAIFacade(OAIQueryPlanner(fixture_studies(spark), page_size=3)),
        port=0).start()
    try:
        base = f"http://127.0.0.1:{src.port}/v0/oai"
        poller = OAIPMHPoller(base)
        assert len(list(poller.pages())) == 3  # resumption-token follow-up
        assert poller.poll_once(spark, events_dir, harvest_ts=T1) == 8
    finally:
        src.stop()
    start_ingest(spark, events_dir, corpus_path, ckpt).awaitTermination()
    rows = {r["aggregator_identifier"]: r
            for r in read_bucketed_corpus(spark, corpus_path).collect()}
    assert len(rows) == 8
    assert {t["value"] for t in rows["agg_id_3"]["study_titles"]} == \
        {"Title of agg_id_3", "Otsikko agg_id_3"}
    assert rows["agg_id_1"]["metadata"]["status"] == "created"

    # --- sweep 2: the source moved on (update + delete); incremental merge
    src2_df = spark.createDataFrame(_sweep2_records(), schema=studies_schema())
    src2 = OAIHTTPServer(
        OAIFacade(OAIQueryPlanner(src2_df, page_size=3)), port=0).start()
    try:
        base2 = f"http://127.0.0.1:{src2.port}/v0/oai"
        assert OAIPMHPoller(base2).poll_once(
            spark, events_dir, harvest_ts=T2) == 8
    finally:
        src2.stop()
    # same checkpoint: the file source processes ONLY sweep 2's files
    start_ingest(spark, events_dir, corpus_path, ckpt).awaitTermination()

    corpus = read_bucketed_corpus(spark, corpus_path)
    rows = {r["aggregator_identifier"]: r for r in corpus.collect()}
    assert len(rows) == 8  # update + delete, no duplicates
    assert [t["value"] for t in rows["agg_id_3"]["study_titles"]] == \
        ["Updated title 3"]
    assert rows["agg_id_1"]["metadata"]["status"] == "deleted"
    assert rows["agg_id_1"]["metadata"]["deleted"] == T2
    assert rows["agg_id_2"]["metadata"]["status"] == "deleted"  # from sweep 1

    # --- serve the merged corpus over HTTP --------------------------------
    srv = OAIHTTPServer(
        OAIFacade(OAIQueryPlanner(corpus, page_size=3)), port=0).start()
    try:
        # metrics BEFORE: corpus totals; requests counter baseline
        _, m0 = _http(srv.port, "/metrics")
        assert "records_total 8.0" in m0.splitlines()
        assert "records_total_without_deleted 6.0" in m0.splitlines()

        # ListRecords pages with resumption-token follow-up
        _, body = _http(
            srv.port, "/v0/oai?verb=ListRecords&metadataPrefix=oai_dc")
        seen, deleted, pages = [], set(), 1
        while True:
            el = ET.fromstring(body)
            for rec in el.findall("./oai:ListRecords/oai:record", NS):
                hdr = rec.find("./oai:header", NS)
                ident = hdr.find("./oai:identifier", NS).text
                seen.append(ident)
                if hdr.get("status") == "deleted":
                    deleted.add(ident)
                    assert rec.find("./oai:metadata", NS) is None
            tok = el.find("./oai:ListRecords/oai:resumptionToken", NS)
            if tok is None or not tok.text:
                break
            pages += 1
            _, body = _http(
                srv.port,
                f"/v0/oai?verb=ListRecords&resumptionToken={tok.text}")
        assert sorted(seen) == [f"agg_id_{i}" for i in range(1, 9)]
        assert pages == 3
        assert deleted == {"agg_id_1", "agg_id_2"}  # header-only deletes

        # ddi25 XML carries the sweep-2 update
        _, ddi = _http(
            srv.port,
            "/v0/oai?verb=GetRecord&identifier=agg_id_3"
            "&metadataPrefix=oai_ddi25")
        el = ET.fromstring(ddi)
        titles = el.findall(
            "./oai:GetRecord/oai:record/oai:metadata/ddi:codeBook"
            "/ddi:stdyDscr/ddi:citation/ddi:titlStmt/ddi:titl", NS)
        assert [t.text for t in titles] == ["Updated title 3"]

        # metrics AFTER: the request counters moved
        _, m1 = _http(srv.port, "/metrics")

        def _req_total(text):
            return sum(
                float(line.rsplit(" ", 1)[1])
                for line in text.splitlines()
                if line.startswith("requests_total"))

        assert _req_total(m1) >= _req_total(m0) + 4  # 3 pages + GetRecord
        assert any(
            'requests_per_user_agent{harvester="lifecycle-harvester"}' in l
            for l in m1.splitlines())
    finally:
        srv.stop()


def test_lifecycle_on_versioned_table_with_time_travel(spark, tmp_path):
    """Round-6 task: the SAME harvest→merge→serve cycle with the versioned
    table as the corpus store — one publish discipline. Each microbatch
    commits one snapshot, so O2 snapshot paging, CDC and time travel hold
    over the LIVE studies corpus: after the update+delete sweep, the
    pre-sweep version still serves the old state."""
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources import (
        versioned_table as VT,
    )
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.streaming.ingest import (
        start_ingest_versioned,
    )

    events_dir = str(tmp_path / "events")
    table_path = str(tmp_path / "vt_corpus")
    ckpt = str(tmp_path / "ckpt")

    # sweep 1: harvest the 8 fixtures, merge into the versioned table
    src = OAIHTTPServer(
        OAIFacade(OAIQueryPlanner(fixture_studies(spark), page_size=3)),
        port=0).start()
    try:
        base = f"http://127.0.0.1:{src.port}/v0/oai"
        assert OAIPMHPoller(base).poll_once(
            spark, events_dir, harvest_ts=T1) == 8
    finally:
        src.stop()
    view_path = str(tmp_path / "metrics_view.json")
    start_ingest_versioned(spark, events_dir, table_path, ckpt,
                           metrics_view_path=view_path).awaitTermination()
    v1 = VT.current_version(table_path)
    import time as _time

    t_between_sweeps = _time.time()
    rows = {r["aggregator_identifier"]: r
            for r in VT.read(spark, table_path).collect()}
    assert len(rows) == 8
    assert rows["agg_id_1"]["metadata"]["status"] == "created"

    # sweep 2: update + delete, incremental merge (same checkpoint)
    src2_df = spark.createDataFrame(_sweep2_records(), schema=studies_schema())
    src2 = OAIHTTPServer(
        OAIFacade(OAIQueryPlanner(src2_df, page_size=3)), port=0).start()
    try:
        base2 = f"http://127.0.0.1:{src2.port}/v0/oai"
        assert OAIPMHPoller(base2).poll_once(
            spark, events_dir, harvest_ts=T2) == 8
    finally:
        src2.stop()
    start_ingest_versioned(spark, events_dir, table_path, ckpt,
                           metrics_view_path=view_path).awaitTermination()

    corpus = VT.read(spark, table_path)
    rows = {r["aggregator_identifier"]: r for r in corpus.collect()}
    assert len(rows) == 8
    assert [t["value"] for t in rows["agg_id_3"]["study_titles"]] == \
        ["Updated title 3"]
    assert rows["agg_id_1"]["metadata"]["status"] == "deleted"

    # TIME TRAVEL across the ingest batch (SURVEY §2.5 O2, the Delta
    # "VERSION AS OF" idiom): the pre-sweep-2 snapshot is intact
    old = {r["aggregator_identifier"]: r
           for r in VT.read(spark, table_path, version=v1).collect()}
    assert len(old) == 8
    assert {t["value"] for t in old["agg_id_3"]["study_titles"]} == \
        {"Title of agg_id_3", "Otsikko agg_id_3"}
    assert old["agg_id_1"]["metadata"]["status"] == "created"

    # CDC between the two snapshots: sweep 2 re-upserted every record
    # (metadata.updated moved to T2 on all 8), so the feed carries a
    # delete+insert pair per key; the inserts show the new state
    feed = VT.table_changes(spark, table_path, v1,
                            VT.current_version(table_path)).collect()
    inserts = {r["aggregator_identifier"]: r for r in feed
               if r["_change"] == "insert"}
    deletes = {r["aggregator_identifier"] for r in feed
               if r["_change"] == "delete"}
    assert set(inserts) == deletes == {f"agg_id_{i}" for i in range(1, 9)}
    assert [t["value"] for t in inserts["agg_id_3"]["study_titles"]] == \
        ["Updated title 3"]
    assert inserts["agg_id_1"]["metadata"]["status"] == "deleted"

    # the merged head serves over HTTP exactly like the directory layouts
    srv = OAIHTTPServer(
        OAIFacade(OAIQueryPlanner(corpus, page_size=5)), port=0).start()
    try:
        _, body = _http(
            srv.port, "/v0/oai?verb=GetRecord&identifier=agg_id_3"
            "&metadataPrefix=oai_ddi25")
        el = ET.fromstring(body)
        titles = el.findall(
            "./oai:GetRecord/oai:record/oai:metadata/ddi:codeBook"
            "/ddi:stdyDscr/ddi:citation/ddi:titlStmt/ddi:titl", NS)
        assert [t.text for t in titles] == ["Updated title 3"]
    finally:
        srv.stop()

    # replayed epoch is a no-op (epoch rides the manifest, not a marker)
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.streaming.ingest import (
        merge_batch_versioned,
    )
    v_before = VT.current_version(table_path)
    merge_batch_versioned(
        spark.createDataFrame([], schema=harvest_event_schema()),
        table_path, epoch_id=0)
    assert VT.current_version(table_path) == v_before

    # TIMESTAMP AS OF: a wall-clock taken between the sweeps resolves to
    # the sweep-1 snapshot (manifests record committed_at at publish)
    assert VT.version_asof(table_path, t_between_sweeps) == v1
    assert VT.version_asof(table_path, _time.time()) == v_before

    # the maintained /metrics view advanced with each microbatch and must
    # equal a from-scratch recompute over the corpus — including the
    # deleted agg_id_1 (counted in totals, excluded from without-deleted)
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators.metrics import (
        compute_metrics,
    )
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.streaming.ingest import (
        _load_view_state, metrics_view_counts,
    )
    view = metrics_view_counts(_load_view_state(view_path))
    direct = compute_metrics(corpus)
    assert view["version"] == v_before
    assert view["publishers_counts"] == direct["publishers_counts"]
    assert (view["publishers_counts_without_deleted"]
            == direct["publishers_counts_without_deleted"])
    # 8 records total; the fixture corpus ships one deleted record and
    # sweep 2 deleted agg_id_1 → 6 live
    assert sum(view["publishers_counts"].values()) == 8
    assert sum(view["publishers_counts_without_deleted"].values()) == 6
