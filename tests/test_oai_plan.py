"""OAI plan-builder tests: set filters, pagination tokens, ListSets, metrics
— mirroring the reference's wire-level query assertions
(/root/reference/tests/test_serve.py:1330-1377, tests/test_metrics.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators.metrics import compute_metrics
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.plans.query_builder import (
    FORMAT_FIELDS, OAIQueryPlanner, UnsupportedSetSpec, finalize_token,
)
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.plans.tokens import (
    BadResumptionToken, ResumptionToken,
)
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.studies import (
    FSD_URL, GESIS_URL, fixture_studies,
)
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources import yaml_sets

DATA = "/root/repo/tests/data"
NOW = "2019-12-12 07:14:38"


@pytest.fixture(scope="module")
def planner(spark):
    studies = fixture_studies(spark)
    studies.cache().count()
    return OAIQueryPlanner(
        studies,
        source_defs=yaml_sets.load_source_defs(f"{DATA}/sources.yaml"),
        configurable_path=f"{DATA}/configurable.yaml",
        page_size=3,
    )


def ids(df):
    return sorted(r.aggregator_identifier for r in
                  df.select("aggregator_identifier").collect())


# --- YAML machinery ----------------------------------------------------------

def test_validate_configurable_ok_and_externals():
    cnf = yaml_sets.validate_configurable(f"{DATA}/configurable.yaml")
    assert cnf["spec"] == "thematic"
    loaded = yaml_sets.load_configurable(f"{DATA}/configurable.yaml")
    assert [n["spec"] for n in loaded["nodes"]] == [
        "social_sciences", "humanities", "history", "literature"]


def test_validate_configurable_errors(tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text("spec: s\nname: n\nnodes:\n  - spec: c\n    name: cn\n    identifiers: []\n")
    with pytest.raises(yaml_sets.SetConfigError):
        yaml_sets.validate_configurable(str(bad))
    bad.write_text("name: n\nnodes:\n  - spec: c\n    name: cn\n    identifiers: [x]\n")
    with pytest.raises(yaml_sets.SetConfigError):
        yaml_sets.validate_configurable(str(bad))


@pytest.mark.parametrize("content", [
    "spec: s\nname: n\n",                                         # nodes missing
    "spec: s\nname: n\nnodes: []\n",                              # nodes empty
    "spec: s\nname: n\nnodes: [{name: cn, identifiers: [x]}]\n",  # node spec missing
    "spec: s\nname: n\nnodes: [{spec: c, identifiers: [x]}]\n",   # node name missing
    "spec: s\nname: n\nnodes: [{spec: c, name: cn}]\n",           # identifiers missing
    "spec: s\nname: n\nnodes: [{spec: c, name: cn, identifiers: x}]\n",  # not a list
    "spec: ''\nname: n\nnodes: [{spec: c, name: cn, identifiers: [x]}]\n",  # empty spec
    "name: n\nnodes: [{spec: c, name: cn, identifiers: [x]}]\n",  # top spec missing
    "spec: s\nnodes: [{spec: c, name: cn, identifiers: [x]}]\n",  # top name missing
])
def test_validate_configurable_error_matrix(tmp_path, content):
    """Mirror of the reference's 12-variant YAML validation suite
    (/root/reference/tests/test_metadataformats.py:80-239)."""
    bad = tmp_path / "bad.yaml"
    bad.write_text(content)
    with pytest.raises(yaml_sets.SetConfigError):
        yaml_sets.validate_configurable(str(bad))


def test_validate_configurable_bad_external(tmp_path):
    ext = tmp_path / "ext.yaml"
    ext.write_text("- spec: c\n  name: cn\n  identifiers: []\n")  # empty ids in ext
    main = tmp_path / "main.yaml"
    main.write_text(f"spec: s\nname: n\nnodes:\n  - path: '{ext}'\n")
    with pytest.raises(yaml_sets.SetConfigError):
        yaml_sets.validate_configurable(str(main))


def test_source_defs_uniqueness(tmp_path):
    dup = tmp_path / "dup.yaml"
    dup.write_text("- {url: u1, source: s1, setname: n1}\n- {url: u1, source: s2, setname: n2}\n")
    with pytest.raises(yaml_sets.SetConfigError):
        yaml_sets.load_source_defs(str(dup))


def test_configurable_union_dedup():
    cnf = yaml_sets.load_configurable(f"{DATA}/configurable.yaml")
    # U1: top-level = deduped union (agg_id_2 in two nodes, counted once)
    assert yaml_sets.configurable_identifiers(cnf) == [
        "agg_id_1", "agg_id_2", "agg_id_3", "agg_id_4", "agg_id_5",
        "agg_id_6", "agg_id_7"]
    assert yaml_sets.configurable_identifiers(cnf, "social_sciences") == [
        "agg_id_1", "agg_id_2"]


# --- set filters -------------------------------------------------------------

def test_source_set_filter(planner):
    got = ids(planner.studies.filter(planner.set_filter("source:FSD")))
    assert got == ["agg_id_1", "agg_id_2", "agg_id_3", "agg_id_5",
                   "agg_id_7", "agg_id_8"]
    assert ids(planner.studies.filter(planner.set_filter("source:GESIS"))) == ["agg_id_4"]
    # bare 'source' = any direct hop with base_url ($exists form)
    got_all = ids(planner.studies.filter(planner.set_filter("source")))
    assert "agg_id_6" not in got_all and len(got_all) == 7


def test_configurable_set_filter(planner):
    assert ids(planner.studies.filter(planner.set_filter("thematic:social_sciences"))) == [
        "agg_id_1", "agg_id_2"]
    assert ids(planner.studies.filter(planner.set_filter("thematic"))) == [
        "agg_id_1", "agg_id_2", "agg_id_3", "agg_id_4", "agg_id_5",
        "agg_id_6", "agg_id_7"]


def test_language_and_openaire_filters(planner):
    assert "agg_id_4" in ids(planner.studies.filter(planner.set_filter("language:sv")))
    openaire = ids(planner.studies.filter(planner.set_filter("openaire_data")))
    assert "agg_id_3" not in openaire and "agg_id_5" not in openaire
    assert "agg_id_1" in openaire


def test_unknown_set_spec_raises(planner):
    with pytest.raises(UnsupportedSetSpec):
        planner.set_filter("nosuch:set")


# --- GetRecord ---------------------------------------------------------------

def test_get_record_projection_and_sets(planner):
    row = planner.get_record("agg_id_1", "oai_dc").first()
    assert set(FORMAT_FIELDS["oai_dc"] + ["setSpec", "datestamp", "deleted"]) == set(
        row.asDict().keys())
    assert sorted(row["setSpec"]) == [
        "language:en", "language:fi", "source:FSD", "thematic:social_sciences"]
    assert row["deleted"] is False


def test_get_record_datacite_openaire_set(planner):
    row = planner.get_record("agg_id_1", "oai_datacite").first()
    assert "openaire_data" in row["setSpec"]
    row3 = planner.get_record("agg_id_3", "oai_datacite").first()
    assert "openaire_data" not in row3["setSpec"]


# --- pagination --------------------------------------------------------------

def test_list_pages_to_exhaustion(planner):
    seen, token, pages = [], None, 0
    while True:
        page = planner.list_page("oai_dc", request_ts=NOW, token=token)
        rows = page.df.collect()
        seen += [r["aggregator_identifier"] for r in rows]
        pages += 1
        assert page.complete_list_size == 8
        token = finalize_token(page, rows)
        if token is None:
            break
    assert pages == 3 and len(seen) == 8
    assert seen == sorted(seen)  # deterministic keyset order


def test_list_page_datacite_validity_prefilter(planner):
    page = planner.list_page("oai_datacite", request_ts=NOW)
    got = [r["aggregator_identifier"] for r in page.df.collect()]
    # agg_id_2 (no ids), agg_id_3 (Unknown agency), agg_id_5 excluded by P4
    assert page.complete_list_size == 5
    assert "agg_id_3" not in got


def test_deleted_record_listed_with_deletion_datestamp(planner):
    page = planner.list_page("oai_dc", request_ts=NOW)
    rows = {r["aggregator_identifier"]: r for r in page.df.collect()}
    assert rows["agg_id_2"]["deleted"] is True
    assert str(rows["agg_id_2"]["datestamp"]).startswith("2000-01-01 23:00")


def test_selective_harvest_from_until(planner):
    # deleted record datestamp = deletion time (2000) → until=2010 catches
    # ONLY it (others updated 2019)
    page = planner.list_page("oai_dc", until_ts="2010-01-01", request_ts=NOW)
    assert [r["aggregator_identifier"] for r in page.df.collect()] == ["agg_id_2"]
    page2 = planner.list_page("oai_dc", from_ts="2019-06-15", request_ts=NOW)
    got = [r["aggregator_identifier"] for r in page2.df.collect()]
    assert "agg_id_2" not in got and "agg_id_7" in got


def test_bad_token_rejected(planner):
    with pytest.raises(BadResumptionToken):
        planner.list_page("oai_dc", token="garbage!!")
    # tampered integrity hash is rejected at decode
    with pytest.raises(BadResumptionToken):
        planner.list_page(token=ResumptionToken(
            "f" * 16, 3, 10, NOW, metadata_prefix="oai_dc").encode())


def test_token_carries_query_state(planner):
    """A resumed call passes ONLY the token; set/range state comes from it."""
    page = planner.list_page("oai_dc", set_spec="source:FSD", request_ts=NOW)
    tok = finalize_token(page, page.df.collect())
    page2 = planner.list_page(token=tok)
    ids = [r["aggregator_identifier"] for r in page2.df.collect()]
    assert ids and all(planner.studies.filter(
        planner.set_filter("source:FSD")).filter(
        F.col("aggregator_identifier") == i).count() == 1 for i in ids)


def test_token_roundtrip():
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.plans.tokens import query_hash

    qh = query_hash("oai_dc", "source:FSD", None, None)
    t = ResumptionToken(qh, 3, 10, NOW, metadata_prefix="oai_dc",
                        set_spec="source:FSD", last_key="k1")
    assert ResumptionToken.decode(t.encode()) == t


# --- ListSets + metrics ------------------------------------------------------

def test_list_sets(planner):
    sets = dict((s, (n, d)) for s, n, d in planner.list_sets())
    assert sets["source:FSD"] == ("FSD metadata", "FSD metadata description")
    assert sets["source:GESIS"] == ("GESIS metadata", None)
    assert sets["thematic"] == ("Thematic", "Thematic grouping of records")
    assert sets["thematic:history"] == ("History", None)
    assert sets["language:fi"] == ("Language fi", None)
    assert "openaire_data" in sets


def test_compute_metrics_golden(planner):
    m = compute_metrics(planner.studies)
    assert m["records_total"] == 8
    assert m["records_total_without_deleted"] == 7   # null status counted (P3)
    assert m["publishers_total"] == 2                # null direct_base_url skipped
    assert m["publishers_counts"] == {FSD_URL: 6, GESIS_URL: 1}
    assert m["publishers_counts_without_deleted"] == {FSD_URL: 5, GESIS_URL: 1}


def test_prometheus_exposition(planner):
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators.metrics import (
        render_prometheus,
    )

    body = render_prometheus(compute_metrics(planner.studies)).splitlines()
    assert "records_total 8.0" in body
    assert "records_total_without_deleted 7.0" in body
    assert "publishers_total 2.0" in body
    assert f'publishers_counts{{publisher="{FSD_URL}"}} 6.0' in body
    assert f'publishers_counts_without_deleted{{publisher="{FSD_URL}"}} 5.0' in body


def test_per_format_page_size(spark):
    """Per-format list sizes mirror the reference's
    --oai-pmh-list-size-* flags (metadataformats.py:506-529)."""
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.studies import (
        fixture_studies,
    )

    planner = OAIQueryPlanner(fixture_studies(spark), page_size=3,
                              page_sizes={"oai_datacite": 2})
    dc = planner.list_page("oai_dc", request_ts=NOW)
    assert len(dc.df.collect()) == 3
    datacite = planner.list_page("oai_datacite", request_ts=NOW)
    assert len(datacite.df.collect()) == 2
    # token resume keeps the format's own size
    tok = finalize_token(datacite, datacite.df.collect())
    page2 = planner.list_page(token=tok)
    assert len(page2.df.collect()) == 2


def test_finalize_token_empty_resumed_page_closes_list():
    """A resumed page that collects zero rows (records drifted out of the
    snapshot after completeListSize was counted) must CLOSE the list — a
    None last_key would drop the keyset filter and re-deliver page one."""
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.plans.query_builder import Page
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.plans.tokens import ResumptionToken

    tok = ResumptionToken(query_hash="h", cursor=3, complete_list_size=9,
                          snapshot_ts="2019-12-12 07:14:38",
                          metadata_prefix="oai_dc", last_key="agg_id_3")
    page = Page(df=None, token=tok, complete_list_size=9, cursor=3)
    assert finalize_token(page, []) is None


def test_vt_backed_get_record_opens_at_most_one_file(spark, tmp_path):
    """Round-6 stretch (VERDICT r5 #8): the serving tier exercises the
    versioned table's file skipping — a GetRecord over a key-clustered,
    bloom-indexed VT corpus reads <=1 of the data files, and the record
    it serves matches the full-scan plan."""
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources import (
        versioned_table as VT,
    )
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.studies import (
        fixture_studies,
    )

    path = str(tmp_path / "vt_corpus")
    VT.create(fixture_studies(spark), path)
    # cluster on the key so zone maps are selective, then bloom-index it
    VT.compact(spark, path, target_files=4,
               cluster_by="aggregator_identifier")
    VT.build_blooms(spark, path, VT.current_version(path),
                    "aggregator_identifier")

    planner = OAIQueryPlanner(VT.read(spark, path), page_size=5,
                              vt_path=path)
    rec = planner.get_record("agg_id_5", "oai_dc").collect()
    assert len(rec) == 1
    assert rec[0]["aggregator_identifier"] == "agg_id_5"
    total, read = planner.last_point_files
    assert total == 4 and read <= 1

    # the existence probe prunes the same way; a missing id reads 0-1
    # files and returns False
    assert planner.get_record_exists("agg_id_5")
    assert not planner.get_record_exists("no_such_id")
    assert planner.last_point_files[1] <= 1
