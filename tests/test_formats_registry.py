"""Plugin-format registry: a new metadata format registers and serves
end-to-end through the facade (SURVEY §2.9; mirrors the reference's
entry-point discovery, /root/reference/setup.py:41-45)."""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pytest

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.oai import formats as FMT
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.oai.facade import OAIFacade
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.plans.query_builder import (
    HEADER_FIELDS, OAIQueryPlanner,
)
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.studies import fixture_studies

NOW = "2019-12-12 07:14:38"
NS = {"oai": "http://www.openarchives.org/OAI/2.0/"}


def _render_minimal(parent, row, derived):
    el = ET.SubElement(parent, "minimal")
    el.text = row["study_number"]


@pytest.fixture()
def custom_format():
    fmt = FMT.MetadataFormat(
        prefix="oai_minimal",
        namespace="urn:test:minimal",
        schema_url="urn:test:minimal.xsd",
        fields=HEADER_FIELDS + ["study_number"],
        renderer=_render_minimal,
    )
    FMT.register(fmt)
    yield fmt
    FMT.unregister("oai_minimal")


def test_builtins_registered():
    assert set(FMT.prefixes()) >= {"oai_dc", "oai_ddi25", "oai_datacite"}


def test_custom_format_serves_get_record(spark, custom_format):
    facade = OAIFacade(OAIQueryPlanner(fixture_studies(spark)))
    xml = facade.handle_request(verb="GetRecord", request_ts=NOW,
                                identifier="agg_id_1", metadataPrefix="oai_minimal")
    el = ET.fromstring(xml)
    assert el.find("./oai:GetRecord/oai:record/oai:metadata/minimal", NS).text == (
        "study_agg_id_1")


def test_custom_format_in_list_metadata_formats(spark, custom_format):
    facade = OAIFacade(OAIQueryPlanner(fixture_studies(spark)))
    xml = facade.handle_request(verb="ListMetadataFormats", request_ts=NOW)
    el = ET.fromstring(xml)
    prefixes = [e.text for e in el.findall(
        "./oai:ListMetadataFormats/oai:metadataFormat/oai:metadataPrefix", NS)]
    assert "oai_minimal" in prefixes


def test_unknown_format_still_rejected(spark):
    facade = OAIFacade(OAIQueryPlanner(fixture_studies(spark)))
    xml = facade.handle_request(verb="GetRecord", request_ts=NOW,
                                identifier="agg_id_1", metadataPrefix="oai_nope")
    el = ET.fromstring(xml)
    assert el.find("./oai:error", NS).get("code") == "cannotDisseminateFormat"
