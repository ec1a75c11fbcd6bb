"""Renderer details pinned by the reference's per-field tests
(/root/reference/tests/test_serve.py:358-546): DDI attribute carriers
(element_version, distDate date attr, collDate event attr, resInstru,
document titles, data kinds) and datacite subject schemes / affiliation /
contributor absence."""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pytest

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.oai.facade import OAIFacade
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.plans.query_builder import OAIQueryPlanner
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.studies import (
    _record, studies_schema,
)

NOW = "2019-12-12 07:14:38"
NS = {
    "oai": "http://www.openarchives.org/OAI/2.0/",
    "ddi": "ddi:codebook:2_5",
    "datacite": "http://datacite.org/schema/kernel-3",
}
XML_LANG = "{http://www.w3.org/XML/1998/namespace}lang"


@pytest.fixture(scope="module")
def rich_facade(spark):
    from rich_record import rich_record

    df = spark.createDataFrame([rich_record()], studies_schema())
    return OAIFacade(OAIQueryPlanner(df))


def get(facade, prefix):
    xml = facade.handle_request(verb="GetRecord", request_ts=NOW,
                                identifier="rich_1", metadataPrefix=prefix)
    return ET.fromstring(xml)


def test_ddi25_attribute_carriers(rich_facade):
    el = get(rich_facade, "oai_ddi25")
    cb = el.find("./oai:GetRecord/oai:record/oai:metadata/ddi:codeBook", NS)
    titles = [t.text for t in cb.findall("./ddi:stdyDscr/ddi:citation/ddi:titlStmt/ddi:titl", NS)]
    assert "Title of rich_1" in titles
    dist = cb.find(".//ddi:distStmt/ddi:distDate", NS)
    assert dist.get("date") == "2019-01-01" and dist.text == "First release"
    # collDate: date attr = value, text = description
    # (/root/reference/tests/test_serve.py:513-539)
    colls = cb.findall(".//ddi:sumDscr/ddi:collDate", NS)
    assert [(c.get("event"), c.get("date"), c.text or "") for c in colls] == [
        ("start", "2018-01-01", ""), ("end", "2018-06-30", "")]
    # resInstru: text = description; concept child carries the CV value
    # (/root/reference/tests/test_serve.py:480-512)
    resinstru = cb.find(".//ddi:dataColl/ddi:resInstru", NS)
    assert resinstru.text == "desc"
    concept = resinstru.find("./ddi:concept", NS)
    assert concept.text == "structured questionnaire"
    assert concept.get("vocab") == "CVS"
    assert concept.get("vocabURI") == "http://cv.example"
    kinds = [k.text for k in cb.findall(".//ddi:sumDscr/ddi:dataKind", NS)]
    assert kinds == ["quantitative"]


def test_ddi25_docdscr_and_holdings(rich_facade):
    """Document titles live under docDscr/citation/titlStmt
    (/root/reference/tests/test_serve.py:382-404); holdings carries
    URI + xml:lang (:359-380)."""
    el = get(rich_facade, "oai_ddi25")
    cb = el.find("./oai:GetRecord/oai:record/oai:metadata/ddi:codeBook", NS)
    doc_titles = {t.get(XML_LANG): t.text for t in cb.findall(
        "./ddi:docDscr/ddi:citation/ddi:titlStmt/ddi:titl", NS)}
    assert doc_titles == {"en": "some_doc", "fi": "joku_doc"}
    holdings = cb.findall("./ddi:stdyDscr/ddi:citation/ddi:holdings", NS)
    assert [(h.get("URI"), h.get(XML_LANG)) for h in holdings] == [
        ("http://urn.fi/1", "en")]


def test_ddi25_conditions_element_version(rich_facade):
    """conditions under dataAccs/useStmt with elementVersion
    (/root/reference/tests/test_serve.py:428-453)."""
    el = get(rich_facade, "oai_ddi25")
    cb = el.find("./oai:GetRecord/oai:record/oai:metadata/ddi:codeBook", NS)
    cond = cb.find("./ddi:stdyDscr/ddi:dataAccs/ddi:useStmt/ddi:conditions", NS)
    assert cond.text == "conditions apply"
    assert cond.get("elementVersion") == "1.2.3"


def test_ddi25_full_field_inventory(rich_facade):
    """Every projected oai_ddi25 field appears in the XML — the 37-field
    inventory of /root/reference/tests/test_serve.py:1384-1424."""
    el = get(rich_facade, "oai_ddi25")
    cb = el.find("./oai:GetRecord/oai:record/oai:metadata/ddi:codeBook", NS)
    expectations = {
        # canonical DDI 2.5 placements for template-unpinned fields
        "./ddi:docDscr/ddi:citation/ddi:prodStmt/ddi:prodDate": "Published",
        "./ddi:docDscr/ddi:citation/ddi:prodStmt/ddi:copyright": "Doc copyright",
        "./ddi:stdyDscr/ddi:citation/ddi:prodStmt/ddi:copyright": "FSD copyright",
        "./ddi:stdyDscr/ddi:citation/ddi:prodStmt/ddi:fundAg": "Academy of Finland",
        "./ddi:stdyDscr/ddi:citation/ddi:prodStmt/ddi:prodDate": "2001-05-01",
        "./ddi:stdyDscr/ddi:stdyInfo/ddi:sumDscr/ddi:anlyUnit": "Individual",
        "./ddi:stdyDscr/ddi:stdyInfo/ddi:sumDscr/ddi:universe": "Adults 18+",
        "./ddi:stdyDscr/ddi:dataAccs/ddi:setAvail/ddi:avlStatus": "Open",
        "./ddi:stdyDscr/ddi:dataAccs/ddi:useStmt/ddi:citReq": "Cite as X",
        "./ddi:stdyDscr/ddi:dataAccs/ddi:useStmt/ddi:deposReq": "Deposit to Y",
        "./ddi:stdyDscr/ddi:method/ddi:dataColl/ddi:timeMeth": "Longitudinal",
        "./ddi:stdyDscr/ddi:method/ddi:dataColl/ddi:sampProc": "Random sample",
        "./ddi:stdyDscr/ddi:method/ddi:dataColl/ddi:collMode": "Interview",
        "./ddi:stdyDscr/ddi:stdyInfo/ddi:sumDscr/ddi:geogCover": "Finland",
        "./ddi:stdyDscr/ddi:stdyInfo/ddi:sumDscr/ddi:nation": "FI",
        "./ddi:fileDscr/ddi:fileTxt/ddi:fileName": "data.por",
    }
    for path, want in expectations.items():
        found = [e.text for e in cb.findall(path, NS)]
        assert want in found, f"{path}: wanted {want!r}, found {found}"
    # instruments render as plain resInstru alongside the CV-bearing one
    instr_texts = [e.text for e in cb.findall(
        "./ddi:stdyDscr/ddi:method/ddi:dataColl/ddi:resInstru", NS)]
    assert "CAPI" in instr_texts
    # document_uris → othrStdyMat/relMat
    relmats = [e.text for e in cb.findall(
        "./ddi:stdyDscr/ddi:othrStdyMat/ddi:relMat", NS)]
    assert "http://docs.fsd/1" in relmats


def test_datacite_subject_schemes_and_affiliation(rich_facade):
    el = get(rich_facade, "oai_datacite")
    res = el.find("./oai:GetRecord/oai:record/oai:metadata/datacite:resource", NS)
    subjects = res.findall("./datacite:subjects/datacite:subject", NS)
    classified = [s for s in subjects if s.get("subjectScheme") == "CESSDA Topics"]
    assert classified and classified[0].get("schemeURI") == "http://vocab.example/soc"
    assert classified[0].text == "Social"
    creator = res.find("./datacite:creators/datacite:creator", NS)
    assert creator.find("./datacite:creatorName", NS).text == "Dr. Example"
    aff = creator.find("./datacite:affiliation", NS)
    assert aff.text == "Example University" and aff.get(XML_LANG) == "en"


def test_datacite_no_contributors_without_funder_grants(rich_facade):
    el = get(rich_facade, "oai_datacite")
    res = el.find("./oai:GetRecord/oai:record/oai:metadata/datacite:resource", NS)
    assert res.find("./datacite:contributors", NS) is None
