"""Field-level oai_datacite golden tests ported from the reference's
element-by-element assertions (/root/reference/tests/test_serve.py:700-766
publisher preference, :934-993 relatedIdentifier whitelist, :995-1042
funder contributors). Each test builds exactly the study variant the
reference test builds and asserts the same rendered elements.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.oai.facade import OAIFacade
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.plans.query_builder import OAIQueryPlanner
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.studies import (
    _record, _vl, studies_schema,
)

NOW = "2019-12-12 07:14:38"
NS = {
    "oai": "http://www.openarchives.org/OAI/2.0/",
    "datacite": "http://datacite.org/schema/kernel-3",
}
XML_LANG = "{http://www.w3.org/XML/1998/namespace}lang"


def datacite_resource(spark, **over):
    rec = _record("g1", **over)
    df = spark.createDataFrame([rec], studies_schema())
    facade = OAIFacade(OAIQueryPlanner(df))
    xml = facade.handle_request(verb="GetRecord", request_ts=NOW,
                                identifier="g1", metadataPrefix="oai_datacite")
    root = ET.fromstring(xml)
    res = root.find("./oai:GetRecord/oai:record/oai:metadata/datacite:resource", NS)
    assert res is not None, xml
    return res


# --- publisher preference (/root/reference/tests/test_serve.py:700-766) ----

def test_publisher_prefers_english_distributor(spark):
    """Datacite allows ONE publisher; distributors outrank publishers and
    english outranks ingest order; no xml:lang on the element."""
    res = datacite_resource(
        spark,
        distributors=_vl(("joku jakelija", "fi"), ("some distributor", "en")),
        publishers=_vl(("joku julkaisija", "fi"), ("some publ", "en")),
    )
    els = res.findall("./datacite:publisher", NS)
    assert len(els) == 1
    assert els[0].text == "some distributor"
    assert XML_LANG not in els[0].attrib


def test_publisher_takes_first_distributor_without_english(spark):
    res = datacite_resource(
        spark,
        publishers=_vl(("någon publ", "sv"), ("joku julkaisija", "fi")),
        distributors=_vl(("någon distr", "sv"), ("joku jakelija", "fi")),
    )
    els = res.findall("./datacite:publisher", NS)
    assert len(els) == 1 and els[0].text == "någon distr"


def test_publisher_alternative_source_prefers_english(spark):
    """No distributors → publishers, english first."""
    res = datacite_resource(
        spark,
        distributors=[],
        publishers=_vl(("joku julkaisija", "fi"), ("some publ", "en")),
    )
    els = res.findall("./datacite:publisher", NS)
    assert len(els) == 1 and els[0].text == "some publ"


def test_publisher_alternative_source_takes_first(spark):
    res = datacite_resource(
        spark,
        distributors=[],
        publishers=_vl(("någon publ", "sv"), ("joku julkaisija", "fi")),
    )
    els = res.findall("./datacite:publisher", NS)
    assert len(els) == 1 and els[0].text == "någon publ"


# --- relatedIdentifier (/root/reference/tests/test_serve.py:934-993) -------

def _relpub(identifier, agency):
    return {"value": None, "language": "en",
            "identifier": identifier, "identifier_agency": agency}


def test_related_identifier_controlled_list(spark):
    """Only OpenAIRE-vocabulary agencies render (ISBN qualifies — it is in
    the relatedIdentifierType vocabulary though not in the record-validity
    list); relationType is always IsCitedBy; duplicates collapse is NOT
    applied (the reference renders the ARK pair once per test expectation
    list, which dedups via remove())."""
    res = datacite_resource(spark, related_publications=[
        _relpub("first.id", "DOI"),
        _relpub("second.id", "ISBN"),
        _relpub("second.id", "ARK"),
        _relpub("third.id", "Unknown"),      # not in vocabulary: dropped
        _relpub("fourth.id", None),           # no agency: dropped
    ])
    els = res.findall(
        "./datacite:relatedIdentifiers/datacite:relatedIdentifier", NS)
    exp = [("first.id", "DOI"), ("second.id", "ISBN"), ("second.id", "ARK")]
    assert len(els) == len(exp)
    for el in els:
        assert el.get("relationType") == "IsCitedBy"
        pair = (el.text, el.get("relatedIdentifierType"))
        assert pair in exp
        exp.remove(pair)
    assert exp == []


def test_related_identifier_discards_empty(spark):
    """Missing identifier or empty-string agency → nothing renders."""
    res = datacite_resource(spark, related_publications=[
        _relpub(None, "ARK"),
        _relpub("some.id", ""),
    ])
    els = res.findall(
        "./datacite:relatedIdentifiers/datacite:relatedIdentifier", NS)
    assert els == []


# --- funder contributors (/root/reference/tests/test_serve.py:995-1042) ----

def _grant(value, language, agency):
    return {"value": value, "language": language, "agency": agency}


def test_funder_contributors_from_eu_repo_grants(spark):
    """Only info:eu-repo/grantAgreement grants become Funder contributors:
    contributorName = agency, nameIdentifier = grant id, neither carries
    xml:lang."""
    res = datacite_resource(spark, grant_numbers=[
        _grant("info:eu-repo/grantAgreement/EC/FP7/282896", "en", "some agency"),
        _grant("info:eu-repo/grantAgreement/funder/program/projectid", "fi",
               "joku agency"),
        _grant("some_grant_number", "en", "some agency"),
    ])
    els = res.findall("./datacite:contributors/datacite:contributor", NS)
    exp = [("info:eu-repo/grantAgreement/EC/FP7/282896", "some agency"),
           ("info:eu-repo/grantAgreement/funder/program/projectid", "joku agency")]
    assert len(els) == len(exp)
    for el in els:
        assert el.get("contributorType") == "Funder"
        cnames = el.findall("./datacite:contributorName", NS)
        nameids = el.findall("./datacite:nameIdentifier", NS)
        assert len(cnames) == 1 and len(nameids) == 1
        assert XML_LANG not in cnames[0].attrib
        assert XML_LANG not in nameids[0].attrib
        pair = (nameids[0].text, cnames[0].text)
        assert pair in exp
        exp.remove(pair)
    assert exp == []


def test_no_contributors_element_without_eu_repo_grants(spark):
    res = datacite_resource(spark, grant_numbers=[
        _grant("some_grant_number", "en", "some agency"),
    ])
    assert res.findall("./datacite:contributors/datacite:contributor", NS) == []
    assert res.find("./datacite:contributors", NS) is None
