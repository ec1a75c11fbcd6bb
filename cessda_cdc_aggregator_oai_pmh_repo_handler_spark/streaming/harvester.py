"""OAI-PMH harvest-response parser → ingest events (SURVEY §2.8 input side).

The reference serves an aggregation maintained by sibling CESSDA harvester
components; the equivalent here is a parser that turns OAI-PMH ListRecords
responses (any repository's, including our own facade's output — which the
round-trip test exploits) into the harvest-event rows the ingest merge
consumes. Parsing is driver-side per response page (pages are bounded);
bulk re-harvest of stored response files runs the same function inside
``mapInPandas`` over a binary column of response bodies.

Each parsed record carries the new provenance hop the aggregator prepends
(harvest date, source base URL, upstream identifier/datestamp, direct=True)
on top of the chain already present in the record's <about> block —
mirroring the provenance-append contract
(/root/reference/tests/test_serve.py:222-224, templates/provenance.xml).
"""

from __future__ import annotations

import datetime
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

from ..sources.studies import STUDY_DDL
from .ingest import ACTION_DELETE, ACTION_UPSERT, harvest_event_schema

OAI = "{http://www.openarchives.org/OAI/2.0/}"
DC = "{http://purl.org/dc/elements/1.1/}"
OAI_DC = "{http://www.openarchives.org/OAI/2.0/oai_dc/}"
PROV = "{http://www.openarchives.org/OAI/2.0/provenance}"


def _vl(values_langs):
    return [{"value": v, "language": lang} for v, lang in values_langs]


def _parse_dc(md) -> dict:
    """oai_dc payload → content fields (titles/creators/publishers/
    abstracts/subjects/identifiers)."""
    dc = md.find(f"{OAI_DC}dc")
    if dc is None:
        return {}
    lang_of = "{http://www.w3.org/XML/1998/namespace}lang"

    def grab(tag):
        return [(e.text, e.get(lang_of)) for e in dc.findall(f"{DC}{tag}")]

    return {
        "identifiers": [
            {"value": v, "language": lang, "agency": None} for v, lang in grab("identifier")
        ],
        "study_titles": _vl(grab("title")),
        "principal_investigators": [
            {"value": v, "language": lang, "organization": None}
            for v, lang in grab("creator")
        ],
        "publishers": _vl(grab("publisher")),
        "abstracts": _vl(grab("description")),
        "keywords": [
            {"value": v, "language": lang, "system_name": None, "uri": None,
             "description": None}
            for v, lang in grab("subject")
        ],
        "study_area_countries": _vl(grab("coverage")),
        "data_collection_copyrights": _vl(grab("rights")),
    }


def _parse_provenance(about) -> list[dict]:
    hops = []
    node = about.find(f"{PROV}provenance/{PROV}originDescription") if about is not None else None
    while node is not None:
        hops.append({
            "harvest_date": node.get("harvestDate"),
            "altered": node.get("altered") == "true",
            "base_url": getattr(node.find(f"{PROV}baseURL"), "text", None),
            "identifier": getattr(node.find(f"{PROV}identifier"), "text", None),
            "datestamp": getattr(node.find(f"{PROV}datestamp"), "text", None),
            "direct": False,  # re-marked below: only the NEW hop is direct
            "metadata_namespace": getattr(node.find(f"{PROV}metadataNamespace"), "text", None),
        })
        node = node.find(f"{PROV}originDescription")
    return hops


def parse_list_records(xml_str: str, source_base_url: str,
                       harvest_ts: datetime.datetime) -> list[dict]:
    """One ListRecords/GetRecord response page → harvest-event dicts
    (studies schema + action + harvest_ts)."""
    root = ET.fromstring(xml_str)
    out = []
    for rec in root.iter(f"{OAI}record"):
        header = rec.find(f"{OAI}header")
        identifier = header.find(f"{OAI}identifier").text
        datestamp = getattr(header.find(f"{OAI}datestamp"), "text", None)
        deleted = header.get("status") == "deleted"

        ev = {name: None for name, _ in STUDY_DDL}
        ev["aggregator_identifier"] = identifier
        ev["study_number"] = identifier
        if not deleted:
            ev.update(_parse_dc(rec.find(f"{OAI}metadata")))
        upstream_hops = _parse_provenance(rec.find(f"{OAI}about"))
        new_hop = {
            "harvest_date": harvest_ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
            "altered": True,
            "base_url": source_base_url,
            "identifier": identifier,
            "datestamp": datestamp,
            "direct": True,
            "metadata_namespace": "http://www.openarchives.org/OAI/2.0/oai_dc/",
        }
        ev["provenance"] = [new_hop] + upstream_hops
        ev["action"] = ACTION_DELETE if deleted else ACTION_UPSERT
        ev["harvest_ts"] = harvest_ts
        out.append(ev)
    return out


def events_df(spark: SparkSession, events: list[dict]) -> DataFrame:
    return spark.createDataFrame(events, schema=harvest_event_schema())
