"""Per-record derivation expressions (SURVEY §2.7 F1–F11).

The reference computes these in Genshi templates and per-record async hooks
(/root/reference/cdcagg_oai/metadataformats.py:720-748, templates/*.xml);
here each is a pure ``Column`` expression over the multilingual
``array<struct>`` columns, so they run JVM-side inside whole-stage codegen —
no Python on the per-row path.

Array ORDER is load-bearing: 'first element' fallbacks depend on ingest
order (/root/reference/tests/test_serve.py:700-766).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..sources.studies import OPENAIRE_ID_TYPES, RELATED_ID_TYPES

EU_REPO_GRANT_PREFIX = "info:eu-repo/grantAgreement"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def first_or_null(arr: Column) -> Column:
    """element_at over a possibly-empty array without index errors."""
    return F.when(F.size(arr) > 0, arr[0])


def preferred_identifier(identifiers: Column | str = "identifiers") -> Column:
    """F1: first identifier whose agency ∈ OpenAIRE whitelist →
    struct(type, value); NULL when none (record then invalid for datacite,
    /root/reference/cdcagg_oai/metadataformats.py:733-748, 775-788)."""
    ids = _c(identifiers)
    match = F.filter(ids, lambda i: i["agency"].isin(*OPENAIRE_ID_TYPES))
    first = first_or_null(match)
    return F.when(
        first.isNotNull(),
        F.struct(first["agency"].alias("type"), first["value"].alias("value")),
    )


def publication_year(publication_years: Column | str = "publication_years") -> Column:
    """F2: first element; prefer attr_distribution_date over value; keep only
    the leading 4-digit year when date-shaped
    (/root/reference/tests/test_serve.py:768-818: '2011-01-02'→'2011',
    '2012'→'2012')."""
    first = first_or_null(_c(publication_years))
    candidate = F.coalesce(first["distribution_date"], first["value"])
    year = F.regexp_extract(candidate, r"^(\d{4})", 1)
    return F.when(candidate.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(year != "", year).otherwise(candidate)
    )


def _prefer_english(arr: Column) -> Column:
    en = F.filter(arr, lambda x: x["language"] == "en")
    return F.coalesce(first_or_null(en)["value"], first_or_null(arr)["value"])


def preferred_publisher(distributors: Column | str = "distributors",
                        publishers: Column | str = "publishers") -> Column:
    """F3: distributors are the primary source when non-empty, else
    publishers; within the source prefer language='en', else first element
    (/root/reference/tests/test_serve.py:558-578, 700-766)."""
    d, p = _c(distributors), _c(publishers)
    source = F.when(F.coalesce(F.size(d), F.lit(0)) > 0, d).otherwise(p)
    return _prefer_english(source)


def keyword_displays(keywords: Column | str = "keywords") -> Column:
    """F4: per element, attr_description if non-empty else value
    (/root/reference/templates/agg_oai_dc.xml:28-30,
    tests/test_serve.py:1138-1147)."""
    return F.transform(
        _c(keywords),
        lambda k: F.coalesce(F.nullif(k["description"], F.lit("")), k["value"]),
    )


def dc_dates(distribution_dates: Column | str = "distribution_dates") -> Column:
    """F5: value if present else attr_description-carried date — rendered
    per element (/root/reference/templates/agg_oai_dc.xml:36-38)."""
    return F.transform(
        _c(distribution_dates), lambda d: F.coalesce(d["value"], d["description"])
    )


def funder_grants(grant_numbers: Column | str = "grant_numbers") -> Column:
    """F6: only grants starting 'info:eu-repo/grantAgreement' become Funder
    contributors (nameid, agency); empty-string agency stays (the reference
    renders it verbatim, /root/reference/tests/test_serve.py:995-1042)."""
    g = _c(grant_numbers)
    matched = F.filter(g, lambda x: x["value"].startswith(EU_REPO_GRANT_PREFIX))
    return F.transform(
        matched, lambda x: F.struct(x["value"].alias("nameid"), x["agency"].alias("agency"))
    )


def related_identifiers(
    related_publications: Column | str = "related_publications",
) -> Column:
    """P10/datacite relatedIdentifier: keep only entries whose
    identifier_agency ∈ the OpenAIRE relatedIdentifierType vocabulary
    (broader than the record-validity list: ISBN etc. qualify here) AND
    identifier non-empty (/root/reference/tests/test_serve.py:934-993)."""
    r = _c(related_publications)
    kept = F.filter(
        r,
        lambda x: x["identifier_agency"].isin(*RELATED_ID_TYPES)
        & x["identifier"].isNotNull()
        & (x["identifier"] != ""),
    )
    return F.transform(
        kept,
        lambda x: F.struct(
            x["identifier"].alias("identifier"),
            x["identifier_agency"].alias("agency"),
        ),
    )


def bool_to_string(col: Column | str) -> Column:
    """F7: boolean → 'true'/'false' (provenance altered attr,
    /root/reference/templates/provenance.xml:10-13)."""
    return F.when(_c(col), "true").otherwise("false")


def dc_identifier_uris(
    identifiers: Column | str = "identifiers",
    document_uris: Column | str = "document_uris",
    study_uris: Column | str = "study_uris",
) -> Column:
    """U2: dc:identifier = distinct identifier values + distinct of
    chain(document_uris, study_uris)
    (/root/reference/templates/agg_oai_dc.xml:14-15,
    tests/test_serve.py:1083-1094)."""
    id_vals = F.array_distinct(F.transform(_c(identifiers), lambda i: i["value"]))
    uri_vals = F.array_distinct(
        F.concat(
            F.coalesce(F.transform(_c(document_uris), lambda u: u["value"]),
                       F.array().cast("array<string>")),
            F.coalesce(F.transform(_c(study_uris), lambda u: u["value"]),
                       F.array().cast("array<string>")),
        )
    )
    return F.concat(F.coalesce(id_vals, F.array().cast("array<string>")), uri_vals)


def title_languages(study_titles: Column | str = "study_titles") -> Column:
    """A5 per-record distinct languages of study_titles (dc:language,
    /root/reference/templates/agg_oai_dc.xml:32)."""
    return F.array_distinct(F.transform(_c(study_titles), lambda t: t["language"]))


def direct_base_url_expr(provenance: Column | str = "provenance") -> Column:
    """Ingest-time denormalization: first provenance element with
    direct=true → base_url (mirrors the reference's `_direct_base_url`,
    /root/reference/CHANGELOG.md:117-120) — computed once so /metrics never
    pays a per-row exists() at query time."""
    direct = F.filter(_c(provenance), lambda p: p["direct"])
    return first_or_null(direct)["base_url"]
