"""Byte-golden XML snapshots (round-4 verdict item 7): the renderer's
exact output for the fully-populated fixture study, one file per metadata
format, asserted byte-for-byte. Element-wise render tests verify
SEMANTICS; these verify STABILITY — any future render edit shows up as a
readable file diff instead of silently passing field checks.

Regenerate deliberately after an intended render change:

    GOLDEN_REGEN=1 python -m pytest tests/test_golden_xml.py

then review the git diff of tests/data/golden_*.xml like any other code.
"""

from __future__ import annotations

import os

import pytest

from rich_record import rich_record

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.oai.facade import OAIFacade
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.plans.query_builder import (
    OAIQueryPlanner,
)
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.studies import (
    studies_schema,
)

NOW = "2019-12-12 07:14:38"  # pins responseDate: output is deterministic
DATA = os.path.join(os.path.dirname(__file__), "data")
FORMATS = ("oai_dc", "oai_ddi25", "oai_datacite")


@pytest.fixture(scope="module")
def facade(spark):
    df = spark.createDataFrame([rich_record()], studies_schema())
    return OAIFacade(OAIQueryPlanner(df))


@pytest.mark.parametrize("prefix", FORMATS)
def test_render_is_byte_golden(facade, prefix):
    xml = facade.handle_request(verb="GetRecord", request_ts=NOW,
                                identifier="rich_1", metadataPrefix=prefix)
    path = os.path.join(DATA, f"golden_{prefix}.xml")
    if os.environ.get("GOLDEN_REGEN") == "1" or not os.path.exists(path):
        with open(path, "w", encoding="utf-8") as f:
            f.write(xml)
    with open(path, encoding="utf-8") as f:
        golden = f.read()
    assert xml == golden, (
        f"renderer output for {prefix} drifted from tests/data/"
        f"golden_{prefix}.xml; if the change is intended, regenerate with "
        "GOLDEN_REGEN=1 and review the diff")
