"""Distributed XML bulk export (SURVEY §2.1 S4, scale path).

The facade renders bounded pages driver-side; a full-corpus export must
not. This operator runs the SAME per-row renderers inside ``mapInPandas``,
emitting one XML string per record as a column — executor-side, Arrow
batched, no driver materialization. At 100 TB the output partitions write
straight to the object store."""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from ..oai import render as R


def _pyify(v):
    """Arrow→pandas gives numpy arrays / pd.Timestamps; renderers expect
    plain lists/dicts/datetimes."""
    if isinstance(v, dict):
        return {k: _pyify(x) for k, x in v.items()}
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if hasattr(v, "tolist") and not isinstance(v, (str, bytes)):  # numpy array
        return [_pyify(x) for x in v.tolist()]
    if isinstance(v, (list, tuple)):
        return [_pyify(x) for x in v]
    return v


def export_records_xml(page_like_df: DataFrame, metadata_prefix: str) -> DataFrame:
    """``(aggregator_identifier, xml)`` for every row of a planner-projected
    DataFrame (must carry the format's fields + setSpec/datestamp/deleted,
    and the ``d_*`` derived columns for formats that need them)."""

    def render_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, xmls = [], []
            for raw in pdf.to_dict("records"):
                row = {k: _pyify(v) for k, v in raw.items()}
                derived = None
                if "d_preferred_identifier" in row:
                    derived = {
                        "preferred_identifier": row["d_preferred_identifier"],
                        "publication_year": row["d_publication_year"],
                        "publisher": row["d_publisher"],
                        "funders": row["d_funders"],
                        "related_identifiers": row["d_related_identifiers"],
                    }
                holder = ET.Element("holder")
                R.render_record(holder, row, metadata_prefix, derived)
                ids.append(row["aggregator_identifier"])
                xmls.append(ET.tostring(holder[0], encoding="unicode"))
            yield pd.DataFrame({"aggregator_identifier": ids, "xml": xmls})

    return page_like_df.mapInPandas(
        render_batches, schema="aggregator_identifier string, xml string"
    )
