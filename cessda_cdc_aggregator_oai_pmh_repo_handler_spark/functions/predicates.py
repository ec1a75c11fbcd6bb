"""Mongo-semantics predicate helpers (SURVEY §2.2) as Column expressions.

The reference's only query IR is a Mongo-style filter dict; these helpers
encode its exact null/existence semantics ONCE so every caller (OAI plan
builder, metrics rollup, tests) agrees:

- ``{$ne: v}`` matches rows where the field is NULL or missing
  (/root/reference/cdcagg_oai/metrics.py:172-176 — deleted-exclusion must
  keep never-statused rows).
- ``$elemMatch`` = at least one array element satisfying ALL conditions
  (/root/reference/cdcagg_oai/metadataformats.py:427-430; wire form
  /root/reference/tests/test_serve.py:1342-1345).
- ``{$exists: true}`` inside elemMatch = attribute present and non-null
  (/root/reference/cdcagg_oai/metadataformats.py:426; wire form
  tests/test_serve.py:1348-1350).

All helpers return plain ``Column``s → Catalyst folds them into scans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

REC_STATUS_DELETED = "deleted"


def ne_keep_null(col: Column | str, value) -> Column:
    """Mongo ``{field: {$ne: value}}`` — true when NULL or != value."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNull() | (c != value)


def not_deleted(metadata_col: str = "metadata") -> Column:
    """``_metadata.status != 'deleted'`` with null-keeping semantics."""
    return ne_keep_null(F.col(f"{metadata_col}.status"), REC_STATUS_DELETED)


def is_deleted(metadata_col: str = "metadata") -> Column:
    return F.col(f"{metadata_col}.status") == REC_STATUS_DELETED


def elem_match(array_col: Column | str, *preds) -> Column:
    """Mongo ``$elemMatch``: any element satisfying all per-element preds.
    Each pred is a fn(element) -> Column."""
    arr = F.col(array_col) if isinstance(array_col, str) else array_col
    def combined(x):
        out = None
        for p in preds:
            c = p(x)
            out = c if out is None else (out & c)
        return out
    return F.exists(arr, combined)


def direct_hop_from(base_url: str, provenance_col: str = "provenance") -> Column:
    """P5 source-set filter: any provenance hop with base_url == X AND
    direct (/root/reference/tests/test_serve.py:1342-1345)."""
    return elem_match(provenance_col, lambda p: p["base_url"] == base_url,
                      lambda p: p["direct"])


def any_direct_hop(provenance_col: str = "provenance") -> Column:
    """P6 ``$exists`` form: any direct hop whose base_url is present
    (/root/reference/tests/test_serve.py:1348-1350)."""
    return elem_match(provenance_col, lambda p: p["direct"],
                      lambda p: p["base_url"].isNotNull())


def snapshot_bound(request_ts, metadata_col: str = "metadata") -> Column:
    """P7/O2: ``_metadata.updated < $isodate(request time)`` — injected into
    every list query for stable paging
    (/root/reference/tests/test_serve.py:1342)."""
    return F.col(f"{metadata_col}.updated") < F.lit(request_ts).cast("timestamp")


def record_datestamp(metadata_col: str = "metadata") -> Column:
    """OAI datestamp: deletion time for deleted records, else updated
    (F9, /root/reference/tests/test_serve.py:274-306)."""
    m = F.col(metadata_col)
    return F.when(m["status"] == REC_STATUS_DELETED, m["deleted"]).otherwise(m["updated"])


def datestamp_range(from_ts=None, until_ts=None, metadata_col: str = "metadata") -> Column:
    """P8 selective harvest from/until over the OAI datestamp."""
    ds = record_datestamp(metadata_col)
    cond = F.lit(True)
    if from_ts is not None:
        cond = cond & (ds >= F.lit(from_ts).cast("timestamp"))
    if until_ts is not None:
        cond = cond & (ds <= F.lit(until_ts).cast("timestamp"))
    return cond
