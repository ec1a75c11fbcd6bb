"""Chaos test for the driver gate contract itself (round-4 post-mortem).

Round 4 shipped a one-line codec bug that executed at *import* time via the
multimodal ORACLES literal, zeroing all 50 gate rows instead of one. These
tests convert "the driver found an empty gate" into a local red test:

- importing ``__spark_entry__`` must execute NO codec (poisoned-encoder
  import must still succeed),
- the gate must declare exactly 50 queries with matching oracle keys,
- a codec regression must degrade exactly ``multimodal_features`` to a
  rows-only check (oracle entry dropped), never raise out of
  ``oracle_sql()``.
"""

from __future__ import annotations

import subprocess
import sys

import __spark_entry__ as entry_mod
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import multimodal

GATE_SIZE = 50


def test_gate_declares_exactly_50_queries_with_oracles():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert len(q) == GATE_SIZE
    assert len(o) == GATE_SIZE
    assert set(o) == set(q)
    assert list(q) == entry_mod.GATE_ORDER
    for name, fn in q.items():
        assert callable(fn), name
    for name, sql in o.items():
        assert isinstance(sql, str) and sql.strip(), name


def test_import_executes_no_codec():
    """Importing the entry module (and the multimodal operator) must not run
    any encoder/decoder: a subprocess stubs the codec primitives to raise
    BEFORE importing, and the import must still succeed."""
    script = r"""
import sys
sys.path.insert(0, "/root/repo")

# Poison the codec layer before anything imports it.
import cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators.jpeg as J

def _boom(*a, **k):
    raise RuntimeError("codec executed at import time")

J.encode_jpeg_rgb = _boom
J.decode_jpeg = _boom

import __spark_entry__ as m
q = m.queries()
assert len(q) == 50, len(q)
# oracle_sql() with a broken codec: multimodal_features degrades to a
# rows-only check (entry dropped), everything else stays.
o = m.oracle_sql()
assert "multimodal_features" not in o, "poisoned oracle should drop out"
assert len(o) == 49, len(o)
print("OK")
"""
    res = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr
    assert "OK" in res.stdout


def test_lazy_oracle_is_memoized_and_matches_gate_key():
    multimodal._ORACLE_CACHE = None
    first = multimodal.oracles()
    assert set(first) == {"multimodal_features"}
    assert first is multimodal.oracles()  # memoized
    assert "VALUES" in first["multimodal_features"]


def test_entry_smoke_runs_flagship(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns  # stable, non-empty schema
