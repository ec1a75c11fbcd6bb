"""JSONL corpus source: permissive parse, quarantine, schema drift."""

from __future__ import annotations

import gzip
import json

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources import text_corpus as TC

GOOD = [
    {"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "s1"},
    {"doc_id": 2, "text": "gamma", "lang": "de", "source": "s2",
     "meta": {"crawl": "2024-01"}},                     # extra nested meta
    {"doc_id": 3, "text": "delta epsilon zeta"},        # drifted: no lang/source
]
BAD_PARSE = '{"doc_id": 4, "text": "unterminated'       # malformed JSON
BAD_CONTRACT = {"doc_id": None, "text": "orphan"}       # parses, breaks contract


def _write_fixture(tmp_path, gz: bool):
    lines = [json.dumps(r) for r in GOOD] + [BAD_PARSE,
                                             json.dumps(BAD_CONTRACT)]
    data = "\n".join(lines) + "\n"
    if gz:
        p = tmp_path / "dump.jsonl.gz"
        with gzip.open(p, "wt") as f:
            f.write(data)
    else:
        p = tmp_path / "dump.jsonl"
        p.write_text(data)
    return str(p)


def test_jsonl_read_quarantines_bad_lines(spark, tmp_path):
    src = _write_fixture(tmp_path, gz=False)
    good, quarantine = TC.split_corrupt(TC.read_jsonl_corpus(spark, src))
    rows = {r["doc_id"]: r for r in good.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2]["meta"]["crawl"] == "2024-01"
    assert rows[3]["lang"] is None  # drifted line reads under the contract
    q = quarantine.collect()
    assert len(q) == 2
    parse_failures = [r for r in q if r["parse_failure"]]
    assert len(parse_failures) == 1
    assert parse_failures[0]["raw"].startswith('{"doc_id": 4')  # raw line kept


def test_jsonl_gz_ingest_end_to_end(spark, tmp_path):
    src = _write_fixture(tmp_path, gz=True)
    out = str(tmp_path / "landed")
    counts = TC.ingest_jsonl_corpus(spark, src, out)
    assert counts == {"good": 3, "quarantined": 2}
    back = spark.read.parquet(out)
    assert {r["doc_id"] for r in back.collect()} == {1, 2, 3}
    assert dict(back.dtypes)["n_chars"] == "int"
