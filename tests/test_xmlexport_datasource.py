"""`xmlexport` Python Data Source writer (sources/xmlexport_datasource.py):
per-partition XML shards, two-phase commit (temp → rename + manifest
last), abort cleanup on task failure, overwrite semantics."""

from __future__ import annotations

import json
import os
import xml.etree.ElementTree as ET

import pytest
from pyspark.sql import functions as F

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.xmlexport_datasource import (
    MANIFEST, XMLExportDataSource,
)


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(XMLExportDataSource)
    return spark


def _df(spark, n=20, parts=3):
    return (spark.range(n).repartition(parts)
            .select(F.col("id"),
                    F.concat(F.lit("study "), F.col("id")).alias("title"),
                    F.when(F.col("id") % 5 == 0, None)
                    .otherwise(F.lit("en")).alias("lang")))


def test_commit_writes_shards_and_manifest_last(registered, tmp_path):
    spark = registered
    out = str(tmp_path / "export")
    _df(spark).write.format("xmlexport").option("path", out).mode("append").save()

    files = sorted(os.listdir(out))
    shards = [f for f in files if f.endswith(".xml")]
    assert len(shards) == 3
    assert MANIFEST in files
    assert not [f for f in files if f.endswith(".tmp")], "temps must be gone"

    manifest = json.load(open(os.path.join(out, MANIFEST)))
    assert manifest["total_records"] == 20
    assert [s["shard"] for s in manifest["shards"]] == shards
    assert manifest["columns"] == ["id", "title", "lang"]

    seen = []
    for shard in shards:
        root = ET.parse(os.path.join(out, shard)).getroot()
        assert root.tag == "records"
        for rec in root.findall("record"):
            fields = {f.get("name"): f.text for f in rec.findall("field")}
            seen.append(fields)
    assert len(seen) == 20
    ids = sorted(int(f["id"]) for f in seen)
    assert ids == list(range(20))
    # null columns are omitted, not rendered as "None"
    for f in seen:
        if int(f["id"]) % 5 == 0:
            assert "lang" not in f
        else:
            assert f["lang"] == "en"
    # XML escaping is real
    assert all(fld["title"] == f"study {fld['id']}" for fld in seen)


def test_abort_cleans_temp_shards(registered, tmp_path):
    spark = registered
    out = str(tmp_path / "aborted")

    poison = (spark.range(10).repartition(2)
              .select(F.col("id"),
                      F.when(F.col("id") == 7,
                             F.raise_error(F.lit("poisoned row")))
                      .otherwise(F.lit("x")).alias("title"),
                      F.lit("en").alias("lang")))
    with pytest.raises(Exception):
        poison.write.format("xmlexport").option("path", out).mode("append").save()
    leftover = [f for f in os.listdir(out)] if os.path.exists(out) else []
    assert MANIFEST not in leftover, "failed job must not publish a manifest"
    assert not [f for f in leftover if f.endswith(".xml")], \
        "failed job must not publish shards"


def test_overwrite_replaces_previous_export(registered, tmp_path):
    spark = registered
    out = str(tmp_path / "overwrite")
    _df(spark, n=20, parts=4).write.format("xmlexport") \
        .option("path", out).mode("append").save()
    assert len([f for f in os.listdir(out) if f.endswith(".xml")]) == 4

    _df(spark, n=6, parts=2).write.format("xmlexport") \
        .option("path", out).mode("overwrite").save()
    shards = [f for f in os.listdir(out) if f.endswith(".xml")]
    assert len(shards) == 2
    manifest = json.load(open(os.path.join(out, MANIFEST)))
    assert manifest["total_records"] == 6


def test_missing_path_option_fails_fast(registered):
    with pytest.raises(Exception):
        _df(registered, 4, 1).write.format("xmlexport").mode("append").save()


def test_stream_writer_commits_per_epoch(registered, tmp_path):
    """writeStream.format('xmlexport'): each microbatch lands as its own
    epoch=N directory (shards + manifest), temps cleaned, and the union
    of all epochs' records equals the input exactly."""
    spark = registered
    src = str(tmp_path / "stream_src")
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")

    df1 = _df(spark, n=8, parts=1)
    df2 = (spark.range(8, 14).repartition(1)
           .select(F.col("id"),
                   F.concat(F.lit("study "), F.col("id")).alias("title"),
                   F.lit("en").alias("lang")))
    df1.write.parquet(src)
    df2.write.mode("append").parquet(src)

    stream = (spark.readStream.schema(df1.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream.writeStream.format("xmlexport")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    epochs = sorted(d for d in os.listdir(out) if d.startswith("epoch="))
    assert len(epochs) == 2
    total, ids = 0, []
    for ep in epochs:
        edir = os.path.join(out, ep)
        files = os.listdir(edir)
        assert MANIFEST in files
        assert not [f for f in files if f.endswith(".tmp")]
        manifest = json.load(open(os.path.join(edir, MANIFEST)))
        total += manifest["total_records"]
        for shard in (f for f in files if f.endswith(".xml")):
            root = ET.parse(os.path.join(edir, shard)).getroot()
            ids += [int(r.find("field[@name='id']").text)
                    for r in root.findall("record")]
    assert total == 14 and sorted(ids) == list(range(14))


def test_read_back_roundtrip(registered, tmp_path):
    """The same data source READS an export back: manifest-driven schema
    (all strings), one input partition per shard; every exported row
    returns, nulls stay null."""
    spark = registered
    out = str(tmp_path / "roundtrip")
    _df(spark).write.format("xmlexport").option("path", out) \
        .mode("append").save()

    back = spark.read.format("xmlexport").option("path", out).load()
    assert back.columns == ["id", "title", "lang"]
    assert back.schema["id"].dataType.simpleString() == "string"
    assert back.rdd.getNumPartitions() == 3  # one per shard
    rows = {int(r["id"]): r for r in back.collect()}
    assert sorted(rows) == list(range(20))
    for i, r in rows.items():
        assert r["title"] == f"study {i}"
        assert (r["lang"] is None) == (i % 5 == 0)


def test_read_uncommitted_export_fails(registered, tmp_path):
    out = str(tmp_path / "nothing")
    import os
    os.makedirs(out)
    with pytest.raises(Exception):
        registered.read.format("xmlexport").option("path", out).load().collect()
