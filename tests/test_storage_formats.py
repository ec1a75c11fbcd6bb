"""Columnar/text storage-format coverage beyond parquet: ORC (built into
Spark — round-trip equality + predicate pushdown into the ORC scan) and
schema'd CSV (header round-trip, permissive bad-line tolerance). DuckDB
reads neither of these layouts here, so the checks are Spark-side
equalities against the parquet source of truth."""

from __future__ import annotations

from pyspark.sql import functions as F

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_orc_round_trip_and_pushdown(spark, tmp_path):
    src = load_table(spark, "orders", SF)
    path = str(tmp_path / "orders_orc")
    src.write.orc(path)
    back = spark.read.orc(path)
    assert back.schema == src.schema
    assert back.count() == src.count()
    assert back.exceptAll(src).count() == 0 and src.exceptAll(back).count() == 0
    # predicate reaches the ORC scan (search pushed filters in the plan)
    plan = (back.filter(F.col("o_orderkey") == 7)
            ._jdf.queryExecution().executedPlan().toString())
    assert "orderkey" in plan and "PushedFilters: [" in plan
    assert "IsNotNull(o_orderkey)" in plan or "EqualTo(o_orderkey,7)" in plan


def test_csv_schema_round_trip(spark, tmp_path):
    src = load_table(spark, "nation", SF)
    path = str(tmp_path / "nation_csv")
    src.write.option("header", "true").csv(path)
    back = (spark.read.option("header", "true")
            .schema(src.schema).csv(path))
    assert back.schema == src.schema
    assert (sorted(map(tuple, back.collect()))
            == sorted(map(tuple, src.collect())))


def test_csv_permissive_corrupt_line_quarantine(spark, tmp_path):
    p = tmp_path / "rows.csv"
    p.write_text("id,qty\n1,10\n2,notanumber\n3,30\n")
    df = (spark.read.option("header", "true")
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt")
          .schema("id INT, qty INT, _corrupt STRING")
          .csv(str(p)))
    rows = df.collect()
    good = [r for r in rows if r["_corrupt"] is None]
    bad = [r for r in rows if r["_corrupt"] is not None]
    assert {(r["id"], r["qty"]) for r in good} == {(1, 10), (3, 30)}
    assert len(bad) == 1 and "notanumber" in bad[0]["_corrupt"]
