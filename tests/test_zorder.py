"""Z-order layout: both filter dimensions must actually skip files."""

from __future__ import annotations

from pyspark.sql import functions as F

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources import zorder_layout as Z
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.tables import load_table

N_FILES = 16


def _layouts(spark, sf_dir, tmp_path):
    docs = load_table(spark, "documents", sf_dir)
    zp, up = str(tmp_path / "zorder"), str(tmp_path / "unordered")
    Z.write_zordered(docs, zp, N_FILES)
    Z.write_unordered(docs, up, N_FILES)
    return docs, zp, up


def test_zorder_preserves_rows(spark, sf_dir, tmp_path):
    docs, zp, _ = _layouts(spark, sf_dir, tmp_path)
    back = spark.read.parquet(zp)
    assert back.count() == docs.count()
    assert (back.select(F.sum("doc_id")).first()[0]
            == docs.select(F.sum("doc_id")).first()[0])
    assert back.select(F.input_file_name()).distinct().count() == N_FILES


def test_zorder_skips_on_length_band(spark, sf_dir, tmp_path):
    """A length-band query overlaps far fewer per-file min/max ranges in
    the z-ordered layout than in the round-robin control (where every file
    spans nearly the full length range)."""
    _, zp, up = _layouts(spark, sf_dir, tmp_path)
    z_touched = Z.files_touched_by_band(spark, zp, 200, 230)
    u_touched = Z.files_touched_by_band(spark, up, 200, 230)
    assert u_touched == N_FILES  # control: no skipping possible
    assert z_touched <= N_FILES // 2


def test_zorder_skips_on_source(spark, sf_dir, tmp_path):
    """Every source concentrates into a few z-contiguous files; in the
    control it scatters across (nearly) all of them."""
    docs, zp, up = _layouts(spark, sf_dir, tmp_path)
    sources = [r["source"] for r in
               docs.select("source").distinct().limit(5).collect()]
    for s in sources:
        z_touched = Z.files_touched_by_source(spark, zp, s)
        u_touched = Z.files_touched_by_source(spark, up, s)
        assert z_touched <= max(1, u_touched // 2), (s, z_touched, u_touched)


def test_zvalue_is_monotone_in_each_dim(spark, sf_dir):
    """Morton key sanity: with one dimension fixed, z is strictly
    increasing in the other (the property that makes contiguous z ranges
    axis-aligned rectangles)."""
    df = spark.range(0, 1 << Z.Z_BITS).select(
        F.col("id").alias("a"), F.lit(7).cast("long").alias("b"))
    z = df.select(Z.zvalue(F.col("a"), F.col("b")).alias("z"),
                  "a").orderBy("a").collect()
    vals = [r["z"] for r in z]
    assert vals == sorted(vals) and len(set(vals)) == len(vals)
    df2 = spark.range(0, 1 << Z.Z_BITS).select(
        F.lit(7).cast("long").alias("a"), F.col("id").alias("b"))
    z2 = [r["z"] for r in df2.select(
        Z.zvalue(F.col("a"), F.col("b")).alias("z"), "b").orderBy("b").collect()]
    assert z2 == sorted(z2) and len(set(z2)) == len(z2)
