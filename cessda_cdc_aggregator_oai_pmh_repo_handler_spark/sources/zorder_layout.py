"""Z-order (Morton-curve) corpus layout — multi-dimensional data skipping
for the two-filter query mix over ``documents``: by-source (mixture
weighting, per-domain audits) AND by-length-band (quality funnels read
"200-400 char docs" style slices).

One sort key cannot serve two filter dimensions: sorting by ``source``
gives perfect source pruning but scatters every length band across all
files, and vice versa. Interleaving the bits of both dimensions into one
Morton key and range-partitioning + sorting on it gives each output file a
contiguous z-range — which is a small axis-aligned rectangle in
(source-hash, length-bucket) space — so parquet footer min/max stats prune
files for filters on EITHER dimension. This is the same layout trick
Delta/Iceberg expose as OPTIMIZE ZORDER BY; here it is expressed with
nothing but ``repartitionByRange`` + ``sortWithinPartitions``, so it runs
on stock Spark.

Scale shape (100 TB): the z-value is a pure per-row projection (no
shuffle); the layout write is ONE range shuffle — the same cost as any
global sort — sized by ``n_files``; readers prune with ordinary pushed
filters, no library support needed. ``tests/test_zorder.py`` proves the
skipping: per-file min/max of both dimensions tighten by construction, and
a band query touches a fraction of the files an unordered layout touches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

Z_BITS = 8          # per-dimension resolution: 256 cells per axis
LEN_BUCKET = 4      # chars per length-bucket cell (documents are ≤ ~600)


def _dim_source(col: str = "source") -> Column:
    """Dimension 1: source hashed into 0..2^Z_BITS-1. Hashing loses range
    locality (sources are categorical anyway) but keeps equality pruning:
    one source = one cell = a thin z-stripe."""
    return F.pmod(F.xxhash64(F.coalesce(F.col(col), F.lit(""))),
                  F.lit(1 << Z_BITS)).cast("long")


def _dim_length(col: str = "n_chars") -> Column:
    """Dimension 2: length quantized to LEN_BUCKET-char cells, capped at
    the top cell so outliers don't stretch the curve."""
    return F.least(F.col(col) / F.lit(LEN_BUCKET),
                   F.lit((1 << Z_BITS) - 1)).cast("long")


def zvalue(a: Column, b: Column, bits: int = Z_BITS) -> Column:
    """Morton interleave of two ``bits``-wide non-negative columns: bit i
    of ``a`` lands at position 2i, bit i of ``b`` at 2i+1. Pure integer
    expression — whole-stage codegen, no UDF."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def write_zordered(docs: DataFrame, path: str, n_files: int = 16) -> None:
    """Write ``documents`` z-ordered on (source, length): one range shuffle
    on the Morton key, a within-partition sort, one file per range — every
    file covers a contiguous z-interval."""
    z = zvalue(_dim_source(), _dim_length())
    (
        docs.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite").parquet(path)
    )


def write_unordered(docs: DataFrame, path: str, n_files: int = 16) -> None:
    """Control layout for the skipping comparison: same file count, rows
    scattered by round-robin."""
    docs.repartition(n_files).write.mode("overwrite").parquet(path)


def file_stats(spark: SparkSession, path: str) -> DataFrame:
    """Per-file footer-style stats (min/max length, distinct sources) —
    what a parquet reader's skipping decision sees."""
    return (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(F.min("n_chars").alias("min_len"),
             F.max("n_chars").alias("max_len"),
             F.countDistinct("source").alias("n_sources"))
    )


def files_touched_by_band(spark: SparkSession, path: str,
                          lo: int, hi: int) -> int:
    """How many files a length-band filter must open, judged by the same
    min/max overlap rule parquet row-group skipping applies."""
    return (file_stats(spark, path)
            .filter((F.col("max_len") >= lo) & (F.col("min_len") <= hi))
            .count())


def files_touched_by_source(spark: SparkSession, path: str,
                            source: str) -> int:
    """How many files contain any row of ``source`` (dictionary/bloom-style
    pruning upper bound)."""
    return (spark.read.parquet(path)
            .filter(F.col("source") == source)
            .select(F.input_file_name().alias("file"))
            .distinct().count())
