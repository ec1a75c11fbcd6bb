"""JSONL corpus source — how raw LLM training text actually arrives:
newline-delimited JSON dumps (one document per line, often gzipped, often
with a few malformed lines and a schema that drifted across dump dates).

Spark-native ingestion, no hand parsing:

- ``spark.read.schema(...).json`` with PERMISSIVE mode and
  ``columnNameOfCorruptRecord``: malformed lines become rows whose corrupt
  column holds the raw line — the source-level analog of ingest's
  ``split_quarantine`` (streaming/ingest.py:93-104), so one bad line never
  fails a 100 TB read and nothing is silently dropped.
- An EXPLICIT schema, not inference: schema inference is a full extra pass
  over the data (and samples at scale); a corpus contract should be
  declared. Drifted dumps that ADD fields still read (absent fields are
  NULL under the declared schema; extra fields are ignored), which is the
  schema-evolution contract parquet's ``mergeSchema`` gives columnar data.
- gz files are fine but NOT splittable — one task per .gz however large.
  At 100 TB keep dump shards ≤ a few hundred MB (the standard CommonCrawl
  shape) so task = shard; the reader then parallelizes by file count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    # drifted dumps may carry extra metadata; declared fields absent in a
    # line are NULL — the reader never fails on shape
    T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    T.StructField(CORRUPT_COL, T.StringType()),
])


def read_jsonl_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Read a JSONL dump (plain or .gz) under the declared corpus schema;
    malformed lines survive into ``_corrupt_record``."""
    return (
        spark.read
        .schema(DOC_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine): a row is quarantined if the line failed to parse
    OR parsed but misses the contract's required fields. Quarantine keeps
    the raw line (parse failures) or the reassembled row (contract
    failures) for triage."""
    is_corrupt = F.col(CORRUPT_COL).isNotNull()
    missing_required = F.col("doc_id").isNull() | F.col("text").isNull()
    bad = is_corrupt | missing_required
    good = docs.filter(~bad).drop(CORRUPT_COL)
    quarantine = docs.filter(bad).select(
        F.coalesce(F.col(CORRUPT_COL), F.to_json(F.struct(
            *[c for c in docs.columns if c != CORRUPT_COL]))).alias("raw"),
        is_corrupt.alias("parse_failure"),
    )
    return good, quarantine


def ingest_jsonl_corpus(spark: SparkSession, src_path: str,
                        out_path: str) -> dict[str, int]:
    """Land a JSONL dump as parquet: good rows to ``out_path``, quarantined
    lines to ``out_path + '.quarantine'``. Returns counts — the manifest a
    pipeline run records."""
    good, quarantine = split_corrupt(read_jsonl_corpus(spark, src_path))
    good = good.withColumn("n_chars", F.length("text"))
    good.write.mode("overwrite").parquet(out_path)
    quarantine.write.mode("overwrite").parquet(out_path + ".quarantine")
    back_good = spark.read.parquet(out_path).count()
    back_bad = spark.read.parquet(out_path + ".quarantine").count()
    return {"good": back_good, "quarantined": back_bad}
