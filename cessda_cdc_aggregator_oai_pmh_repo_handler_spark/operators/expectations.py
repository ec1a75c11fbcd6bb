"""Declarative data-quality expectations — the contract checks a pipeline
runs before publishing a table (the Great-Expectations/dbt-test idea,
expressed as Spark plans):

- row-level predicates (not-null, value range, set membership) AND key
  uniqueness all ride ONE aggregate pass over the table — each predicate
  is a ``sum(when(...))`` column and uniqueness is count-vs-distinct in
  the same aggregate (a single distinct plans the ordinary two-phase
  partial-distinct, no Expand, no extra scan), so adding a check adds a
  column, not a scan;
- referential integrity is one pass over the child: LEFT-join the
  distinct parent keys (broadcast when dimension-sized) and count
  orphans and total rows in the same aggregate.

The report is long-format (check, violations, checked) so any number of
checks lands in one verifiable relation; violations == 0 everywhere is
the publish gate. At 100 TB: one scan per table for every row-level +
uniqueness check, one pruned-column join pass per FK — the same cost
envelope as writing the table's statistics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table


def _safe_name(name: str) -> str:
    """Check names are spliced into selectExpr — reject the characters
    that would break the SQL (and the reserved internal column)."""
    if any(ch in name for ch in "'`\\") or name == "_checked":
        raise ValueError(f"invalid check name: {name!r}")
    return name


def run_row_checks(df: DataFrame,
                   checks: list[tuple[str, Column]],
                   unique_keys: list[tuple[str, str]] = ()) -> DataFrame:
    """(check, violations, checked) for violation-predicate columns — one
    aggregate pass however many checks there are. ``unique_keys``
    (name, column) adds count-vs-distinct uniqueness checks to the SAME
    aggregate: a single distinct plans the ordinary two-phase
    partial-distinct, no extra scan (asserted in test_expectations)."""
    if not checks and not unique_keys:
        return df.sparkSession.createDataFrame(
            [], "check string, violations long, checked long")
    cols = [F.sum(F.when(cond, 1).otherwise(0)).cast("long")
            .alias(_safe_name(name)) for name, cond in checks]
    cols += [(F.count(F.lit(1)) - F.countDistinct(col)).cast("long")
             .alias(_safe_name(name)) for name, col in unique_keys]
    agg = df.agg(*cols, F.count(F.lit(1)).cast("long").alias("_checked"))
    names = [name for name, _ in checks] + [name for name, _ in unique_keys]
    stack = ", ".join(f"'{name}', `{name}`" for name in names)
    return agg.selectExpr(
        f"stack({len(names)}, {stack}) AS (check, violations)",
        "_checked AS checked")


def fk_check(child: DataFrame, parent: DataFrame,
             child_key: str, parent_key: str, name: str) -> DataFrame:
    """Referential integrity in ONE pass over the child: LEFT-join the
    (distinct) parent keys and count both orphans and total rows in the
    same aggregate — no separate count(*) scan for ``checked``. The
    parent side is deduplicated so a violated parent-side PK can only
    surface as ITS OWN uniqueness failure, never as inflated FK counts.
    ANSI FK semantics: a NULL child key is vacuously valid (it belongs to
    a separate not_null expectation), so NULLs are excluded from the
    orphan count."""
    pk = (parent.select(F.col(parent_key).alias("_pk")).distinct()
          .withColumn("_present", F.lit(1)))
    j = child.select(F.col(child_key).alias("_ck")).join(
        pk, F.col("_ck") == F.col("_pk"), "left")
    return j.agg(
        F.sum(F.when(F.col("_present").isNull()
                     & F.col("_ck").isNotNull(), 1).otherwise(0))
        .cast("long").alias("violations"),
        F.count(F.lit(1)).cast("long").alias("checked"),
    ).select(F.lit(_safe_name(name)).alias("check"), "violations", "checked")


def q_data_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The expectation suite over the star schema, one row per check:

    - orders: o_orderkey not null, o_totalprice > 0, o_orderpriority in
      its domain, o_orderkey unique;
    - lineitem: discount within [0, 0.1], quantity in [1, 50];
    - referential: every lineitem.l_orderkey has an order, every
      orders.o_custkey has a customer.
    All violation counts are 0 on the generator's data — the PASSING
    publish gate — except the deliberately-too-tight `l_quantity <= 40`
    probe, which exists so the gate provably counts real violations
    rather than defaulting to zero."""
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    c = load_table(spark, "customer", sf_dir)

    pri_domain = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    orders_checks = run_row_checks(o, [
        ("orders.o_orderkey.not_null", F.col("o_orderkey").isNull()),
        ("orders.o_totalprice.positive", ~(F.col("o_totalprice") > 0)),
        ("orders.o_orderpriority.in_domain",
         ~F.col("o_orderpriority").isin(pri_domain)),
    ], unique_keys=[("orders.o_orderkey.unique", "o_orderkey")])
    li_checks = run_row_checks(li, [
        ("lineitem.l_discount.range",
         (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)),
        ("lineitem.l_quantity.range",
         (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)),
        ("lineitem.l_quantity.le_40_probe", F.col("l_quantity") > 40),
    ])
    fk_li = fk_check(li, o, "l_orderkey", "o_orderkey",
                     "lineitem.l_orderkey.fk_orders")
    fk_o = fk_check(o, c, "o_custkey", "c_custkey",
                    "orders.o_custkey.fk_customer")
    return (orders_checks.unionByName(li_checks)
            .unionByName(fk_li).unionByName(fk_o))


ORACLE = """
    SELECT 'orders.o_orderkey.not_null' AS check,
           CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS violations,
           CAST(count(*) AS BIGINT) AS checked
    FROM orders
    UNION ALL
    SELECT 'orders.o_totalprice.positive',
           CAST(sum(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders.o_orderpriority.in_domain',
           CAST(sum(CASE WHEN o_orderpriority NOT IN
                    ('1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED',
                     '5-LOW') THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'lineitem.l_discount.range',
           CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
                    THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem.l_quantity.range',
           CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                    THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem.l_quantity.le_40_probe',
           CAST(sum(CASE WHEN l_quantity > 40 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'orders.o_orderkey.unique',
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'lineitem.l_orderkey.fk_orders',
           CAST((SELECT count(*) FROM lineitem l
                 WHERE l.l_orderkey IS NOT NULL
                   AND NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT),
           CAST((SELECT count(*) FROM lineitem) AS BIGINT)
    UNION ALL
    SELECT 'orders.o_custkey.fk_customer',
           CAST((SELECT count(*) FROM orders o
                 WHERE o.o_custkey IS NOT NULL
                   AND NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT),
           CAST((SELECT count(*) FROM orders) AS BIGINT)
"""

ERASE_MOD = 37  # deterministic erase set: ~1/37 of documents (md5 draw)


def q_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten sweep: purge a deterministic erase set of
    documents from every doc-keyed derived relation and report, per
    relation, rows_before / purged / rows_after — the audit artifact a
    compliance pipeline publishes after an erasure run. Relations:

    - corpus: the documents table itself;
    - chunks: the fixed-width chunk relation (counted via the closed-form
      per-doc chunk count — the audit never materializes the exploded
      relation, a 100 TB chunk table is counted, not rebuilt);
    - postings: distinct (doc_id, term) pairs, the inverted-index
      backbone (BM25's index rows for erased docs MUST go);
    - shard_assignment: the doc→shard manifest rows.

    `purged` is nonzero by construction (the erase set is real), and
    rows_before - purged = rows_after is checked per relation by the
    oracle, which recomputes all three counts independently in SQL.
    At scale each relation's audit is one aggregate pass with the
    erase-set membership as a broadcast join (the erase list is tiny
    relative to the corpus); the chunk row avoids its explode entirely."""
    from .assembly import CHUNK_S, CHUNK_W, N_SHARDS, _shard_draw

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "text", F.coalesce("text", F.lit("")))
    erased = (F.pmod(_shard_draw(F.col("doc_id")), F.lit(ERASE_MOD)) == 0)
    flagged = docs.withColumn("_e", erased.cast("long"))

    def audit(rel: DataFrame, name: str, weight=None) -> DataFrame:
        w = weight if weight is not None else F.lit(1).cast("long")
        return rel.agg(
            F.sum(w).cast("long").alias("rows_before"),
            F.sum(w * F.col("_e")).cast("long").alias("purged"),
            F.sum(w * (1 - F.col("_e"))).cast("long").alias("rows_after"),
        ).select(F.lit(name).alias("relation"),
                 "rows_before", "purged", "rows_after")

    corpus = audit(flagged, "corpus")
    extra = F.greatest(F.length("text") - CHUNK_W, F.lit(0))
    n_chunks = (F.floor((extra + (CHUNK_S - 1)) / F.lit(CHUNK_S)) + 1)
    chunks = audit(flagged, "chunks", weight=n_chunks.cast("long"))
    postings_rel = (
        flagged.select(
            "doc_id", "_e",
            F.explode(F.split(F.lower("text"), " ")).alias("term"))
        .filter(F.col("term") != "")
        .select("doc_id", "_e", "term").distinct()
    )
    postings = audit(postings_rel, "postings")
    shard_rel = flagged.select(
        "doc_id", "_e",
        F.pmod(_shard_draw(F.col("doc_id")), F.lit(N_SHARDS)).alias("shard"))
    shards = audit(shard_rel, "shard_assignment")
    return (corpus.unionByName(chunks)
            .unionByName(postings).unionByName(shards))


def _erasure_oracle() -> str:
    from .assembly import CHUNK_S, CHUNK_W, N_SHARDS

    return f"""
        WITH flagged AS (
            SELECT doc_id, coalesce(text, '') AS text,
                   CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                                 1, 4) AS INT)
                             % {ERASE_MOD} = 0 THEN 1 ELSE 0 END AS e
            FROM documents
        ),
        chunked AS (
            SELECT e,
                   CAST(floor((greatest(length(text) - {CHUNK_W}, 0)
                               + {CHUNK_S - 1}) / {CHUNK_S}) AS BIGINT) + 1
                       AS n_chunks
            FROM flagged
        ),
        postings AS (
            SELECT DISTINCT f.doc_id, f.e, t.term
            FROM flagged f,
                 unnest(string_split(lower(f.text), ' ')) AS t(term)
            WHERE t.term <> ''
        )
        SELECT 'corpus' AS relation,
               CAST(count(*) AS BIGINT) AS rows_before,
               CAST(sum(e) AS BIGINT) AS purged,
               CAST(sum(1 - e) AS BIGINT) AS rows_after
        FROM flagged
        UNION ALL
        SELECT 'chunks', CAST(sum(n_chunks) AS BIGINT),
               CAST(sum(n_chunks * e) AS BIGINT),
               CAST(sum(n_chunks * (1 - e)) AS BIGINT)
        FROM chunked
        UNION ALL
        SELECT 'postings', CAST(count(*) AS BIGINT),
               CAST(sum(e) AS BIGINT), CAST(sum(1 - e) AS BIGINT)
        FROM postings
        UNION ALL
        SELECT 'shard_assignment', CAST(count(*) AS BIGINT),
               CAST(sum(e) AS BIGINT), CAST(sum(1 - e) AS BIGINT)
        FROM flagged
    """


QUERIES = {"data_expectations": q_data_expectations,
           "erasure_audit": q_erasure_audit}
ORACLES = {"data_expectations": ORACLE,
           "erasure_audit": _erasure_oracle()}


class PublishGateError(RuntimeError):
    """Raised by ``gated_write`` when violation counters are nonzero; the
    freshly written output has already been rolled back."""

    def __init__(self, metrics: dict):
        self.metrics = metrics
        bad = {k: v for k, v in metrics.items() if v}
        super().__init__(f"publish gate failed: {bad}")


def gated_write(df: DataFrame, checks: list[tuple[str, Column]],
                path: str) -> dict:
    """SINGLE-PASS publish gate via ``df.observe``: the violation
    counters ride the WRITE job itself (Spark's Observation API collects
    accumulator-backed metrics during the action), so gating costs zero
    extra scans — q_data_expectations' audit pass and the publish write
    collapse into one job. If any counter is nonzero the just-written
    output is rolled back (removed) and ``PublishGateError`` carries the
    metrics; on success the metrics dict is returned for lineage logs.

    At 100 TB this halves the publish cost against audit-then-write, and
    unlike write-then-count it can never leave a bad table visible: the
    parquet directory exists only between write and rollback, and a
    manifest-driven consumer (see xmlexport's discipline) would gate on
    the metrics row this function emits."""
    import shutil

    from pyspark.sql import Observation

    obs = Observation("publish_gate")
    aggs = [F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)
            for name, cond in [(_safe_name(n), c) for n, c in checks]]
    df.observe(obs, *aggs).write.mode("overwrite").parquet(path)
    metrics = obs.get
    if any(v for v in metrics.values()):
        shutil.rmtree(path, ignore_errors=True)
        raise PublishGateError(metrics)
    return metrics
