"""Declarative data-quality expectations — the contract checks a pipeline
runs before publishing a table (the Great-Expectations/dbt-test idea,
expressed as Spark plans):

- row-level predicates (not-null, value range, set membership) all ride
  ONE aggregate pass over the table — each check is a ``sum(when(...))``
  column, so adding a check adds a column, not a scan;
- key uniqueness is a count-vs-distinct comparison in the same pass;
- referential integrity is a left anti-join per (child, parent) pair —
  the only check that touches a second table, and the parent side is the
  join's build side (broadcast when dimension-sized).

The report is long-format (check, violations, checked) so any number of
checks lands in one verifiable relation; violations == 0 everywhere is
the publish gate. At 100 TB: one scan for all row-level checks + one
pruned-column anti-join per FK — the same cost envelope as writing the
table's statistics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table


def _violation_rows(checks: list[tuple[str, Column]], total: Column
                    ) -> list[Column]:
    """Each check → sum(when(violated, 1)) in one shared aggregation."""
    return [F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)
            for name, cond in checks] + [total.cast("long").alias("_checked")]


def run_row_checks(df: DataFrame,
                   checks: list[tuple[str, Column]]) -> DataFrame:
    """(check, violations, checked) for violation-predicate columns — one
    aggregate pass however many checks there are."""
    agg = df.agg(*_violation_rows(checks, F.count(F.lit(1))))
    stack = ", ".join(f"'{name}', `{name}`" for name, _ in checks)
    return agg.selectExpr(
        f"stack({len(checks)}, {stack}) AS (check, violations)",
        "_checked AS checked")


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
    ])
    li_checks = run_row_checks(li, [
        ("lineitem.l_discount.range",
         (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)),
        ("lineitem.l_quantity.range",
         (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)),
        ("lineitem.l_quantity.le_40_probe", F.col("l_quantity") > 40),
    ])
    uniq = o.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("violations"),
        F.count(F.lit(1)).alias("checked"),
    ).select(F.lit("orders.o_orderkey.unique").alias("check"),
             "violations", "checked")
    fk_li = (li.join(o.select("o_orderkey"),
                     li.l_orderkey == o.o_orderkey, "left_anti")
             .agg(F.count(F.lit(1)).alias("violations"))
             .crossJoin(li.agg(F.count(F.lit(1)).alias("checked")))
             .select(F.lit("lineitem.l_orderkey.fk_orders").alias("check"),
                     "violations", "checked"))
    fk_o = (o.join(c.select("c_custkey"),
                   o.o_custkey == c.c_custkey, "left_anti")
            .agg(F.count(F.lit(1)).alias("violations"))
            .crossJoin(o.agg(F.count(F.lit(1)).alias("checked")))
            .select(F.lit("orders.o_custkey.fk_customer").alias("check"),
                    "violations", "checked"))
    return (orders_checks.unionByName(li_checks).unionByName(uniq)
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
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT),
           CAST((SELECT count(*) FROM lineitem) AS BIGINT)
    UNION ALL
    SELECT 'orders.o_custkey.fk_customer',
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT),
           CAST((SELECT count(*) FROM orders) AS BIGINT)
"""

QUERIES = {"data_expectations": q_data_expectations}
ORACLES = {"data_expectations": ORACLE}
