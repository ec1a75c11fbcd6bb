"""The SQL surface: base + derived views compose in spark.sql."""

from __future__ import annotations

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators.catalog import (
    DERIVED_VIEWS,
    register_derived_views,
)
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.tables import (
    register_views,
)


def test_sql_over_base_and_derived_views(spark, sf_dir):
    register_views(spark, sf_dir)
    names = register_derived_views(spark, sf_dir)
    assert set(names) == set(DERIVED_VIEWS)
    # a pure-SQL consumer joins a derived relation to a base table
    rows = spark.sql("""
        SELECT c.component,
               count(*) AS members,
               sum(d.n_chars) AS total_chars
        FROM neardup_components c
        JOIN documents d USING (doc_id)
        GROUP BY c.component
        ORDER BY members DESC, c.component
        LIMIT 5
    """).collect()
    assert rows and all(r["members"] >= 1 for r in rows)
    # chunk view agrees with the documents it derives from
    n_docs = spark.sql(
        "SELECT count(DISTINCT doc_id) AS n FROM doc_chunks").first()["n"]
    assert n_docs == spark.sql("SELECT count(*) AS n FROM documents").first()["n"]
    # every view is queryable
    for name in names:
        assert spark.sql(f"SELECT * FROM {name} LIMIT 1").columns
