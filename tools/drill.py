"""Suite mismatch auto-drill (r6 verdict #4): when a suite gate row's
value hash mismatches, re-hash every Sub inside that suite in the SAME
session and name the culprit sub-ops. verify_local and soak both call
this, so a red suite row is always attributed in the artifact — round 6
had the sidecar tool but the driver's red still named no sub-op.
"""

from __future__ import annotations

from tools.hashing import value_hash


def drill_suite(spark, con, suite_name: str, sf_dir: str) -> list[dict]:
    """Per-sub Spark-vs-oracle hash compare for one suite query.

    Returns one dict per MISMATCHING sub-op: {op, spark, oracle} with
    16-hex hash prefixes. Empty list = every sub-op matches individually
    (the mismatch was in suite assembly, or has already evaporated — the
    flake signature)."""
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import (
        suites,
    )

    subs = suites.SUITE_SUBS.get(suite_name)
    if subs is None:
        return []
    culprits = []
    for s in subs:
        sdf = suites._spark_long(s.fn(spark, sf_dir), s)
        sh = value_hash(sdf.columns, [tuple(r) for r in sdf.collect()])
        res = con.execute(suites._oracle_long(s))
        oh = value_hash([d[0] for d in res.description], res.fetchall())
        if sh != oh:
            culprits.append(
                {"op": s.op, "spark": sh[:16], "oracle": oh[:16]})
    return culprits
