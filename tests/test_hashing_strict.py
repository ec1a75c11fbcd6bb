"""The r8 strict-hash regression suite (r7 verdict #1/#2).

Three rounds of driver red survived locally because tools/hashing.py
normalized floats to 6 significant digits: Spark's 31234.68 and DuckDB's
31234.69 (``round(312346.85 * 0.1, 2)`` on DOUBLE) both collapsed to
"31234.7". These tests pin (a) the hash itself now distinguishes
sub-1e-6 relative divergence, (b) the exact engine pair that diverged is
VISIBLE to the strict hash (the seeded regression), and (c) the fixed
DECIMAL formulation agrees bit-for-bit on both engines.
"""

from __future__ import annotations

import duckdb

from tools.hashing import norm_cell, norm_cell_lenient, value_hash

# The verbatim scalar expression that was red for three rounds
# (relational_ext.py sql_text_lateral_alias, pre-r8): double product
# 31234.684999999998 rounds DOWN on Spark (BigDecimal HALF_UP on the
# binary expansion) and UP on DuckDB.
OLD_DOUBLE_EXPR = "round(CAST(312346.85 AS DOUBLE) * 0.1, 2)"
# The r8 fix: the product is exact DECIMAL 31234.685; both engines round
# half-up to 31234.69 and cast to DOUBLE at the edge.
NEW_DECIMAL_EXPR = ("CAST(round(CAST(312346.85 AS DECIMAL(18,2)) * 0.1, 2) "
                    "AS DOUBLE)")


def test_strict_hash_sees_seventh_digit():
    # the two historical cell values: identical under the old 6-sig-digit
    # normalization, distinct under strict
    assert norm_cell_lenient(31234.68) == norm_cell_lenient(31234.69)
    assert norm_cell(31234.68) != norm_cell(31234.69)
    h_spark = value_hash(["tithe"], [(31234.68,)])
    h_duck = value_hash(["tithe"], [(31234.69,)])
    assert h_spark != h_duck
    assert (value_hash(["tithe"], [(31234.68,)], norm=norm_cell_lenient)
            == value_hash(["tithe"], [(31234.69,)],
                          norm=norm_cell_lenient))


def test_strict_hash_float_edge_cases():
    assert norm_cell(0.0) == norm_cell(-0.0)  # equal doubles, one repr
    assert norm_cell(float("nan")) == "nan"
    assert norm_cell(None) == "NULL"
    # full round-trip precision: adjacent doubles hash differently
    import math
    x = 1.0
    assert norm_cell(x) != norm_cell(math.nextafter(x, 2.0))


def test_seeded_regression_old_double_round_diverges(spark):
    """Re-introduce the pre-r8 expression: the strict hash MUST go red
    (this is exactly what verify_local/soak/drill could not see)."""
    sval = spark.sql(f"SELECT {OLD_DOUBLE_EXPR} AS tithe").collect()[0][0]
    dval = duckdb.sql(f"SELECT {OLD_DOUBLE_EXPR} AS tithe").fetchone()[0]
    assert sval != dval  # the deterministic engine divergence, reproduced
    assert (value_hash(["tithe"], [(sval,)])
            != value_hash(["tithe"], [(dval,)]))
    # ... and the lenient hash is blind to it, which is why it had to go
    assert (value_hash(["tithe"], [(sval,)], norm=norm_cell_lenient)
            == value_hash(["tithe"], [(dval,)], norm=norm_cell_lenient))


def test_fixed_decimal_round_agrees(spark):
    sval = spark.sql(f"SELECT {NEW_DECIMAL_EXPR} AS tithe").collect()[0][0]
    dval = duckdb.sql(f"SELECT {NEW_DECIMAL_EXPR} AS tithe").fetchone()[0]
    assert sval == dval == 31234.69
    assert (value_hash(["tithe"], [(sval,)])
            == value_hash(["tithe"], [(dval,)]))


def test_duckdb_wide_int_to_double_needs_varchar_route():
    """DuckDB's native HUGEINT→DOUBLE conversion double-rounds (a two-step
    hi·2^64 + lo float expression), so exact integers above 2^53 can land
    one ulp off Python's / Spark's correctly-rounded value — the r8
    sf0.1 sweep caught ridge_regression's syy_cents2 this way. Casting
    through VARCHAR (strtod, correctly rounded) must match exactly; this
    pins both behaviors so an engine upgrade that fixes the native cast
    is noticed."""
    n = 22240711483861231690  # the actual divergent sum from the sweep
    raw = duckdb.sql(
        f"SELECT CAST(CAST({n} AS HUGEINT) AS DOUBLE)").fetchone()[0]
    via = duckdb.sql(
        f"SELECT CAST(CAST(CAST({n} AS HUGEINT) AS VARCHAR) AS DOUBLE)"
    ).fetchone()[0]
    assert via == float(n)  # correctly rounded
    assert raw != via       # the native cast is 1 ulp off for this value
    from tools.hashing import value_hash
    assert (value_hash(["v"], [(via,)])
            == value_hash(["v"], [(float(n),)]))
