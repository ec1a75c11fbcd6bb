"""Exact (merge-order-independent) money aggregation helpers.

The gate hashes doubles at 6 significant digits after ``round(x, 2)``.
A ``SUM(double)`` over many rows carries partial-aggregation merge-order
noise (~sqrt(n)·ulp), so a sum whose true value sits near a half-cent
boundary can round differently run-to-run — the round-5 flake
(VERDICT r5 §What's-wrong #1). Fix class: money columns are 2-decimal
values stored as double; casting each row to DECIMAL recovers the exact
value, DECIMAL sums are exact integers under the hood in BOTH Spark and
DuckDB (order-independent), and ``round(exact, 2)`` is deterministic
HALF_UP/away-from-zero in both engines. The final cast back to double is
correctly rounded in both, so the hashed text is bit-stable.

Precisions are chosen so no intermediate exceeds DECIMAL(38,_) in Spark
(which would trigger engine-specific precision-loss rounding) while still
holding 100 TB-scale sums: a DECIMAL(38,6) sum has 32 integral digits.

Spark side: use ``money``/``rate`` to lift columns, compose arithmetic in
decimal, and ``exact_sum`` to aggregate. DuckDB side: the ``SQL_*``
templates spell the same thing in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["money", "rate", "exact_sum", "exact_wsum", "exact_avg",
           "money_sql", "rate_sql", "exact_sum_sql", "exact_avg_sql"]


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def money(c) -> Column:
    """Lift a 2-decimal money column stored as double to exact DECIMAL(12,2)
    (covers per-row magnitudes < 10^10; sums widen automatically)."""
    return _col(c).cast("decimal(12,2)")


def rate(c) -> Column:
    """Lift a 2-decimal rate/percentage column (discount, tax: 0.00-1.00)
    to exact DECIMAL(4,2). ``1 - rate(c)`` stays a narrow exact decimal so
    products with ``money`` never exceed precision 38."""
    return _col(c).cast("decimal(4,2)")


def exact_sum(expr: Column, round_to: int = 2) -> Column:
    """Exact decimal SUM of a decimal expression, rounded and returned as
    double. Deterministic across partial-merge orders in Spark AND DuckDB."""
    return F.round(F.sum(expr), round_to).cast("double")


def exact_wsum(expr: Column, w, round_to: int = 2) -> Column:
    """Exact decimal SUM over a window frame, rounded and returned as
    double. Window sums over raw doubles differ between Spark's
    incremental frame evaluation and DuckDB's segment-tree association
    order; decimal accumulation makes both exact and therefore equal."""
    return F.round(F.sum(expr).over(w), round_to).cast("double")


def exact_avg(expr: Column, round_to: int = 4) -> Column:
    """Deterministic AVG: exact decimal SUM cast to double, divided by the
    non-null count. IEEE double division of two exact operands is correctly
    rounded, so the pre-round value is identical in Spark and DuckDB and
    across runs — unlike AVG(double), whose accumulated sum carries
    merge-order ulps."""
    return F.round(
        F.sum(expr).cast("double") / F.count(expr), round_to
    ).cast("double")


def money_sql(col: str) -> str:
    """DuckDB-side twin of ``money``."""
    return f"CAST({col} AS DECIMAL(12,2))"


def rate_sql(col: str) -> str:
    """DuckDB-side twin of ``rate``."""
    return f"CAST({col} AS DECIMAL(4,2))"


def exact_sum_sql(expr: str, round_to: int = 2) -> str:
    """DuckDB-side twin of ``exact_sum`` — ``expr`` must already be a
    decimal expression (compose from ``money_sql``/``rate_sql``)."""
    return f"CAST(round(sum({expr}), {round_to}) AS DOUBLE)"


def exact_avg_sql(expr: str, count_col: str, round_to: int = 4) -> str:
    """DuckDB-side twin of ``exact_avg``."""
    return (f"CAST(round(CAST(sum({expr}) AS DOUBLE) / count({count_col}), "
            f"{round_to}) AS DOUBLE)")
