"""Deterministic numeric helpers shared by queries and their oracles.

Floating-point SUM is order-sensitive: Spark's shuffle/merge order differs
from DuckDB's, so a naive ``sum(double)`` diverges in the last bits at
~10^4 rows and the driver's value hash (exact) would miss.  The fix is to
aggregate exactly: cast to DECIMAL (exact, associative, order-independent),
sum, and cast the final scalar back to double.  Both engines round a double
to the same DECIMAL value and convert the same DECIMAL back to the same
double, so results are bit-identical regardless of execution order.

This also matters at 100 TB: the same query plan produces the same answer
whatever the cluster's partitioning — run-to-run reproducibility for audits.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 6 fractional digits represents every testdata double EXACTLY (2dp values and
# products of up to three 2dp factors), so the decimal cast never rounds —
# no cross-engine rounding-tie risk.  Width 38
# keeps ~10^33 of headroom before overflow at 100 TB row counts.
DEC = "decimal(38,6)"


def dsum(col: Column | str, scale: int = 6) -> Column:
    """Order-independent SUM of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(38,{scale})")).cast("double")


def dsum_sql(expr: str, scale: int = 6) -> str:
    """DuckDB mirror of :func:`dsum` for oracle SQL strings."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,{scale}))) AS DOUBLE)"


def davg(col: Column | str, scale: int = 6) -> Column:
    """Order-independent AVG: exact decimal sum divided by count, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def davg_sql(expr: str, scale: int = 6) -> str:
    return f"({dsum_sql(expr, scale)} / COUNT({expr}))"
