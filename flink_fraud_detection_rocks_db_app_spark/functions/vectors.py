"""Vector expressions over array<float>/array<double> columns.

No UDFs: `aggregate(zip_with(...))` runs inside whole-stage codegen,
which is why the similarity operators stay JVM-side end to end.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: str | Column) -> Column:
    name = col if isinstance(col, str) else None
    if name is None:
        raise ValueError("to_double_array takes a column NAME (used in SQL text)")
    return F.expr(f"transform({name}, x -> CAST(x AS DOUBLE))")


def dot(a: str, b: str) -> Column:
    """Dot product of two array columns (by name)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"CAST(0.0 AS DOUBLE), (s, x) -> s + x)"
    )


def l2_norm(a: str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: str, b: str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
