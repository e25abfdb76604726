"""Vector math over ``array<float>`` embedding columns — JVM-side expressions
(no UDF): dot product, L2 norm, cosine similarity via ``zip_with`` +
``aggregate``. Accumulation is in DOUBLE, left-to-right over the array —
deterministic and matched by the DuckDB oracle expressions below.

Scale note: these are narrow per-row expressions; a brute-force top-k over N
vectors is a scan + TakeOrdered (no shuffle of the vectors themselves). The
LSH/IVF variants in ``operators/similarity.py`` cut the scan for big N.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ a_i * b_i in double, left-to-right."""
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


# --- DuckDB oracle SQL generators (same math, same accumulation order) ---


def _as_double_sql(col: str) -> str:
    return f"CAST({col} AS DOUBLE[])"


def dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0, "
        f"list_transform(list_zip({_as_double_sql(a)}, {_as_double_sql(b)}), "
        f"p -> p[1] * p[2])), (acc, x) -> acc + x)"
    )


def l2_norm_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def cosine_sql(a: str, b: str) -> str:
    return f"{dot_sql(a, b)} / ({l2_norm_sql(a)} * {l2_norm_sql(b)})"


def valid_vector(a: Column | str) -> Column:
    """Cosine-domain validity: non-null with positive norm. Every
    cosine-consuming operator filters on this at entry — a NULL embedding
    poisons arithmetic into nulls/exceptions and a zero vector makes
    cosine 0/0 (NaN, whose ordering semantics differ across engines)."""
    c = F.col(a) if isinstance(a, str) else a
    return c.isNotNull() & (l2_norm(c) > 0)


def valid_vector_sql(a: str) -> str:
    """DuckDB twin of :func:`valid_vector`."""
    return f"({a} IS NOT NULL AND {l2_norm_sql(a)} > 0)"
