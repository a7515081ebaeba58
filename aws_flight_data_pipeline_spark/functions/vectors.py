"""Vector Column builders over array<float> embedding columns.

Dot products / norms / cosine as higher-order array expressions: per-row,
JVM-side, no shuffle and no UDF — the brute-force path stays a narrow map at
any scale, and blocking/LSH queries compose these after a cheap candidate join.

Precision discipline: elements are cast to double BEFORE multiplication so the
products are bit-identical with a double-arithmetic oracle; only summation
order can differ (≤1e-12 relative), absorbed by result rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(_d(a), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(_d(a), _d(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def unit_dot(a: Column, b: Column) -> Column:
    """Dot product of two already-double, already-normalized arrays — the
    per-pair kernel after pre-normalization. No casts, no norm recomputation:
    for a candidate join with P pairs over N rows this turns O(3·P) array
    sweeps (dot + both norms) into O(P) + O(N) normalization sweeps."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def with_unit_embedding(df, src: str = "embedding", dst: str = "unit"):
    """Add a pre-normalized double copy of ``src`` (one norm per ROW, so
    pairwise cosine downstream is a single zip_with sweep via unit_dot)."""
    return df.withColumn("_norm", norm(F.col(src))).withColumn(
        dst, F.transform(F.col(src), lambda x: x.cast("double") / F.col("_norm"))
    ).drop("_norm")


def sign_bucket(a: Column, n_dims: int = 6) -> Column:
    """Deterministic sign-pattern LSH bucket: '+'/'-' per leading dimension.

    A data-independent random-hyperplane surrogate (axis-aligned planes), so
    the same bucketing is computable in any engine; bucket-join turns an
    O(n²) similarity scan into per-bucket candidate sets.
    """
    signs = F.transform(
        F.slice(_d(a), 1, n_dims), lambda x: F.when(x >= 0, F.lit("+")).otherwise(F.lit("-"))
    )
    return F.concat_ws("", signs)
