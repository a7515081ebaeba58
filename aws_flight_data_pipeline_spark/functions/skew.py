"""Skew-mitigation helpers: salted two-phase aggregation.

The reference never needs these (Athena hides skew handling); at 100 TB a
groupBy on a skewed key (one country carrying half the traffic, one hot
event_type) concentrates a shuffle partition on one task. AQE's skew-join
splitting handles JOIN skew automatically; skewed AGGREGATION keys are
handled here by the classic salt→partial→merge rewrite:

    groupBy(k).agg(f)  ≡  groupBy(k, salt).agg(partial f) → groupBy(k).agg(merge)

Works for any algebraic aggregate (sum/count/min/max and anything composed of
them, e.g. avg = sum/count). The first shuffle spreads each hot key over
``n_salts`` reducers; the second shuffles only ``n_groups × n_salts`` rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, col_name: str = "_salt") -> DataFrame:
    """Add a uniform salt column. Deterministic (hash of all columns, not
    rand()) so retried tasks and oracle comparisons see identical salting —
    spreading quality is equivalent for skew purposes."""
    return df.withColumn(col_name, F.pmod(F.hash(*df.columns), F.lit(n_salts)))


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value: str | Column,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted sum+count per key → columns ``sum_value, cnt, avg_value``.

    The building block for skew-proof sum/count/avg on a hot-keyed groupBy;
    results are bit-equal to the direct groupBy (summation order aside).
    """
    v = F.col(value) if isinstance(value, str) else value
    partial = (
        with_salt(df, n_salts)
        .groupBy(*keys, "_salt")
        .agg(F.sum(v).alias("_psum"), F.count(v).alias("_pcnt"))
    )
    return (
        partial.groupBy(*keys)
        .agg(F.sum("_psum").alias("sum_value"), F.sum("_pcnt").alias("cnt"))
        .withColumn("avg_value", F.col("sum_value") / F.col("cnt"))
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    n_salts: int = 16,
) -> DataFrame:
    """Skew-proof fact×dim equi-join via salt-and-replicate.

    AQE splits skewed SORT-MERGE join partitions, but cannot help when the
    join must stay hash-partitioned for a downstream co-partitioned aggregate
    or when runtime stats are unavailable (first run, streaming micro-batch).
    The classic manual rewrite: salt the fact side uniformly, replicate every
    dim row once per salt (explode of a ``sequence`` — dim×n_salts rows, fine
    for dimension-sized tables), and join on (key…, salt). Each hot key's
    rows spread over ``n_salts`` reducers instead of one.

    Result equals ``fact.join(dim, on)`` row-for-row (asserted in
    tests/test_skew_join.py). Column sets must be disjoint apart from the
    join key(s).
    """
    keys = [on] if isinstance(on, str) else list(on)
    f = fact.withColumn("_salt", F.pmod(F.hash(*fact.columns), F.lit(n_salts)))
    d = dim.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return f.join(d, [*keys, "_salt"]).drop("_salt")
