"""Binned point-in-interval join — the non-equi join Spark would otherwise
execute as a broadcast-nested-loop / cartesian filter.

The reference's analytics layer expresses time-window correlation as SQL
BETWEEN joins (the proximity patterns in ``sql/athena/04_analytical_
queries.sql``; Athena/Presto plans them as partitioned hash joins on the
equi part THEN filters). Spark has no range-join optimizer rule, so a
``p BETWEEN s AND e`` join with only a key equality degenerates at scale:
every (key,) pair is a candidate. This operator applies the standard
bin-decomposition rewrite:

1. Every interval row is exploded to one row per fixed-width bin it
   overlaps (``sequence(floor(s/w), floor(e/w))`` — replication factor is
   ``len/w + 1``, so pick ``bin_width`` near the typical interval length).
2. Every point row maps to exactly ONE bin (``floor(p/w)``).
3. An equi shuffle join on ``(*keys, _bin)`` finds candidates; the exact
   ``s <= p <= e`` predicate filters them.

A matching pair is emitted exactly once with no dedup step: the join can
only succeed in the point's single bin (the interval covers that bin by
construction). Shuffle volume is O(points + intervals·replication), never
O(points × intervals); per-bin locality also bounds the hash-table build
per task — the plan that survives 100 TB where the BNLJ does not.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BIN = "__rj_bin"


def bin_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    keys: Sequence[str] = (),
) -> DataFrame:
    """INNER join of ``points`` rows to every ``intervals`` row whose
    inclusive ``[start_col, end_col]`` range contains ``point_col``
    (equal ``keys`` required on both sides). Columns from both inputs
    survive; the helper bin column does not.

    Inputs must not already share ambiguous column names beyond ``keys``;
    ``bin_width`` is in the units of the three bound columns (use integer
    epoch micros for timestamps — integer bin math is exact). Negative- or
    zero-length intervals (``end < start``) match nothing and are dropped
    before the explode (``sequence`` would otherwise count DOWN and
    fabricate bins).
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    bw = int(bin_width)

    def to_bin(col_name: str) -> Column:
        # floor-divide that is exact for negatives too: pmod snaps to the
        # largest multiple of w <= v, and SQL `div` is bigint-in/bigint-out
        # integer division — the bin index NEVER transits a double (Column
        # `/` would, and doubles lose integer exactness past 2^53)
        return F.expr(
            f"CAST((CAST({col_name} AS BIGINT)"
            f" - pmod(CAST({col_name} AS BIGINT), {bw})) div {bw} AS BIGINT)"
        )

    iv = intervals.where(F.col(end_col) >= F.col(start_col)).withColumn(
        _BIN,
        F.explode(F.sequence(to_bin(start_col), to_bin(end_col))),
    )
    pt = points.withColumn(_BIN, to_bin(point_col))
    on = [*keys, _BIN]
    return (
        pt.join(iv, on=on, how="inner")
        .where(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop(_BIN)
    )
