"""As-of (temporal point-in-time) join — an operator Spark lacks natively.

For every left row, attach the payload of the LATEST right row in the same
key group whose timestamp is at or before the left row's timestamp (the
``backward`` direction of a point-in-time lookup: trade→quote matching,
event attribution, slowly-changing-dimension versioning).

Spark has no ASOF JOIN physical operator, and the naive encodings fall over
at scale: a range join (``l.ts >= r.ts``) explodes into O(|L|·|R|/keys)
intermediate pairs before the per-row max, and a windowed subquery per left
row re-scans the right side. The classic scalable encoding — what a
merge-based ASOF join does natively — is UNION + ORDER + LAST:

1. tag both sides and union them on a common schema;
2. one hash shuffle on the key, one sort by (ts, side) within the key;
3. carry the most recent right-side payload forward with
   ``last(payload, ignorenulls=True)`` over rows UNBOUNDED PRECEDING..CURRENT;
4. keep only the left rows.

Cost: ONE shuffle + ONE sort over |L| + |R| rows — linear, skew-tolerant
(AQE can split a hot key's sort), and with no pair explosion, so the same
plan holds on a 100 TB event stream. Right rows sort BEFORE left rows at
equal timestamps, giving inclusive (``right_ts <= left_ts``) semantics —
identical to DuckDB's ``ASOF LEFT JOIN ... ON l.ts >= r.ts``, which the
parity suite uses as the oracle.

The right-side payload travels as ONE struct column, so a legitimately-NULL
payload field on the matched row stays NULL instead of leaking an older
row's value through ``ignorenulls`` (per-column fill would mix rows).

Ties among right rows with identical (key, ts) are resolved by union order,
which is not deterministic under shuffles — pre-deduplicate the right side
to one row per (key, ts) if the source can contain such ties.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
) -> DataFrame:
    """Backward as-of join: left ⟕ latest right row with right_ts <= left_ts.

    ``right`` must contain the key column(s), ``right_ts``, and any payload
    columns; all non-key right columns (including ``right_ts``) are appended
    to every left row, NULL where no right row precedes the left row.
    Column names must not collide between the two frames (rename first).
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload_cols = [c for c in right.columns if c not in keys]
    payload_t = right.select(F.struct(*payload_cols).alias("_p")).schema["_p"].dataType

    l2 = left.select(
        *left.columns,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(payload_t).alias("_p"),
    )
    r2 = right.select(
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns if c not in keys],
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*payload_cols).alias("_p"),
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l2.unionByName(r2).withColumn("_match", F.last("_p", ignorenulls=True).over(w))
    return filled.where(F.col("_side") == 1).select(
        *left.columns, *[F.col(f"_match.{c}").alias(c) for c in payload_cols]
    )
