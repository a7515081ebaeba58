"""null_semantics_suite's key-grain pair counts vs the engine's row-grain
joins (r14 batch 6).

The suite's two pair-count subqueries were factored from row-grain joins
(COUNT(*) over every matched pair) to key-grain joins (SUM(cnt_l * cnt_r)
over per-side key counts, the NULL-key group riding the join). The DuckDB
oracle pins the registered output; THIS test pins the semantic claim the
factorization rests on — that for every pair-count form the engine's own
row-grain `=` / `<=>` joins produce the identical number — on a planted
corpus that arms all the NULL corners harder than the testdata does
(multiple NULLs per side, keys unique to each side, a key with skewed
multiplicity). If Spark's three-valued join semantics ever drifted, or the
factorization mis-handled the NULL group, the two grains would disagree
here before the oracle could say why.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _plant(spark):
    # (id, k): NULL keys on both sides, key 1 skewed 3x2, key 2 balanced,
    # keys 3 / 4 unique to one side each
    l = spark.createDataFrame(
        [(1, None), (2, None), (3, 1), (4, 1), (5, 1), (6, 2), (7, 3)],
        "id int, k int",
    )
    r = spark.createDataFrame(
        [(1, None), (2, 1), (3, 1), (4, 2), (5, 4)],
        "id int, k int",
    )
    return l, r


def _row_grain(spark, l, r) -> dict:
    l.createOrReplaceTempView("_nsf_l")
    r.createOrReplaceTempView("_nsf_r")
    row = spark.sql(
        """
        SELECT
          (SELECT COUNT(*) FROM _nsf_l l JOIN _nsf_r r ON l.k = r.k) AS eq,
          (SELECT COUNT(*) FROM _nsf_l l JOIN _nsf_r r ON l.k <=> r.k) AS ns
        """
    ).first()
    return {"eq": row["eq"], "ns": row["ns"]}


def _key_grain(spark, l, r) -> dict:
    lc = l.groupBy("k").agg(F.count("*").alias("cnt"))
    rc = r.groupBy("k").agg(F.count("*").alias("cnt"))
    lc.createOrReplaceTempView("_nsf_lk")
    rc.createOrReplaceTempView("_nsf_rk")
    row = spark.sql(
        """
        SELECT
          (SELECT COALESCE(SUM(l.cnt * r.cnt), 0)
             FROM _nsf_lk l JOIN _nsf_rk r ON l.k = r.k) AS eq,
          (SELECT COALESCE(SUM(l.cnt * r.cnt), 0)
             FROM _nsf_lk l JOIN _nsf_rk r ON l.k <=> r.k) AS ns
        """
    ).first()
    return {"eq": row["eq"], "ns": row["ns"]}


def test_key_grain_pair_counts_match_row_grain_joins(spark):
    l, r = _plant(spark)
    row = _row_grain(spark, l, r)
    key = _key_grain(spark, l, r)
    assert row == key
    # hand-derived ground truth: eq = 3*2 (k=1) + 1*1 (k=2) = 7;
    # null-safe adds the 2*1 NULL-group product = 9
    assert row == {"eq": 7, "ns": 9}


def test_null_group_is_load_bearing_on_both_grains(spark):
    """Strip the NULL rows and both grains must converge to the equi
    count — proving the null-safe surplus in the test above comes from
    the engine matching genuinely NULL keys, on either grain."""
    l, r = _plant(spark)
    l2, r2 = l.where(F.col("k").isNotNull()), r.where(F.col("k").isNotNull())
    row = _row_grain(spark, l2, r2)
    key = _key_grain(spark, l2, r2)
    assert row == key == {"eq": 7, "ns": 7}
