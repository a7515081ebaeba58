"""DDSketch quantile-profile contracts on planted distributions.

Cross-engine parity (binning, walk, flags vs DuckDB) is covered by
tests/test_oracle_parity.py; these tests pin the numerical CONTRACT on
distributions the synthetic orders table doesn't exercise: a 4-decade
log-spread and a heavy right tail, where an equi-width histogram's p99
would be off by orders of magnitude but the relative-error guarantee
(|est - exact| <= alpha * exact) must still hold.
"""

from __future__ import annotations

import math

import pytest

from aws_flight_data_pipeline_spark.plans.registry import resolve
from aws_flight_data_pipeline_spark.plans.sketch_queries import _DD_ALPHA


def _write_orders(spark, path: str, rows) -> None:
    spark.createDataFrame(rows, "o_orderstatus string, o_totalprice double").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{path}/orders.parquet")


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("planted_quantiles"))
    rows = []
    # status A: 4 decades of log-spaced values, 1.0 .. 10^4
    rows += [("A", 10.0 ** (i / 1000.0)) for i in range(4001)]
    # status B: heavy right tail — 98% at ~1.0, 2% at ~1e6 (the p99 rank,
    # ceil(0.99 * 1000) = 990, must land inside the outlier band)
    rows += [("B", 1.0 + (i % 7) * 0.001) for i in range(980)]
    rows += [("B", 1e6 + i) for i in range(20)]
    _write_orders(spark, d, rows)
    return d


@pytest.fixture(scope="module")
def profile(spark, planted_dir):
    out = resolve("sketch_quantile_profile")(spark, planted_dir).collect()
    return {r["scope"]: r.asDict() for r in out}


def test_within_alpha_on_log_spread_and_heavy_tail(profile):
    assert set(profile) == {"A", "B", "GLOBAL"}
    for scope, row in profile.items():
        assert row["within_alpha_all"] == 1, f"{scope}: {row}"
        for p in (50, 95, 99):
            est, exact = row[f"q{p}_est"], row[f"q{p}_exact"]
            assert abs(est - exact) <= _DD_ALPHA * exact + 1e-4, (scope, p, est, exact)


def test_heavy_tail_p99_is_not_flattened(profile):
    """The skew case an equi-width histogram loses: B's p99 sits in the 1e6
    outlier band, 6 decades above its median — both must be resolved."""
    b = profile["B"]
    assert b["q50_exact"] < 2.0 and b["q99_exact"] > 1e6
    assert abs(b["q99_est"] - b["q99_exact"]) <= _DD_ALPHA * b["q99_exact"]


def test_global_is_the_merge_of_per_status_sketches(profile):
    assert profile["GLOBAL"]["n_rows"] == profile["A"]["n_rows"] + profile["B"]["n_rows"]
    # bucket sets overlap, so merged bucket count is bounded by the parts
    assert profile["GLOBAL"]["n_buckets"] <= (
        profile["A"]["n_buckets"] + profile["B"]["n_buckets"]
    )
    assert profile["GLOBAL"]["within_alpha_all"] == 1


def test_sketch_state_is_small(profile):
    """The 100 TB story: state per scope is O(buckets-spanned), not O(rows).
    4 decades at alpha=1% is ~decades * ln(10)/ln(gamma) ~= 115 buckets/decade."""
    per_decade = math.log(10) / math.log((1 + _DD_ALPHA) / (1 - _DD_ALPHA))
    assert profile["A"]["n_buckets"] <= 4.1 * per_decade + 2
    assert profile["B"]["n_buckets"] < 100  # two tight clusters, not 1e6 buckets
