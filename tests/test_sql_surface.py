"""SQL front-end surface: the engine is equally drivable through spark.sql.

The DataFrame registry is the primary API, but a user of the reference's
Athena surface writes SQL — so the portable (ANSI-subset) oracle strings must
run UNCHANGED through ``spark.sql`` over the registered temp views and
produce the registry query's own result. This pins (a) ``load_tables``'s view
registration, and (b) that those plans stay expressible in Spark SQL — the
two halves of "switch your SQL workload to this engine".

Only oracles written in the portable subset qualify (most use DuckDB-specific
list functions); the suite covers one per operator family.
"""

from __future__ import annotations

import pytest

from aws_flight_data_pipeline_spark.plans.registry import BUILDER_SPECS, REGISTRY, _ensure_loaded
from aws_flight_data_pipeline_spark.sources.testdata import load_tables

_ensure_loaded()

# Every oracle written in the ANSI-portable subset (verified: parses and runs
# on Spark SQL unchanged) — one or more per operator family: aggregation,
# profiles, dim/left/band joins, window latest-per-key, z-score stats join,
# grouping sets, top-k, scalar/datetime suites, skew aggregate, sequence
# dedup, sequence packing, geo zones, vector LSH buckets.
PORTABLE = (
    "pricing_summary",
    "quality_score_profile",
    "order_status_profile",
    "anomaly_geo_zones",
    "rollup_subtotals",
    "dim_join_rollup",
    "left_join_missing_dim",
    "band_proximity_join",
    "latest_order_per_customer",
    "zscore_anomalies",
    "topk_line_items",
    "datetime_function_suite",
    "case_bucketing",
    "salted_skew_aggregate",
    "seq_dedup_keep_best",
    "doc_pack_sequences",
    # vector_lsh_sign_buckets parses on Spark SQL but DuckDB's 1-based list
    # slicing reads different signature elements — dialect-divergent, excluded
    # round-6 builders whose oracles stay in the portable subset:
    "multiway_join_revenue",
    "pivot_unpivot_roundtrip",
)


def _norm(v):
    # Spark SQL types decimal literals as DECIMAL where the DataFrame plan
    # (and DuckDB) use DOUBLE — numerically identical, so widen for compare
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    return v


@pytest.mark.parametrize("name", PORTABLE)
def test_oracle_sql_runs_on_spark_and_matches_dataframe_plan(spark, sf_dir, name):
    spec = REGISTRY.get(name) or BUILDER_SPECS[name]
    load_tables(spark, sf_dir)
    via_sql = spark.sql(spec.oracle)
    via_df = spec.fn(spark, sf_dir)
    cols = sorted(via_df.columns)
    assert sorted(via_sql.columns) == cols
    s_rows = sorted((tuple(_norm(v) for v in r) for r in via_sql.select(*cols).collect()), key=repr)
    d_rows = sorted((tuple(_norm(v) for v in r) for r in via_df.select(*cols).collect()), key=repr)
    assert s_rows == d_rows
