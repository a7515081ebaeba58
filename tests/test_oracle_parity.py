"""Engine-vs-oracle parity harness — mirrors the driver's correctness gate.

For every registered query with an oracle, run the Spark plan and the DuckDB
SQL over the same parquet tables and compare row count, column-name set, and
order-insensitive values (exact on non-floats, 1e-9 on floats — stricter than
the driver's post-rounding hash, so local green implies driver green).
"""

from __future__ import annotations

import datetime
import math
import os
from decimal import Decimal

import duckdb
import pytest

from aws_flight_data_pipeline_spark.plans.registry import REGISTRY, _ensure_loaded
from aws_flight_data_pipeline_spark.sources.testdata import TABLES

_ensure_loaded()

WITH_ORACLE = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def _rows(df_pandas, cols):
    return [tuple(_norm(v) for v in row) for row in df_pandas[cols].itertuples(index=False)]


def _sort_key(row):
    return tuple((v is None, str(type(v)), str(v)) for v in row)


def _values_equal(a, b) -> bool:
    if a is None or b is None:
        return a is b or a == b
    if isinstance(a, float) and isinstance(b, (float, int)):
        return math.isclose(a, float(b), rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(b, float) and isinstance(a, int):
        return math.isclose(float(a), b, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir).toPandas()
    con = _duck(sf_dir)
    odf = con.execute(spec.oracle).fetchdf()
    con.close()

    s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
    assert s_cols == o_cols, f"{name}: column mismatch spark={s_cols} oracle={o_cols}"
    assert len(sdf) == len(odf), f"{name}: row count spark={len(sdf)} oracle={len(odf)}"

    s_rows = sorted(_rows(sdf, s_cols), key=_sort_key)
    o_rows = sorted(_rows(odf, o_cols), key=_sort_key)
    mismatches = []
    for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
        if not all(_values_equal(a, b) for a, b in zip(sr, orow)):
            mismatches.append((i, sr, orow))
            if len(mismatches) >= 5:
                break
    assert not mismatches, f"{name}: value mismatches (cols={s_cols}): {mismatches}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert len(df.schema.fields) > 0
