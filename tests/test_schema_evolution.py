"""Write-time schema enforcement + additive evolution for the versioned
table: type flips are rejected BEFORE any data lands, added columns read
back as NULL for pre-evolution files (and vice versa for omitted ones),
maintenance commits carry the schema record, and rollback across an
evolution restores the old schema."""

from __future__ import annotations

import pytest

from aws_flight_data_pipeline_spark.sources import versioned as vt


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "id bigint, tag string, score double"
    )


def test_append_type_flip_rejected_before_write(spark, tmp_path):
    path = str(tmp_path / "t")
    v0 = vt.commit(_base(spark), path)
    bad = spark.createDataFrame([(3, 7, 30.0)], "id bigint, tag bigint, score double")
    with pytest.raises(vt.SchemaMismatch, match="tag"):
        vt.commit(bad, path, mode="append")
    # the table is untouched: same head, same rows, and the rejected
    # write left no data directory behind (fail-fast happens pre-write)
    assert vt.latest_version(path) == v0
    assert vt.read(spark, path).count() == 2
    import os

    data_dir = os.path.join(path, "data")
    assert len(os.listdir(data_dir)) == 1  # only v0's txn dir


def test_additive_column_evolution_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    vt.commit(_base(spark), path)
    widened = spark.createDataFrame(
        [(3, "c", 30.0, "en")], "id bigint, tag string, score double, lang string"
    )
    vt.commit(widened, path, mode="append")
    rows = {r["id"]: r["lang"] for r in vt.read(spark, path).collect()}
    assert rows == {1: None, 2: None, 3: "en"}
    # the evolved schema is the table schema now: a third append may use
    # the new column but must keep its type
    worse = spark.createDataFrame([(4, "d", 1.0, 5)], "id bigint, tag string, score double, lang bigint")
    with pytest.raises(vt.SchemaMismatch, match="lang"):
        vt.commit(worse, path, mode="append")


def test_omitted_columns_read_back_null(spark, tmp_path):
    path = str(tmp_path / "t")
    vt.commit(_base(spark), path)
    narrow = spark.createDataFrame([(9, "z")], "id bigint, tag string")
    vt.commit(narrow, path, mode="append")
    got = {r["id"]: r["score"] for r in vt.read(spark, path).collect()}
    assert got == {1: 10.0, 2: 20.0, 9: None}


def test_maintenance_commits_carry_schema(spark, tmp_path):
    path = str(tmp_path / "t")
    vt.commit(_base(spark), path, stats_cols=("id",))
    vt.delete_where(spark, path, {"id": (2, 2)})
    head = vt.latest_version(path)
    m = vt._read_manifest(path, head)
    assert m["mode"] == "delete"
    assert {c["name"] for c in m["schema"]} == {"id", "tag", "score"}
    # and enforcement still works against the inherited record
    bad = spark.createDataFrame([(3, 7, 1.0)], "id bigint, tag bigint, score double")
    with pytest.raises(vt.SchemaMismatch):
        vt.commit(bad, path, mode="append")


def test_merge_records_evolved_schema(spark, tmp_path):
    # a MERGE that adds source-only columns (additive evolution through
    # unionByName allowMissingColumns) must RECORD the evolved schema in
    # its manifest — inheriting the parent's verbatim would let a later
    # append re-introduce the same column at a conflicting type
    path = str(tmp_path / "t")
    vt.commit(_base(spark), path, stats_cols=("id",))
    src = spark.createDataFrame(
        [(2, "b2", 21.0, "en"), (5, "e", 50.0, "fr")],
        "id bigint, tag string, score double, lang string",
    )
    vt.merge_into(spark, path, src, on=("id",))
    m = vt._read_manifest(path, vt.latest_version(path))
    assert m["mode"] == "merge"
    assert {c["name"] for c in m["schema"]} == {"id", "tag", "score", "lang"}
    bad = spark.createDataFrame(
        [(9, "x", 1.0, 7)], "id bigint, tag string, score double, lang bigint"
    )
    with pytest.raises(vt.SchemaMismatch, match="lang"):
        vt.commit(bad, path, mode="append")


def test_insert_only_merge_records_evolved_schema(spark, tmp_path):
    # the append-shaped merge branch (nothing matched) evolves the same way
    path = str(tmp_path / "t")
    vt.commit(_base(spark), path, stats_cols=("id",))
    src = spark.createDataFrame(
        [(50, "z", 5.0, "de")], "id bigint, tag string, score double, lang string"
    )
    vt.merge_into(spark, path, src, on=("id",))
    m = vt._read_manifest(path, vt.latest_version(path))
    assert {c["name"] for c in m["schema"]} == {"id", "tag", "score", "lang"}


def test_rollback_restores_pre_evolution_schema(spark, tmp_path):
    path = str(tmp_path / "t")
    v0 = vt.commit(_base(spark), path)
    widened = spark.createDataFrame(
        [(3, "c", 30.0, "en")], "id bigint, tag string, score double, lang string"
    )
    vt.commit(widened, path, mode="append")
    v2 = vt.rollback(path, v0)
    m = vt._read_manifest(path, v2)
    assert {c["name"] for c in m["schema"]} == {"id", "tag", "score"}
    assert "lang" not in vt.read(spark, path).columns
