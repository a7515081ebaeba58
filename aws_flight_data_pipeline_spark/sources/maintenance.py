"""Lake maintenance: small-file audit + compaction.

At 100 TB the lake's dominant operational failure mode is not a wrong query
plan — it is file-count pathology: streaming micro-batches and per-executor
writers leave thousands of KB-sized parquet files per partition, and every
subsequent scan pays a task per file (plus a footer read and an object-store
request). The reference ships this concern as its optimization guide's
storage recommendations (`sql/athena/07_optimization_guide.sql:384-447`:
file-count/size statistics per partition and a "compact small files"
recommendation class); here it is a first-class operator triple:

1. ``lake_file_audit`` — per-file rows (file, partition, bytes, row_count).
   Row counts come from ONE distributed scan grouped by ``input_file_name()``
   (never a per-file driver loop); byte sizes come from a recursive Hadoop
   FileSystem listing (works on file://, hdfs://, s3a:// alike) that returns
   one metadata row per file — catalog-sized, not data-sized.
2. ``compaction_plan`` — per-partition verdicts: file count, bytes, the
   target file count at ``target_bytes``, and a needs_compaction flag.
3. ``compact`` — rewrite one partition directory to ``ceil(bytes/target)``
   files via ``repartition(n)``. Partition-at-a-time is deliberate: it is
   idempotent, retry-safe, and parallelizable across partitions by the
   caller, which is how table services (Delta OPTIMIZE, Iceberg rewrite)
   schedule the same work.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _list_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """Recursive (path, bytes) listing, driver-side, one tuple per data file.

    Contract: uses the Hadoop FileSystem API through the py4j gateway when
    the session has one (classic PySpark — scheme-agnostic, covers object
    stores); under Spark Connect (``spark._jvm`` absent) it degrades to a
    local-filesystem walk, which covers every ``file://`` lake this repo's
    maintenance tooling targets. Object-store audits require classic mode.
    """
    jvm = getattr(spark, "_jvm", None)
    out: list[tuple[str, int]] = []
    if jvm is not None:
        conf = spark._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(conf)
        it = fs.listFiles(p, True)
        while it.hasNext():
            st = it.next()
            name = st.getPath().toUri().getPath()
            if not name.rsplit("/", 1)[-1].startswith("_"):
                out.append((name, st.getLen()))
        return out
    for root, _dirs, files in os.walk(path.removeprefix("file://")):
        for fn in files:
            if not fn.startswith("_"):
                fp = os.path.join(root, fn)
                out.append((fp, os.path.getsize(fp)))
    return out


def _strip_scheme(col):
    return F.regexp_replace(col, r"^[a-z0-9.+-]+:/+", "/")


def lake_file_audit(spark: SparkSession, path: str) -> DataFrame:
    """Per-file audit of a parquet lake: file, partition dir, bytes, rows."""
    sizes = spark.createDataFrame(_list_files(spark, path), "file string, bytes long")
    rows = (
        spark.read.parquet(path)
        .groupBy(_strip_scheme(F.input_file_name()).alias("file"))
        .agg(F.count("*").alias("row_count"))
    )
    base = path.rstrip("/")
    # literal (non-regex) root strip — lake paths may contain regex metachars
    part = F.replace(F.regexp_extract("file", r"^(.*)/[^/]+$", 1), F.lit(base), F.lit(""))
    return (
        sizes.join(rows, "file", "left")
        .na.fill({"row_count": 0})
        .withColumn("partition", F.regexp_replace(part, r"^/", ""))
        .select("file", "partition", "bytes", "row_count")
    )


def compaction_plan(audit: DataFrame, target_bytes: int = 128 * 1024 * 1024) -> DataFrame:
    """Per-partition compaction verdicts from a ``lake_file_audit`` frame.

    A partition needs compaction when it holds more files than its data
    justifies at ``target_bytes`` per file (strictly more than the target
    count — a partition already at its ideal layout is left alone).
    """
    return (
        audit.groupBy("partition")
        .agg(
            F.count("*").alias("file_count"),
            F.sum("bytes").alias("total_bytes"),
            F.sum("row_count").alias("total_rows"),
            F.min("bytes").alias("min_file_bytes"),
            F.max("bytes").alias("max_file_bytes"),
        )
        .withColumn(
            "target_file_count",
            F.greatest(F.lit(1), F.ceil(F.col("total_bytes") / F.lit(target_bytes))),
        )
        .withColumn("needs_compaction", F.col("file_count") > F.col("target_file_count"))
    )


def compact(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_bytes: int = 128 * 1024 * 1024,
    cluster_by: tuple[str, str] | None = None,
) -> int:
    """Rewrite one partition directory's parquet to ~target-sized files.

    Returns the file count written. Sizing uses the SOURCE bytes (compressed
    parquet), so output files land near ``target_bytes`` — the round-number
    heuristic every table service uses; exactness is not the point, escaping
    the many-small-files regime is.

    ``cluster_by=(col_a, col_b)`` Z-orders the rewrite (the OPTIMIZE
    ZORDER composition): the compaction shuffle you were paying anyway
    becomes a range exchange on the Morton key, so the rewritten files get
    tight min/max stats on BOTH clustering columns for free — same job
    cost, strictly better layout for 2-D box queries
    (:mod:`..operators.layout`).
    """
    total = sum(b for _, b in _list_files(spark, src_path))
    n = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(src_path)
    if cluster_by is not None:
        from aws_flight_data_pipeline_spark.operators.layout import zorder_key

        df = (
            zorder_key(df, *cluster_by)
            .repartitionByRange(n, F.col("_z"))
            .sortWithinPartitions("_z")
            .drop("_z")
        )
    else:
        df = df.repartition(n)
    (
        df.write.mode("overwrite")
        .option("compression", "snappy")
        .parquet(dst_path)
    )
    return n


def schema_drift_audit(spark: SparkSession, path: str) -> DataFrame:
    """Per-file schema drift report for a parquet lake written over time.

    Schema evolution (a writer adding/dropping/retyping columns) is invisible
    to a plain scan until ``mergeSchema`` blows up a query or silently nulls
    a column; the audit makes it explicit: one row per (file, field) with the
    field's parquet type, so drift shows up as fields whose file-count
    differs from the lake's file total (added/dropped) or whose type set has
    more than one member (retyped).

    Scale shape: footers are read on EXECUTORS — the driver only lists file
    paths (catalog-sized); ``mapInPandas`` fans the footer reads out in Arrow
    batches, so a million-file lake costs a million footer reads spread
    across the cluster, never a driver loop. The summary is one hash
    aggregate over (field, type).
    """
    from pyspark.sql.types import StructType

    files = [f for f, _ in _list_files(spark, path) if f.endswith(".parquet")]
    n_files = len(files)
    fdf = spark.createDataFrame([(f,) for f in files], "file string").repartition(
        min(max(n_files // 64, 1), 256)
    )

    def _read_footers(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for f in pdf["file"]:
                schema = pq.read_schema(f)
                for name, typ in zip(schema.names, schema.types):
                    rows.append((f, name, str(typ)))
            yield pd.DataFrame(rows, columns=["file", "field", "ptype"])

    out_schema = StructType.fromDDL("file string, field string, ptype string")
    per_file = fdf.mapInPandas(_read_footers, out_schema)
    return (
        per_file.groupBy("field", "ptype")
        .agg(F.countDistinct("file").cast("bigint").alias("files_with_field"))
        .withColumn("lake_files", F.lit(n_files).cast("bigint"))
        .withColumn("drift", F.col("files_with_field") != F.col("lake_files"))
        .orderBy("field", "ptype")
    )
