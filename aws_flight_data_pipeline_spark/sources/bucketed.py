"""Bucketed (hash-clustered) table layout: shuffle-free co-located joins.

The lake writers partition by time (``sources/sinks.py``) which prunes
scans, but every key join over those files still shuffles both sides. For
the joins a warehouse runs REPEATEDLY on the same key — fact-to-dim on
customer id, fact-to-fact on order id — the shuffle can be paid ONCE at
write time instead of on every query: ``bucketBy(n, key)`` hash-clusters
files so both sides of an equi join arrive pre-partitioned, and
``sortBy(key)`` pre-sorts within each bucket so the sort-merge join needs
no sort either. At 100 TB this converts the dominant per-query exchange
(the whole fact table over the wire) into a metadata property of the
layout; equality point-predicates additionally prune to a single bucket
per side (SelectedBucketsCount in the scan).

Reference analog: the partition-projection DDL exists to make Athena
scans layout-aware (sql/athena/02_create_raw_tables.sql:47-94); bucketing
is the same idea applied to the JOIN key instead of the time axis.

Bucketed output requires the session catalog (``saveAsTable``) — plain
``.parquet(path)`` writes lose the bucket spec. Tables are written as
EXTERNAL (explicit ``path``) so data placement stays the caller's choice.

Two reader-side switches govern how much of the layout Spark exploits
(pinned in tests/test_bucketed_join.py):

- ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` makes the
  scan REPORT the sortBy order, eliding the sort-merge join's per-query
  Sort. Off by default since 3.0 because a bucket split across files
  would need a merge-read; ``write_bucketed`` guarantees one file per
  bucket (repartition onto the bucket spec), which is exactly the layout
  the flag is safe on.
- ``spark.sql.sources.bucketing.autoBucketedScan.enabled=false`` for
  point-lookup workloads: the auto rule drops the bucketed scan when no
  join/agg wants the clustering, and equality-predicate BUCKET PRUNING
  (read 1/N of the table) is lost with it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    keys: tuple[str, ...] | list[str],
    n_buckets: int,
    path: str,
    sorted_within: bool = True,
) -> None:
    """Write ``df`` as an external bucketed parquet table named ``name``.

    ``n_buckets`` must match across every table meant to join shuffle-free
    (Spark only elides the exchange when both sides cluster identically).
    ``sorted_within`` additionally pre-sorts each bucket file on the keys,
    eliding the sort-merge join's per-query Sort as well.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    keys = list(keys)
    # one FILE per bucket: repartition onto the bucket spec (same murmur3
    # hash, same modulus) so each write task owns exactly one bucket.
    # Multiple files per bucket are individually sorted but not globally,
    # and Spark then re-Sorts every read — silently forfeiting sortBy.
    df = df.repartition(n_buckets, *[df[k] for k in keys])
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, keys[0], *keys[1:])
    )
    if sorted_within:
        writer = writer.sortBy(keys[0], *keys[1:])
    writer.saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table through the catalog (the bucket spec only
    survives a catalog read — ``spark.read.parquet`` on the same files
    forgets it and joins shuffle again)."""
    return spark.table(name)


def drop_bucketed(spark: SparkSession, name: str) -> None:
    """Drop the catalog entry. External data files are left in place."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
