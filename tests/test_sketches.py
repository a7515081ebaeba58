"""Cross-checks for the pure-Python Count-Min sketch prober
(functions/sketches.py) against the JVM implementation it mirrors, plus the
laziness contract of the sketch_heavy_hitters builder.

The serialization gotcha these tests exist to catch: CountMinSketch V1 writes
the ``hashA`` long array (depth entries) BETWEEN the header and the counter
table; a reader that parses the table at offset 20 returns hashA values as
counters and estimates ~0 for every present item. The single-item sketch test
fails immediately under that bug.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_flight_data_pipeline_spark.functions.sketches import (
    CountMinSketchReader,
    cms_estimate,
    murmur3_x86_32,
)

EPS, CONF, SEED = 0.001, 0.99, 42


def _sketch_bytes(spark, tokens):
    df = spark.createDataFrame([(t,) for t in tokens], "token string")
    row = df.agg(
        F.count_min_sketch("token", F.lit(EPS), F.lit(CONF), F.lit(SEED)).alias("cms")
    ).first()
    return bytes(row["cms"])


def test_single_item_sketch_roundtrip(spark):
    # the minimal case that catches the hashA table-offset bug: one item,
    # count must read back as exactly 1 (and total_count as 1)
    blob = _sketch_bytes(spark, ["hello"])
    r = CountMinSketchReader(blob)
    assert r.total_count == 1
    assert r.estimate_count("hello") == 1


def test_python_prober_matches_jvm_estimates(spark):
    # the claimed cross-check: every probe (present AND absent items) must
    # equal the JVM's estimateCount bit-for-bit. spark._jvm is fine HERE —
    # this test pins the Python prober precisely so production plans never
    # need the gateway.
    tokens = [f"tok{i}" for i in range(200) for _ in (range(i % 7 + 1))]
    blob = _sketch_bytes(spark, tokens)
    ours = CountMinSketchReader(blob)
    jvm = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(blob)
    assert ours.total_count == jvm.totalCount()
    assert ours.depth == jvm.depth()
    assert ours.width == jvm.width()
    probes = [f"tok{i}" for i in range(210)] + ["", "absent", "tok", "0kot"]
    for p in probes:
        assert ours.estimate_count(p) == jvm.estimateCount(p), p


def test_estimates_hold_cms_contract(spark):
    # ground truth without the JVM: never underestimate, overestimate by at
    # most ceil(eps * stream length); at this scale width >> tokens so the
    # estimates are exact
    counts = {f"w{i}": i + 1 for i in range(50)}
    stream = [t for t, c in counts.items() for _ in range(c)]
    r = CountMinSketchReader(_sketch_bytes(spark, stream))
    assert r.total_count == len(stream)
    for t, c in counts.items():
        assert r.estimate_count(t) == c


def test_murmur3_tail_handling():
    # lengths 0..8 cover aligned and 1/2/3-byte tails incl. sign-extension
    # (0x80+ bytes); pinned values guard against regressions in the tail mix
    data = bytes([0x61, 0x80, 0xFF, 0x01, 0x7F, 0xC3, 0x00, 0x42])
    got = [murmur3_x86_32(data[:n], 0) for n in range(9)]
    assert got[0] == 0  # seed 0, empty input -> fmix(0) ^ 0 == 0
    assert all(-(2**31) <= h < 2**31 for h in got)
    assert len(set(got)) == len(got)  # distinct prefixes hash apart
    # seed feeds through: same bytes, different seed, different hash
    assert murmur3_x86_32(b"abc", 0) != murmur3_x86_32(b"abc", 1)


def test_cms_estimate_column_is_lazy_and_correct(spark):
    # the Column probe used by sketch_heavy_hitters: correct values through
    # the Arrow batch path
    tokens = ["a", "a", "a", "b", "b", "c"]
    df = spark.createDataFrame([(t,) for t in tokens], "token string")
    sk = df.agg(
        F.count_min_sketch("token", F.lit(EPS), F.lit(CONF), F.lit(SEED)).alias("cms")
    )
    out = (
        df.distinct()
        .crossJoin(F.broadcast(sk))
        .select("token", cms_estimate(F.col("token"), F.col("cms")).alias("est"))
    )
    got = {r["token"]: r["est"] for r in out.collect()}
    assert got == {"a": 3, "b": 2, "c": 1}


def test_sketch_heavy_hitters_builder_is_lazy(spark, sf_dir):
    # ADVICE item 1 regression pin: building + explaining the plan must not
    # trigger any Spark job (the old builder ran first()/collect() eagerly)
    from aws_flight_data_pipeline_spark.plans.registry import resolve
    from aws_flight_data_pipeline_spark.sources.testdata import load_table

    sc = spark.sparkContext
    # baseline: spark.read.parquet itself runs a tiny footer/schema job —
    # that is scan metadata, not builder logic. The builder (which contains
    # exactly one load_table) must add NOTHING beyond that baseline; the old
    # eager builder ran first() + collect() — multi-stage query jobs.
    sc.setJobGroup("lazy-baseline", "bare scan")
    try:
        load_table(spark, sf_dir, "documents")
        baseline = len(sc.statusTracker().getJobIdsForGroup("lazy-baseline"))
    finally:
        sc.setJobGroup(None, None)

    sc.setJobGroup("lazy-probe", "sketch_heavy_hitters build must run no query jobs")
    try:
        df = resolve("sketch_heavy_hitters")(spark, sf_dir)
        df.explain("formatted")
        jobs = sc.statusTracker().getJobIdsForGroup("lazy-probe")
    finally:
        sc.setJobGroup(None, None)
    assert len(jobs) <= baseline, (
        f"builder ran eager query jobs: {list(jobs)} (scan-metadata baseline {baseline})"
    )
    # and the plan still evaluates to the contract-green result
    rows = df.collect()
    assert len(rows) == 20
    assert all(r["cms_ge_exact"] == 1 and r["cms_within_eps"] == 1 for r in rows)
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks) and ranks[0] == 1
