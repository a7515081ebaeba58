"""Temperature-mix semantics on a planted skewed corpus: tau < 1 must give
the small source MORE than its natural share and the big source LESS, and
shard assignment must be balanced and deterministic."""

from __future__ import annotations

import pytest

from aws_flight_data_pipeline_spark.plans.registry import resolve


@pytest.fixture(scope="module")
def skewed_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("planted_mix"))
    rows = []
    # big: 900 docs, small: 100 docs — 90%/10% natural split, equal doc sizes
    for i in range(900):
        rows.append((i, "tok " * 7 + "tok", "en", "big", 1))
    for i in range(100):
        rows.append((1000 + i, "tok " * 7 + "tok", "en", "small", 1))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_temperature_flattens_the_mixture(spark, skewed_dir):
    out = {r["source"]: r.asDict() for r in resolve("corpus_temperature_mix")(spark, skewed_dir).collect()}
    big, small = out["big"], out["small"]
    natural_small = small["total_tokens"] / (small["total_tokens"] + big["total_tokens"])
    # tau=0.7: small's weight strictly exceeds its 10% natural share;
    # big's drops below 90% — and the budget split follows the weights
    assert small["weight_e6"] > natural_small * 1e6 * 1.2
    assert big["weight_e6"] < 0.9e6
    assert abs(big["weight_e6"] + small["weight_e6"] - 1_000_000) <= 1
    assert big["budget_tokens"] > small["budget_tokens"]  # still ordered
    for r in (big, small):
        assert r["admitted_tokens"] <= r["budget_tokens"]
    # the flattening outcome: the big source is SUBSAMPLED while the small
    # source's inflated budget exceeds its supply, so it saturates whole
    assert 0 < big["admitted_docs"] < big["total_docs"]
    assert small["admitted_docs"] == small["total_docs"]


def test_shard_assignment_is_balanced_and_deterministic(spark, skewed_dir):
    fn = resolve("corpus_shard_assignment")
    a = [tuple(r) for r in fn(spark, skewed_dir).collect()]
    b = [tuple(r) for r in fn(spark, skewed_dir).collect()]
    assert a == b
    counts = [r[1] for r in a]
    assert len(counts) == 8 and max(counts) - min(counts) <= 1  # NTILE balance
    assert sum(r[3] for r in a) == sum(range(900)) + sum(range(1000, 1100))
