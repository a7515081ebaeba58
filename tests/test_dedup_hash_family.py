"""The xxhash64 production hash-family twin of the fuzzy-dedup pipeline.

The md5 tier stays oracle-verified (DuckDB parity); the xx tier has no
cross-engine twin, so these tests pin what rows-only checks cannot:

- NO FALSE POSITIVES: every pair the xx family verifies really has
  shingle-Jaccard >= 0.5, checked against a test-local pure-Python shingle
  implementation (verification is exact Jaccard, so a family switch can
  change RECALL, never precision).
- FAMILY AGREEMENT: the two families' verified-pair sets overlap on the
  bulk of pairs (LSH recall is family-dependent — different minima pick
  different band keys — but true near-dups collide in most bands).
- ACCOUNTING: the twin's rollup preserves the corpus partition
  (surviving + duplicates == total, per source, totals equal to the md5
  tier's).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_flight_data_pipeline_spark.plans.registry import resolve
from aws_flight_data_pipeline_spark.plans.text_queries import scored_pair_frame
from aws_flight_data_pipeline_spark.sources.testdata import load_table


def _py_shingles(text: str) -> set[str]:
    # test-local mirror of functions.text.shingles (3-token, distinct,
    # slice-clamped for short docs) — deliberately not the engine code
    tk = text.split(" ")
    return {" ".join(tk[i : i + 3]) for i in range(max(len(tk) - 2, 1))}


def _verified_pairs(spark, sf_dir: str, family: str) -> set[tuple[int, int]]:
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    scored = scored_pair_frame(d, hash_family=family)
    return {
        (r["doc_a"], r["doc_b"])
        for r in scored.filter(F.col("j") >= 0.5).collect()
    }


def test_xx_family_verified_pairs_are_true_near_dups(spark, sf_dir):
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }

    def jac(a: int, b: int) -> float:
        sa, sb = _py_shingles(texts[a]), _py_shingles(texts[b])
        return len(sa & sb) / len(sa | sb)

    xx = _verified_pairs(spark, sf_dir, "xxhash64")
    md5 = _verified_pairs(spark, sf_dir, "md5")
    assert xx and md5, "corpus must contain verified near-dup pairs"
    for a, b in xx | md5:
        assert jac(a, b) >= 0.5, f"false positive: ({a}, {b})"
    # the bulk of true near-dups collides under either family
    assert len(xx & md5) * 2 >= max(len(xx), len(md5))


def test_xx_rollup_accounting_matches_md5_totals(spark, sf_dir):
    base = {
        r["source"]: r["total_docs"]
        for r in resolve("dedup_pipeline_end_to_end")(spark, sf_dir).collect()
    }
    rows = resolve("dedup_pipeline_end_to_end_xx")(spark, sf_dir).collect()
    assert {r["source"] for r in rows} == set(base)
    for r in rows:
        assert r["total_docs"] == base[r["source"]]
        assert r["surviving_docs"] + r["duplicate_docs"] == r["total_docs"]
        assert r["verified_dup_pairs"] >= r["duplicate_docs"] >= 0
