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


def test_family_agreement_df_cap_drops_stop_shingles(spark):
    """Verdict r13 missing #1: the family-agreement entry's complete join
    caps shingle document frequency — a planted stop-shingle shared by
    every doc must not create pairs (capped), while the uncapped frame
    blows up into all-pairs on it. Cap semantics are 'drop from both
    sides BEFORE sizes and intersections', so sizes shrink too."""
    from aws_flight_data_pipeline_spark.plans.text_queries import (
        _family_agreement_frame,
    )

    # 6 docs: all share the stop phrase (one common 3-shingle with df=6);
    # docs 1/2 additionally share a genuine near-dup body; doc ids grouped
    # under one source for easy accounting
    body = " ".join(f"w{i:02d}" for i in range(12))
    near = " ".join(("zz" if i == 11 else f"w{i:02d}") for i in range(12))
    stop = "stop1 stop2 stop3 stop4"
    rows = [
        (1, f"{body} {stop}", "s"),
        (2, f"{near} {stop}", "s"),
        # tiny docs dominated by the stop run: one own token + the 4-token
        # stop phrase = 3 shingles, 2 of them the df-6 stop shingles, so
        # every tiny-doc pair sits at J = 2/4 = 0.5 — verified UNCAPPED,
        # gone once the cap drops the stop shingles
        *[(i, f"unique{i}x {stop}", "s") for i in range(3, 7)],
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")

    capped = {r["source"]: r for r in _family_agreement_frame(d, df_cap=5).collect()}
    uncapped = {
        r["source"]: r for r in _family_agreement_frame(d, df_cap=None).collect()
    }
    # capped: only the genuine near-dup pair (1,2) survives the threshold —
    # the stop shingles (df=6 > 5) are dropped before sizes/intersections
    assert capped["s"]["verified_dup_pairs"] == 1
    assert capped["s"]["duplicate_docs"] == 1
    assert capped["s"]["surviving_docs"] == 5
    # uncapped: the stop run alone pushes every tiny-doc pair to J = 0.5,
    # planting C(4,2) = 6 false pairs on top of the genuine one — the
    # blow-up the cap exists to prevent
    assert uncapped["s"]["verified_dup_pairs"] == 7
    assert uncapped["s"]["duplicate_docs"] > capped["s"]["duplicate_docs"]
