"""Prefix-filter completeness for set_similarity_join: on a planted
corpus where brute-force Jaccard over all pairs is enumerable in Python,
the blocked+verified operator must return EXACTLY the >= 0.5 pairs —
the prefix filter may admit extra candidates but can never lose a pair."""

from __future__ import annotations

import itertools
import os

from aws_flight_data_pipeline_spark.plans.text_queries import set_similarity_join


DOCS = [
    (0, "alpha beta gamma delta"),          # J(0,1) = 3/5 = 0.6
    (1, "alpha beta gamma epsilon"),
    (2, "alpha beta gamma delta"),           # exact dup of 0 -> J = 1.0
    (3, "zeta eta theta iota kappa"),        # disjoint from 0-2
    (4, "zeta eta theta iota lambda mu"),    # J(3,4) = 4/7 ≈ 0.571
    (5, "alpha zeta nu xi omicron pi rho"),  # shares 1 with many: J < 0.5
    (6, "single"),
    (7, "single"),                           # J(6,7) = 1.0
    (8, "beta gamma delta alpha"),           # same SET as 0 (order shifted)
    (9, "completely different words here now then"),
]


def _brute_pairs():
    sets = {i: set(t.split()) for i, t in DOCS}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter == 0:
            continue
        j = inter / len(sets[a] | sets[b])
        if j >= 0.5:
            out[(a, b)] = (inter, len(sets[a]), len(sets[b]), round(1e6 * j))
    return out


def test_operator_equals_brute_force(spark, tmp_path):
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in DOCS],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    got = {
        (r["doc_a"], r["doc_b"]): (r["n_common"], r["sz_a"], r["sz_b"], r["jac_ppm"])
        for r in set_similarity_join(spark, sf).collect()
    }
    assert got == _brute_pairs()
    # the planted truth itself covers the interesting shapes
    truth = _brute_pairs()
    assert (0, 2) in truth and truth[(0, 2)][3] == 1_000_000  # exact dup
    assert (0, 8) in truth and truth[(0, 8)][3] == 1_000_000  # order-shifted set dup
    assert (0, 1) in truth  # borderline 0.6
    assert (3, 4) in truth  # 0.571
    assert (6, 7) in truth  # singleton sets
    assert not any(5 in p for p in truth)  # sub-threshold sharer excluded
