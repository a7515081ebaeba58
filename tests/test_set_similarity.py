"""Prefix-filter completeness for set_similarity_join: on a planted
corpus where brute-force shingle-Jaccard over all pairs is enumerable in
Python, the blocked+verified operator must return EXACTLY the >= 0.8
pairs — the prefix filter may admit extra candidates but can never lose
a pair."""

from __future__ import annotations

import itertools
import os

from aws_flight_data_pipeline_spark.plans.text_queries import set_similarity_join


DOCS = [
    (0, "alpha beta gamma delta"),           # J(0,2) = 1.0 (exact dup)
    (1, "alpha beta gamma epsilon"),         # shares 1 of 3 shingles with 0
    (2, "alpha beta gamma delta"),
    (3, "zeta eta theta iota kappa"),
    (4, "zeta eta theta iota lambda mu"),    # shingle overlap below 0.8
    (5, "alpha zeta nu xi omicron pi rho"),
    (6, "single"),
    (7, "single"),                           # one-token docs: J = 1.0
    (8, "beta gamma delta alpha"),           # same TOKEN set as 0, different shingles
    (9, "completely different words here now then"),
    # exact-boundary pair: 8 common shingles, union 10 -> J = 0.8
    (12, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11"),
    (13, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 x1"),
    # subset boundary: 14's 8 shingles ⊂ 15's 10 -> J = 0.8 AND the
    # 5*min >= 4*max length filter sits exactly on its boundary (8 vs 10)
    (14, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
    (15, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),
]


def _shingle_set(text: str) -> set[str]:
    toks = text.split(" ")
    n = max(len(toks) - 2, 1)
    return {" ".join(toks[i : i + 3]) for i in range(n)}


def _brute_pairs():
    sets = {i: _shingle_set(t) for i, t in DOCS}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter == 0:
            continue
        j = inter / len(sets[a] | sets[b])
        if j >= 0.8:
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
    truth = _brute_pairs()
    assert (0, 2) in truth and truth[(0, 2)][3] == 1_000_000  # exact dup
    assert (6, 7) in truth and truth[(6, 7)][3] == 1_000_000  # one-token docs
    assert (12, 13) in truth and truth[(12, 13)][3] == 800_000  # exact boundary
    assert (14, 15) in truth and truth[(14, 15)][3] == 800_000  # subset + length boundary
    assert (0, 8) not in truth  # same tokens, different shingles: sub-threshold
    assert (0, 1) not in truth and (3, 4) not in truth
