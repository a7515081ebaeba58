"""R-S prefix-filter completeness for decontam_fuzzy_pairs: on a planted
corpus where brute-force shingle-Jaccard across the train/eval split is
enumerable in Python, the blocked+verified operator must report exactly
the train docs with a >= 0.7 match, each attributed to its best eval doc
(highest Jaccard, smallest eval id on ties). Eval split: doc_id % 7 == 0."""

from __future__ import annotations

import os

from aws_flight_data_pipeline_spark.plans.curation_queries import decontam_fuzzy_pairs

# a 9-token block shared by docs 1 (train) and 14 (eval) gives 7 common
# shingles; 1 has 8 shingles, 14 has 9 -> J = 7/10 = 0.7 EXACTLY (the
# threshold boundary, not representable as a double — the integer form
# must keep it)
_BLOCK = "c1 c2 c3 c4 c5 c6 c7 c8 c9"
DOCS = [
    (0, "alpha beta gamma delta epsilon"),            # eval
    (1, f"{_BLOCK} a1"),                              # train: J(1,14)=0.7 exact
    (2, "alpha beta gamma delta epsilon"),            # train: dup of eval 0 AND 7
    (3, f"{_BLOCK} d1 d2 d3"),                        # train: J(3,14)=7/12 < 0.7
    (4, "alpha beta gamma delta zeta"),               # train: J(4,0)=3/7 < 0.7
    (5, "totally unrelated words in this document"),  # train: no match
    (6, "more private text nothing shared at all"),   # train: no match
    (7, "alpha beta gamma delta epsilon"),            # eval: tie target for 2
    (14, f"{_BLOCK} b1 b2"),                          # eval: 9 shingles
    (9, "alpha beta gamma delta epsilon"),            # train: dup of 0 and 7 too
]


def _shingle_set(text: str) -> set[str]:
    toks = text.split(" ")
    n = max(len(toks) - 2, 1)
    return {" ".join(toks[i : i + 3]) for i in range(n)}


def _brute():
    sets = {i: _shingle_set(t) for i, t in DOCS}
    out = {}
    for t_id in sets:
        if t_id % 7 == 0:
            continue
        best = None
        for e_id in sets:
            if e_id % 7 != 0:
                continue
            inter = len(sets[t_id] & sets[e_id])
            union = len(sets[t_id] | sets[e_id])
            if 10 * inter < 7 * union:
                continue
            row = (
                e_id,
                inter,
                len(sets[t_id]),
                len(sets[e_id]),
                round(1e6 * inter / union),
            )
            # best = highest jac, then smallest eval id
            if best is None or (-row[4], row[0]) < (-best[4], best[0]):
                best = row
        if best is not None:
            out[t_id] = best
    return out


def test_operator_equals_brute_force(spark, tmp_path):
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in DOCS],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "documents.parquet")
    )
    got = {
        r["train_id"]: (
            r["eval_id"],
            r["n_common"],
            r["sz_train"],
            r["sz_eval"],
            r["jac_ppm"],
        )
        for r in decontam_fuzzy_pairs(spark, sf).collect()
    }
    truth = _brute()
    assert got == truth
    # the planted shapes actually exercised what they claim:
    assert truth[1][0] == 14 and truth[1][4] == 700_000  # exact J=0.7 boundary kept
    assert truth[2][0] == 0 and truth[2][4] == 1_000_000  # tie -> smallest eval id
    assert truth[9][0] == 0
    assert 3 not in truth and 4 not in truth and 5 not in truth  # sub-threshold
