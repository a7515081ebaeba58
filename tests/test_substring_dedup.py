"""Planted-corpus semantics for dedup_substring_spans: exact 8-gram
duplicate detection with gaps-and-islands span merging. A Python
brute-force over the same corpus is the truth — the operator must find
exactly the duplicated positions and merge overlapping/adjacent spans
into maximal islands."""

from __future__ import annotations

import os
from collections import Counter

from aws_flight_data_pipeline_spark.plans.text_queries import dedup_substring_spans

K = 8

# a 12-word passage shared verbatim by docs 0 and 1 (5 duplicated 8-gram
# positions in each -> ONE merged island of 12 words), a doc that repeats
# its own 8-word phrase twice (within-doc duplication counts), two docs
# with NO duplicated grams, and a doc shorter than K words.
PASSAGE = "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 p11 p12"
DOCS = [
    (0, f"a0 a1 {PASSAGE} a2 a3"),
    (1, f"b0 {PASSAGE} b1 b2 b3 b4"),
    # doc 2: same 8-word phrase at positions 1 and 12 (gap of 3 clean
    # words between span end 8 and span start 12 -> TWO islands)
    (2, "q1 q2 q3 q4 q5 q6 q7 q8 z1 z2 z3 q1 q2 q3 q4 q5 q6 q7 q8"),
    (3, "unique words that appear nowhere else in this corpus at all"),
    (4, "another entirely distinct document with its own private text"),
    (5, "short doc only"),  # < K words: no k-gram, never reported
]


def _brute():
    grams = Counter()
    pos_by_doc = {}
    for doc_id, text in DOCS:
        w = text.split(" ")
        pos_by_doc[doc_id] = []
        for i in range(len(w) - K + 1):
            g = " ".join(w[i : i + K])
            grams[g] += 1
            pos_by_doc[doc_id].append((i + 1, g))
    out = {}
    for doc_id, text in DOCS:
        w = text.split(" ")
        dup_pos = [p for p, g in pos_by_doc[doc_id] if grams[g] >= 2]
        if not dup_pos:
            continue
        islands = []
        for p in sorted(dup_pos):
            if islands and p <= islands[-1][1] + 1:
                islands[-1][1] = max(islands[-1][1], p + K - 1)
            else:
                islands.append([p, p + K - 1])
        dup_words = sum(e - s + 1 for s, e in islands)
        out[doc_id] = (
            len(islands),
            dup_words,
            len(w),
            round(1e6 * dup_words / len(w)),
        )
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
        r["doc_id"]: (r["n_spans"], r["dup_words"], r["total_words"], r["dup_ppm"])
        for r in dedup_substring_spans(spark, sf).collect()
    }
    truth = _brute()
    assert got == truth
    # the planted shapes actually exercised what they claim:
    assert truth[0][0] == 1 and truth[0][1] == 12  # 5 overlapping grams -> 1 island
    assert truth[1][0] == 1 and truth[1][1] == 12
    assert truth[2][0] == 2 and truth[2][1] == 16  # within-doc repeat, 2 islands
    assert 3 not in truth and 4 not in truth and 5 not in truth
