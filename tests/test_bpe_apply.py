"""Sequential-greedy semantics for bpe_apply_encode against a Python
reference on a planted corpus: an earlier-ranked merge CONSUMES tokens a
later merge would have matched, greedy left-to-right within a round, and
rank order follows (count desc, pair asc)."""

from __future__ import annotations

import os
from collections import Counter

from aws_flight_data_pipeline_spark.plans.curation_queries import (
    _BPE_APPLY_MERGES,
    bpe_apply_encode,
)

# counts: (x,y) x10 -> rank 1; (y,z) x8 -> rank 2; the "x y z" docs then
# encode to [xy, z] because rank 1 consumed the y that rank 2 wanted.
DOCS = (
    [(i, "x y", "s") for i in range(10)]
    + [(100 + i, "y z", "s") for i in range(8)]
    + [(200 + i, "x y z", "s") for i in range(3)]          # consumption case
    + [(300, "x y x y", "s")]                              # greedy: 2 merges
    + [(301, "q r q r q r", "t"), (302, "q r", "t")]       # second source
    + [(303, "lonely", "t")]                               # 1-token doc
)


def _reference():
    toks = {
        doc_id: [w for w in text.split(" ") if w] for doc_id, text, _ in DOCS
    }
    pairs = Counter()
    for w in toks.values():
        for i in range(len(w) - 1):
            if w[i] != w[i + 1]:
                pairs[(w[i], w[i + 1])] += 1
    ranked = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:_BPE_APPLY_MERGES]
    enc = dict(toks)
    for (a, b), _ in ranked:
        for doc_id, w in enc.items():
            out = []
            for x in w:
                if out and out[-1] == a and x == b:
                    out[-1] = f"{a} {b}"
                else:
                    out.append(x)
            enc[doc_id] = out
    per_source = {}
    for doc_id, text, source in DOCS:
        d = per_source.setdefault(source, [0, 0, 0])
        d[0] += 1
        d[1] += len(toks[doc_id])
        d[2] += len(enc[doc_id])
    return {
        s: (docs, tb, ta, round(1e6 * (tb - ta) / tb))
        for s, (docs, tb, ta) in per_source.items()
    }


def test_sequential_greedy_encoding(spark, tmp_path):
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    df = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in DOCS],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "documents.parquet")
    )
    got = {
        r["source"]: (
            r["docs"],
            r["tokens_before"],
            r["tokens_after"],
            r["saved_ppm"],
        )
        for r in bpe_apply_encode(spark, sf).collect()
    }
    truth = _reference()
    assert got == truth
    # the planted shapes actually happened in the reference:
    # source s: 10 "x y" docs -> 10 tokens; 8 "y z" -> 8; 3 "x y z" docs
    # encode to [xy, z] (rank-1 consumption) -> 6; "x y x y" -> 2 (greedy)
    assert truth["s"][2] == 10 + 8 + 3 * 2 + 2
    # source t: (q,r) merges its 3+1 occurrences; "lonely" unchanged
    assert truth["t"][2] == 3 + 1 + 1
