"""Naive-Bayes classifier math on a separable planted corpus (the classifier
itself, not just the plumbing), and the overlap-chunker geometry."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_flight_data_pipeline_spark.plans.classifier_queries import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    doc_chunk_overlap,
    nb_predictions,
)


def _planted(spark):
    """Two classes with disjoint signal vocabularies plus shared noise —
    deterministic, linearly separable."""
    sport = ["ball", "goal", "team", "match", "score", "league"]
    tech = ["code", "chip", "stack", "query", "kernel", "cache"]
    noise = ["the", "a", "of", "and"]
    rows = []
    for i in range(120):
        cls = "sport" if i % 2 == 0 else "tech"
        sig = sport if cls == "sport" else tech
        # deterministic token mix: 8 signal + 4 noise tokens, rotated by i
        toks = [sig[(i + j) % len(sig)] for j in range(8)] + [
            noise[(i + j) % len(noise)] for j in range(4)
        ]
        rows.append((i, " ".join(toks), cls))
    return spark.createDataFrame(rows, "doc_id long, text string, label string")


def test_nb_separates_planted_classes(spark):
    docs = _planted(spark)
    train = docs.where("doc_id < 80")
    test = docs.where("doc_id >= 80")
    preds = nb_predictions(train, test, "label").collect()
    assert len(preds) == 40
    correct = sum(1 for r in preds if r["pred_label"] == r["true_label"])
    assert correct / len(preds) >= 0.9, f"accuracy {correct}/{len(preds)}"
    # separable classes: every decision has a strictly positive margin
    assert all(r["margin_e6"] > 0 for r in preds)


def test_nb_unseen_tokens_fall_back_to_laplace_floor(spark):
    docs = _planted(spark)
    train = docs.where("doc_id < 80")
    unseen = spark.createDataFrame(
        [(999, "zzz qqq ball goal team", "sport")],
        "doc_id long, text string, label string",
    )
    preds = nb_predictions(train, unseen, "label").collect()
    # unknown tokens contribute the same floor to every class, so the
    # known signal tokens still decide
    assert preds[0]["pred_label"] == "sport"


def test_chunker_geometry_and_overlap(spark, tmp_path):
    toks = [f"t{i}" for i in range(80)]
    sf = str(tmp_path)
    spark.createDataFrame(
        [(1, " ".join(toks), "en", "src0", len(" ".join(toks)))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")
    out = doc_chunk_overlap(spark, sf).collect()
    assert [(r["chunk_idx"], r["start_tok"], r["chunk_toks"]) for r in out] == [
        (0, 0, CHUNK_TOKENS),
        (1, CHUNK_STRIDE, CHUNK_TOKENS),
        (2, 2 * CHUNK_STRIDE, CHUNK_TOKENS),
        (3, 3 * CHUNK_STRIDE, 80 - 3 * CHUNK_STRIDE),
    ]
    # identical text -> identical fingerprints: a duplicated doc chunk-matches
    import hashlib

    expect0 = hashlib.md5(" ".join(toks[:CHUNK_TOKENS]).encode()).hexdigest()
    assert out[0]["chunk_md5"] == expect0


def test_chunker_duplicate_passage_shares_fingerprints(spark, tmp_path):
    body = " ".join(f"w{i}" for i in range(CHUNK_TOKENS))
    sf = str(tmp_path)
    spark.createDataFrame(
        [
            (1, body, "en", "src0", len(body)),
            (2, body, "en", "src1", len(body)),  # exact duplicate text
            (3, "different " * CHUNK_TOKENS, "en", "src2", 10),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")
    df = doc_chunk_overlap(spark, sf)
    shared = (
        df.groupBy("chunk_md5")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .where("n_docs >= 2")
        .collect()
    )
    assert len(shared) >= 1  # the duplicated passage is visible cross-doc
