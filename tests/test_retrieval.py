"""Behavioral checks for BM25 retrieval, unigram-LM scoring, and
cluster-stratified diversity sampling on planted corpora.

Strict cross-engine parity for all three is covered by
tests/test_oracle_parity.py (they are oracle-backed builders); these tests
pin the *semantics* the parity check cannot see on the synthetic corpus:
that BM25 actually rewards term density and rarity, that the LM score
actually separates typical from atypical vocabulary, and that the sampler's
per-stratum cap and determinism hold.
"""

from __future__ import annotations

import pytest

from aws_flight_data_pipeline_spark.plans.registry import resolve
from aws_flight_data_pipeline_spark.plans.retrieval_queries import BM25_TERMS, BM25_TOPK

_FILLER = ("alpha", "beta", "gamma", "delta")


def _write_docs(spark, path: str, rows) -> None:
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


@pytest.fixture(scope="module")
def bm25_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("planted_bm25"))
    rows = []
    # docs 0..9: one 'spark' (a COMMON term — in 10/12 docs) + 7 filler
    for i in range(10):
        toks = ["spark"] + [_FILLER[(i + j) % 4] for j in range(7)]
        rows.append((i, " ".join(toks), "en", "src0", len(" ".join(toks))))
    # doc 10: one 'merge' (a RARE term — only here), same length
    toks = ["merge"] + [_FILLER[j % 4] for j in range(7)]
    rows.append((10, " ".join(toks), "en", "src0", len(" ".join(toks))))
    # doc 11: term-dense — every query term once, half the length
    rows.append((11, " ".join(BM25_TERMS), "en", "src0", 23))
    # doc 12: no query terms at all
    rows.append((12, " ".join(_FILLER * 2), "en", "src0", 23))
    _write_docs(spark, d, rows)
    return d


def test_bm25_rewards_density_and_rarity(spark, bm25_dir):
    out = {r["doc_id"]: r for r in resolve("text_bm25_topk")(spark, bm25_dir).collect()}
    assert 12 not in out, "doc with zero query terms must not be retrieved"
    assert out[11]["n_terms"] == len(BM25_TERMS)
    # term-dense short doc ranks above every single-term doc
    assert out[11]["score_e6"] > out[10]["score_e6"] > 0
    # rarity: same tf and dl, but 'merge' (df=2) outscores 'spark' (df=11)
    assert out[10]["score_e6"] > out[0]["score_e6"]
    assert len(out) <= BM25_TOPK


@pytest.fixture(scope="module")
def lm_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("planted_lm"))
    rows = []
    # lang 'typ': 20 docs over a tiny repeated vocabulary (high-prob tokens)
    for i in range(20):
        toks = [_FILLER[(i + j) % 4] for j in range(8)]
        rows.append((i, " ".join(toks), "typ", "src0", 1))
    # lang 'odd': 5 docs of hapax tokens (each token occurs once in corpus)
    for i in range(5):
        toks = [f"odd{i}_{j}" for j in range(8)]
        rows.append((100 + i, " ".join(toks), "odd", "src0", 1))
    _write_docs(spark, d, rows)
    return d


def test_lm_score_separates_atypical_vocabulary(spark, lm_dir):
    out = {r["lang"]: r for r in resolve("text_lm_quality_score")(spark, lm_dir).collect()}
    assert out["typ"]["doc_count"] == 20 and out["odd"]["doc_count"] == 5
    # every hapax doc must score strictly worse than every typical doc
    assert out["odd"]["min_xent_e6"] > out["typ"]["max_xent_e6"]
    assert out["odd"]["avg_xent"] > out["typ"]["avg_xent"]


@pytest.fixture(scope="module")
def emb_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("planted_emb"))
    rows = []
    # stratum A ('++++++'): 100 vectors, ids 0..99
    for i in range(100):
        rows.append((i, [1.0 + 0.01 * i] * 8, 0))
    # stratum B ('------'): 5 vectors, ids 1000..1004
    for i in range(5):
        rows.append((1000 + i, [-1.0 - 0.01 * i] * 8, 1))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    return d


def test_diversity_sample_caps_per_stratum(spark, emb_dir):
    out = {r["bucket"]: r for r in resolve("corpus_diversity_sample")(spark, emb_dir).collect()}
    big, small = out["++++++"], out["------"]
    assert big["bucket_size"] == 100 and big["n_sampled"] == 32
    assert small["bucket_size"] == 5 and small["n_sampled"] == 5
    # samples come from the right stratum (planted disjoint id ranges)
    assert big["sampled_id_max"] <= 99
    assert small["sampled_id_min"] >= 1000 and small["sampled_id_sum"] == sum(range(1000, 1005))


def test_diversity_sample_is_deterministic(spark, emb_dir):
    fn = resolve("corpus_diversity_sample")
    a = [tuple(r) for r in fn(spark, emb_dir).collect()]
    b = [tuple(r) for r in fn(spark, emb_dir).collect()]
    assert a == b
