"""Language-ID classifier math on a separable planted corpus.

The driver's synthetic documents table draws text independently of `lang`,
so text_language_id's driver-green row only pins the fit/apply/evaluate
PLUMBING (its accuracy there is chance level, documented in SURVEY §9.1).
This test plants per-language token distributions — disjoint core
vocabularies plus shared stopword noise — and asserts the smoothed
fixed-point naive-Bayes scoring actually separates them: the confusion
matrix must be near-diagonal (accuracy >= 0.9; in practice 1.0).
"""

from __future__ import annotations

import pytest

from aws_flight_data_pipeline_spark.plans.registry import resolve

LANGS = ("aa", "bb", "cc")
DOCS_PER_LANG = 30
# shared across every language — pure noise the classifier must see past
_SHARED = ("the", "of", "and", "to", "in")


def _planted_corpus(spark, path: str) -> None:
    rows = []
    doc_id = 0
    for li, lang in enumerate(LANGS):
        core = [f"{lang}_word{k:02d}" for k in range(20)]
        for d in range(DOCS_PER_LANG):
            # 10 core tokens (deterministic rotation through the lang vocab)
            # + 4 shared noise tokens: ~29% of every doc is cross-language.
            toks = [core[(d * 3 + j) % len(core)] for j in range(10)]
            toks += [_SHARED[(d + j) % len(_SHARED)] for j in range(4)]
            text = " ".join(toks)
            rows.append((doc_id, text, lang, f"src{li}", len(text)))
            doc_id += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("planted_langs"))
    _planted_corpus(spark, d)
    return d


def test_language_id_separates_planted_distributions(spark, planted_dir):
    confusion = {
        (r["actual"], r["predicted"]): r["doc_count"]
        for r in resolve("text_language_id")(spark, planted_dir).collect()
    }
    total = sum(confusion.values())
    correct = sum(confusion.get((l, l), 0) for l in LANGS)
    assert total == len(LANGS) * DOCS_PER_LANG
    accuracy = correct / total
    assert accuracy >= 0.9, f"planted-corpus accuracy {accuracy} (confusion={confusion})"


def test_language_id_noise_only_docs_do_not_flip_others(spark, planted_dir):
    """Shared-noise robustness: every off-diagonal cell is small even though
    ~29% of each document's tokens are identical across languages."""
    confusion = {
        (r["actual"], r["predicted"]): r["doc_count"]
        for r in resolve("text_language_id")(spark, planted_dir).collect()
    }
    for a in LANGS:
        for p in LANGS:
            if a != p:
                assert confusion.get((a, p), 0) <= 3
