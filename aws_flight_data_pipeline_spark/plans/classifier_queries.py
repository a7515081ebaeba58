"""Trained text classification + retrieval-chunking over the documents table.

Two LLM-training-data operators that complete the quality-filter ladder
(heuristics → statistical LM → TRAINED classifier) and the retrieval prep
path:

- **Naive-Bayes classifier train/eval** (``text_nb_classifier_eval``): the
  fastText/DCLM-style trained quality-or-domain classifier tier, expressed
  as pure aggregations — multinomial naive Bayes IS two hash-aggregates
  (class priors, token-class counts) plus one join-and-sum at scoring time,
  which makes it the one trained classifier a 100 TB engine can run without
  any ML runtime. Train on even doc_ids, score odd doc_ids, report a
  per-class evaluation (support, correct count, summed decision margin).
- **Sliding-window chunking with overlap** (``doc_chunk_overlap``): the
  RAG/embedding prep operator — fixed token-budget windows with stride
  overlap so no boundary sentence is lost, each chunk fingerprinted for
  downstream dedup/indexing. Per-row array arithmetic only: the explode is
  O(corpus tokens / stride) and nothing shuffles corpus text.

Reference analog: the validator's static scoring tier
(``src/lambda/quality_validator/quality_validator.py:196-282``) is the
untrained ancestor of the NB tier; chunking has no reference analog (the
reference serves whole records) and follows standard RAG practice.

Cross-engine float discipline (see ``plans/registry.py``): every ln() is
integer-micro-scaled at the narrowest grain (one transcendental per value,
then BIGINT arithmetic only), so Spark/DuckDB ulp noise cannot reorder a
ranking or flip a hash; DuckDB BIGINT sums are CAST back from HUGEINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_flight_data_pipeline_spark.functions.caching import tracked_cache
from aws_flight_data_pipeline_spark.functions.text import tokens, word_count
from aws_flight_data_pipeline_spark.plans.registry import builder
from aws_flight_data_pipeline_spark.plans.text_queries import _WORD_COUNT_SQL
from aws_flight_data_pipeline_spark.sources.testdata import load_table

#: Chunker geometry: token budget per chunk and stride (budget - stride =
#: overlap carried between adjacent chunks).
CHUNK_TOKENS = 32
CHUNK_STRIDE = 24


def nb_predictions(train: DataFrame, test: DataFrame, label_col: str) -> DataFrame:
    """Multinomial naive-Bayes: train on ``train``, score ``test``; returns
    one row per test doc — (doc_id, true_label, pred_label, margin_e6).

    Both inputs need (doc_id, text, ``label_col``). Laplace(+1) smoothing
    over the train vocabulary; integer-micro log-probabilities; ties broken
    by candidate label ascending, margin = best minus runner-up score.

    Scale shape: the model is two aggregate frames — token-class counts
    (vocabulary x observed-class pairs: sparse, vocabulary-scale) and a
    classes-row frame (|classes| rows) — both broadcast; scoring is one
    explode over the test corpus fanned out by |classes|, then a hash
    aggregate. No corpus-width shuffle carries text, and the model never
    touches the driver.
    """
    lbl = F.col(label_col)
    train_tok = train.select(lbl.alias("cls"), F.explode(tokens(F.col("text"))).alias("tok"))
    # the model: vocabulary x observed-class sparse counts — cached because
    # three consumers (grid probe, class totals, vocab size) read it, and it
    # is vocabulary-scale no matter the corpus size
    counts = train_tok.groupBy("tok", "cls").agg(F.count("*").alias("cnt")).transform(
        tracked_cache
    )
    vocab = counts.select("tok").distinct().agg(F.count("*").alias("v"))
    classes = (
        train.groupBy(lbl.alias("cls"))
        .agg(F.count("*").alias("docs_l"))
        # n_l folds out of the count table — no second pass over the corpus
        .join(counts.groupBy("cls").agg(F.sum("cnt").alias("n_l")), "cls")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(train.agg(F.count("*").alias("docs_train"))))
        .select(
            "cls",
            "n_l",
            "v",
            F.round(F.log(F.col("docs_l") * 1.0 / F.col("docs_train")) * 1e6)
            .cast("bigint")
            .alias("prior_e6"),
        )
    )

    test_tok = test.select(
        "doc_id", lbl.alias("true_label"), F.explode(tokens(F.col("text"))).alias("tok")
    )
    # fan out each token instance to every candidate class, probe the sparse
    # count table; an unseen (tok, class) pair coalesces to the Laplace floor
    lp = F.round(
        F.log((F.coalesce(F.col("cnt"), F.lit(0)) + 1.0) / (F.col("n_l") + F.col("v"))) * 1e6
    ).cast("bigint")
    scored = (
        test_tok.crossJoin(F.broadcast(classes.select("cls", "n_l", "v", "prior_e6")))
        .join(F.broadcast(counts), ["tok", "cls"], "left")
        .groupBy("doc_id", "true_label", "cls", "prior_e6")
        .agg(F.sum(lp).alias("lp_sum_e6"))
        .select(
            "doc_id",
            "true_label",
            "cls",
            (F.col("prior_e6") + F.col("lp_sum_e6")).alias("score_e6"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score_e6").desc(), F.col("cls"))
    ranked = scored.select(
        "doc_id",
        "true_label",
        "cls",
        "score_e6",
        F.row_number().over(w).alias("rn"),
        F.lead("score_e6").over(w).alias("second_e6"),
    )
    return ranked.where(F.col("rn") == 1).select(
        "doc_id",
        "true_label",
        F.col("cls").alias("pred_label"),
        (F.col("score_e6") - F.coalesce(F.col("second_e6"), F.col("score_e6")))
        .cast("bigint")
        .alias("margin_e6"),
    )


@builder(
    "text_nb_classifier_eval",
    tags=("text", "classifier", "naive-bayes", "quality"),
    doc="Trained multinomial naive-Bayes classifier, train/eval split by "
    "doc_id parity, label = lang: two hash-aggregates train the model "
    "(sparse token-class counts + a |classes|-row stats frame, both "
    "broadcast at score time), one explode x |classes| fan-out scores the "
    "held-out half, integer-micro log-probs make the argmax/margin exact "
    "across engines. Output: per true class — support, correct "
    "predictions, summed decision margin. The trained tier of the "
    "quality-filter ladder (heuristics -> unigram LM -> this).",
    oracle=f"""
        WITH train AS (
            SELECT doc_id, lang, text FROM documents WHERE doc_id % 2 = 0
        ),
        test AS (
            SELECT doc_id, lang, text FROM documents WHERE doc_id % 2 = 1
        ),
        train_tok AS (
            SELECT lang AS cls, unnest(string_split(text, ' ')) AS tok FROM train
        ),
        counts AS (
            SELECT tok, cls, COUNT(*) AS cnt FROM train_tok GROUP BY tok, cls
        ),
        vocab AS (
            SELECT COUNT(DISTINCT tok) AS v FROM counts
        ),
        classes AS (
            SELECT p.cls, t.n_l, vocab.v,
                   CAST(ROUND(ln(p.docs_l * 1.0 / (SELECT COUNT(*) FROM train)) * 1e6)
                        AS BIGINT) AS prior_e6
            FROM (SELECT lang AS cls, COUNT(*) AS docs_l FROM train GROUP BY lang) p
            JOIN (SELECT cls, CAST(SUM(cnt) AS BIGINT) AS n_l FROM counts GROUP BY cls) t
              ON p.cls = t.cls
            CROSS JOIN vocab
        ),
        test_tok AS (
            SELECT doc_id, lang AS true_label,
                   unnest(string_split(text, ' ')) AS tok
            FROM test
        ),
        scored AS (
            SELECT tt.doc_id, tt.true_label, c.cls,
                   c.prior_e6 + CAST(SUM(
                       CAST(ROUND(ln((COALESCE(k.cnt, 0) + 1.0) / (c.n_l + c.v)) * 1e6)
                            AS BIGINT)
                   ) AS BIGINT) AS score_e6
            FROM test_tok tt
            CROSS JOIN classes c
            LEFT JOIN counts k ON k.tok = tt.tok AND k.cls = c.cls
            GROUP BY tt.doc_id, tt.true_label, c.cls, c.prior_e6
        ),
        ranked AS (
            SELECT doc_id, true_label, cls, score_e6,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY score_e6 DESC, cls) AS rn,
                   LEAD(score_e6) OVER (PARTITION BY doc_id
                                        ORDER BY score_e6 DESC, cls) AS second_e6
            FROM scored
        ),
        preds AS (
            SELECT doc_id, true_label, cls AS pred_label,
                   CAST(score_e6 - COALESCE(second_e6, score_e6) AS BIGINT) AS margin_e6
            FROM ranked WHERE rn = 1
        )
        SELECT true_label AS lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_correct,
               CAST(SUM(margin_e6) AS BIGINT) AS sum_margin_e6
        FROM preds
        GROUP BY true_label
        ORDER BY lang
    """,
)
def text_nb_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    train = d.where(F.col("doc_id") % 2 == 0).select("doc_id", "lang", "text")
    test = d.where(F.col("doc_id") % 2 == 1).select("doc_id", "lang", "text")
    preds = nb_predictions(train, test, "lang")
    return (
        preds.groupBy(F.col("true_label").alias("lang"))
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_correct"),
            F.sum("margin_e6").cast("bigint").alias("sum_margin_e6"),
        )
        .orderBy("lang")
    )


@builder(
    "doc_chunk_overlap",
    tags=("text", "chunking", "rag", "retrieval"),
    doc=f"Sliding-window retrieval chunking: {CHUNK_TOKENS}-token windows "
    f"every {CHUNK_STRIDE} tokens ({CHUNK_TOKENS - CHUNK_STRIDE}-token "
    "overlap so boundary context is never lost), each chunk md5-"
    "fingerprinted for downstream dedup/indexing. Pure per-row array "
    "arithmetic — tokenize once, generate window starts with sequence(), "
    "slice per start; the explode is O(corpus tokens / stride) and the "
    "only shuffled columns are (doc_id, ints, md5). Output: one row per "
    "chunk plus per-doc ordinals; a 100 TB corpus chunks in one "
    "embarrassingly parallel pass.",
    oracle=f"""
        WITH base AS (
            SELECT doc_id, string_split(text, ' ') AS toks,
                   {_WORD_COUNT_SQL} AS n_tok
            FROM documents
            WHERE {_WORD_COUNT_SQL} > 0
        ),
        starts AS (
            SELECT doc_id, toks, n_tok,
                   unnest(generate_series(0, n_tok - 1, {CHUNK_STRIDE})) AS start_tok
            FROM base
        )
        SELECT doc_id,
               CAST(start_tok / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
               CAST(start_tok AS BIGINT) AS start_tok,
               CAST(LEAST({CHUNK_TOKENS}, n_tok - start_tok) AS BIGINT) AS chunk_toks,
               md5(array_to_string(toks[start_tok + 1 : start_tok + {CHUNK_TOKENS}], ' '))
                   AS chunk_md5
        FROM starts
        ORDER BY doc_id, chunk_idx
    """,
)
def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    base = d.select(
        "doc_id",
        tokens(F.col("text")).alias("toks"),
        word_count(F.col("text")).alias("n_tok"),
    ).where(F.col("n_tok") > 0)
    starts = base.select(
        "doc_id",
        "toks",
        "n_tok",
        F.explode(
            F.sequence(F.lit(0), F.col("n_tok") - 1, F.lit(CHUNK_STRIDE))
        ).alias("start_tok"),
    )
    return starts.select(
        "doc_id",
        (F.col("start_tok") / CHUNK_STRIDE).cast("bigint").alias("chunk_idx"),
        F.col("start_tok").cast("bigint").alias("start_tok"),
        F.least(F.lit(CHUNK_TOKENS), F.col("n_tok") - F.col("start_tok"))
        .cast("bigint")
        .alias("chunk_toks"),
        F.md5(
            F.array_join(F.slice(F.col("toks"), F.col("start_tok") + 1, CHUNK_TOKENS), " ")
        ).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_idx")
