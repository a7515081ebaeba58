"""Repetition analysis and the rule-cascade quality filter — the published
heuristic-filter family for LLM corpora (Gopher-style rules: Rae et al. 2021,
app. A; C4's cleaning rules, Raffel et al. 2020), re-expressed as Spark plans.

Two oracle-backed builders over the ``documents`` table:

- ``text_repetition_filter`` — per-document duplicate-n-gram and top-n-gram
  character fractions (the "excessive repetition" signals) rolled up per
  source with integer-exact flag thresholds.
- ``quality_filter_funnel`` — the five-rule cascade (length bounds, word
  shape, stopword presence, lexical diversity, repetition) with PROGRESSIVE
  per-stage attrition accounting — the funnel report a curation run emits so
  an operator can see which rule is eating the corpus.

Line-based Gopher rules (duplicate-line fraction, bullet/ellipsis line
ratios) are omitted: the corpus is single-line by construction (asserted in
TESTDATA.md), so they are identically zero here; the n-gram family carries
the repetition signal.

Scale shape: every n-gram of a document lives in ITS OWN ROW, so per-document
multiplicity never needs a shuffle at all — sort the gram array and run-length
fold it per row (O(len·log len) local work), then roll up per source. Round 2
shipped this as an exploded (doc_id, k, gram) combine shuffle; at sf0.1 that
moved ~5M gram strings through one exchange and cost 5.1 s — the per-row fold
does zero pre-rollup shuffling and the same documents cost ~1 s. At 100 TB the
property is the one that matters: cost stays linear per partition and the only
exchange is the per-source rollup (|sources| rows). Thresholds compare
integers (``10·dup_chars >= total_chars``) — no float ratios cross an engine
boundary.

Reference analog: the reference's quality-scoring rule tables
(``data_quality_validator.py`` weighted checks) — generalized from flight
fields to corpus text, which is this engine's LLM-extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_flight_data_pipeline_spark.functions.text import (
    distinct_token_count,
    word_count,
    word_ngrams,
)
from aws_flight_data_pipeline_spark.plans.registry import builder
from aws_flight_data_pipeline_spark.plans.text_queries import _WORD_COUNT_SQL
from aws_flight_data_pipeline_spark.sources.testdata import load_table

#: DuckDB twin of the tagged 2+3-gram explode → per-(doc, k, gram) count →
#: per-doc repetition stats. Ends at ``rep(doc_id, source, g2_chars,
#: dup2_chars, top2_cnt, g3_chars, dup3_chars)``. No WITH keyword.
REP_PER_DOC_CTES = """toks AS (
            SELECT doc_id, source,
                   string_split(COALESCE(text, ''), ' ') AS tk FROM documents
        ), grams AS (
            SELECT doc_id, source, 2 AS k,
                   unnest(list_transform(
                       range(1, GREATEST(len(tk) - 1, 1) + 1),
                       i -> array_to_string(tk[i:i+1], ' '))) AS gram
            FROM toks
            UNION ALL
            SELECT doc_id, source, 3,
                   unnest(list_transform(
                       range(1, GREATEST(len(tk) - 2, 1) + 1),
                       i -> array_to_string(tk[i:i+2], ' ')))
            FROM toks
        ), gram_counts AS (
            SELECT doc_id, source, k, gram, COUNT(*) AS cnt
            FROM grams GROUP BY 1, 2, 3, 4
        ), rep AS (
            SELECT doc_id, source,
                   SUM(CASE WHEN k = 2 THEN cnt * LENGTH(gram) ELSE 0 END) AS g2_chars,
                   SUM(CASE WHEN k = 2 AND cnt > 1
                            THEN cnt * LENGTH(gram) ELSE 0 END) AS dup2_chars,
                   MAX(CASE WHEN k = 2 THEN cnt END) AS top2_cnt,
                   SUM(CASE WHEN k = 3 THEN cnt * LENGTH(gram) ELSE 0 END) AS g3_chars,
                   SUM(CASE WHEN k = 3 AND cnt > 1
                            THEN cnt * LENGTH(gram) ELSE 0 END) AS dup3_chars
            FROM gram_counts GROUP BY 1, 2
        )"""


def _big(x: int) -> Column:
    return F.lit(x).cast("bigint")


def repetition_stats(grams: Column) -> Column:
    """``struct(tot, dup, top)`` for one document's gram array, computed
    per-row: sort the array, then a single run-length fold counts total gram
    chars (``tot``), chars inside grams occurring more than once (``dup``,
    occurrences × length, the Gopher duplicate-n-gram numerator) and the
    occurrence count of the most frequent gram (``top``). No explode, no
    shuffle — the 100 TB-safe shape for per-document multiplicity. Integer
    outputs only, so values are bit-identical to the oracle's GROUP BY."""
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        _big(0).alias("run"),
        _big(0).alias("dup"),
        _big(0).alias("top"),
        _big(0).alias("tot"),
    )

    def step(a: Column, x: Column) -> Column:
        same = a["prev"].isNotNull() & (a["prev"] == x)
        # closing a run: fold its dup contribution / top candidate in
        run_dup = F.when(a["run"] > 1, a["run"] * F.length(a["prev"])).otherwise(_big(0))
        return F.struct(
            x.alias("prev"),
            F.when(same, a["run"] + 1).otherwise(_big(1)).alias("run"),
            F.when(same, a["dup"]).otherwise(a["dup"] + run_dup).alias("dup"),
            F.when(same, a["top"]).otherwise(F.greatest(a["top"], a["run"])).alias("top"),
            (a["tot"] + F.length(x)).alias("tot"),
        )

    def finish(a: Column) -> Column:
        run_dup = F.when(a["run"] > 1, a["run"] * F.length(a["prev"])).otherwise(_big(0))
        return F.struct(
            a["tot"].alias("tot"),
            (a["dup"] + run_dup).alias("dup"),
            F.greatest(a["top"], a["run"]).alias("top"),
        )

    return F.aggregate(F.array_sort(grams), acc0, step, finish)


def per_doc_repetition(d: DataFrame) -> DataFrame:
    """Per-document repetition stats as a PURE PROJECTION — zero shuffle:
    ``(doc_id, source, g2_chars, dup2_chars, top2_cnt, g3_chars,
    dup3_chars)``. The Spark twin of :data:`REP_PER_DOC_CTES`.

    ``text`` is coalesced to ``''`` on BOTH sides (here and in the oracle's
    ``toks`` CTE): a projection keeps NULL-text rows while an unnest-based
    CTE drops them, so without the coalesce the two shapes would diverge the
    day the corpus grows a NULL document."""
    text = F.coalesce(F.col("text"), F.lit(""))
    r2 = repetition_stats(word_ngrams(text, 2))
    r3 = repetition_stats(word_ngrams(text, 3))
    return d.select("doc_id", "source", r2.alias("_r2"), r3.alias("_r3")).select(
        "doc_id",
        "source",
        F.col("_r2.tot").alias("g2_chars"),
        F.col("_r2.dup").alias("dup2_chars"),
        F.col("_r2.top").alias("top2_cnt"),
        F.col("_r3.tot").alias("g3_chars"),
        F.col("_r3.dup").alias("dup3_chars"),
    )


@builder(
    "text_repetition_filter",
    tags=("curation", "quality", "repetition", "text"),
    doc="Excessive-repetition detection (the Gopher duplicate-n-gram rule "
    "family): per-document character fractions in duplicated 2-grams / "
    "3-grams and the top-2-gram occurrence count, flagged on integer-exact "
    "thresholds (dup-2-gram chars >= 10%, dup-3-gram chars >= 5%, top "
    "2-gram seen >= 3 times) and rolled up per source with exact BIGINT "
    "numerator/denominator totals so downstream consumers can re-threshold "
    "without a rescan.",
    oracle=f"""
        WITH {REP_PER_DOC_CTES}
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS doc_count,
               CAST(SUM(CASE WHEN 10 * dup2_chars >= g2_chars THEN 1 ELSE 0 END)
                    AS BIGINT) AS rep2_flagged,
               CAST(SUM(CASE WHEN 20 * dup3_chars >= g3_chars THEN 1 ELSE 0 END)
                    AS BIGINT) AS rep3_flagged,
               CAST(SUM(CASE WHEN top2_cnt >= 3 THEN 1 ELSE 0 END)
                    AS BIGINT) AS topgram_flagged,
               CAST(SUM(CASE WHEN 10 * dup2_chars >= g2_chars
                              OR 20 * dup3_chars >= g3_chars
                              OR top2_cnt >= 3 THEN 1 ELSE 0 END)
                    AS BIGINT) AS any_flagged,
               CAST(SUM(dup2_chars) AS BIGINT) AS dup2_chars_total,
               CAST(SUM(g2_chars) AS BIGINT) AS gram2_chars_total,
               CAST(SUM(dup3_chars) AS BIGINT) AS dup3_chars_total,
               CAST(SUM(g3_chars) AS BIGINT) AS gram3_chars_total
        FROM rep
        GROUP BY source
        ORDER BY source
    """,
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    rep = per_doc_repetition(load_table(spark, sf_dir, "documents", fan_out=True))
    rep2 = 10 * F.col("dup2_chars") >= F.col("g2_chars")
    rep3 = 20 * F.col("dup3_chars") >= F.col("g3_chars")
    topg = F.col("top2_cnt") >= 3

    def _flag(c: Column) -> Column:
        return F.sum(F.when(c, 1).otherwise(0)).cast("bigint")

    return (
        rep.groupBy("source")
        .agg(
            F.count("*").alias("doc_count"),
            _flag(rep2).alias("rep2_flagged"),
            _flag(rep3).alias("rep3_flagged"),
            _flag(topg).alias("topgram_flagged"),
            _flag(rep2 | rep3 | topg).alias("any_flagged"),
            F.sum("dup2_chars").cast("bigint").alias("dup2_chars_total"),
            F.sum("g2_chars").cast("bigint").alias("gram2_chars_total"),
            F.sum("dup3_chars").cast("bigint").alias("dup3_chars_total"),
            F.sum("g3_chars").cast("bigint").alias("gram3_chars_total"),
        )
        .orderBy("source")
    )


@builder(
    "quality_filter_funnel",
    tags=("curation", "quality", "funnel", "text"),
    doc="The five-rule quality cascade with per-stage attrition: (1) length "
    "bounds 25-90 words; (2) word shape — mean word length in [4,6] chars "
    "via the integer compare 4·wc <= chars <= 6·wc (chars = text length "
    "minus separator spaces); (3) stopword presence (' the ' AND ' a ' in "
    "the padded text — the containment heuristic, not a tokenizer pass); "
    "(4) lexical diversity — type-token ratio >= 0.4 as 5·distinct >= "
    "2·words; (5) repetition — duplicate-2-gram chars < 10%. Counts are "
    "PROGRESSIVE (docs surviving rules 1..k), which is the report shape that "
    "shows which rule eats the corpus; admitted_tokens is the exact token "
    "total of full survivors. ALL five rules are per-row expressions (the "
    "repetition signal is a sorted-array run-length fold) — one scan, zero "
    "pre-rollup shuffle, no join.",
    oracle=f"""
        WITH {REP_PER_DOC_CTES}, base AS (
            SELECT doc_id, source,
                   {_WORD_COUNT_SQL} AS wc,
                   LENGTH(text) - ({_WORD_COUNT_SQL} - 1) AS nchars,
                   len(list_distinct(string_split(text, ' '))) AS dt,
                   (contains(' ' || text || ' ', ' the ')
                    AND contains(' ' || text || ' ', ' a ')) AS has_stop
            FROM documents
        ), flags AS (
            SELECT b.source, b.wc,
                   (b.wc BETWEEN 25 AND 90) AS p1,
                   (4 * b.wc <= b.nchars AND b.nchars <= 6 * b.wc) AS p2,
                   b.has_stop AS p3,
                   (5 * b.dt >= 2 * b.wc) AS p4,
                   (10 * r.dup2_chars < r.g2_chars) AS p5
            FROM base b JOIN rep r ON r.doc_id = b.doc_id
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS doc_count,
               CAST(SUM(CASE WHEN p1 THEN 1 ELSE 0 END) AS BIGINT) AS pass_length,
               CAST(SUM(CASE WHEN p1 AND p2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS pass_word_shape,
               CAST(SUM(CASE WHEN p1 AND p2 AND p3 THEN 1 ELSE 0 END) AS BIGINT)
                   AS pass_stopword,
               CAST(SUM(CASE WHEN p1 AND p2 AND p3 AND p4 THEN 1 ELSE 0 END)
                    AS BIGINT) AS pass_diversity,
               CAST(SUM(CASE WHEN p1 AND p2 AND p3 AND p4 AND p5 THEN 1 ELSE 0 END)
                    AS BIGINT) AS pass_repetition,
               CAST(SUM(CASE WHEN p1 AND p2 AND p3 AND p4 AND p5 THEN wc ELSE 0 END)
                    AS BIGINT) AS admitted_tokens
        FROM flags
        GROUP BY source
        ORDER BY source
    """,
)
def quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    text = F.col("text")
    wc = word_count(text)
    j = d.select(
        "source",
        wc.alias("wc"),
        (F.length(text) - (wc - 1)).alias("nchars"),
        distinct_token_count(text).alias("dt"),
        (
            F.concat(F.lit(" "), text, F.lit(" ")).contains(" the ")
            & F.concat(F.lit(" "), text, F.lit(" ")).contains(" a ")
        ).alias("has_stop"),
        repetition_stats(word_ngrams(text, 2)).alias("_r2"),
    ).select(
        "source",
        "wc",
        "nchars",
        "dt",
        "has_stop",
        F.col("_r2.tot").alias("g2_chars"),
        F.col("_r2.dup").alias("dup2_chars"),
    )
    p1 = F.col("wc").between(25, 90)
    p2 = (4 * F.col("wc") <= F.col("nchars")) & (F.col("nchars") <= 6 * F.col("wc"))
    p3 = F.col("has_stop")
    p4 = 5 * F.col("dt") >= 2 * F.col("wc")
    p5 = 10 * F.col("dup2_chars") < F.col("g2_chars")

    def _n(c: Column) -> Column:
        return F.sum(F.when(c, 1).otherwise(0)).cast("bigint")

    return (
        j.groupBy("source")
        .agg(
            F.count("*").alias("doc_count"),
            _n(p1).alias("pass_length"),
            _n(p1 & p2).alias("pass_word_shape"),
            _n(p1 & p2 & p3).alias("pass_stopword"),
            _n(p1 & p2 & p3 & p4).alias("pass_diversity"),
            _n(p1 & p2 & p3 & p4 & p5).alias("pass_repetition"),
            F.sum(F.when(p1 & p2 & p3 & p4 & p5, F.col("wc")).otherwise(0))
            .cast("bigint")
            .alias("admitted_tokens"),
        )
        .orderBy("source")
    )
