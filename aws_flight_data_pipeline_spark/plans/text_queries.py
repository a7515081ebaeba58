"""Text-analysis + deduplication operators over the documents table.

The LLM-training-data extension surface (BASELINE.json north star): token
statistics, language-marker heuristics, quality scoring, exact and fuzzy
deduplication (fingerprint, MinHash-LSH, n-gram Jaccard). Everything is
higher-order array functions and hash-aggregates — per-row compute then one
shuffle for the grouping — so the same plans stream over 100 TB of documents.

Hash portability: md5 (bit-identical in Spark and DuckDB) is the hash
primitive for fingerprints and MinHash, so the oracle can verify actual
signature values, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_flight_data_pipeline_spark.functions.text import (
    bpe_ish_token_estimate,
    fingerprint,
    minhash_band,
    minhash_signature,
    occurrence_count,
    prefix_fingerprint,
    token_type_ratio,
    tokens,
    word_count,
)
from aws_flight_data_pipeline_spark.plans.registry import query
from aws_flight_data_pipeline_spark.sources.testdata import load_table


def _r4(c):
    return F.round(c, 4)


_WORD_COUNT_SQL = (
    "(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0 "
    "ELSE LENGTH(TRIM(text)) - LENGTH(REPLACE(TRIM(text), ' ', '')) + 1 END)"
)


@query(
    "text_stats_by_lang",
    tags=("text", "agg"),
    doc="Corpus token statistics per language: char/word counts, avg word "
    "length, BPE-ish token estimate (~4 chars/token) — the token-counting "
    "operator of the training-data pipeline.",
    oracle=f"""
        SELECT lang,
               COUNT(*) AS doc_count,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM({_WORD_COUNT_SQL}) AS BIGINT) AS total_words,
               ROUND(AVG({_WORD_COUNT_SQL}), 4) AS avg_words_per_doc,
               ROUND(AVG(CAST(LENGTH(text) AS DOUBLE) / {_WORD_COUNT_SQL}), 4)
                   AS avg_chars_per_word,
               CAST(SUM(CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT)) AS BIGINT)
                   AS est_bpe_tokens
        FROM documents
        GROUP BY lang
        ORDER BY lang
    """,
)
def text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    wc = word_count(F.col("text"))
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("doc_count"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(wc).alias("total_words"),
            _r4(F.avg(wc)).alias("avg_words_per_doc"),
            _r4(F.avg(F.length("text").cast("double") / wc)).alias("avg_chars_per_word"),
            F.sum(bpe_ish_token_estimate(F.col("text"))).alias("est_bpe_tokens"),
        )
        .orderBy("lang")
    )


@query(
    "text_quality_scores",
    tags=("text", "quality"),
    doc="Document quality scoring — length score, lexical diversity "
    "(distinct/total tokens), composite weighted score, quality banding; the "
    "text analog of the record quality scorer (quality_validator.py:196-282).",
    oracle=f"""
        WITH scored AS (
            SELECT lang, source,
                   LEAST(CAST({_WORD_COUNT_SQL} AS DOUBLE) / 50.0, 1.0) AS length_score,
                   CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                       / {_WORD_COUNT_SQL} AS diversity
            FROM documents
        )
        SELECT lang,
               COUNT(*) AS doc_count,
               ROUND(AVG(length_score), 4) AS avg_length_score,
               ROUND(AVG(diversity), 4)    AS avg_diversity,
               ROUND(AVG(0.5 * length_score + 0.5 * diversity), 4) AS avg_quality,
               SUM(CASE WHEN 0.5 * length_score + 0.5 * diversity >= 0.6
                        THEN 1 ELSE 0 END) AS high_quality_count
        FROM scored
        GROUP BY lang
        ORDER BY lang
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    wc = word_count(F.col("text"))
    length_score = F.least(wc.cast("double") / 50.0, F.lit(1.0))
    diversity = token_type_ratio(F.col("text"))
    quality = 0.5 * length_score + 0.5 * diversity
    return (
        d.select("lang", length_score.alias("ls"), diversity.alias("dv"), quality.alias("q"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("doc_count"),
            _r4(F.avg("ls")).alias("avg_length_score"),
            _r4(F.avg("dv")).alias("avg_diversity"),
            _r4(F.avg("q")).alias("avg_quality"),
            F.sum(F.when(F.col("q") >= 0.6, 1).otherwise(0)).alias("high_quality_count"),
        )
        .orderBy("lang")
    )


@query(
    "text_language_markers",
    tags=("text", "langid"),
    doc="Language-ID n-gram/marker heuristic: frequency of marker tokens per "
    "labeled language + argmax classification — the language-ID operator as "
    "pure length-arithmetic occurrence counting (portable, regex-free).",
    oracle="""
        WITH padded AS (
            SELECT lang, ' ' || text || ' ' AS t, LENGTH(text) AS n FROM documents
        ), counted AS (
            SELECT lang,
                   (LENGTH(t) - LENGTH(REPLACE(t, ' the ', ''))) / 5 AS c_the,
                   (LENGTH(t) - LENGTH(REPLACE(t, ' data ', ''))) / 6 AS c_data,
                   (LENGTH(t) - LENGTH(REPLACE(t, ' spark ', ''))) / 7 AS c_spark,
                   (LENGTH(t) - LENGTH(REPLACE(t, ' join ', ''))) / 6 AS c_join
            FROM padded
        )
        SELECT lang,
               COUNT(*) AS doc_count,
               CAST(SUM(c_the) AS BIGINT)   AS the_count,
               CAST(SUM(c_data) AS BIGINT)  AS data_count,
               CAST(SUM(c_spark) AS BIGINT) AS spark_count,
               CAST(SUM(c_join) AS BIGINT)  AS join_count,
               ROUND(CAST(SUM(c_the) AS DOUBLE) / COUNT(*), 4) AS the_per_doc
        FROM counted
        GROUP BY lang
        ORDER BY lang
    """,
)
def text_language_markers(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    d = d.withColumn("t", padded)
    counts = {m: occurrence_count(F.col("t"), f" {m} ") for m in ("the", "data", "spark", "join")}
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("doc_count"),
            F.sum(counts["the"]).alias("the_count"),
            F.sum(counts["data"]).alias("data_count"),
            F.sum(counts["spark"]).alias("spark_count"),
            F.sum(counts["join"]).alias("join_count"),
            _r4(F.sum(counts["the"]).cast("double") / F.count("*")).alias("the_per_doc"),
        )
        .orderBy("lang")
    )


@query(
    "dedup_exact_fingerprint",
    tags=("dedup", "text"),
    doc="Exact deduplication via md5 fingerprint of normalized text + "
    "prefix-fingerprint candidate groups — hash-groupBy dedup, the exact-dedup "
    "operator of the training-data pipeline (and data_transformer.py:612-659's "
    "key-based dedup generalized to content hashing).",
    oracle="""
        WITH fps AS (
            SELECT source,
                   md5(LOWER(TRIM(text))) AS fp,
                   md5(array_to_string((string_split(text, ' '))[1:3], ' ')) AS prefix_fp
            FROM documents
        )
        SELECT source,
               COUNT(*)                  AS doc_count,
               COUNT(DISTINCT fp)        AS unique_docs,
               COUNT(*) - COUNT(DISTINCT fp) AS exact_dup_count,
               COUNT(DISTINCT prefix_fp) AS unique_prefixes,
               COUNT(*) - COUNT(DISTINCT prefix_fp) AS prefix_collision_count
        FROM fps
        GROUP BY source
        ORDER BY source
    """,
)
def dedup_exact_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    d = d.withColumn("fp", fingerprint(F.col("text"))).withColumn(
        "prefix_fp", prefix_fingerprint(F.col("text"), 3)
    )
    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("doc_count"),
            F.countDistinct("fp").alias("unique_docs"),
            (F.count("*") - F.countDistinct("fp")).alias("exact_dup_count"),
            F.countDistinct("prefix_fp").alias("unique_prefixes"),
            (F.count("*") - F.countDistinct("prefix_fp")).alias("prefix_collision_count"),
        )
        .orderBy("source")
    )


@query(
    "dedup_minhash_signatures",
    tags=("dedup", "minhash", "lsh"),
    doc="MinHash signatures (8 md5 hash families) + 2-band LSH bucketing. "
    "Per-row higher-order-function signature computation (zero shuffle), then "
    "band-bucket grouping: bucket-size histogram + candidate-pair count per "
    "band. The shape that replaces O(n²) similarity with per-bucket joins at "
    "100 TB (shingle→minhash→band→bucket-join).",
    oracle="""
        WITH sigs AS (
            SELECT doc_id,
                   list_transform(range(0, 8), i -> list_min(
                       list_transform(list_distinct(string_split(text, ' ')),
                                      t -> md5(t || CAST(i AS VARCHAR))))) AS sig
            FROM documents
        ), bands AS (
            SELECT doc_id, md5(array_to_string(sig[1:4], '|')) AS band_key, 0 AS band_id
            FROM sigs
            UNION ALL
            SELECT doc_id, md5(array_to_string(sig[5:8], '|')) AS band_key, 1 AS band_id
            FROM sigs
        ), buckets AS (
            SELECT band_id, band_key, COUNT(*) AS bucket_size
            FROM bands GROUP BY band_id, band_key
        )
        SELECT band_id, bucket_size,
               COUNT(*) AS n_buckets,
               CAST(SUM(bucket_size * (bucket_size - 1) / 2) AS BIGINT) AS candidate_pairs
        FROM buckets
        GROUP BY band_id, bucket_size
        ORDER BY band_id, bucket_size
    """,
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(tokens(F.col("text")))
    d = d.withColumn("sig", minhash_signature(toks, 8))
    bands = d.select(
        "doc_id", minhash_band(F.col("sig"), 0, 4).alias("band_key"), F.lit(0).alias("band_id")
    ).unionAll(
        d.select(
            "doc_id",
            minhash_band(F.col("sig"), 4, 4).alias("band_key"),
            F.lit(1).alias("band_id"),
        )
    )
    buckets = bands.groupBy("band_id", "band_key").agg(F.count("*").alias("bucket_size"))
    return (
        buckets.groupBy("band_id", "bucket_size")
        .agg(
            F.count("*").alias("n_buckets"),
            F.sum(F.col("bucket_size") * (F.col("bucket_size") - 1) / 2)
            .cast("bigint")
            .alias("candidate_pairs"),
        )
        .orderBy("band_id", "bucket_size")
    )


@query(
    "dedup_ngram_jaccard",
    tags=("dedup", "jaccard"),
    doc="Token-set Jaccard similarity between candidate document pairs "
    "(consecutive doc_ids as the candidate generator) — the n-gram-Jaccard "
    "near-dup verifier that runs after LSH candidate generation. "
    "intersection/union via exploded-token equi-join: pure hash joins, "
    "no O(n²) scan.",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, UNNEST(list_distinct(string_split(text, ' '))) AS tok
            FROM documents
        ), sizes AS (
            SELECT doc_id, COUNT(*) AS n_tok FROM toks GROUP BY doc_id
        ), inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
            FROM toks a JOIN toks b ON b.doc_id = a.doc_id + 1 AND a.tok = b.tok
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b,
               COALESCE(i.n_inter, 0) AS intersection_size,
               sa.n_tok + sb.n_tok - COALESCE(i.n_inter, 0) AS union_size,
               ROUND(CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
                     / (sa.n_tok + sb.n_tok - COALESCE(i.n_inter, 0)), 4) AS jaccard
        FROM sizes sa
        JOIN sizes sb ON sb.doc_id = sa.doc_id + 1
        LEFT JOIN inter i ON i.doc_a = sa.doc_id
        ORDER BY doc_a
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("tok"))
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    a, b = toks.alias("a"), toks.alias("b")
    inter = (
        a.join(
            b,
            (F.col("b.doc_id") == F.col("a.doc_id") + 1) & (F.col("a.tok") == F.col("b.tok")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    joined = (
        sa.join(sb, F.col("sb.doc_id") == F.col("sa.doc_id") + 1)
        .join(inter, F.col("doc_a") == F.col("sa.doc_id"), "left")
    )
    n_inter = F.coalesce(F.col("n_inter"), F.lit(0))
    union_size = F.col("sa.n_tok") + F.col("sb.n_tok") - n_inter
    return joined.select(
        F.col("sa.doc_id").alias("doc_a"),
        F.col("sb.doc_id").alias("doc_b"),
        n_inter.alias("intersection_size"),
        union_size.alias("union_size"),
        _r4(n_inter.cast("double") / union_size).alias("jaccard"),
    ).orderBy("doc_a")


@query(
    "text_rolling_fingerprint",
    tags=("text", "fingerprint", "shingle"),
    doc="Winnowing-style document fingerprint: hash every 8-char shingle of "
    "the document (the rolling-hash position sweep; md5 stands in for "
    "Rabin-Karp so both engines produce identical hashes) and keep the "
    "minimum — a content fingerprint robust to edits outside the minimal "
    "shingle. Per-source distinct-fingerprint and collision profile. "
    "Per-row higher-order functions, zero shuffle before the final agg.",
    oracle="""
        WITH fp AS (
            SELECT source,
                   list_min(list_transform(
                       range(1, GREATEST(LENGTH(text) - 6, 2)),
                       i -> md5(substring(text, CAST(i AS BIGINT), 8)))) AS rolling_fp,
                   LENGTH(text) AS n
            FROM documents
        )
        SELECT source,
               COUNT(*) AS doc_count,
               COUNT(DISTINCT rolling_fp) AS distinct_fingerprints,
               COUNT(*) - COUNT(DISTINCT rolling_fp) AS fingerprint_collisions,
               CAST(SUM(GREATEST(n - 7, 1)) AS BIGINT) AS total_shingles
        FROM fp
        GROUP BY source
        ORDER BY source
    """,
)
def text_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # substr with a column start position needs the SQL form; the whole sweep
    # is one codegen'd projection (sequence → transform → array_min).
    rolling_fp = F.expr(
        "array_min(transform(sequence(1, greatest(length(text) - 6, 2) - 1),"
        " i -> md5(substr(text, i, 8))))"
    )
    n_shingles = F.greatest(F.length("text") - 7, F.lit(1))
    return (
        d.select("source", rolling_fp.alias("rolling_fp"), n_shingles.alias("ns"))
        .groupBy("source")
        .agg(
            F.count("*").alias("doc_count"),
            F.countDistinct("rolling_fp").alias("distinct_fingerprints"),
            (F.count("*") - F.countDistinct("rolling_fp")).alias("fingerprint_collisions"),
            F.sum("ns").cast("bigint").alias("total_shingles"),
        )
        .orderBy("source")
    )


@query(
    "dedup_simhash",
    tags=("dedup", "simhash"),
    # xxhash64 bit manipulation is Spark-specific — no portable oracle; the
    # driver records the rows-only check (SURVEY §2 non-SQL-expressible class).
    oracle=None,
    doc="SimHash document fingerprint: per-token xxhash64, sign-sum the 32 "
    "low bits, pack to a bit-signature; groups by simhash for near-dup "
    "detection. Native bit ops via higher-order functions, no UDF.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(tokens(F.col("text")))
    # For each of 32 bit positions, sum +1/-1 votes over token hashes, then
    # pack the positive-vote bits into a long. shiftright needs a literal bit
    # count, so the bit loop is Python-side (fixed 32 expressions, still one
    # whole-stage-codegen projection).
    def _vote(bit: int):
        def merge(acc, t):
            return acc + F.when(
                F.shiftright(F.xxhash64(t), bit).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)

        return F.aggregate(toks, F.lit(0), merge)

    simhash = F.lit(0).cast("long")
    for i in range(32):
        simhash = simhash + F.when(_vote(i) > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0))
    d = d.withColumn("simhash", simhash)
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("doc_count"),
            F.countDistinct("simhash").alias("unique_simhashes"),
            (F.count("*") - F.countDistinct("simhash")).alias("simhash_collisions"),
        )
        .orderBy("lang")
    )


@query(
    "dedup_simhash_hamming_pairs",
    tags=("dedup", "simhash", "lsh"),
    # xxhash64-derived signatures are Spark-specific — rows-only check, like
    # dedup_simhash (SURVEY §2 non-SQL-expressible class).
    oracle=None,
    doc="SimHash near-duplicate candidate JOIN: split each 32-bit simhash "
    "into two 16-bit bands (any pair within hamming distance 1 per band "
    "shares at least one exact band — the pigeonhole banding of simhash "
    "dedup), bucket-join on band value, verify with bit_count(a XOR b) <= 3. "
    "The join is per-bucket (never O(n²)); xor/bit_count are native "
    "expressions. Returns the hamming-distance histogram of candidates.",
)
def dedup_simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(tokens(F.col("text")))

    def _vote(bit: int):
        def merge(acc, t):
            return acc + F.when(
                F.shiftright(F.xxhash64(t), bit).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)

        return F.aggregate(toks, F.lit(0), merge)

    simhash = F.lit(0).cast("long")
    for i in range(32):
        simhash = simhash + F.when(_vote(i) > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0))
    sigs = d.select("doc_id", simhash.alias("sh"))
    # band decomposition: low/high 16 bits; same-band docs are candidates
    bands = sigs.select(
        "doc_id", "sh", F.lit(0).alias("band_id"), (F.col("sh").bitwiseAND(F.lit(0xFFFF))).alias("band_val")
    ).unionByName(
        sigs.select(
            "doc_id", "sh", F.lit(1).alias("band_id"), F.shiftright("sh", 16).alias("band_val")
        )
    )
    a = bands.alias("a")
    b = bands.select(
        F.col("doc_id").alias("b_doc_id"),
        F.col("sh").alias("b_sh"),
        F.col("band_id").alias("b_band_id"),
        F.col("band_val").alias("b_band_val"),
    )
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b_band_id"))
            & (F.col("a.band_val") == F.col("b_band_val"))
            & (F.col("a.doc_id") < F.col("b_doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b_doc_id").alias("doc_b"),
                F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b_sh"))).alias("hamming"))
        .distinct()  # a pair may match in both bands
    )
    return (
        pairs.withColumn("is_near_dup", F.col("hamming") <= 3)
        .groupBy("hamming", "is_near_dup")
        .agg(F.count("*").alias("pair_count"))
        .orderBy("hamming")
    )


_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")
_PUNCT = (".", ",", "!", "?", ";", ":")


@query(
    "text_stopword_punct_ratios",
    tags=("text", "quality"),
    doc="The remaining quality-signal ratios of the training-data pipeline: "
    "stopword ratio (7-word function-word set via padded occurrence "
    "counting), punctuation density, and uppercase density per source — all "
    "length-arithmetic column expressions, no regex in the hot path except "
    "one class replace.",
    oracle=f"""
        WITH t AS (
            SELECT source,
                   ' ' || text || ' ' AS padded,
                   LENGTH(text) AS n,
                   {_WORD_COUNT_SQL} AS wc
            FROM documents
        ), ratios AS (
            SELECT source, wc,
                   ({" + ".join(f"(LENGTH(padded) - LENGTH(REPLACE(padded, ' {w} ', ''))) / {len(w) + 2}" for w in _STOPWORDS)})
                       AS stop_hits,
                   ({" + ".join(f"(LENGTH(padded) - LENGTH(REPLACE(padded, '{p}', '')))" for p in _PUNCT)})
                       / CAST(n AS DOUBLE) AS punct_ratio,
                   (n - LENGTH(regexp_replace(padded, '[A-Z]', '', 'g')) + 2)
                       / CAST(n AS DOUBLE) AS upper_ratio
            FROM t
        )
        SELECT source,
               COUNT(*) AS doc_count,
               ROUND(AVG(CAST(stop_hits AS DOUBLE) / wc), 4) AS avg_stopword_ratio,
               ROUND(AVG(punct_ratio), 4) AS avg_punct_ratio,
               ROUND(AVG(upper_ratio), 4) AS avg_upper_ratio
        FROM ratios
        GROUP BY source
        ORDER BY source
    """,
)
def text_stopword_punct_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    d = d.withColumn("padded", padded).withColumn("n", F.length("text")).withColumn(
        "wc", word_count(F.col("text"))
    )
    stop_hits = sum(
        (occurrence_count(F.col("padded"), f" {w} ") for w in _STOPWORDS), start=F.lit(0)
    )
    punct_hits = sum(
        (
            F.length("padded") - F.length(F.replace(F.col("padded"), F.lit(p), F.lit("")))
            for p in _PUNCT
        ),
        start=F.lit(0),
    )
    # padded adds two spaces; regexp strips [A-Z], so n - stripped + 2 = uppercase count
    upper_hits = F.col("n") - F.length(F.regexp_replace("padded", "[A-Z]", "")) + 2
    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("doc_count"),
            _r4(F.avg(stop_hits.cast("double") / F.col("wc"))).alias("avg_stopword_ratio"),
            _r4(F.avg(punct_hits / F.col("n").cast("double"))).alias("avg_punct_ratio"),
            _r4(F.avg(upper_hits / F.col("n").cast("double"))).alias("avg_upper_ratio"),
        )
        .orderBy("source")
    )


@query(
    "text_char_entropy",
    tags=("text", "quality", "entropy"),
    doc="Per-document character-distribution entropy (the perplexity-proxy "
    "quality signal: gibberish and boilerplate both sit at distribution "
    "extremes). Entropy per row via higher-order functions over the distinct "
    "character set — occurrence counts by length arithmetic, -Σ p·ln p by "
    "aggregate() — zero shuffle before the per-language rollup.",
    oracle="""
        WITH ent AS (
            SELECT lang,
                   list_aggregate(list_transform(
                       list_distinct(string_split(text, '')),
                       c -> -1.0 * ((LENGTH(text) - LENGTH(REPLACE(text, c, '')))
                                    / CAST(LENGTH(text) AS DOUBLE))
                            * ln((LENGTH(text) - LENGTH(REPLACE(text, c, '')))
                                 / CAST(LENGTH(text) AS DOUBLE))
                   ), 'sum') AS h
            FROM documents
        )
        SELECT lang,
               COUNT(*) AS doc_count,
               ROUND(AVG(h), 4) AS avg_entropy,
               ROUND(MIN(h), 4) AS min_entropy,
               ROUND(MAX(h), 4) AS max_entropy
        FROM ent
        GROUP BY lang
        ORDER BY lang
    """,
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n = F.length("text").cast("double")
    chars = F.array_distinct(F.split(F.col("text"), ""))

    def char_p(c):
        return (F.length("text") - F.length(F.replace(F.col("text"), c, F.lit("")))) / n

    h = F.aggregate(
        chars, F.lit(0.0), lambda acc, c: acc - char_p(c) * F.log(char_p(c))
    )
    return (
        d.select("lang", h.alias("h"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("doc_count"),
            _r4(F.avg("h")).alias("avg_entropy"),
            _r4(F.min("h")).alias("min_entropy"),
            _r4(F.max("h")).alias("max_entropy"),
        )
        .orderBy("lang")
    )


@query(
    "doc_pack_sequences",
    tags=("text", "packing"),
    doc="Training-sequence packing: assign documents to fixed-budget bins "
    "(4096 estimated BPE tokens) by cumulative token count within each "
    "(lang, source) stream — the greedy sequence-packing step that turns a "
    "document corpus into fixed-length training batches. One running-sum "
    "window per stream, then per-bin fill statistics; streams pack "
    "independently so the plan scales with partition count.",
    oracle=f"""
        WITH toks AS (
            SELECT lang, source, doc_id,
                   CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT) AS est_tokens
            FROM documents
        ), packed AS (
            SELECT lang, source, est_tokens,
                   CAST(FLOOR((SUM(est_tokens) OVER (PARTITION BY lang, source
                        ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        - est_tokens) / 4096.0) AS BIGINT) AS bin_id
            FROM toks
        )
        SELECT lang, source, bin_id,
               COUNT(*) AS docs_in_bin,
               CAST(SUM(est_tokens) AS BIGINT) AS bin_tokens,
               ROUND(SUM(est_tokens) / 4096.0, 4) AS fill_ratio
        FROM packed
        GROUP BY lang, source, bin_id
        ORDER BY lang, source, bin_id
    """,
)
def doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    d = d.withColumn("est_tokens", bpe_ish_token_estimate(F.col("text")))
    w = Window.partitionBy("lang", "source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    # bin = floor(tokens-before-this-doc / budget): greedy first-fit in doc order
    bin_id = F.floor((F.sum("est_tokens").over(w) - F.col("est_tokens")) / 4096.0).cast(
        "bigint"
    )
    return (
        d.withColumn("bin_id", bin_id)
        .groupBy("lang", "source", "bin_id")
        .agg(
            F.count("*").alias("docs_in_bin"),
            F.sum("est_tokens").cast("bigint").alias("bin_tokens"),
            _r4(F.sum("est_tokens") / 4096.0).alias("fill_ratio"),
        )
        .orderBy("lang", "source", "bin_id")
    )
