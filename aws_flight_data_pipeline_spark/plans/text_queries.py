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
    hashed_shingle_nums,
    hashed_shingles,
    minhash_band,
    minhash_band_xx,
    minhash_fast_sql,
    minhash_nums,
    token_hashes,
    minhash_signature,
    minhash_signature_fast,
    occurrence_count,
    prefix_fingerprint,
    shingles,
    token_type_ratio,
    tokens,
    word_count,
)
from aws_flight_data_pipeline_spark.plans.registry import builder, query
from aws_flight_data_pipeline_spark.sources.testdata import load_table
from aws_flight_data_pipeline_spark.functions.caching import tracked_cache


def _r4(c):
    return F.round(c, 4)


_WORD_COUNT_SQL = (
    "(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0 "
    "ELSE LENGTH(TRIM(text)) - LENGTH(REPLACE(TRIM(text), ' ', '')) + 1 END)"
)


@builder("text_stats_by_lang")
def text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standalone token statistics (round-1 bench name) — the registered
    surface is text_signal_suite; this keeps the bench workload identical."""
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
    "text_signal_suite",
    tags=("text", "agg", "quality", "langid", "entropy"),
    doc="Per-language text-signal suite merging four same-grain operators "
    "into ONE scan + ONE hash-agg: corpus token statistics (char/word/BPE-ish "
    "token counts), language-ID marker frequencies (length-arithmetic "
    "occurrence counting, regex-free), document quality scores (length score, "
    "lexical diversity, composite banding — the text analog of "
    "quality_validator.py:196-282), and character-distribution entropy (the "
    "perplexity-proxy signal; gibberish and boilerplate sit at distribution "
    "extremes). Every per-row signal is a higher-order Catalyst expression — "
    "zero shuffle before the rollup, so the plan is one pass at any corpus "
    "size. Cross-engine discipline: ratio-of-integer columns are unrounded "
    "quotients of exact BIGINT sums; the continuous quality scores are "
    "integer-micro-scaled per row (ROUND(x*1e6) — a dyadic-.5-safe encoding) "
    "then summed, so no ROUND(AVG) half-boundary can fire; entropy (a "
    "transcendental per-row value) keeps ROUND(AVG, 4).",
    oracle=f"""
        WITH sig AS (
            SELECT lang,
                   n_chars,
                   LENGTH(text) AS n,
                   {_WORD_COUNT_SQL} AS wc,
                   CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT) AS est_tokens,
                   ' ' || text || ' ' AS t,
                   LEAST(CAST({_WORD_COUNT_SQL} AS DOUBLE) / 50.0, 1.0) AS ls,
                   CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                       / {_WORD_COUNT_SQL} AS dv,
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
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(wc) AS BIGINT) AS total_words,
               CAST(SUM(wc) AS BIGINT) / (1.0 * COUNT(*)) AS avg_words_per_doc,
               ROUND(AVG(CAST(n AS DOUBLE) / wc), 4) AS avg_chars_per_word,
               CAST(SUM(est_tokens) AS BIGINT) AS est_bpe_tokens,
               CAST(SUM((LENGTH(t) - LENGTH(REPLACE(t, ' the ', ''))) / 5) AS BIGINT)
                   AS the_count,
               CAST(SUM((LENGTH(t) - LENGTH(REPLACE(t, ' data ', ''))) / 6) AS BIGINT)
                   AS data_count,
               CAST(SUM((LENGTH(t) - LENGTH(REPLACE(t, ' spark ', ''))) / 7) AS BIGINT)
                   AS spark_count,
               CAST(SUM((LENGTH(t) - LENGTH(REPLACE(t, ' join ', ''))) / 6) AS BIGINT)
                   AS join_count,
               CAST(SUM((LENGTH(t) - LENGTH(REPLACE(t, ' the ', ''))) / 5) AS BIGINT)
                   / (1.0 * COUNT(*)) AS the_per_doc,
               CAST(SUM(LEAST(2 * wc, 100)) AS BIGINT) / (100.0 * COUNT(*))
                   AS avg_length_score,
               CAST(SUM(CAST(ROUND(dv * 1e6) AS BIGINT)) AS BIGINT) / (1e6 * COUNT(*))
                   AS avg_diversity,
               CAST(SUM(CAST(ROUND((0.5 * ls + 0.5 * dv) * 1e6) AS BIGINT)) AS BIGINT)
                   / (1e6 * COUNT(*)) AS avg_quality,
               CAST(SUM(CASE WHEN 0.5 * ls + 0.5 * dv >= 0.6 THEN 1 ELSE 0 END) AS BIGINT)
                   AS high_quality_count,
               ROUND(AVG(h), 4) AS avg_entropy,
               ROUND(MIN(h), 4) AS min_entropy,
               ROUND(MAX(h), 4) AS max_entropy
        FROM sig
        GROUP BY lang
        ORDER BY lang
    """,
)
def text_signal_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    wc = word_count(F.col("text"))
    n = F.length("text")
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    ls = F.least(wc.cast("double") / 50.0, F.lit(1.0))
    dv = token_type_ratio(F.col("text"))
    quality = 0.5 * ls + 0.5 * dv
    chars = F.array_distinct(F.split(F.col("text"), ""))
    # one replace-scan per distinct char: materialize p before the fold — the
    # naive fold (acc - p * log p with p inlined) re-evaluates the replace
    # subtree twice per char. Same arithmetic, same fold order, so the value
    # stays bit-identical with the oracle's list_transform/list_aggregate.
    probs = F.transform(
        chars,
        lambda c: (n - F.length(F.replace(F.col("text"), c, F.lit("")))) / n.cast("double"),
    )
    h = F.aggregate(probs, F.lit(0.0), lambda acc, p: acc - p * F.log(p))

    sig = d.select(
        "lang",
        "n_chars",
        n.alias("n"),
        wc.alias("wc"),
        bpe_ish_token_estimate(F.col("text")).alias("est_tokens"),
        padded.alias("t"),
        ls.alias("ls"),
        dv.alias("dv"),
        quality.alias("q"),
        h.alias("h"),
    )
    marker = {m: occurrence_count(F.col("t"), f" {m} ") for m in ("the", "data", "spark", "join")}
    cnt = F.count("*")
    return (
        sig.groupBy("lang")
        .agg(
            cnt.alias("doc_count"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("wc").alias("total_words"),
            (F.sum("wc") / (1.0 * cnt)).alias("avg_words_per_doc"),
            _r4(F.avg(F.col("n").cast("double") / F.col("wc"))).alias("avg_chars_per_word"),
            F.sum("est_tokens").alias("est_bpe_tokens"),
            F.sum(marker["the"]).alias("the_count"),
            F.sum(marker["data"]).alias("data_count"),
            F.sum(marker["spark"]).alias("spark_count"),
            F.sum(marker["join"]).alias("join_count"),
            (F.sum(marker["the"]) / (1.0 * cnt)).alias("the_per_doc"),
            (F.sum(F.least(2 * F.col("wc"), F.lit(100))) / (100.0 * cnt)).alias(
                "avg_length_score"
            ),
            (F.sum(F.round(F.col("dv") * 1e6).cast("long")) / (1e6 * cnt)).alias(
                "avg_diversity"
            ),
            (F.sum(F.round(F.col("q") * 1e6).cast("long")) / (1e6 * cnt)).alias("avg_quality"),
            F.sum(F.when(F.col("q") >= 0.6, 1).otherwise(0)).alias("high_quality_count"),
            _r4(F.avg("h")).alias("avg_entropy"),
            _r4(F.min("h")).alias("min_entropy"),
            _r4(F.max("h")).alias("max_entropy"),
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


@builder(
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
    d = load_table(spark, sf_dir, "documents", fan_out=True)
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


@builder("dedup_ngram_jaccard")
def dedup_ngram_jaccard_builder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standalone Jaccard verifier over consecutive-doc_id candidates (round-1
    name) — the registered surface is dedup_pipeline_end_to_end, where the
    same exploded-token equi-join verifies LSH candidates."""
    return _ngram_jaccard_frame(spark, sf_dir)





def _ngram_jaccard_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
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


@builder(
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
    d = load_table(spark, sf_dir, "documents", fan_out=True)
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


def _simhash_votes() -> "F.Column":
    """32-wide SimHash vote array in ONE token walk: hash each distinct token
    ONCE (the naive form calls xxhash64 inside every bit's aggregate — 32
    digests per token), then fold a 32-counter array with zip_with, testing
    each bit via a literal mask array (shiftright requires a literal count,
    masks don't). Returns the vote array — materialize it as a column before
    packing so the fold runs once, not once per referenced bit."""
    toks = F.array_distinct(tokens(F.col("text")))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    masks = F.array(*[F.lit(1 << i).cast("long") for i in range(32)])
    return F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 32),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(masks, lambda m: F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1)),
            lambda a, b: a + b,
        ),
    )


def _pack_simhash(votes: "F.Column") -> "F.Column":
    """Pack positive-vote bits of a 32-wide vote array into a long."""
    sim = F.lit(0).cast("long")
    for i in range(32):
        sim = sim + F.when(F.element_at(votes, i + 1) > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0)
        )
    return sim


def _simhash_frame(d: DataFrame, portable: bool = False) -> DataFrame:
    """(doc_id, lang, sh) SimHash signatures via explode + codegen sums.

    ``portable=False`` (production) hashes tokens with xxhash64 — the cheap
    engine-native path. ``portable=True`` derives the 32-bit token hash from
    an md5 prefix (``conv(substr(md5(tok),1,8),16,10)``), bit-identical in
    DuckDB (``('0x'||substr(md5,1,8))::BIGINT``) so the registered suite is
    value-verified by the driver oracle — the same md5-parity/xxhash64-
    production split as text_rolling_fingerprint (~10× cheaper per token in
    production; signature semantics identical either way).

    Value-equivalent to the HOF fold (``_simhash_votes`` + ``_pack_simhash``,
    kept as the reference implementation and pinned equal in
    tests/test_properties.py) but executes in whole-stage codegen instead of
    the interpreted higher-order-function evaluator: explode the distinct
    tokens, hash each once, and take 32 conditional SUMs — vote_i > 0 ⇔ the
    majority of token hashes set bit i, exactly the fold's criterion. The
    explode adds one doc_id-keyed shuffle, but the 32 sums partially aggregate
    map-side so only ~one combined row per (doc, partition) moves — at corpus
    scale this stays a linear one-pass plan. Measured 2.4× faster than the
    interpreted fold at sf0.1.

    Assumes non-null text (the corpus contract): ``explode`` of a null token
    array would drop the document where the fold would carry a null signature.
    """
    toks = d.select(
        "doc_id", "lang", F.explode(F.array_distinct(tokens(F.col("text")))).alias("tok")
    )
    h = (
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
        if portable
        else F.xxhash64("tok")
    )
    votes = toks.groupBy("doc_id", "lang").agg(
        *[
            F.sum(F.when(h.bitwiseAND(F.lit(1 << i).cast("long")) != 0, 1).otherwise(-1)).alias(
                f"v{i}"
            )
            for i in range(32)
        ]
    )
    sim = F.lit(0).cast("long")
    for i in range(32):
        sim = sim + F.when(F.col(f"v{i}") > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0))
    return votes.select("doc_id", "lang", sim.alias("sh"))


@builder("dedup_simhash")
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standalone per-language SimHash collision profile (round-1 name) —
    the registered surface is dedup_simhash_suite."""
    d = _simhash_frame(load_table(spark, sf_dir, "documents", fan_out=True)).withColumnRenamed("sh", "simhash")
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("doc_count"),
            F.countDistinct("simhash").alias("unique_simhashes"),
            (F.count("*") - F.countDistinct("simhash")).alias("simhash_collisions"),
        )
        .orderBy("lang")
    )


_SIMHASH_VOTES_SQL = ",\n                   ".join(
    f"SUM(CASE WHEN (h & {1 << i}) != 0 THEN 1 ELSE -1 END) AS v{i}" for i in range(32)
)
_SIMHASH_PACK_SQL = "\n                 + ".join(
    f"(CASE WHEN v{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(32)
)


@query(
    "dedup_simhash_suite",
    tags=("dedup", "simhash", "lsh"),
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, lang,
                   unnest(list_distinct(string_split(text, ' '))) AS tok
            FROM documents
        ),
        hashes AS (
            SELECT doc_id, lang,
                   CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT) AS h
            FROM toks
        ),
        votes AS (
            SELECT doc_id, lang,
                   {_SIMHASH_VOTES_SQL}
            FROM hashes
            GROUP BY doc_id, lang
        ),
        sigs AS (
            SELECT doc_id, lang,
                   CAST({_SIMHASH_PACK_SQL} AS BIGINT) AS sh
            FROM votes
        ),
        prof AS (
            SELECT lang, COUNT(*) AS doc_count, COUNT(DISTINCT sh) AS uniq
            FROM sigs GROUP BY lang
        ),
        profile AS (
            SELECT 'signatures' AS section, lang AS grp,
                   'doc_count' AS metric, CAST(doc_count AS BIGINT) AS value
            FROM prof
            UNION ALL
            SELECT 'signatures', lang, 'unique_simhashes', CAST(uniq AS BIGINT)
            FROM prof
            UNION ALL
            SELECT 'signatures', lang, 'simhash_collisions',
                   CAST(doc_count - uniq AS BIGINT)
            FROM prof
        ),
        bands AS (
            SELECT doc_id, sh, 0 AS band_id, sh & 65535 AS band_val FROM sigs
            UNION ALL
            SELECT doc_id, sh, 1, sh >> 16 FROM sigs
        ),
        pairs AS (
            SELECT bit_count(xor(a.sh, b.sh)) AS hamming
            FROM bands a JOIN bands b
              ON a.band_id = b.band_id
             AND a.band_val = b.band_val
             AND a.doc_id < b.doc_id
            WHERE a.band_id = 0 OR (a.sh & 65535) != (b.sh & 65535)
        ),
        hist AS (SELECT hamming, COUNT(*) AS pair_count FROM pairs GROUP BY hamming),
        histogram AS (
            SELECT 'hamming_pairs' AS section, CAST(hamming AS VARCHAR) AS grp,
                   'pair_count' AS metric, CAST(pair_count AS BIGINT) AS value
            FROM hist
            UNION ALL
            SELECT 'hamming_pairs', CAST(hamming AS VARCHAR), 'is_near_dup',
                   CAST(CASE WHEN hamming <= 3 THEN 1 ELSE 0 END AS BIGINT)
            FROM hist
        )
        SELECT * FROM (SELECT * FROM profile UNION ALL SELECT * FROM histogram)
        ORDER BY section, grp, metric
    """,
    doc="SimHash dedup suite in long (section, grp, metric, value) form, "
    "merging the fingerprint profile and the banded hamming candidate join: "
    "(1) per-token sign-sum packed to a 32-bit signature (md5-derived parity "
    "hash here so the driver value-verifies it; xxhash64 in the production "
    "builder dedup_simhash — same pipeline, ~10× cheaper hash), collision "
    "counts per language; (2) the near-duplicate candidate JOIN — each "
    "signature split into two 16-bit bands (pigeonhole: any pair within "
    "hamming distance 1 shares at least one exact band), bucket-join on band "
    "value, verify with bit_count(a XOR b) <= 3 — per-bucket joins only, "
    "never O(n²); xor/bit_count are native expressions. Emits the per-lang "
    "collision profile and the hamming-distance histogram of candidates.",
)
def dedup_simhash_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    # the 32-vote signature is the expensive subtree and feeds the profile AND
    # both sides of the band self-join — cache the tiny (doc_id, lang, sh)
    # frame so it is computed once, not three times
    sigs = _simhash_frame(d, portable=True).transform(tracked_cache)

    profile = (
        sigs.groupBy("lang")
        .agg(
            F.count("*").alias("doc_count"),
            F.countDistinct("sh").alias("unique_simhashes"),
        )
        .select(
            F.lit("signatures").alias("section"),
            F.col("lang").alias("grp"),
            F.explode(
                F.array(
                    F.struct(
                        F.lit("doc_count").alias("metric"),
                        F.col("doc_count").cast("long").alias("value"),
                    ),
                    F.struct(
                        F.lit("unique_simhashes").alias("metric"),
                        F.col("unique_simhashes").cast("long").alias("value"),
                    ),
                    F.struct(
                        F.lit("simhash_collisions").alias("metric"),
                        (F.col("doc_count") - F.col("unique_simhashes"))
                        .cast("long")
                        .alias("value"),
                    ),
                )
            ).alias("e"),
        )
        .select("section", "grp", "e.metric", "e.value")
    )

    # band decomposition: low/high 16 bits; same-band docs are candidates
    bands = sigs.select(
        "doc_id",
        "sh",
        F.lit(0).alias("band_id"),
        (F.col("sh").bitwiseAND(F.lit(0xFFFF))).alias("band_val"),
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
    # A pair matching in BOTH bands would be emitted twice; count it only in
    # its FIRST matching band (band 1 qualifies only when the low bands
    # differ) — the standard LSH dedup that replaces a 700k-pair distinct()
    # shuffle with a free post-join filter.
    pairs = a.join(
        b,
        (F.col("a.band_id") == F.col("b_band_id"))
        & (F.col("a.band_val") == F.col("b_band_val"))
        & (F.col("a.doc_id") < F.col("b_doc_id")),
    ).where(
        (F.col("a.band_id") == 0)
        | (F.col("a.sh").bitwiseAND(F.lit(0xFFFF)) != F.col("b_sh").bitwiseAND(F.lit(0xFFFF)))
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b_doc_id").alias("doc_b"),
        F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b_sh"))).alias("hamming"),
    )
    histogram = (
        pairs.groupBy("hamming")
        .agg(F.count("*").alias("pair_count"))
        .select(
            F.lit("hamming_pairs").alias("section"),
            F.col("hamming").cast("string").alias("grp"),
            F.explode(
                F.array(
                    F.struct(
                        F.lit("pair_count").alias("metric"),
                        F.col("pair_count").cast("long").alias("value"),
                    ),
                    F.struct(
                        F.lit("is_near_dup").alias("metric"),
                        F.when(F.col("hamming") <= 3, F.lit(1)).otherwise(0)
                        .cast("long")
                        .alias("value"),
                    ),
                )
            ).alias("e"),
        )
        .select("section", "grp", "e.metric", "e.value")
    )
    return profile.unionAll(histogram).orderBy("section", "grp", "metric")


_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")
_PUNCT = (".", ",", "!", "?", ";", ":")


@builder(
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


@builder("text_rolling_fingerprint_xx")
def text_rolling_fingerprint_xx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production variant of text_rolling_fingerprint: xxhash64 per shingle
    instead of md5 (~10x cheaper per position; md5 exists only so the oracle
    can reproduce signature values). Same plan shape — one codegen'd
    higher-order projection, one hash-agg — rows-only verification."""
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    rolling_fp = F.expr(
        "array_min(transform(sequence(1, greatest(length(text) - 6, 2) - 1),"
        " i -> xxhash64(substr(text, i, 8))))"
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


_MINHASH_FAST_SQL = minhash_fast_sql("shingles", 8)

#: Stages 1-3 of the fuzzy-dedup pipeline as a reusable CTE chain (no WITH
#: keyword): shingle → MinHash signature → 2-band LSH candidates → exploded-
#: shingle Jaccard scores. Ends at `scored(doc_a, doc_b, j)`. Shared by the
#: dedup pipeline and the cluster-components oracle (curation_queries.py).
SCORED_PAIRS_CTES = f"""shing AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       range(1, GREATEST(len(string_split(text, ' ')) - 2, 1) + 1),
                       i -> array_to_string((string_split(text, ' '))[i:i+2], ' ')
                   )) AS shingles
            FROM documents
        ), toks AS (
            SELECT doc_id, UNNEST(shingles) AS tok FROM shing
        ), sizes AS (
            SELECT doc_id, COUNT(*) AS n_tok FROM toks GROUP BY doc_id
        ), sigs AS (
            SELECT doc_id, {_MINHASH_FAST_SQL} AS sig
            FROM shing
        ), bands AS (
            SELECT doc_id, 0 AS band_id, md5(array_to_string(sig[1:4], '|')) AS band_key
            FROM sigs
            UNION ALL
            SELECT doc_id, 1, md5(array_to_string(sig[5:8], '|')) FROM sigs
        ), cands AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a
            JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
                        AND a.doc_id < b.doc_id
        ), inter AS (
            SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
            FROM cands c
            JOIN toks ta ON ta.doc_id = c.doc_a
            JOIN toks tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
            GROUP BY c.doc_a, c.doc_b
        ), scored AS (
            SELECT c.doc_a, c.doc_b,
                   CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
                       / (sa.n_tok + sb.n_tok - COALESCE(i.n_inter, 0)) AS j
            FROM cands c
            JOIN sizes sa ON sa.doc_id = c.doc_a
            JOIN sizes sb ON sb.doc_id = c.doc_b
            LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
        )"""


def scored_pair_frame(
    d: DataFrame,
    _stage_sink: dict | None = None,
    hash_family: str = "md5",
) -> DataFrame:
    """Stages 1-3 of the fuzzy-dedup pipeline over a documents frame:
    shingle-MinHash LSH candidate generation + exploded-shingle Jaccard
    verification. Returns ``(doc_a, doc_b, j)`` for every candidate pair
    (doc_a < doc_b). The Spark twin of :data:`SCORED_PAIRS_CTES`.

    ``hash_family``: ``"md5"`` (default — oracle-parity tier, DuckDB
    computes identical shingle strings and digests) or ``"xxhash64"``
    (production tier: HASHED shingling — shingle identities are xxhash64
    over k consecutive token hashes, no k-gram string ever materializes,
    and the band key is an xxhash64 long. The r11 per-stage breakdown
    measured signatures/banding at 95% of end-to-end wall-clock; the
    constant turned out to be shingle-STRING construction, not the digest
    — see functions.text.hashed_shingle_nums. Measured 20x on the x100
    signature stage). Identical banding semantics and verification;
    candidate SETS may differ (different minima), verified pairs are
    whatever survives exact Jaccard either way.

    ``_stage_sink``: measurement hook — when a dict is passed, the three
    cached stage frames (``bands``, ``cands``, ``cand_docs``) are exposed
    through it so the scaling sidecar can materialize and time each stage
    separately (bench_scaling's per-stage breakdown). Never used by
    queries."""
    band_fn = minhash_band if hash_family == "md5" else minhash_band_xx
    toks_arr = shingles(F.col("text"), 3)

    # stage 1: signatures + banding (per-row HOFs, zero shuffle). Each
    # expensive pass is materialized as its own column so downstream
    # consumers are arithmetic over it, never repeated sweeps.
    if hash_family == "md5":
        sigs = d.select("doc_id", minhash_nums(toks_arr).alias("nums"))
    else:
        # hashed shingles: token hashes staged FIRST (see token_hashes —
        # inlining them into the shingle lambda re-evaluates per element)
        sigs = d.select("doc_id", token_hashes(F.col("text")).alias("th")).select(
            "doc_id", hashed_shingle_nums(F.col("th"), 3).alias("nums")
        )
    sigs = sigs.select(
        "doc_id", minhash_signature_fast(F.col("nums"), 8).alias("sig")
    )
    # both bands from ONE signature evaluation (posexplode of the two band
    # keys), and the tiny (doc_id, band_id, band_key) frame is cached: it
    # feeds BOTH sides of the candidate self-join, which would otherwise
    # re-evaluate the whole shingle+minhash subtree once per side. At scale
    # this is the signature table a dedup service materializes once per
    # corpus snapshot.
    bands = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(band_fn(F.col("sig"), 0, 4), band_fn(F.col("sig"), 4, 4))
        ).alias("band_id", "band_key"),
    ).transform(tracked_cache)

    # stage 2: per-bucket candidate join (shuffle on band key, never all-pairs).
    # The candidate frame is cached — it feeds the semi-join that scopes
    # verification AND the verification joins themselves.
    a = bands.alias("a")
    b = bands.select(
        F.col("doc_id").alias("b_doc_id"),
        F.col("band_id").alias("b_band_id"),
        F.col("band_key").alias("b_band_key"),
    )
    cands = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b_band_id"))
            & (F.col("a.band_key") == F.col("b_band_key"))
            & (F.col("a.doc_id") < F.col("b_doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b_doc_id").alias("doc_b"))
        .distinct()
        .transform(tracked_cache)
    )

    # stage 3: Jaccard verification of CANDIDATES ONLY. Only documents that
    # appear in a candidate pair are ever joined, so the corpus is left-semi
    # pruned to candidate doc-ids BEFORE any per-token work — the cached
    # frame is O(candidate docs), not O(corpus tokens) (the latter is a
    # genuine 100 TB scale-killer: LSH keeps |candidates| << |corpus|).
    # Intersections are per-row array_intersect over the cached shingle
    # arrays (shingles() already dedupes, so |array_intersect| IS the exact
    # distinct-intersection cardinality): two hash joins of the small cands
    # frame against cand_docs replace the r13 explode + (tok, doc_b)
    # equi-join + groupBy — that path shuffled one row per (candidate pair
    # x shared token) and paid three extra exchanges; this one never
    # materializes per-token rows at all (r14, guide §2.3/§2.4).
    cand_ids = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cands.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    cand_docs = (
        d.join(cand_ids, "doc_id", "left_semi")
        .select("doc_id", toks_arr.alias("toks"))
        .transform(tracked_cache)
    )
    if _stage_sink is not None:
        _stage_sink.update(bands=bands, cands=cands, cand_docs=cand_docs)
    ca = cand_docs.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a"))
    cb = cand_docs.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b"))
    n_inter = F.size(F.array_intersect("toks_a", "toks_b"))
    return (
        cands.join(ca, "doc_a")
        .join(cb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                n_inter.cast("double")
                / (F.size("toks_a") + F.size("toks_b") - n_inter)
            ).alias("j"),
        )
    )


def scored_pairs_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MATERIALIZED scored-pair table for the corpus snapshot at
    ``sf_dir`` — ``(doc_a, doc_b, j)``, built once per snapshot and read by
    every downstream consumer (views-as-cache; see sources/snapshots.py).

    ``dedup_pipeline_end_to_end`` deliberately keeps the full recompute so
    the end-to-end cost of the pipeline stays measured; clustering and other
    secondary consumers read this table instead of rebuilding signatures —
    at 100 TB the signature/pair build is a once-per-snapshot batch job, not
    a per-query cost."""
    import os

    from aws_flight_data_pipeline_spark.sources.snapshots import (
        materialized_snapshot,
    )

    return materialized_snapshot(
        spark,
        "scored_pairs",
        [os.path.join(sf_dir, "documents.parquet")],
        lambda: scored_pair_frame(
            load_table(spark, sf_dir, "documents", fan_out=True)
        ),
    )


@query(
    "dedup_pipeline_end_to_end",
    tags=("dedup", "minhash", "lsh", "jaccard", "pipeline"),
    doc="The composed fuzzy-dedup pipeline — candidate generation, pair "
    "verification, survivor selection as ONE operator (reference analog: "
    "dedup strategy selection, data_transformer.py:612-659, generalized from "
    "key-equality to content similarity). Stages: (1) 3-token SHINGLE "
    "MinHash 8-hash signatures + 2-band LSH bucketing (md5 family, engine-"
    "portable; shingles, not unigrams — unigram minima degenerate on shared "
    "vocabulary, see functions.text.shingles); (2) candidate pairs via "
    "per-bucket self-join (doc_a < doc_b, distinct across bands) — never an "
    "all-pairs scan; (3) shingle-set Jaccard verification of candidates "
    "only, via exploded-shingle equi-join (hash joins end to end); (4) "
    "keep-first survivor selection: a doc is a duplicate iff it has a "
    "smaller-id verified near-dup partner (j >= 0.5) — single-pass, no "
    "iterative union-find: members of a near-dup cluster collide pairwise in "
    "the banding, so every non-minimal member is flagged directly. Emits "
    "per-source corpus accounting; avg verified similarity travels as exact "
    "integer micro-units (ROUND(j*1e6) per pair — dyadic-.5-safe).",
    oracle=f"""
        WITH {SCORED_PAIRS_CTES}, pair_stats AS (
            SELECT d.source,
                   COUNT(*) AS candidate_pairs,
                   CAST(SUM(CASE WHEN s.j >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
                       AS verified_dup_pairs,
                   CAST(SUM(CASE WHEN s.j >= 0.5
                            THEN CAST(ROUND(s.j * 1e6) AS BIGINT) ELSE 0 END) AS BIGINT)
                       AS jaccard_e6_total
            FROM scored s JOIN documents d ON d.doc_id = s.doc_b
            GROUP BY d.source
        ), dropped AS (
            SELECT d.source, COUNT(DISTINCT s.doc_b) AS duplicate_docs
            FROM scored s JOIN documents d ON d.doc_id = s.doc_b
            WHERE s.j >= 0.5
            GROUP BY d.source
        ), totals AS (
            SELECT source, COUNT(*) AS total_docs FROM documents GROUP BY source
        )
        SELECT t.source, t.total_docs,
               COALESCE(p.candidate_pairs, 0)    AS candidate_pairs,
               COALESCE(p.verified_dup_pairs, 0) AS verified_dup_pairs,
               COALESCE(d.duplicate_docs, 0)     AS duplicate_docs,
               t.total_docs - COALESCE(d.duplicate_docs, 0) AS surviving_docs,
               COALESCE(p.jaccard_e6_total, 0)   AS jaccard_e6_total
        FROM totals t
        LEFT JOIN pair_stats p ON p.source = t.source
        LEFT JOIN dropped d ON d.source = t.source
        ORDER BY t.source
    """,
)
def dedup_pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out: the MinHash-signature map stage dominates and must not run on
    # a single input split (measured honest-bench: 12.1 s -> ~1 s at sf0.1)
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    # stages 1-3 (shared with the cluster-components operator)
    scored = scored_pair_frame(d)
    return _dedup_survivor_rollup(d, scored)


def _dedup_survivor_rollup(d: DataFrame, scored: DataFrame) -> DataFrame:
    """Stage 4 of the fuzzy-dedup pipeline: per-source survivor accounting
    over a scored-pair frame — shared by the md5 oracle tier and the
    xxhash64 production twin."""
    docsrc = d.select(F.col("doc_id").alias("doc_b"), "source")
    scored_src = scored.join(docsrc, "doc_b")
    is_dup = F.col("j") >= 0.5
    # ONE aggregation pass: the r13 shape ran a second groupBy + left join
    # just for duplicate_docs; countDistinct over a NULL-masked doc_b
    # (non-dup rows -> NULL, skipped by COUNT DISTINCT) folds it into the
    # same hash aggregate, dropping one full pass over scored_src and one
    # join (r14, guide §2.4 "remove shuffles outright").
    pair_stats = scored_src.groupBy("source").agg(
        F.count("*").alias("candidate_pairs"),
        F.sum(F.when(is_dup, 1).otherwise(0)).alias("verified_dup_pairs"),
        F.sum(F.when(is_dup, F.round(F.col("j") * 1e6).cast("long")).otherwise(0))
        .cast("bigint")
        .alias("jaccard_e6_total"),
        F.countDistinct(F.when(is_dup, F.col("doc_b"))).alias("duplicate_docs"),
    )
    totals = d.groupBy("source").agg(F.count("*").alias("total_docs"))
    return (
        totals.join(pair_stats, "source", "left")
        .select(
            "source",
            "total_docs",
            F.coalesce("candidate_pairs", F.lit(0)).alias("candidate_pairs"),
            F.coalesce("verified_dup_pairs", F.lit(0)).alias("verified_dup_pairs"),
            F.coalesce("duplicate_docs", F.lit(0)).alias("duplicate_docs"),
            (F.col("total_docs") - F.coalesce("duplicate_docs", F.lit(0))).alias(
                "surviving_docs"
            ),
            F.coalesce("jaccard_e6_total", F.lit(0)).alias("jaccard_e6_total"),
        )
        .orderBy("source")
    )


@builder(
    "dedup_pipeline_end_to_end_xx",
    tags=("dedup", "minhash", "lsh", "jaccard", "pipeline", "xxhash", "scale"),
    doc="Production hash-family twin of dedup_pipeline_end_to_end (verdict "
    "r11 #4): identical stages and survivor semantics, but stage 1 uses "
    "HASHED SHINGLING — one xxhash64 per token, shingle identity = "
    "xxhash64 over the k consecutive token hashes (a multi-arg long hash; "
    "no k-gram string ever materializes), dedup in 64-bit space, band key "
    "an xxhash64 long. Measurement drove the design: the r11 per-stage "
    "breakdown put signatures/banding at 95% of end-to-end wall-clock at "
    "x1000 (646 of 664 s), and swapping ONLY the digest over the same "
    "shingle strings bought 1.06x — the constant is k-gram string "
    "construction + string array_distinct, which hashed shingling removes "
    "entirely (x100 signature stage: 72.1 -> 3.5 s, 20x; end-to-end in "
    "bench_scaling --hash-family). Candidate SETS may differ between "
    "families (different minima pick different band keys — LSH recall is "
    "family-dependent by nature); verification is the same exact Jaccard "
    "over real shingle strings, so reported pairs are exact under either "
    "family. Rows-only verification (xxhash64 has no DuckDB twin — the "
    "established _xx precedent: text_rolling_fingerprint_xx, "
    "dedup_paragraphs_xx, dedup_segments_cdc_xx); no-false-positive and "
    "family-agreement properties pinned in tests/test_dedup_hash_family.py.",
)
def dedup_pipeline_end_to_end_xx(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    scored = scored_pair_frame(d, hash_family="xxhash64")
    return _dedup_survivor_rollup(d, scored)


#: Document-frequency cap for the family-agreement entry's complete
#: shared-shingle join (verdict r13 missing #1): a shingle appearing in
#: more than this many documents is dropped from BOTH sides before sizes
#: and intersections — the production-standard stop-shingle drop. With
#: the cap, join volume is Σ_{df<=cap} df² <= cap · Σ df = cap · (total
#: shingle rows), i.e. LINEAR in the corpus by construction instead of
#: by corpus-profile luck (uncapped, a single df-D shingle contributes
#: D² rows — measured in bench_scaling's heavy-df stressor). On the test
#: corpus max df is 25, so the cap provably changes nothing at any sf —
#: the oracle mirrors the same filter, keeping the hash match exact.
_FAMILY_AGREEMENT_DF_CAP = 256


def _family_agreement_frame(
    d: DataFrame, df_cap: int | None = _FAMILY_AGREEMENT_DF_CAP
) -> DataFrame:
    """Shared body of ``dedup_family_agreement_xx`` with the df-cap as a
    knob (``None`` = uncapped — only bench_scaling's heavy-df stressor
    uses that, to measure what the cap prevents)."""
    tok_raw = d.select("doc_id", token_hashes(F.col("text")).alias("th")).select(
        "doc_id", F.explode(hashed_shingles(F.col("th"), 3)).alias("tok")
    )
    if df_cap is not None:
        # stop-shingle drop: df per shingle rides the same hash partitioning
        # the pair join needs, so the semi-join adds no exchange on the big
        # side (groupBy("tok") output partitioning == join key). Only the
        # FILTERED token table is cached — hashed shingling is cheap enough
        # to recompute for the df pass (the xx family's whole point), and
        # caching the raw table too doubled storage pressure for no reuse
        # after this block (the double cache OOM'd the x1000 sweep child).
        light = (
            tok_raw.groupBy("tok")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") <= df_cap)
            .select("tok")
        )
        tok = tok_raw.join(light, "tok", "left_semi").transform(tracked_cache)
    else:
        tok = tok_raw.transform(tracked_cache)
    sizes = tok.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("sz"))
    # complete shared-shingle join: both sides distinct per (doc, tok), so
    # COUNT(*) per pair IS the exact intersection — one shuffle, one agg.
    # Join volume is Σ df² over SURVIVING shingles, <= df_cap · (token
    # rows): linear in the corpus by construction. Prefix filtering at
    # t = 1/2 indexes floor(sz/2)+1 shingles per doc — measured WORSE here
    # (310k candidates for 252 true pairs, plus a dfreq pass, a per-doc
    # rank window, and a 3-way verify re-join); the prefix filter earns
    # its keep on heavy-tailed df at higher thresholds, which is
    # set_similarity_join's department (t = 0.8, swept ×100 at 0.781).
    ta = tok.select(F.col("doc_id").alias("doc_a"), "tok")
    tb = tok.select(F.col("doc_id").alias("doc_b"), "tok")
    inter = (
        ta.join(tb, "tok")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    union_sz = F.col("sz_a") + F.col("sz_b") - F.col("n_common")
    verified = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(2 * F.col("n_common") >= union_sz)
        .select(
            "doc_a",
            "doc_b",
            F.round(F.lit(1_000_000.0) * F.col("n_common") / union_sz)
            .cast("bigint")
            .alias("jac_e6"),
        )
    )
    vsrc = verified.join(
        d.select(F.col("doc_id").alias("doc_b"), "source"), "doc_b"
    )
    pair_stats = vsrc.groupBy("source").agg(
        F.count("*").cast("bigint").alias("verified_dup_pairs"),
        F.countDistinct("doc_b").cast("bigint").alias("duplicate_docs"),
        F.sum("jac_e6").cast("bigint").alias("jaccard_e6_total"),
    )
    totals = d.groupBy("source").agg(F.count("*").cast("bigint").alias("total_docs"))
    return (
        totals.join(pair_stats, "source", "left")
        .select(
            "source",
            "total_docs",
            F.coalesce("verified_dup_pairs", F.lit(0)).alias("verified_dup_pairs"),
            F.coalesce("duplicate_docs", F.lit(0)).alias("duplicate_docs"),
            (F.col("total_docs") - F.coalesce("duplicate_docs", F.lit(0))).alias(
                "surviving_docs"
            ),
            F.coalesce("jaccard_e6_total", F.lit(0)).alias("jaccard_e6_total"),
        )
        .orderBy("source")
    )


@query(
    "dedup_family_agreement_xx",
    tags=("dedup", "xxhash", "prefix-filter", "jaccard", "pipeline", "scale"),
    doc="The xxhash64 production hash family under the driver's HASH-MATCH "
    "gate for the first time (verdict r12 #4 / missing #3): the Spark side "
    "runs HASHED SHINGLING — one xxhash64 per token, shingle identity = "
    "raw 64-bit xxhash64 over k token hashes, no k-gram string ever "
    "materializes (functions.text.hashed_shingles, the machinery measured "
    "16x on the dedup signature stage) — through the df-CAPPED complete "
    "shared-shingle self-join (count per pair = exact intersection; "
    "shingles with document frequency above _FAMILY_AGREEMENT_DF_CAP are "
    "dropped from both sides first — the production stop-shingle drop, "
    "verdict r13 missing #1 — so join volume is Σ_{df<=cap} df² <= "
    "cap · token-rows, LINEAR in the corpus by construction; uncapped "
    "it is Σ df², quadratic in any heavy shingle's df, measured in "
    "bench_scaling's heavy-df stressor; max df on this corpus is 25, so "
    "the cap changes nothing at any sf and the oracle mirrors the same "
    "filter), then exact integer-threshold Jaccard "
    "(2|∩| >= |∪|) and the per-source survivor rollup. "
    "The DuckDB oracle computes the SAME totals from the string-shingle "
    "tier (distinct 3-token shingles, all shared-shingle pairs, identical "
    "integer threshold), so a hash match certifies the hashed-shingle "
    "family produces VALUE-IDENTICAL dedup decisions to the oracle-tier "
    "strings — the family-agreement contract of "
    "tests/test_dedup_hash_family.py promoted into the 50-slot gate. The "
    "EXACT candidate stage (not LSH banding) is deliberate: banded recall "
    "is family-dependent by nature (measured: the families' verified sets "
    "differ by 1 pair at sf0.01), so only the exact grain is "
    "cross-engine-hashable; the LSH production tier stays property-pinned "
    "and swept (dedup_pipeline_end_to_end_xx). Accounting columns are the "
    "rollup's family-agnostic subset — candidate counts are construction-"
    "dependent and deliberately excluded.",
    oracle="""
        WITH tok0 AS (
            SELECT doc_id, UNNEST(list_distinct(list_transform(
                range(1, GREATEST(len(string_split(text, ' ')) - 2, 1) + 1),
                i -> array_to_string((string_split(text, ' '))[i:i+2], ' ')
            ))) AS tok
            FROM documents
        ), light AS (
            SELECT tok FROM tok0 GROUP BY tok HAVING COUNT(*) <= 256
        ), tok AS (
            SELECT t.doc_id, t.tok FROM tok0 t SEMI JOIN light l ON l.tok = t.tok
        ), sizes AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM tok GROUP BY 1
        ), inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(COUNT(*) AS BIGINT) AS n_common
            FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ), verified AS (
            SELECT i.doc_a, i.doc_b,
                   CAST(ROUND(1000000.0 * i.n_common
                              / (sa.sz + sb.sz - i.n_common)) AS BIGINT) AS jac_e6
            FROM inter i
            JOIN sizes sa ON sa.doc_id = i.doc_a
            JOIN sizes sb ON sb.doc_id = i.doc_b
            WHERE 2 * i.n_common >= sa.sz + sb.sz - i.n_common
        ), pair_stats AS (
            SELECT d.source,
                   CAST(COUNT(*) AS BIGINT) AS verified_dup_pairs,
                   CAST(COUNT(DISTINCT v.doc_b) AS BIGINT) AS duplicate_docs,
                   CAST(SUM(v.jac_e6) AS BIGINT) AS jaccard_e6_total
            FROM verified v JOIN documents d ON d.doc_id = v.doc_b
            GROUP BY d.source
        ), totals AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS total_docs
            FROM documents GROUP BY source
        )
        SELECT t.source, t.total_docs,
               COALESCE(p.verified_dup_pairs, 0) AS verified_dup_pairs,
               COALESCE(p.duplicate_docs, 0)     AS duplicate_docs,
               t.total_docs - COALESCE(p.duplicate_docs, 0) AS surviving_docs,
               COALESCE(p.jaccard_e6_total, 0)   AS jaccard_e6_total
        FROM totals t LEFT JOIN pair_stats p ON p.source = t.source
        ORDER BY t.source
    """,
)
def dedup_family_agreement_xx(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    return _family_agreement_frame(d)


@builder(
    "text_language_id",
    tags=("text", "langid", "classify"),
    doc="Trainable n-gram language-ID heuristic, fit and applied in one plan: "
    "(1) FIT — per-language token-frequency profiles over the full lang×vocab "
    "grid with add-one smoothing; (2) APPLY — each document scores every "
    "language by summing its tokens' profile weights and predicts the argmax "
    "(deterministic lang-ascending tiebreak); (3) REPORT — the (actual, "
    "predicted) confusion matrix. Weights are integer fixed-point "
    "((c+1)*1e6 div (n_l+V)) so scoring is exact BIGINT arithmetic in both "
    "engines — no log/float summation-order divergence. Scale shape: token "
    "explode is linear, the profile (|langs|×|vocab| rows) broadcasts, "
    "scoring is one map-side-combinable groupBy(doc, lang), the argmax is a "
    "5-row-per-doc window. On this synthetic corpus the text distribution is "
    "language-independent, so accuracy is chance level — the operator "
    "demonstrates the full fit/apply/evaluate plumbing, which is the "
    "engine-relevant part.",
    oracle="""
        WITH tok AS (
            SELECT doc_id, lang AS actual, UNNEST(string_split(text, ' ')) AS tok
            FROM documents
        ),
        counts AS (
            SELECT actual AS lang, tok, CAST(COUNT(*) AS BIGINT) AS c
            FROM tok GROUP BY 1, 2
        ),
        langs AS (SELECT DISTINCT lang FROM documents),
        vocab AS (SELECT DISTINCT tok FROM tok),
        v AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
        lang_tot AS (
            SELECT lang, CAST(SUM(c) AS BIGINT) AS n_l FROM counts GROUP BY 1
        ),
        profile AS (
            SELECT l.lang, t.tok,
                   ((COALESCE(c.c, 0) + 1) * 1000000) // (lt.n_l + v.v) AS weight
            FROM langs l
            CROSS JOIN vocab t
            CROSS JOIN v
            JOIN lang_tot lt ON lt.lang = l.lang
            LEFT JOIN counts c ON c.lang = l.lang AND c.tok = t.tok
        ),
        scores AS (
            SELECT tk.doc_id, tk.actual, p.lang AS cand,
                   CAST(SUM(p.weight) AS BIGINT) AS score
            FROM tok tk JOIN profile p ON p.tok = tk.tok
            GROUP BY 1, 2, 3
        ),
        pred AS (
            SELECT doc_id, actual, cand AS predicted
            FROM scores
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY doc_id ORDER BY score DESC, cand ASC
            ) = 1
        )
        SELECT actual, predicted, CAST(COUNT(*) AS BIGINT) AS doc_count
        FROM pred
        GROUP BY actual, predicted
        ORDER BY actual, predicted
    """,
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.col("lang").alias("actual"), F.explode(tokens(F.col("text"))).alias("tok")
    )
    counts = tok.groupBy(F.col("actual").alias("lang"), "tok").agg(F.count("*").alias("c"))
    lang_tot = counts.groupBy("lang").agg(F.sum("c").alias("n_l"))
    vocab = tok.select("tok").distinct()
    v = vocab.agg(F.count("*").alias("v"))
    langs = d.select("lang").distinct()
    # full smoothed lang×vocab grid; |langs|×|vocab| rows — broadcastable at
    # any corpus size once vocab is capped (top-k by frequency at 100 TB)
    profile = (
        langs.crossJoin(vocab)
        .join(counts, ["lang", "tok"], "left")
        .na.fill({"c": 0})
        .join(F.broadcast(lang_tot), "lang")
        .crossJoin(F.broadcast(v))
        .select("lang", "tok", F.expr("((c + 1) * 1000000) div (n_l + v)").alias("weight"))
    )
    scores = (
        tok.join(F.broadcast(profile.withColumnRenamed("lang", "cand")), "tok")
        .groupBy("doc_id", "actual", "cand")
        .agg(F.sum("weight").alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("cand").asc())
    pred = scores.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return (
        pred.groupBy("actual", F.col("cand").alias("predicted"))
        .agg(F.count("*").alias("doc_count"))
        .orderBy("actual", "predicted")
    )


_INC_SOURCES_SQL = "('src18', 'src19')"


@builder(
    "corpus_merge_increment",
    tags=("dedup", "merge", "incremental", "lsh"),
    doc="Incremental corpus ingestion — admit a new document increment "
    "against an EXISTING corpus (the operation a training-data pipeline runs "
    "per crawl snapshot; here the increment is the src18/src19 slice). "
    "Stages: (1) exact rejection — the increment's content fingerprints "
    "left-semi-join the existing corpus's fingerprint set; (2) near-dup "
    "rejection — shingle fast-MinHash 2-band LSH keys of the increment join "
    "the EXISTING corpus's band table (asymmetric: increment × corpus, never "
    "corpus × corpus), candidates verified by exploded-shingle Jaccard with "
    "the INTEGER-EXACT threshold 2·|∩| ≥ |A|+|B|−|∩| (no doubles anywhere); "
    "(3) per-source admission accounting. At production scale the existing "
    "corpus's fingerprint + band tables are materialized once per snapshot, "
    "so each increment's cost is proportional to the increment, not the "
    "corpus. Increment-internal duplicates are the batch "
    "dedup_pipeline_end_to_end operator's job.",
    oracle=f"""
        WITH inc AS (
            SELECT * FROM documents WHERE source IN {_INC_SOURCES_SQL}
        ), corpus AS (
            SELECT * FROM documents WHERE source NOT IN {_INC_SOURCES_SQL}
        ), corpus_fp AS (
            SELECT DISTINCT md5(LOWER(TRIM(text))) AS fp FROM corpus
        ), exact AS (
            SELECT i.doc_id
            FROM inc i JOIN corpus_fp e ON e.fp = md5(LOWER(TRIM(i.text)))
        ), shing AS (
            SELECT doc_id, source,
                   list_distinct(list_transform(
                       range(1, GREATEST(len(string_split(text, ' ')) - 2, 1) + 1),
                       i -> array_to_string((string_split(text, ' '))[i:i+2], ' ')
                   )) AS shingles
            FROM documents
        ), toks AS (
            SELECT doc_id, UNNEST(shingles) AS tok FROM shing
        ), sizes AS (
            SELECT doc_id, COUNT(*) AS n_tok FROM toks GROUP BY doc_id
        ), sigs AS (
            SELECT doc_id, source, {_MINHASH_FAST_SQL} AS sig FROM shing
        ), bands AS (
            SELECT doc_id, source,
                   0 AS band_id, md5(array_to_string(sig[1:4], '|')) AS band_key
            FROM sigs
            UNION ALL
            SELECT doc_id, source, 1, md5(array_to_string(sig[5:8], '|')) FROM sigs
        ), cands AS (
            SELECT DISTINCT i.doc_id AS i_doc, e.doc_id AS e_doc
            FROM bands i
            JOIN bands e ON e.band_id = i.band_id AND e.band_key = i.band_key
            WHERE i.source IN {_INC_SOURCES_SQL}
              AND e.source NOT IN {_INC_SOURCES_SQL}
        ), inter AS (
            SELECT c.i_doc, c.e_doc, COUNT(*) AS n_inter
            FROM cands c
            JOIN toks ta ON ta.doc_id = c.i_doc
            JOIN toks tb ON tb.doc_id = c.e_doc AND tb.tok = ta.tok
            GROUP BY c.i_doc, c.e_doc
        ), near AS (
            SELECT DISTINCT c.i_doc AS doc_id
            FROM cands c
            JOIN sizes sa ON sa.doc_id = c.i_doc
            JOIN sizes sb ON sb.doc_id = c.e_doc
            LEFT JOIN inter x ON x.i_doc = c.i_doc AND x.e_doc = c.e_doc
            WHERE 2 * COALESCE(x.n_inter, 0)
                  >= sa.n_tok + sb.n_tok - COALESCE(x.n_inter, 0)
        ), flags AS (
            SELECT i.doc_id, i.source,
                   CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_exact,
                   CASE WHEN n.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_near
            FROM inc i
            LEFT JOIN exact e ON e.doc_id = i.doc_id
            LEFT JOIN near n ON n.doc_id = i.doc_id
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS incoming_docs,
               CAST(SUM(is_exact) AS BIGINT) AS exact_dup_docs,
               CAST(SUM(CASE WHEN is_near = 1 AND is_exact = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS near_dup_docs,
               CAST(SUM(CASE WHEN is_exact = 0 AND is_near = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS admitted_docs
        FROM flags
        GROUP BY source
        ORDER BY source
    """,
)
def corpus_merge_increment(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out: signature computation over the full corpus dominates
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    inc_sources = ("src18", "src19")
    is_inc = F.col("source").isin(*inc_sources)
    inc, corpus = d.where(is_inc), d.where(~is_inc)

    # exact rejection: increment fp semi-join the corpus fingerprint set
    corpus_fp = corpus.select(fingerprint(F.col("text")).alias("fp")).distinct()
    exact = (
        inc.select("doc_id", fingerprint(F.col("text")).alias("fp"))
        .join(corpus_fp, "fp", "left_semi")
        .select("doc_id")
    )

    # near-dup rejection: asymmetric increment × corpus LSH candidate join
    toks_arr = shingles(F.col("text"), 3)
    bands = (
        d.select("doc_id", is_inc.alias("is_inc"), minhash_nums(toks_arr).alias("nums"))
        .select("doc_id", "is_inc", minhash_signature_fast(F.col("nums"), 8).alias("sig"))
        .select(
            "doc_id",
            "is_inc",
            F.posexplode(
                F.array(minhash_band(F.col("sig"), 0, 4), minhash_band(F.col("sig"), 4, 4))
            ).alias("band_id", "band_key"),
        )
        .transform(tracked_cache)
    )
    bi = bands.where("is_inc").select(F.col("doc_id").alias("i_doc"), "band_id", "band_key")
    be = bands.where(~F.col("is_inc")).select(
        F.col("doc_id").alias("e_doc"), "band_id", "band_key"
    )
    cands = (
        bi.join(be, ["band_id", "band_key"])
        .select("i_doc", "e_doc")
        .distinct()
        .transform(tracked_cache)
    )

    # Jaccard verification over CANDIDATE docs only (semi-join prune before
    # any per-token work — same O(candidates) discipline as
    # scored_pair_frame). r14: per-pair array_intersect over the cached
    # shingle arrays replaces the r13 explode + (tok, e_doc) equi-join +
    # groupBy + three re-joins — no per-token rows ever materialize and
    # four exchanges drop out (guide §2.3/§2.4).
    cand_ids = (
        cands.select(F.col("i_doc").alias("doc_id"))
        .unionByName(cands.select(F.col("e_doc").alias("doc_id")))
        .distinct()
    )
    cand_docs = (
        d.join(cand_ids, "doc_id", "left_semi")
        .select("doc_id", toks_arr.alias("toks"))
        .transform(tracked_cache)
    )
    ca = cand_docs.select(F.col("doc_id").alias("i_doc"), F.col("toks").alias("toks_a"))
    cb = cand_docs.select(F.col("doc_id").alias("e_doc"), F.col("toks").alias("toks_b"))
    n_inter = F.size(F.array_intersect("toks_a", "toks_b"))
    near = (
        cands.join(ca, "i_doc")
        .join(cb, "e_doc")
        # integer-exact Jaccard >= 0.5:  2|∩| >= |A| + |B| - |∩|
        .where(2 * n_inter >= F.size("toks_a") + F.size("toks_b") - n_inter)
        .select(F.col("i_doc").alias("doc_id"))
        .distinct()
    )

    flags = (
        inc.select("doc_id", "source")
        .join(exact.withColumn("is_exact", F.lit(1)), "doc_id", "left")
        .join(near.withColumn("is_near", F.lit(1)), "doc_id", "left")
        .na.fill({"is_exact": 0, "is_near": 0})
    )
    return (
        flags.groupBy("source")
        .agg(
            F.count("*").alias("incoming_docs"),
            F.sum("is_exact").alias("exact_dup_docs"),
            F.sum(F.when((F.col("is_near") == 1) & (F.col("is_exact") == 0), 1).otherwise(0))
            .alias("near_dup_docs"),
            F.sum(F.when((F.col("is_exact") == 0) & (F.col("is_near") == 0), 1).otherwise(0))
            .alias("admitted_docs"),
        )
        .orderBy("source")
    )


#: Sub-document dedup segment width (words per chunk). Chunk hashing is the
#: distributed approximation of exact-substring dedup (the suffix-array
#: formulation of Lee et al., "Deduplicating Training Data Makes Language
#: Models Better"): repeated passages longer than ~2 segments are caught by
#: their interior chunks regardless of alignment.
_SEG_WORDS = 10


@builder(
    "dedup_paragraphs",
    tags=("dedup", "subdocument", "segments", "llm-ops"),
    doc="SUB-document exact dedup: each document is cut into consecutive "
    f"{_SEG_WORDS}-word segments; a segment KEEPS only its first occurrence "
    "corpus-wide (lexicographic (doc_id, position) — deterministic), every "
    "later occurrence is dropped. This is the fine-grained layer document-"
    "level dedup cannot see: boilerplate headers, license blocks and quoted "
    "passages repeat across otherwise-distinct documents. Scale shape: one "
    "explode (linear in corpus words), one shuffle keyed on the segment for "
    "first-occurrence election via min(struct(doc_id, pos)) — map-side "
    "combinable, no window sort — and one join back on the same key (the "
    "exchange is reusable). Per-source rollup of exact integers. At 100 TB "
    "carry xxhash64/md5 fingerprints through the shuffle instead of segment "
    "text (the dedup_paragraphs_xx production twin).",
    oracle=f"""
        WITH words AS (
            SELECT doc_id, source, string_split(text, ' ') AS w
            FROM documents
        ), segs AS (
            SELECT doc_id, source, k AS pos,
                   array_to_string(w[(k*{_SEG_WORDS}+1):(k*{_SEG_WORDS}+{_SEG_WORDS})], ' ') AS seg
            FROM words,
                 UNNEST(range(0, CAST(CEIL(len(w) / {_SEG_WORDS}.0) AS BIGINT))) AS t(k)
        ), ranked AS (
            SELECT source, seg,
                   ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
            FROM segs
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT)                      AS segments_total,
               CAST(COUNT(*) FILTER (rn > 1) AS BIGINT)      AS segments_dropped,
               CAST(COUNT(DISTINCT seg) AS BIGINT)           AS distinct_segments,
               CAST(SUM(CASE WHEN rn = 1 THEN LEN(seg) ELSE 0 END) AS BIGINT)
                   AS chars_kept
        FROM ranked
        GROUP BY source
        ORDER BY source
    """,
)
def dedup_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    return _paragraph_rollup(d, F.col("seg"))


def _paragraph_segments(d: DataFrame) -> DataFrame:
    """(doc_id, source, pos, seg): consecutive _SEG_WORDS-word chunks."""
    words = F.split(F.col("text"), " ")
    n_seg = F.ceil(F.size(words) / _SEG_WORDS).cast("long")
    chunks = F.transform(
        F.sequence(F.lit(0).cast("long"), n_seg - 1),
        lambda k: F.array_join(
            F.slice(words, k * _SEG_WORDS + 1, _SEG_WORDS), " "
        ),
    )
    return d.select(
        "doc_id", "source", F.posexplode(chunks).alias("pos", "seg")
    )


def _paragraph_rollup(d: DataFrame, key: F.Column) -> DataFrame:
    """First-occurrence election + per-source rollup over aligned chunks."""
    return _segment_rollup(_paragraph_segments(d), key)


def _segment_rollup(segments: DataFrame, key: F.Column) -> DataFrame:
    """First-occurrence election + per-source rollup over a (doc_id, source,
    pos, seg) frame, keyed on ``key`` (the raw segment for oracle parity; a
    hash in production). Shared by the aligned-chunk and content-defined
    segmenters — the election is segmentation-agnostic."""
    segs = segments.withColumn("k", key)
    firsts = segs.groupBy("k").agg(
        F.min(F.struct("doc_id", "pos")).alias("first")
    )
    marked = segs.join(firsts, "k").withColumn(
        "is_first",
        (F.col("doc_id") == F.col("first.doc_id"))
        & (F.col("pos") == F.col("first.pos")),
    )
    return (
        marked.groupBy("source")
        .agg(
            F.count("*").alias("segments_total"),
            F.sum((~F.col("is_first")).cast("long"))
            .cast("bigint")
            .alias("segments_dropped"),
            F.countDistinct("k").alias("distinct_segments"),
            F.sum(
                F.when(F.col("is_first"), F.length("seg")).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("chars_kept"),
        )
        .orderBy("source")
    )


@builder("dedup_paragraphs_xx")
def dedup_paragraphs_xx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production twin of dedup_paragraphs: the first-occurrence shuffle
    carries xxhash64(segment) (8 bytes) instead of the segment text — at
    100 TB the shuffle payload IS the cost, and the election/join only ever
    needed a key. chars_kept still measures real segment text (computed
    map-side before the shuffle). Rows-only verification (xxhash64 class,
    same split as text_rolling_fingerprint/_xx)."""
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    return _paragraph_rollup(d, F.xxhash64(F.col("seg")))


#: Content-defined chunking parameters: a word position starts a new segment
#: when the md5 of the _CDC_W-word shingle at that position hits 0 mod
#: _CDC_D — so expected segment length ≈ _CDC_D words and, crucially,
#: boundaries depend only on a local content window, never on offsets.
_CDC_W = 3
_CDC_D = 8


def _cdc_segments(d: DataFrame) -> DataFrame:
    """(doc_id, source, pos, seg): CONTENT-DEFINED segments.

    Fixed-stride chunking (``_paragraph_segments``) is blind to shifted
    duplicates: a passage repeated at a 1-word offset lands in different
    chunks and hashes differently everywhere. Here segment boundaries are
    chosen by the text itself — position ``i`` (>= 2, with a full
    ``_CDC_W``-word window) starts a new segment iff the window's md5-prefix
    value is 0 mod ``_CDC_D`` (the winnowing/rolling-hash breakpoint idea of
    ``text_rolling_fingerprint`` applied to segmentation; the
    content-defined-chunking scheme of LBFS/rsync applied to words). A
    duplicated passage reproduces its interior boundaries AT ANY OFFSET, so
    its interior segments hash identically and the same first-occurrence
    election that serves aligned chunks catches shifted duplication.

    Entirely per-row Column HOFs (one codegen projection, zero shuffle
    before the explode); md5-prefix arithmetic is engine-portable so the
    oracle reproduces boundaries bit-for-bit.
    """
    base = d.select(
        "doc_id", "source", F.split(F.col("text"), " ").alias("words")
    )
    words = F.col("words")
    n = F.size(words)

    def is_bp(i: F.Column) -> F.Column:
        sh = F.array_join(F.slice(words, i, _CDC_W), " ")
        h = F.conv(F.substring(F.md5(sh), 1, 8), 16, 10).cast("long")
        return h % _CDC_D == 0

    cand_hi = n - (_CDC_W - 1)  # last position with a full boundary window
    interior = F.when(
        cand_hi >= 2, F.filter(F.sequence(F.lit(2), cand_hi), is_bp)
    ).otherwise(F.array().cast("array<int>"))
    # STAGE the breakpoint array as its own projected column before the
    # segment transform references it: `get(bps, idx + 1)` inside the
    # lambda re-evaluates its operand PER ELEMENT, so an inline breakpoint
    # expression would recompute the full O(words) md5 sweep for every
    # segment — O(words × segments) digests. As a materialized column the
    # sweep runs once per document (measured 2.6 s → 1.1 s at sf0.1).
    staged = base.select(
        "doc_id",
        "source",
        "words",
        F.concat(F.array(F.lit(1)), interior).alias("bps"),
    )
    bps = F.col("bps")
    segs = F.transform(
        bps,
        lambda bp, idx: F.array_join(
            F.slice(words, bp, F.coalesce(F.get(bps, idx + 1), n + 1) - bp), " "
        ),
    )
    return staged.select("doc_id", "source", F.posexplode(segs).alias("pos", "seg"))


@builder(
    "dedup_segments_cdc",
    tags=("dedup", "subdocument", "segments", "cdc", "llm-ops"),
    doc="SHIFT-INVARIANT sub-document dedup: content-defined chunk "
    "boundaries (md5 shingle breakpoints, expected segment ≈ "
    f"{_CDC_D} words) + the same corpus-wide first-occurrence election as "
    "dedup_paragraphs. Fixed-stride chunking misses any duplicated passage "
    "not aligned to the stride — real boilerplate/license/quote duplication "
    "never is; content-defined boundaries resynchronize inside the passage "
    "so interior segments match at any offset (pinned by "
    "tests/test_flight_operators.py planted-offset test). Scale shape "
    "identical to dedup_paragraphs: linear explode, one segment-keyed "
    "shuffle with map-side-combinable min(struct) election, one join back.",
    oracle=f"""
        WITH words AS (
            SELECT doc_id, source, string_split(text, ' ') AS w
            FROM documents
        ), bps AS (
            SELECT doc_id, source, w,
                   list_prepend(1, list_filter(range(2, len(w) - {_CDC_W - 1} + 1),
                       i -> ('0x' || substr(md5(array_to_string(w[i:i+{_CDC_W - 1}], ' ')), 1, 8))::BIGINT
                            % {_CDC_D} = 0)) AS bp
            FROM words
        ), segs AS (
            SELECT doc_id, source, k - 1 AS pos,
                   array_to_string(
                       w[bp[k]:(CASE WHEN k < len(bp) THEN bp[k+1] - 1 ELSE len(w) END)],
                       ' ') AS seg
            FROM bps, UNNEST(range(1, len(bp) + 1)) AS t(k)
        ), ranked AS (
            SELECT source, seg,
                   ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
            FROM segs
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT)                      AS segments_total,
               CAST(COUNT(*) FILTER (rn > 1) AS BIGINT)      AS segments_dropped,
               CAST(COUNT(DISTINCT seg) AS BIGINT)           AS distinct_segments,
               CAST(SUM(CASE WHEN rn = 1 THEN LEN(seg) ELSE 0 END) AS BIGINT)
                   AS chars_kept
        FROM ranked
        GROUP BY source
        ORDER BY source
    """,
)
def dedup_segments_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    return _segment_rollup(_cdc_segments(d), F.col("seg"))


@builder("dedup_segments_cdc_xx")
def dedup_segments_cdc_xx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production twin of dedup_segments_cdc: xxhash64(segment) through the
    election shuffle instead of segment text (same 8-byte-key discipline as
    dedup_paragraphs_xx; rows-only verification, xxhash64 class)."""
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    return _segment_rollup(_cdc_segments(d), F.xxhash64(F.col("seg")))


@builder(
    "string_fuzzy_match",
    tags=("text", "fuzzy", "entity-resolution", "blocking"),
    doc="Token-blocked fuzzy string matching (entity resolution): distinct "
    "part names collapse to the name VOCABULARY first (with carrier "
    "counts — at 100 TB the vocabulary is bounded by the naming domain "
    "while rows are not, so every later stage is corpus-size-independent), "
    "candidate pairs come from a shared-token self-join (blocking — never "
    "the all-pairs cross product), and JVM-side levenshtein verifies "
    "candidates within edit distance 3. The canonical dedup/ER shape: "
    "block, verify, report both sides' support.",
    oracle="""
        WITH names AS (
            SELECT TRIM(p_name) AS name, CAST(COUNT(*) AS BIGINT) AS n_parts
            FROM part GROUP BY TRIM(p_name)
        ), toks AS (
            SELECT name, UNNEST(str_split(name, ' ')) AS tok FROM names
        ), cand AS (
            SELECT DISTINCT a.name AS name_a, b.name AS name_b
            FROM toks a JOIN toks b ON a.tok = b.tok AND a.name < b.name
            WHERE a.tok <> ''
        )
        SELECT c.name_a, c.name_b,
               CAST(levenshtein(c.name_a, c.name_b) AS BIGINT) AS edit_dist,
               na.n_parts AS n_parts_a,
               nb.n_parts AS n_parts_b
        FROM cand c
        JOIN names na ON na.name = c.name_a
        JOIN names nb ON nb.name = c.name_b
        WHERE levenshtein(c.name_a, c.name_b) <= 3
        ORDER BY c.name_a, c.name_b
    """,
)
def string_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = (
        load_table(spark, sf_dir, "part")
        .groupBy(F.trim(F.col("p_name")).alias("name"))
        .agg(F.count("*").cast("bigint").alias("n_parts"))
    )
    toks = names.select(
        "name", F.explode(F.split(F.col("name"), " ")).alias("tok")
    ).where(F.col("tok") != "")
    a = toks.select(F.col("name").alias("name_a"), "tok")
    b = toks.select(F.col("name").alias("name_b"), "tok")
    cand = (
        a.join(b, "tok")
        .where(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
    )
    verified = cand.withColumn(
        "edit_dist", F.levenshtein("name_a", "name_b").cast("bigint")
    ).where(F.col("edit_dist") <= 3)
    return (
        verified.join(
            names.select(F.col("name").alias("name_a"), F.col("n_parts").alias("n_parts_a")),
            "name_a",
        )
        .join(
            names.select(F.col("name").alias("name_b"), F.col("n_parts").alias("n_parts_b")),
            "name_b",
        )
        .select("name_a", "name_b", "edit_dist", "n_parts_a", "n_parts_b")
        .orderBy("name_a", "name_b")
    )


@builder(
    "set_similarity_join",
    tags=("text", "dedup", "similarity-join", "prefix-filter", "scale"),
    doc="[r13 rotation: builder status, oracle retained under the strict "
    "parity harness — its gate slot went to dedup_family_agreement_xx, "
    "which runs the SAME prefix-filter family (at t = 1/2, over hashed "
    "shingles) plus the survivor rollup, so the exact-set-similarity "
    "surface stays gate-verified while the production hash family gains "
    "its first hash-match proof. Still headline-bench-tracked and swept.] "
    "EXACT set-similarity self-join with prefix filtering (the "
    "AllPairs/PPJoin family): documents as distinct 3-gram SHINGLE sets "
    "(single tokens degenerate on this shared-vocabulary corpus — 31 "
    "distinct words across 5000 docs turns every token block into "
    "millions of pairs; shingles are distinctive, median df 9), shingles "
    "canonically ordered rare-first by global document frequency, each "
    "document indexed ONLY on its first |x| - ceil(t|x|) + 1 shingles — "
    "any pair with Jaccard >= t provably shares a prefix shingle, so "
    "blocking generates a complete yet tiny candidate set (the frequent "
    "shingles that would explode a plain block never index). Candidates "
    "verify by exact intersection counting. The exact complement of the "
    "MinHash-LSH tier: same pair semantics, zero probability of a missed "
    "pair. Jaccard reported in exact ppm.",
    oracle="""
        WITH tok AS (
            SELECT doc_id, tok FROM (
                SELECT doc_id,
                       UNNEST(list_distinct(list_transform(
                           range(1, GREATEST(len(string_split(text, ' ')) - 2, 1) + 1),
                           i -> array_to_string((string_split(text, ' '))[i:i+2], ' ')
                       ))) AS tok
                FROM documents
            ) WHERE tok <> ''
        ), sizes AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz
            FROM tok GROUP BY doc_id
        ), dfreq AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS df
            FROM tok GROUP BY tok
        ), ranked AS (
            SELECT t.doc_id, t.tok,
                   ROW_NUMBER() OVER (PARTITION BY t.doc_id
                                      ORDER BY d.df, t.tok) AS rn,
                   s.sz
            FROM tok t JOIN dfreq d USING (tok) JOIN sizes s USING (doc_id)
        ), prefix AS (
            SELECT doc_id, tok FROM ranked
            WHERE rn <= sz - CAST(CEIL(0.8 * sz) AS BIGINT) + 1
        ), cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM prefix a JOIN prefix b
              ON a.tok = b.tok AND a.doc_id < b.doc_id
        ), inter AS (
            SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS n_common
            FROM cand c
            JOIN tok ta ON ta.doc_id = c.doc_a
            JOIN tok tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
            GROUP BY c.doc_a, c.doc_b
        )
        SELECT i.doc_a, i.doc_b, i.n_common,
               sa.sz AS sz_a, sb.sz AS sz_b,
               CAST(ROUND(1000000.0 * i.n_common
                          / (sa.sz + sb.sz - i.n_common)) AS BIGINT) AS jac_ppm
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.doc_a
        JOIN sizes sb ON sb.doc_id = i.doc_b
        WHERE 5 * i.n_common >= 4 * (sa.sz + sb.sz - i.n_common)
        ORDER BY i.doc_a, i.doc_b
    """,
)
def set_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents", fan_out=True).select("doc_id", "text")
    # One cached frame holds the DISTINCT shingle ARRAY per doc (r14
    # restructure, guide §2.3/§2.4): sz is size(toks) — a per-row
    # projection, so the r13 sizes groupBy + join are gone — and
    # verification is per-pair array_intersect over this frame instead of
    # the exploded (tok, doc) equi-join + groupBy, which shuffled one row
    # per (candidate pair x shared shingle) through three extra exchanges.
    docs_arr = d.select(
        "doc_id",
        F.filter(shingles(F.col("text")), lambda x: x != F.lit("")).alias("toks"),
    ).transform(tracked_cache)
    # tok is cached TOO: it feeds dfreq and ranked, and re-running the
    # explode per consumer from the array cache measured as a net loss
    # (first-cut A/B: 3.62 -> 3.92 s with the explode recomputed twice).
    tok = docs_arr.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("sz"),
        F.explode("toks").alias("tok"),
    ).transform(tracked_cache)
    dfreq = tok.groupBy("tok").agg(F.count("*").cast("bigint").alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "tok")
    ranked = tok.join(dfreq, "tok").withColumn("rn", F.row_number().over(w))
    prefix = ranked.where(
        F.col("rn") <= F.col("sz") - F.ceil(F.lit(0.8) * F.col("sz")) + 1
    ).select("doc_id", "tok", "sz")
    a = prefix.select(F.col("doc_id").alias("doc_a"), "tok", F.col("sz").alias("sz_a"))
    b = prefix.select(F.col("doc_id").alias("doc_b"), "tok", F.col("sz").alias("sz_b"))
    cand = (
        a.join(b, "tok")
        .where(
            (F.col("doc_a") < F.col("doc_b"))
            # length filter: J >= 4/5 forces 5*min(sz) >= 4*max(sz) —
            # exact integer form (0.8 is not a representable double, and a
            # float comparison would mis-prune the subset boundary pair)
            & (5 * F.col("sz_a") >= 4 * F.col("sz_b"))
            & (5 * F.col("sz_b") >= 4 * F.col("sz_a"))
        )
        .select("doc_a", "doc_b", "sz_a", "sz_b")
        .distinct()
    )
    ca = docs_arr.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a"))
    cb = docs_arr.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b"))
    inter = (
        cand.join(ca, "doc_a")
        .join(cb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "sz_a",
            "sz_b",
            F.size(F.array_intersect("toks_a", "toks_b"))
            .cast("bigint")
            .alias("n_common"),
        )
        # every candidate shares a prefix shingle so n_common >= 1 always;
        # the guard only mirrors the r13 inner-join semantics exactly
        .where(F.col("n_common") >= 1)
    )
    union_sz = F.col("sz_a") + F.col("sz_b") - F.col("n_common")
    # threshold in exact integers too: I/U >= 4/5  <=>  5I >= 4U
    return (
        inter.where(5 * F.col("n_common") >= 4 * union_sz)
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            "sz_a",
            "sz_b",
            F.round(F.lit(1_000_000.0) * F.col("n_common") / union_sz)
            .cast("bigint")
            .alias("jac_ppm"),
        )
        .orderBy("doc_a", "doc_b")
    )


@query(
    "dedup_substring_spans",
    tags=("text", "dedup", "substring", "spans", "scale"),
    doc="EXACT substring-level deduplication (the ExactSubstr tier of "
    "Lee et al. 2022, 'Deduplicating Training Data Makes Language Models "
    "Better'): document-level dedup keeps a doc that merely EMBEDS a "
    "duplicated passage — this finds the passages themselves. Every "
    "8-word gram at every position (built zero-shuffle by higher-order "
    "array slicing, not a self-join), grams occurring more than once "
    "ANYWHERE in the corpus mark their [pos, pos+7] span, and per-doc "
    "overlapping/adjacent spans merge into maximal islands via "
    "gaps-and-islands (running-max window, one shuffle shared with the "
    "per-doc rollup). Reported per contaminated doc: island count, "
    "duplicated word mass, exact-ppm duplicated fraction. At 100 TB the "
    "gram string is replaced by its xxhash64 (the CDC segment tier's "
    "production-twin pattern) so the duplicate-gram shuffle moves 8-byte "
    "keys; the count>=2 filter is map-side combinable.",
    oracle="""
        WITH words AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ), grams AS (
            SELECT doc_id, CAST(len(w) AS BIGINT) AS total_words,
                   i AS pos, array_to_string(w[i:i+7], ' ') AS gram
            FROM words, UNNEST(range(1, len(w) - 6)) AS t(i)
            WHERE len(w) >= 8
        ), dup AS (
            SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2
        ), hits AS (
            SELECT g.doc_id, g.total_words, g.pos
            FROM grams g JOIN dup USING (gram)
        ), isl AS (
            SELECT doc_id, total_words, pos,
                   CASE WHEN pos > COALESCE(MAX(pos + 7) OVER (
                            PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                        ), -1) + 1 THEN 1 ELSE 0 END AS is_new
            FROM hits
        ), isl2 AS (
            SELECT doc_id, total_words, pos,
                   CAST(SUM(is_new) OVER (
                       PARTITION BY doc_id ORDER BY pos) AS BIGINT) AS island
            FROM isl
        ), spans AS (
            SELECT doc_id, total_words, island,
                   MIN(pos) AS s, MAX(pos) + 7 AS e
            FROM isl2 GROUP BY doc_id, total_words, island
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_spans,
               CAST(SUM(e - s + 1) AS BIGINT) AS dup_words,
               total_words,
               CAST(ROUND(1000000.0 * SUM(e - s + 1) / total_words)
                    AS BIGINT) AS dup_ppm
        FROM spans GROUP BY doc_id, total_words
        ORDER BY doc_id
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    K = 8
    d = load_table(spark, sf_dir, "documents", fan_out=True).select("doc_id", "text")
    tk = tokens(F.col("text"))
    # positional k-grams, zero-shuffle: slice the token array at every
    # start position (docs shorter than K have no k-gram and drop here)
    grams = (
        d.where(F.size(tk) >= K)
        .select(
            "doc_id",
            F.size(tk).cast("bigint").alias("total_words"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(tk) - (K - 1)),
                    lambda i: F.struct(
                        i.cast("bigint").alias("pos"),
                        F.array_join(F.slice(tk, i, K), " ").alias("gram"),
                    ),
                )
            ).alias("g"),
        )
        .select("doc_id", "total_words", "g.pos", "g.gram")
        .transform(tracked_cache)
    )
    # a gram is duplicated if it occurs more than once anywhere in the
    # corpus (same doc twice included) — partial-agg count, tiny output
    dup = (
        grams.groupBy("gram")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= 2)
        .select("gram")
    )
    hits = grams.join(dup, "gram").select("doc_id", "total_words", "pos")
    # gaps-and-islands merge of [pos, pos+K-1] spans: an island breaks only
    # when this span starts past every previous span's end + 1; the two
    # windows and the island rollup share ONE hashpartitioning(doc_id)
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = Window.partitionBy("doc_id").orderBy("pos")
    isl = hits.withColumn(
        "is_new",
        F.when(
            F.col("pos")
            > F.coalesce(F.max(F.col("pos") + (K - 1)).over(w_prev), F.lit(-1)) + 1,
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("island", F.sum("is_new").over(w_run).cast("bigint"))
    spans = isl.groupBy("doc_id", "total_words", "island").agg(
        F.min("pos").alias("s"), (F.max("pos") + (K - 1)).alias("e")
    )
    return (
        spans.groupBy("doc_id", "total_words")
        .agg(
            F.count("*").cast("bigint").alias("n_spans"),
            F.sum(F.col("e") - F.col("s") + 1).cast("bigint").alias("dup_words"),
        )
        .select(
            "doc_id",
            "n_spans",
            "dup_words",
            "total_words",
            F.round(F.lit(1_000_000.0) * F.col("dup_words") / F.col("total_words"))
            .cast("bigint")
            .alias("dup_ppm"),
        )
        .orderBy("doc_id")
    )


@builder(
    "text_collocation_pmi",
    tags=("text", "collocation", "pmi", "topk"),
    doc="Collocation (phrase) mining by pointwise mutual information: the "
    "top-50 adjacent word pairs whose co-occurrence most exceeds chance "
    "(PMI = ln p(xy)/(p(x)p(y)) over positional bigrams vs unigram "
    "frequencies), min bigram count 5 to suppress noise. PMI is computed "
    "as the SAME ordered sum of logs in both engines and integer-micro-"
    "scaled before ranking (the established ln-ulp discipline), so the "
    "top-k cut is deterministic; ties break on the pair text. Two "
    "zero-shuffle array explodes (unigrams, positional bigrams), two "
    "partial-agg counts, two 1-row scalar broadcasts — at 100 TB the "
    "only state proportional to the corpus is the bigram vocabulary, "
    "and the min-count filter prunes it before the log math. This is "
    "the phrase-detection pass (word2vec-style) that decides which "
    "n-grams become single tokens in a training corpus.",
    oracle="""
        WITH toks AS (
            SELECT u.tok FROM (
                SELECT string_split(text, ' ') AS w FROM documents
            ), UNNEST(w) AS u(tok)
            WHERE u.tok <> ''
        ), uni AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY tok
        ), bi AS (
            SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM (
                SELECT w[i] AS w1, w[i+1] AS w2
                FROM (SELECT string_split(text, ' ') AS w FROM documents),
                     UNNEST(range(1, len(w))) AS t(i)
                WHERE len(w) >= 2
            ) WHERE w1 <> '' AND w2 <> ''
            GROUP BY w1, w2
        ), nu AS (
            SELECT CAST(SUM(c) AS BIGINT) AS n_uni FROM uni
        ), nb AS (
            SELECT CAST(SUM(c) AS BIGINT) AS n_bi FROM bi
        )
        SELECT b.w1, b.w2, b.c AS pair_count,
               u1.c AS w1_count, u2.c AS w2_count,
               CAST(ROUND(1000000.0 * (
                   LN(CAST(b.c AS DOUBLE)) - LN(CAST(u1.c AS DOUBLE))
                   - LN(CAST(u2.c AS DOUBLE)) + 2 * LN(CAST(n_uni AS DOUBLE))
                   - LN(CAST(n_bi AS DOUBLE))
               )) AS BIGINT) AS pmi_micro
        FROM bi b
        JOIN uni u1 ON u1.tok = b.w1
        JOIN uni u2 ON u2.tok = b.w2
        CROSS JOIN nu CROSS JOIN nb
        WHERE b.c >= 5
        ORDER BY pmi_micro DESC, b.w1, b.w2
        LIMIT 50
    """,
)
def text_collocation_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents", fan_out=True).select("text")
    tk = tokens(F.col("text"))
    uni = (
        d.select(F.explode(tk).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    bi = (
        d.where(F.size(tk) >= 2)
        .select(
            # positional bigrams as zip(tokens[:-1], tokens[1:]) — one
            # array pass, ~2x faster than indexing each position
            F.explode(
                F.zip_with(
                    F.slice(tk, 1, F.size(tk) - 1),
                    F.slice(tk, 2, F.size(tk) - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
        .where((F.col("w1") != "") & (F.col("w2") != ""))
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    n_uni = uni.agg(F.sum("c").cast("bigint").alias("n_uni"))
    n_bi = bi.agg(F.sum("c").cast("bigint").alias("n_bi"))
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c").alias("w1_count"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c").alias("w2_count"))
    # same ordered log-sum as the oracle: cross-engine-identical doubles,
    # then micro-rounded before the top-k cut
    pmi = (
        F.log(F.col("c").cast("double"))
        - F.log(F.col("w1_count").cast("double"))
        - F.log(F.col("w2_count").cast("double"))
        + 2 * F.log(F.col("n_uni").cast("double"))
        - F.log(F.col("n_bi").cast("double"))
    )
    return (
        bi.where(F.col("c") >= 5)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .select(
            "w1",
            "w2",
            F.col("c").alias("pair_count"),
            "w1_count",
            "w2_count",
            F.round(F.lit(1_000_000.0) * pmi).cast("bigint").alias("pmi_micro"),
        )
        .orderBy(F.col("pmi_micro").desc(), "w1", "w2")
        .limit(50)
    )
