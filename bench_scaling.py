"""Scaling-trend sidecar: the three heavy dedup pipelines timed across
sf0.001 / sf0.01 / sf0.1, with fitted scaling exponents per query.

The design claim everywhere in plans/text_queries.py is "linear in the
corpus" — banded LSH candidates, semi-join pruning before any explode, no
all-pairs joins. This sidecar turns that claim into a measured number.

Two timings per (query, sf):

- ``cold``: the corpus-snapshot materialization cache (sources/snapshots.py)
  is cleared before every run, so the timing covers the FULL pipeline
  compute — signatures, LSH banding, candidate verification — which is what
  the linear-in-corpus claim is about. The fitted exponents use cold.
- ``warm``: the snapshot is in place (bench.py's steady state) — the
  per-consumer cost once the pair table is materialized for the corpus
  snapshot; flat-ish in sf by design and reported for completeness.

Exponents (cold):

- ``exponent_raw``: least-squares slope of log(t) on log(sf) over all three
  scale factors. Fixed per-query overhead (~0.5-1 s of session dispatch,
  plan compile and tiny-stage scheduling on local[32]) dominates the small
  sfs and drags this DOWN — it is a conservative sanity bound (a quadratic
  engine would still show > 1).
- ``exponent_last_decade``: log10(t(0.1)/t(0.01)) after subtracting the
  sf0.001 cold reading as the fixed-overhead floor (at sf0.001 the data
  work is sub-millisecond, so that reading IS the floor). This is the
  decade where data work actually moves the needle; the bar is <= ~1.2.
  Null (with a note) if the floor-subtracted deltas are not both positive —
  i.e. the data work is indistinguishable from scheduling noise.

Because sf0.001-sf0.1 are all small enough that fixed overhead can swamp the
data work (the "note" fields say when it did), the sidecar ALSO runs a
large-scale sweep: derived corpora at 10x and 100x the sf0.1 documents table
(each copy's tokens perturbed with a copy marker so shingle vocabularies are
disjoint across copies and per-copy dedup rates stay realistic — naive
copying would plant pathological 10-way exact-dup clusters). At 100x
(500k docs) the data work dominates the floor and the fitted decade exponent
is real evidence. Derived data lives under /tmp/afdp_scale (never in
/root/testdata, which is read-only ground truth).

Measurement isolation: each query's sweep runs in its OWN subprocess (fresh
JVM). A first pass ran everything in one long session and recorded a 2.4x
inflated x100 reading for the LAST query measured — accumulated long-session
JVM state (shuffle-file GC, heap pressure after thousands of stages), not
the query (a fresh session reproduces the honest number). Per-process
isolation removes that confound the same way min-of-N removes host stalls.

Run: python bench_scaling.py  -> writes BENCH_SCALING_r{NN}.json and prints
one JSON line. Min-of-N runs per point to cut scheduler noise.
"""

from __future__ import annotations

import glob
import json
import math
import os
import shutil
import subprocess
import sys
import time

# Deep-decade sweeps (x1000 = 5M docs, x2000 = 10M) cache hundreds of
# millions of token/vector rows; the engine's 8g local-mode default heap
# is sized for sf0.1 interactive work, not for these corpora (the r14
# family-agreement x1000 child OOM'd at 8g). The host spec is 128 GiB —
# give sweep JVMs (this process AND the --one/--flag children, which
# inherit the env) a deep-sweep heap unless the caller pinned one.
os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")

from aws_flight_data_pipeline_spark.functions.caching import release_tracked
from aws_flight_data_pipeline_spark.plans.registry import _ensure_loaded, resolve
from aws_flight_data_pipeline_spark.session import get_spark
from aws_flight_data_pipeline_spark.sources.snapshots import _SNAPSHOT_ROOT

HEAVY = (
    "dedup_pipeline_end_to_end",
    "dedup_cluster_components",
    "corpus_merge_increment",
    # round 12 additions (verdict r11 missing #1/#2): the heaviest
    # registered text operator that had never been swept, the cluster-aware
    # split (full CC + audit over the rebuilt pair snapshot when cold), and
    # the linear-scale SemDeDup twin (k = N/64, sign-LSH-pruned assignment)
    "set_similarity_join",
    "leakage_safe_split",
    "semantic_dedup_semdedup_scale",
    # round 9 additions (the round-7 heavy newcomers): ExactSubstr's gram
    # table is ~words-per-doc x the corpus rows — the one operator whose
    # CONSTANT could surprise at 100 TB even with a sound shape; the
    # R-S prefix join and the banded pHash self-join get the same treatment
    "dedup_substring_spans",
    "decontam_fuzzy_pairs",
    "multimodal_phash_neardup",
    # the 60-bit pHash banding measured SUPER-linear at x100 in round 9
    # (5-bit bands = 32-value buckets); the round-10 identical-hash
    # collapse repaired its measurement (0.964) — kept in the sweep so the
    # repair stays re-verified. The 240-bit/20-bit-band tier below is the
    # production path (O(1) buckets by construction, x1000-verified).
    "multimodal_phash_neardup_wide",
    # round 13: the xx-vs-md5 family-agreement gate entry (complete
    # shared-shingle join — Σ df² work, linear in mult here because copy
    # shingle vocabularies are disjoint by construction and per-copy df is
    # bounded) and the hashed-shingle production dedup twin, which r12
    # left unswept past x100 (verdict r12 missing #1)
    "dedup_family_agreement_xx",
    "dedup_pipeline_end_to_end_xx",
)
SFS = (0.001, 0.01, 0.1)
RUNS = 3
MULTS = (1, 10, 100)  # large-scale sweep: x the sf0.1 documents table
LARGE_RUNS = 2
_SCALE_DIR = "/tmp/afdp_scale"

#: One decade further (x1000 = 5M docs) for the two pipelines whose
#: exponents matter most at 100 TB: the end-to-end fuzzy dedup and the wide
#: pHash tier (the round-9 sweep's fix, whose x10->x100 exponent of 1.04
#: needs confirmation that it HOLDS rather than being the knee of a curve).
#: x1000 is expensive (minutes per run), so it is opt-in per query, timed
#: without a dedicated warm-up (JIT is warm from the smaller mults), and
#: exponent_last_decade moves to the 100->1000 decade for these.
XLARGE_QUERIES = (
    "dedup_pipeline_end_to_end",
    "multimodal_phash_neardup_wide",
    # round 13 (verdict r12 #3): the deep decades move to the code a user
    # would actually run — the hashed-shingle production dedup family and
    # the linear-scale SemDeDup twin (whose ∝N chokepoints were engineered
    # out this round; x1000 is where k = N/64 starts to matter)
    "dedup_pipeline_end_to_end_xx",
    "semantic_dedup_semdedup_scale",
    # round 14 (verdict r13 missing #1): the family-agreement gate entry's
    # df-capped complete join — Σ_{df<=cap} df² is linear by construction
    # now; the x1000 decade turns that claim into a measured exponent
    "dedup_family_agreement_xx",
)
XLARGE_MULT = 1000


_MARK_ALPHABET = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
)


def _copy_marker(k: int) -> str:
    """Two-char copy marker with a WIDE byte spread (0x30-0x7a), unique for
    k < 62^2."""
    return _MARK_ALPHABET[k % 62] + _MARK_ALPHABET[(k // 62) % 62]


def _ensure_scaled_corpus(spark, mult: int) -> str:
    """sf_dir holding a documents table ``mult`` x the sf0.1 one. Copy k
    offsets doc_ids by k*10M and suffixes every token (last excepted) with
    a copy marker, so copies never collide in SHINGLE space — and the
    marker's byte value varies widely with k so copies never collide in
    BYTE space either (the first sweep suffixed digits, which left copies
    byte-level near-identical: every doc formed a ``mult``-way pHash
    near-dup cluster, and the pair-grain operator's OUTPUT — quadratic in
    cluster size by definition — measured as a fake super-linear exponent;
    a real corpus's duplicate-cluster size does not grow with corpus
    size). Per-copy duplicate structure matches the base corpus exactly
    under both feature families."""
    base = "/root/testdata/sf0.1"
    if mult == 1:
        return base
    from pyspark.sql import functions as F

    # v3: embeddings perturbation changed to the sign-reflection family
    # (ADVICE r12) — the version bump invalidates cached v2 dirs whose
    # embeddings carry the old degenerate perturbation
    out = os.path.join(_SCALE_DIR, f"x{mult}-v3")
    _ensure_scaled_embeddings(spark, mult, out)
    marker = os.path.join(out, "documents.parquet", "_SUCCESS")
    if not os.path.exists(marker):
        # One crossJoin against range(mult) instead of a mult-way union —
        # content-identical to the per-copy loop (same doc_id offsets, same
        # _copy_marker characters), but the plan stays O(1) in mult, which
        # the x1000 decade needs (a 1000-branch union won't even analyze).
        docs = spark.read.parquet(f"{base}/documents.parquet")
        ks = spark.range(mult).select(F.col("id").alias("k"))
        alpha = f"'{_MARK_ALPHABET}'"
        mark = F.expr(
            f"concat(substr({alpha}, CAST(k % 62 AS INT) + 1, 1), "
            f"substr({alpha}, CAST((k DIV 62) % 62 AS INT) + 1, 1))"
        )
        text = F.when(F.col("k") == 0, F.col("text")).otherwise(
            F.regexp_replace(F.col("text"), F.lit(" "), F.concat(mark, F.lit(" ")))
        )
        scaled = docs.crossJoin(ks).select(
            (F.col("doc_id") + F.col("k") * F.lit(10_000_000)).alias("doc_id"),
            text.alias("text"),
            "lang",
            "source",
            F.length(text).cast("long").alias("n_chars"),
        )
        scaled.repartition(32 if mult <= 100 else 64).write.mode(
            "overwrite"
        ).parquet(f"{out}/documents.parquet")
    return out


#: Per-copy SIGNED PERMUTATION for the scaled embeddings: copy k reads
#: dimension pmod(a_k * j + b_k, 64) (an affine bijection mod 64 — a_k odd
#: — keyed by Murmur3 hash(k, ...)) and flips its sign by a per-(k, j)
#: hash coin. A signed permutation is an ORTHOGONAL transform applied
#: uniformly to every vector of copy k, so every WITHIN-copy dot product
#: is preserved BIT-EXACTLY (the base corpus's own near-dup structure
#: replicates into each copy — the sweep's realism requirement) while
#: cross-copy cosines concentrate near 0: measured on this corpus, mean
#: |cos| ≈ 0.1, ~0.4% of copy-vs-base pairs stray above tau = 0.35 (an
#: irreducible tail at dim 64 — ANY orthogonal mixing has sd ≈ 1/√dim
#: given this corpus's energy concentration), worst ≈ 0.5. The r12
#: multiplicative-magnitude perturbation failed categorically (ADVICE
#: r12): for k % 97 ≡ 0 (mod 13) the factor was constant across dims —
#: an exact scalar multiple, cosine 1.0 — and even non-degenerate copies
#: stayed at cosine ~0.998, planting mult-way near-dup clusters. The
#: separation and preservation properties are asserted numerically in
#: tests/test_bench_coverage.py.
_EMB_REFLECT_SQL = (
    "CASE WHEN k = 0 THEN embedding ELSE transform(embedding, (x, j) -> "
    "CAST(element_at(embedding, CAST(pmod((2 * pmod(hash(k, 11), 32) + 1) * j "
    "+ pmod(hash(k, 13), 64), 64) AS INT) + 1) "
    "* (1 - 2 * pmod(hash(k, j), 2)) AS FLOAT)) END"
)


def _ensure_scaled_embeddings(spark, mult: int, out: str) -> None:
    """embeddings table ``mult`` x the sf0.1 one, in the same scaled dir
    (added r12 for the SemDeDup scale sweep). Copy k offsets vec_ids by
    k*10M (the documents convention) and transforms each copy through a
    hash-keyed SIGNED PERMUTATION of the dimensions (see
    ``_EMB_REFLECT_SQL``): within-copy similarity structure is preserved
    exactly, cross-copy cosines land near zero. Copy 0 is the base corpus
    bit-exact."""
    from pyspark.sql import functions as F

    marker = os.path.join(out, "embeddings.parquet", "_SUCCESS")
    if os.path.exists(marker):
        return
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    ks = spark.range(mult).select(F.col("id").alias("k"))
    emb.crossJoin(ks).select(
        (F.col("vec_id") + F.col("k") * F.lit(10_000_000)).alias("vec_id"),
        F.expr(_EMB_REFLECT_SQL).alias("embedding"),
        "label",
    ).repartition(32).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")


def _fit_slope(points: list[tuple[float, float]]) -> float:
    xs = [math.log(sf) for sf, _ in points]
    ys = [math.log(max(t, 1e-6)) for _, t in points]
    n = len(points)
    mx, my = sum(xs) / n, sum(ys) / n
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )


def measure_query(name: str) -> dict:
    """Full sweep for one query — small-sf cold/warm plus the 1x/10x/100x
    large-scale points — in the calling process's (fresh) session."""
    _ensure_loaded()
    spark = get_spark("afdp-spark-bench-scaling")
    spark.sparkContext.setLogLevel("ERROR")

    def run(sf_dir: str) -> None:
        resolve(name)(spark, sf_dir).write.format("noop").mode("overwrite").save()

    def clear_snapshots() -> None:
        shutil.rmtree(_SNAPSHOT_ROOT, ignore_errors=True)

    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    for sf in SFS:
        sf_dir = f"/root/testdata/sf{sf}"
        run(sf_dir)  # JIT/codegen warm-up (snapshot also built)
        release_tracked()
        best_cold = math.inf
        for _ in range(RUNS):
            clear_snapshots()
            t0 = time.perf_counter()
            run(sf_dir)
            best_cold = min(best_cold, time.perf_counter() - t0)
            release_tracked()
        best_warm = math.inf  # snapshot now in place from the last run
        for _ in range(RUNS):
            t0 = time.perf_counter()
            run(sf_dir)
            best_warm = min(best_warm, time.perf_counter() - t0)
            release_tracked()
        cold[str(sf)] = round(best_cold, 3)
        warm[str(sf)] = round(best_warm, 3)
    raw = _fit_slope([(sf, cold[str(sf)]) for sf in SFS])
    floor = cold[str(SFS[0])]
    d_mid = cold[str(SFS[1])] - floor
    d_top = cold[str(SFS[2])] - floor
    last_decade = (
        round(math.log10(d_top / d_mid), 3) if d_mid > 0 and d_top > 0 else None
    )
    small = {
        "cold_seconds_by_sf": cold,
        "warm_seconds_by_sf": warm,
        "exponent_raw": round(raw, 3),
        "exponent_last_decade": last_decade,
    }
    if last_decade is None:
        small["note"] = (
            "data work indistinguishable from fixed overhead at these sfs"
        )

    mults = MULTS + ((XLARGE_MULT,) if name in XLARGE_QUERIES else ())
    secs: dict[str, float] = {}
    for mult in mults:
        sf_dir = _ensure_scaled_corpus(spark, mult)
        if mult < XLARGE_MULT:
            run(sf_dir)  # warm-up (JIT/codegen; skipped at x1000 — warm
            release_tracked()  # from the smaller mults, and minutes-costly)
        best = math.inf
        for _ in range(LARGE_RUNS):
            clear_snapshots()
            t0 = time.perf_counter()
            run(sf_dir)
            best = min(best, time.perf_counter() - t0)
            release_tracked()
        secs[f"x{mult}"] = round(best, 3)
    slope = _fit_slope([(m, secs[f"x{m}"]) for m in mults])
    by_decade = {
        f"x{lo}->x{hi}": round(math.log10(secs[f"x{hi}"] / secs[f"x{lo}"]), 3)
        for lo, hi in zip(mults[1:], mults[2:])
    }
    last = round(math.log10(secs[f"x{mults[-1]}"] / secs[f"x{mults[-2]}"]), 3)
    large = {
        "cold_seconds_by_mult": secs,
        "exponent_raw": round(slope, 3),
        "exponent_by_decade": by_decade,
        "exponent_last_decade": last,
    }
    return {"small_sf": small, "large_scale": large}


def measure_index_refresh() -> dict:
    """O(churn) evidence for the incrementally-maintained inverted index:
    build the index over the 1x / 10x / 100x corpora, then time an
    IDENTICAL-SIZE increment (append the same 500-doc batch + refresh) on
    each. The design claim is refresh cost proportional to the churn, not
    the corpus — so the refresh curve should stay ~flat across two decades
    of corpus growth while the full build grows ~linearly. Reported as
    both curves plus the x100/x1 refresh ratio (bar: ≤ 2 — two decades of
    corpus growth may at most double a fixed-churn refresh via manifest /
    file-count overheads)."""
    import tempfile

    from pyspark.sql import functions as F

    from aws_flight_data_pipeline_spark.sources import invindex
    from aws_flight_data_pipeline_spark.sources import versioned as vt

    _ensure_loaded()
    spark = get_spark("afdp-spark-bench-scaling")
    spark.sparkContext.setLogLevel("ERROR")

    batch = (
        spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .select("doc_id", "text")
        .limit(500)
        .select((F.col("doc_id") + F.lit(900_000_000)).alias("doc_id"), "text")
    )

    build_secs: dict[str, float] = {}
    refresh_secs: dict[str, float] = {}
    for mult in MULTS:
        sf_dir = _ensure_scaled_corpus(spark, mult)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        best_build, best_refresh = math.inf, math.inf
        for _ in range(LARGE_RUNS):
            root = tempfile.mkdtemp(prefix="afdp-idx-scale-")
            dpath, ipath = f"{root}/docs", f"{root}/index"
            vt.commit(docs.repartition(8), dpath, stats_cols=("doc_id",))
            t0 = time.perf_counter()
            invindex.refresh_index(spark, dpath, ipath)
            best_build = min(best_build, time.perf_counter() - t0)
            vt.commit(batch, dpath, mode="append", stats_cols=("doc_id",))
            t0 = time.perf_counter()
            invindex.refresh_index(spark, dpath, ipath)
            best_refresh = min(best_refresh, time.perf_counter() - t0)
            shutil.rmtree(root, ignore_errors=True)
        build_secs[f"x{mult}"] = round(best_build, 3)
        refresh_secs[f"x{mult}"] = round(best_refresh, 3)
    return {
        "full_build_seconds_by_mult": build_secs,
        "fixed_churn_refresh_seconds_by_mult": refresh_secs,
        "build_exponent": round(
            _fit_slope([(m, build_secs[f"x{m}"]) for m in MULTS]), 3
        ),
        "refresh_x100_over_x1": round(
            refresh_secs[f"x{MULTS[2]}"] / max(refresh_secs[f"x{MULTS[0]}"], 1e-9),
            3,
        ),
        "bar": "refresh_x100_over_x1 <= 2 (O(churn), not O(corpus))",
    }


def measure_decontam_refresh() -> dict:
    """O(churn) + O(increment) evidence for the incremental-decontamination
    tier: the eval split's SHINGLE-tokenized inverted index is built over
    eval splits 1x / 10x / 100x, then (a) a fixed 200-doc eval churn is
    appended and refreshed — the refresh must stay ~flat (it tokenizes only
    the churn), and (b) a FIXED 500-doc training increment is probed via
    ``decontam_increment`` — the probe never touches the accumulated
    training corpus at all (that is the whole point vs the pairwise
    ``decontam_fuzzy_pairs``, whose large-scale curve in this same sidecar
    grows with the corpus). Bars: refresh x100/x1 <= 2; probe growth is
    reported (it scans the eval index, so it tracks EVAL size — fixed in
    practice — never training-corpus size)."""
    import tempfile

    from pyspark.sql import functions as F

    from aws_flight_data_pipeline_spark.plans.curation_queries import (
        decontam_increment,
        shingle_tokenizer,
    )
    from aws_flight_data_pipeline_spark.sources import invindex
    from aws_flight_data_pipeline_spark.sources import versioned as vt

    _ensure_loaded()
    spark = get_spark("afdp-spark-bench-scaling")
    spark.sparkContext.setLogLevel("ERROR")

    base_docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    churn = (
        base_docs.select("doc_id", "text")
        .limit(200)
        .select((F.col("doc_id") + F.lit(910_000_000)).alias("doc_id"), "text")
    )
    increment = (
        base_docs.select("doc_id", "text")
        .limit(500)
        .select((F.col("doc_id") + F.lit(920_000_000)).alias("doc_id"), "text")
    )

    build_secs: dict[str, float] = {}
    refresh_secs: dict[str, float] = {}
    probe_secs: dict[str, float] = {}
    for mult in MULTS:
        sf_dir = _ensure_scaled_corpus(spark, mult)
        ev = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .where(F.col("doc_id") % 7 == 0)
            .select("doc_id", "text")
        )
        best_build = best_refresh = best_probe = math.inf
        for _ in range(LARGE_RUNS):
            root = tempfile.mkdtemp(prefix="afdp-decontam-scale-")
            dpath, ipath = f"{root}/eval", f"{root}/index"
            vt.commit(ev.repartition(8), dpath, stats_cols=("doc_id",))
            t0 = time.perf_counter()
            invindex.refresh_index(spark, dpath, ipath, tokenizer=shingle_tokenizer)
            best_build = min(best_build, time.perf_counter() - t0)
            vt.commit(churn, dpath, mode="append", stats_cols=("doc_id",))
            t0 = time.perf_counter()
            invindex.refresh_index(spark, dpath, ipath, tokenizer=shingle_tokenizer)
            best_refresh = min(best_refresh, time.perf_counter() - t0)
            t0 = time.perf_counter()
            decontam_increment(spark, ipath, increment).write.format("noop").mode(
                "overwrite"
            ).save()
            best_probe = min(best_probe, time.perf_counter() - t0)
            release_tracked()
            shutil.rmtree(root, ignore_errors=True)
        build_secs[f"x{mult}"] = round(best_build, 3)
        refresh_secs[f"x{mult}"] = round(best_refresh, 3)
        probe_secs[f"x{mult}"] = round(best_probe, 3)
    return {
        "eval_index_build_seconds_by_mult": build_secs,
        "fixed_churn_refresh_seconds_by_mult": refresh_secs,
        "fixed_increment_probe_seconds_by_mult": probe_secs,
        "refresh_x100_over_x1": round(
            refresh_secs[f"x{MULTS[2]}"] / max(refresh_secs[f"x{MULTS[0]}"], 1e-9), 3
        ),
        "probe_x100_over_x1": round(
            probe_secs[f"x{MULTS[2]}"] / max(probe_secs[f"x{MULTS[0]}"], 1e-9), 3
        ),
        "bar": "refresh_x100_over_x1 <= 2 (O(churn)); probe_x100_over_x1 "
        "<= 2 (one-pass probe: the eval side is never shuffled, sorted, or "
        "hash-built per probe — r11 fix; r10 measured 2.76) and never "
        "tracks the accumulated training corpus — contrast "
        "decontam_fuzzy_pairs' large_scale curve",
    }


def measure_dedup_stages() -> dict:
    """Per-stage breakdown of ``dedup_pipeline_end_to_end`` at x100 and
    x1000 (verdict-r10 #2: the x1000 decade exponent crept 0.868 -> 1.034;
    name the stage whose cost grows super-linearly before it crosses the
    1.2 bar). Stage frames come from ``scored_pair_frame``'s measurement
    hook and are materialized in dependency order, so each timing is the
    marginal cost of exactly one stage: (1) signatures+banding, (2) the
    banded candidate self-join, (3) the candidate-doc semi-join + shingle
    re-derivation, (4) verification joins + survivor rollup (the full
    query over the warm caches). Row counts per stage say WHICH
    intermediate grows faster than the corpus."""
    from pyspark.sql import functions as F

    from aws_flight_data_pipeline_spark.plans.registry import resolve
    from aws_flight_data_pipeline_spark.plans.text_queries import scored_pair_frame
    from aws_flight_data_pipeline_spark.sources.testdata import load_table

    _ensure_loaded()
    spark = get_spark("afdp-spark-bench-scaling")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict] = {}
    for mult in (100, XLARGE_MULT):
        sf_dir = _ensure_scaled_corpus(spark, mult)
        shutil.rmtree(_SNAPSHOT_ROOT, ignore_errors=True)
        d = load_table(spark, sf_dir, "documents", fan_out=True)
        sink: dict = {}
        scored = scored_pair_frame(d, sink)

        stages: dict[str, dict] = {}

        def _stage(label: str, df, size_col=None) -> None:
            t0 = time.perf_counter()
            n = df.count()
            rec: dict = {"seconds": round(time.perf_counter() - t0, 3), "rows": n}
            if size_col is not None:
                rec["token_rows"] = int(
                    df.select(F.sum(F.size(size_col))).first()[0] or 0
                )
            stages[label] = rec

        _stage("1_signatures_banding", sink["bands"])
        _stage("2_band_candidate_join", sink["cands"])
        _stage("3_candidate_doc_semijoin", sink["cand_docs"], size_col="toks")
        t0 = time.perf_counter()
        scored.write.format("noop").mode("overwrite").save()
        stages["4_verify_joins"] = {
            "seconds": round(time.perf_counter() - t0, 3),
            "rows": stages["2_band_candidate_join"]["rows"],
        }
        t0 = time.perf_counter()
        resolve("dedup_pipeline_end_to_end")(spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        stages["5_full_query_warm_caches"] = {
            "seconds": round(time.perf_counter() - t0, 3)
        }
        release_tracked()
        out[f"x{mult}"] = stages

    growth = {
        k: round(
            out[f"x{XLARGE_MULT}"][k]["seconds"]
            / max(out["x100"][k]["seconds"], 1e-9),
            2,
        )
        for k in out["x100"]
    }
    return {
        "stages_by_mult": out,
        "seconds_growth_x1000_over_x100": growth,
        "corpus_growth": float(XLARGE_MULT) / 100.0,
        "note": "a stage whose seconds-growth exceeds corpus_growth is the "
        "super-linear stage; token_rows/rows show whether the INTERMEDIATE "
        "grew or the per-row cost did",
    }


def measure_hash_family() -> dict:
    """md5-string vs hashed-shingle signature family (verdict-r11 #4): the
    per-stage breakdown showed signatures/banding = 95% of the end-to-end
    dedup wall-clock at x1000. Measurement drove the final design: swapping
    only the DIGEST (xxhash64 over the same shingle strings) bought 1.06x —
    the constant is k-gram string construction + string array_distinct, so
    the production family hashes tokens once and derives shingle identities
    as xxhash64 over k consecutive token hashes (no string ever
    materializes; functions.text.hashed_shingle_nums). This measures the
    x100 corpus with both families — signature/banding stage (materialize
    the bands frame) and the rest of the pipeline — min of N after a shared
    x10 warm-up, same process (the md5 tier runs first, so JIT warmth can
    only bias AGAINST the reported speedup). Measured r12: signature stage
    86.7 -> 4.2 s (20.9x), end-to-end 94.1 -> 10.6 s (8.8x)."""
    from aws_flight_data_pipeline_spark.plans.text_queries import (
        _dedup_survivor_rollup,
        scored_pair_frame,
    )
    from aws_flight_data_pipeline_spark.sources.testdata import load_table

    _ensure_loaded()
    spark = get_spark("afdp-spark-bench-scaling")
    spark.sparkContext.setLogLevel("ERROR")

    def run_once(sf_dir: str, family: str) -> dict:
        shutil.rmtree(_SNAPSHOT_ROOT, ignore_errors=True)
        d = load_table(spark, sf_dir, "documents", fan_out=True)
        sink: dict = {}
        scored = scored_pair_frame(d, sink, hash_family=family)
        t0 = time.perf_counter()
        n_bands = sink["bands"].count()
        sig_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        _dedup_survivor_rollup(d, scored).write.format("noop").mode(
            "overwrite"
        ).save()
        rest_s = time.perf_counter() - t0
        release_tracked()
        return {"sig": sig_s, "rest": rest_s, "band_rows": n_bands}

    warm_dir = _ensure_scaled_corpus(spark, 10)
    x100_dir = _ensure_scaled_corpus(spark, 100)
    out: dict[str, dict] = {}
    for family in ("md5", "xxhash64"):
        run_once(warm_dir, family)  # JIT/codegen warm-up
        best_sig, best_rest, band_rows = math.inf, math.inf, 0
        for _ in range(LARGE_RUNS):
            r = run_once(x100_dir, family)
            best_sig = min(best_sig, r["sig"])
            best_rest = min(best_rest, r["rest"])
            band_rows = r["band_rows"]
        out[family] = {
            "signature_banding_seconds": round(best_sig, 3),
            "rest_of_pipeline_seconds": round(best_rest, 3),
            "end_to_end_seconds": round(best_sig + best_rest, 3),
            "band_rows": band_rows,
        }
    return {
        "mult": 100,
        "families": out,
        "signature_speedup_xx_over_md5": round(
            out["md5"]["signature_banding_seconds"]
            / max(out["xxhash64"]["signature_banding_seconds"], 1e-9),
            2,
        ),
        "end_to_end_speedup_xx_over_md5": round(
            out["md5"]["end_to_end_seconds"]
            / max(out["xxhash64"]["end_to_end_seconds"], 1e-9),
            2,
        ),
        "note": "md5 stays the oracle tier (DuckDB parity); "
        "dedup_pipeline_end_to_end_xx is the production twin",
    }


def measure_dedup_xxlarge() -> dict:
    """The x2000 (10M docs) point, on the PRODUCTION family (verdict r12
    #3: the md5 tier's 1430 s x2000 run in BENCH_SCALING_r12 was the last
    one — deep-decade evidence belongs to the code a user would run, and
    the hashed-shingle twin measured 6.6x faster end-to-end at x100).
    Cold timing of ``dedup_pipeline_end_to_end_xx``, no warm-up (JIT is
    warm from the corpus build), min of 2 runs (the r12 md5 point needed
    episodic-stall filtering; two cold runs are affordable at the xx
    family's speed)."""
    _ensure_loaded()
    spark = get_spark("afdp-spark-bench-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = _ensure_scaled_corpus(spark, 2000)
    best = math.inf
    runs = []
    for _ in range(2):
        shutil.rmtree(_SNAPSHOT_ROOT, ignore_errors=True)
        t0 = time.perf_counter()
        resolve("dedup_pipeline_end_to_end_xx")(spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
        best = min(best, runs[-1])
        release_tracked()
    return {
        "query": "dedup_pipeline_end_to_end_xx",
        "mult": 2000,
        "docs": 2000 * 5000,
        "seconds": round(best, 3),
        "runs": runs,
        "md5_tier_r12_seconds": 1430.1,
    }


def measure_semdedup_xxlarge() -> dict:
    """The x2000 (10M vectors) doubling point for the chokepoint-free
    SemDeDup scale twin (verdict r13 missing #3): k = N/64 puts ~156k
    centroids past the broadcast gate, so this point also exercises the
    bucket-keyed shuffle-hash assignment branch at its intended scale.
    Cold timing, no warm-up (JIT warm from the corpus build), min of 2."""
    _ensure_loaded()
    spark = get_spark("afdp-spark-bench-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = _ensure_scaled_corpus(spark, 2000)
    runs = []
    for _ in range(2):
        shutil.rmtree(_SNAPSHOT_ROOT, ignore_errors=True)
        t0 = time.perf_counter()
        resolve("semantic_dedup_semdedup_scale")(spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
        release_tracked()
    return {
        "query": "semantic_dedup_semdedup_scale",
        "mult": 2000,
        "vectors": 2000 * 2000,
        "seconds": min(runs),
        "runs": runs,
    }


def measure_family_agreement_heavy_df() -> dict:
    """Heavy-df stressor for the family-agreement entry (verdict r13
    missing #1): the x10 corpus plus a planted 4-token stop phrase
    appended to every 3rd doc — two shingles with df ≈ 16,700 each, the
    heavy-tailed profile the complete join's Σ df² is quadratic in. The
    UNCAPPED frame pays ~2 · 16,700² ≈ 560M extra join rows for the two
    stop shingles alone (vs ~2.8M total at this size capped); the
    registered df-capped frame drops them before sizes/intersections. The
    stressor measures BOTH, so the artifact carries the cap's measured
    value, not just its reasoning. (A first cut planted df = 5,000 —
    2 · 25M extra rows — which the join absorbed for less than the df
    pass costs: the artifact records where the cap starts EARNING, not
    just that it is principled.)"""
    from pyspark.sql import functions as F

    from aws_flight_data_pipeline_spark.plans.text_queries import (
        _family_agreement_frame,
    )

    _ensure_loaded()
    spark = get_spark("afdp-spark-bench-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    base = _ensure_scaled_corpus(spark, 10)
    out = os.path.join(_SCALE_DIR, "heavydf-v2")
    marker = os.path.join(out, "documents.parquet", "_SUCCESS")
    if not os.path.exists(marker):
        docs = spark.read.parquet(f"{base}/documents.parquet")
        text = F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.col("text"), F.lit(" hvst1 hvst2 hvst3 hvst4")),
        ).otherwise(F.col("text"))
        docs.select(
            "doc_id", text.alias("text"), "lang", "source",
            F.length(text).cast("long").alias("n_chars"),
        ).repartition(32).write.mode("overwrite").parquet(
            f"{out}/documents.parquet"
        )

    from aws_flight_data_pipeline_spark.sources.testdata import load_table

    def build(capped: bool):
        d = load_table(spark, out, "documents", fan_out=True)
        return (
            _family_agreement_frame(d)
            if capped
            else _family_agreement_frame(d, df_cap=None)
        )

    timings: dict[str, float] = {}
    for label, capped in (("capped_registered", True), ("uncapped", False)):
        build(capped).write.format("noop").mode("overwrite").save()  # warm-up
        release_tracked()
        best = math.inf
        for _ in range(LARGE_RUNS):
            t0 = time.perf_counter()
            build(capped).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            release_tracked()
        timings[label] = round(best, 3)
    return {
        "corpus": "x10 + 4-token stop phrase on every 3rd doc "
        "(2 shingles at df ~ 16,700)",
        "docs": 50_000,
        "seconds": timings,
        "uncapped_over_capped": round(
            timings["uncapped"] / max(timings["capped_registered"], 1e-9), 2
        ),
        "note": "the registered entry runs the capped frame; uncapped is "
        "measured here only to size what the cap prevents",
    }


def main() -> None:
    if len(sys.argv) == 3 and sys.argv[1] == "--one":
        # child mode: one query in this fresh process; last stdout line = JSON
        print(json.dumps(measure_query(sys.argv[2]), separators=(",", ":")))
        return
    if len(sys.argv) == 2 and sys.argv[1] == "--index-refresh":
        print(json.dumps(measure_index_refresh(), separators=(",", ":")))
        return
    if len(sys.argv) == 2 and sys.argv[1] == "--decontam-increment":
        print(json.dumps(measure_decontam_refresh(), separators=(",", ":")))
        return
    if len(sys.argv) == 2 and sys.argv[1] == "--dedup-stages":
        print(json.dumps(measure_dedup_stages(), separators=(",", ":")))
        return
    if len(sys.argv) == 2 and sys.argv[1] == "--dedup-xxlarge":
        print(json.dumps(measure_dedup_xxlarge(), separators=(",", ":")))
        return
    if len(sys.argv) == 2 and sys.argv[1] == "--hash-family":
        print(json.dumps(measure_hash_family(), separators=(",", ":")))
        return
    if len(sys.argv) == 2 and sys.argv[1] == "--semdedup-xxlarge":
        print(json.dumps(measure_semdedup_xxlarge(), separators=(",", ":")))
        return
    if len(sys.argv) == 2 and sys.argv[1] == "--family-heavy-df":
        print(json.dumps(measure_family_agreement_heavy_df(), separators=(",", ":")))
        return

    results: dict[str, dict] = {}
    large: dict[str, dict] = {}
    errors: dict[str, str] = {}
    skipped: dict[str, str] = {}
    # SPARK_GRAFT_SWEEP_ONLY: comma list restricting the per-query sweep to
    # the named pipelines — used when a round's sweep budget must go to NEW
    # evidence (changed operators, new deep decades) rather than
    # re-confirming unchanged code; every skipped pipeline is recorded with
    # a reason so the artifact says what was NOT measured this round.
    only = set(
        s for s in os.environ.get("SPARK_GRAFT_SWEEP_ONLY", "").split(",") if s
    )
    for name in HEAVY:
        if only and name not in only:
            skipped[name] = (
                "unchanged code this round (SPARK_GRAFT_SWEEP_ONLY); the "
                "previous round's artifact carries the standing measurement"
            )
            continue
        # one transient child failure (OOM pressure from a prior JVM's
        # teardown, a host stall) must not void an hour of completed
        # measurements: retry once in a fresh process; record a double
        # failure in the artifact instead of crashing the sweep.
        out = None
        for attempt in (1, 2):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", name],
                capture_output=True,
                text=True,
            )
            if proc.returncode == 0:
                out = json.loads(proc.stdout.strip().splitlines()[-1])
                errors.pop(name, None)  # a successful retry is not an error
                break
            errors[name] = proc.stderr.strip().splitlines()[-1][:300] if proc.stderr else f"exit {proc.returncode}"
        if out is None:
            continue
        results[name] = out["small_sf"]
        large[name] = out["large_scale"]

    skip = set(
        s for s in os.environ.get("SPARK_GRAFT_SWEEP_SKIP", "").split(",") if s
    )

    def _oc_block(flag: str, key: str) -> dict:
        if key in skip:
            return {
                "skipped": True,
                "reason": "unchanged code this round; see the previous "
                "round's artifact for the standing measurement",
            }
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), flag],
            capture_output=True,
            text=True,
            check=True,
        )
        return json.loads(proc.stdout.strip().splitlines()[-1])

    index_refresh = _oc_block("--index-refresh", "index_refresh")
    decontam_incremental = _oc_block(
        "--decontam-increment", "decontam_incremental"
    )

    # verdict-r10 #2/#8: per-stage dedup breakdown + the x2000 point — own
    # child JVMs like every other measurement; a failure records, not voids.
    # The stage breakdown and hash-family comparison re-measure CODE THAT
    # DID NOT CHANGE in a round (their r12 evidence stands verbatim) — they
    # are skippable via SPARK_GRAFT_SWEEP_SKIP to keep a round's sweep
    # budget on the NEW evidence; the artifact records what was skipped
    # and why rather than silently omitting the keys.
    extras: dict[str, dict] = {}
    for flag, key in (
        ("--dedup-stages", "dedup_stage_breakdown"),
        ("--dedup-xxlarge", "dedup_xxlarge"),
        ("--hash-family", "hash_family_comparison"),
        # round 14: the SemDeDup scale twin's x2000 doubling point (verdict
        # r13 missing #3) and the family-agreement heavy-df stressor
        # (verdict r13 missing #1)
        ("--semdedup-xxlarge", "semdedup_xxlarge"),
        ("--family-heavy-df", "family_agreement_heavy_df"),
    ):
        if key in skip:
            extras[key] = {
                "skipped": True,
                "reason": "unchanged code this round; see the previous "
                "round's artifact for the standing measurement",
            }
            continue
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), flag],
            capture_output=True,
            text=True,
        )
        if proc.returncode == 0:
            extras[key] = json.loads(proc.stdout.strip().splitlines()[-1])
        else:
            errors[key] = (
                proc.stderr.strip().splitlines()[-1][:300]
                if proc.stderr
                else f"exit {proc.returncode}"
            )

    repo_dir = os.path.dirname(os.path.abspath(__file__))
    from aws_flight_data_pipeline_spark.functions.rounds import infer_round

    round_no = infer_round(repo_dir)
    payload = {
        "metric": "heavy_pipeline_scaling",
        "sfs": list(SFS),
        "runs_per_point": RUNS,
        "isolation": "one subprocess (fresh JVM) per query",
        "queries": results,
        "large_scale": {
            "base": "sf0.1 documents x {1,10,100} (token-perturbed copies)",
            "queries": large,
        },
        "index_refresh": index_refresh,
        "decontam_incremental": decontam_incremental,
        **extras,
        "bar": "exponent_last_decade <= 1.2 (linear-ish); raw is a conservative bound",
        "child_errors": errors,
        "skipped_queries": skipped,
    }
    with open(
        os.path.join(repo_dir, f"BENCH_SCALING_r{round_no:02d}.json"), "w"
    ) as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload, separators=(",", ":")))


if __name__ == "__main__":
    main()
