"""Planted-corpus control for multimodal_phash_neardup. Length-60 a/z
strings give total bit-level control: one char per block, and a 'z' is
above the global mean whenever the string mixes both chars, so the pHash
is EXACTLY the bitmask of 'z' positions. That pins the boundary (hamming
11 kept, 12 rejected), the pigeonhole banding's completeness, and the
same-modality restriction."""

from __future__ import annotations

import os

from aws_flight_data_pipeline_spark.plans.multimodal_queries import (
    multimodal_phash_neardup,
)


def _pattern(z_positions: set[int]) -> str:
    return "".join("z" if i in z_positions else "a" for i in range(60))


BASE = set(range(0, 30))
FLIP11 = (BASE - set(range(0, 5))) | set(range(30, 36))   # hamming 11 vs BASE
FLIP12 = (BASE - set(range(0, 6))) | set(range(30, 36))   # hamming 12 vs BASE

# modality cycles image/audio/video by doc_id % 3 (attach_payloads)
DOCS = [
    (0, _pattern(BASE)),       # image
    (3, _pattern(FLIP11)),     # image: exactly at the threshold -> kept
    (6, _pattern(FLIP12)),     # image: one past the threshold -> rejected
    (9, _pattern(BASE)),       # image: identical -> hamming 0
    (1, _pattern(BASE)),       # audio: same hash, other modality -> never paired
]


def test_boundary_pigeonhole_and_modality(spark, tmp_path):
    assert len(BASE ^ FLIP11) == 11 and len(BASE ^ FLIP12) == 12
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
        (r["asset_a"], r["asset_b"]): (r["modality"], r["hamming"])
        for r in multimodal_phash_neardup(spark, sf).collect()
    }
    assert got == {
        (0, 3): ("image", 11),   # threshold pair survives the banding
        (0, 9): ("image", 0),    # exact duplicate
        (3, 9): ("image", 11),
        (3, 6): ("image", 1),    # the two flipped variants differ by 1 bit
    }
    # absence assertions the dict equality implies, stated for the reader:
    assert (0, 6) not in got     # hamming 12: one past the threshold
    assert (0, 1) not in got     # identical hash but different modality


def _pattern240(z_positions: set[int]) -> str:
    return "".join("z" if i in z_positions else "a" for i in range(240))


BASE240 = set(range(0, 120))
# flips spread across MANY bands (positions 0,20,40,... hit distinct 20-bit
# bands), so the boundary exercises the cross-band hamming fold
FLIP11_240 = (BASE240 - {0, 20, 40, 60, 80}) | {120, 140, 160, 180, 200, 220}
FLIP12_240 = (BASE240 - {0, 20, 40, 60, 80, 100}) | {120, 140, 160, 180, 200, 220}


def test_wide_boundary_and_band_selectivity(spark, tmp_path):
    from aws_flight_data_pipeline_spark.plans.multimodal_queries import (
        multimodal_phash_neardup_wide,
    )

    assert len(BASE240 ^ FLIP11_240) == 11 and len(BASE240 ^ FLIP12_240) == 12
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    docs = [
        (0, _pattern240(BASE240)),
        (3, _pattern240(FLIP11_240)),  # hamming 11 across 11 bands -> kept
        (6, _pattern240(FLIP12_240)),  # hamming 12 across 12 bands -> rejected
        (9, _pattern240(BASE240)),     # exact duplicate
        (1, _pattern240(BASE240)),     # other modality, same hash -> never paired
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "documents.parquet")
    )
    rows = multimodal_phash_neardup_wide(spark, sf).collect()
    got = {
        (r["asset_a"], r["asset_b"]): (r["modality"], r["hamming"])
        for r in rows
    }
    assert got == {
        (0, 3): ("image", 11),
        (0, 9): ("image", 0),
        (3, 9): ("image", 11),
        (3, 6): ("image", 1),
        # the registered query's planted probe: a twin of the minimum
        # asset (constant id -1, provably outside any non-negative corpus)
        # with bands 0/5/9 perturbed one bit each — hamming 3 to asset 0
        # and its exact duplicate 9; FLIP11's 11 flips partially overlap
        # the probe's 3 (11 + 3 - 2*2 = 10), FLIP12's 12 flips overlap
        # all 3 (12 + 3 - 2*3 = 9)
        (-1, 0): ("image", 3),
        (-1, 9): ("image", 3),
        (-1, 3): ("image", 10),
        (-1, 6): ("image", 9),
    }
    # probe rows are FLAGGED (ADVICE r12): every pair touching the
    # synthetic twin carries pair_kind='probe', every real pair 'corpus'
    kinds = {(r["asset_a"], r["asset_b"]): r["pair_kind"] for r in rows}
    for (a, b), kind in kinds.items():
        assert kind == ("probe" if a < 0 or b < 0 else "corpus")
    assert sum(1 for k in kinds.values() if k == "corpus") == 4
    assert (0, 6) not in got  # hamming 12: every band differs -> and correctly
    #                            rejected even though bands DO collide
    assert (0, 1) not in got  # modality isolation


def test_adversarial_identical_replicas_collapse_before_banding(spark, tmp_path):
    """The 100 TB skew guard: one byte-identical asset replicated N times
    must contribute ONE row per band bucket (not N) — the banded candidate
    join stays O(distinct hashes), and the quadratic part of the output is
    produced only by the trivial within-group fan-out, never by banding."""
    from pyspark.sql import functions as F

    from aws_flight_data_pipeline_spark.operators.multimodal import (
        attach_payloads,
        phash_wide_assets,
    )
    from aws_flight_data_pipeline_spark.plans.multimodal_queries import (
        multimodal_phash_neardup_wide,
        wide_banded_group_candidates,
    )
    from aws_flight_data_pipeline_spark.sources.testdata import load_table

    n = 2000  # replicas of ONE asset, all image-modality (doc_id % 3 == 0)
    docs = [(3 * i, _pattern240(BASE240)) for i in range(n)]
    docs.append((3 * n, _pattern240(FLIP11_240)))        # near-dup, kept
    docs.append((3 * (n + 1), _pattern240(FLIP12_240)))  # past threshold
    sf = str(tmp_path / "sf")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(4).write.mode("overwrite").parquet(
        os.path.join(sf, "documents.parquet")
    )

    hashes = phash_wide_assets(attach_payloads(load_table(spark, sf, "documents")))
    groups = hashes.groupBy("modality", "bands").agg(F.min("asset_id").alias("rep"))
    assert groups.count() == 3  # 2000 replicas collapse to one hash

    # the measured guarantee: candidates = O(distinct^2), independent of n
    n_cand = wide_banded_group_candidates(groups).count()
    assert n_cand <= 3, f"banded candidates grew with replicas: {n_cand}"

    out = multimodal_phash_neardup_wide(spark, sf)
    # output contract: all n*(n-1)/2 identical pairs at hamming 0, the
    # near-dup paired with every replica at hamming 11, plus the registered
    # query's planted probe — ONE distinct hash 3 bits from BASE240, so it
    # fans out to every replica at hamming 3 and meets FLIP11/FLIP12 at
    # 10/9 (their flips overlap the probe's bands 0/5/9)
    counts = {r["hamming"]: r["c"] for r in
              out.groupBy("hamming").agg(F.count("*").alias("c")).collect()}
    assert counts == {0: n * (n - 1) // 2, 11: n, 1: 1, 3: n, 10: 1, 9: 1}
