"""Bloom-filter semi-join pruning: a KB-scale key digest that filters the
big side of a join BEFORE its shuffle.

The reference keeps join inputs small by partition-pruning both sides in
SQL (``sql/athena/07_optimization_guide.sql`` join guidance); the engine
analog at 100 TB is runtime filter pushdown: when the driving side's key
set is too large to broadcast raw (tens of millions of 8-byte keys) but
the FACT side is orders of magnitude larger still, a bloom filter of the
keys — a few hundred KB at a 1% false-positive rate — carried into the
plan as a CONSTANT removes most fact rows before they are hashed, sorted,
or shuffled. Spark's own runtime row-level filtering
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) applies this
rewrite only between shuffle stages it plans itself; this module makes
the same structure available as an explicit operator with deterministic
hashing (``xxhash64`` seeded per probe — JVM-side, whole-stage-codegen
bit arithmetic, no UDF anywhere).

Exactness contract: the bloom admits false POSITIVES only, so the pruned
frame is a superset of the true matches; composing it with the real
(semi) join yields exactly the un-pruned result — the filter changes the
plan's cost, never its answer. Pinned in tests/test_bloom.py.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bits per bloom word (the filter is a list of bigint words).
_W = 64


def optimal_params(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """Textbook (m_bits, k) for ``n_keys`` at false-positive rate ``fpp``;
    m is rounded up to a whole number of 64-bit words."""
    if n_keys <= 0:
        return _W, 1
    m = max(_W, int(math.ceil(-n_keys * math.log(fpp) / (math.log(2) ** 2))))
    m = ((m + _W - 1) // _W) * _W
    k = max(1, int(round(m / n_keys * math.log(2))))
    return m, k


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    # k independent probes from per-seed xxhash64; pmod keeps them in
    # [0, m) for negative hashes too
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)).cast("bigint")
        for i in range(k)
    ]


def build_bloom(df: DataFrame, key: str, m_bits: int, k: int) -> list[int]:
    """Aggregate the bloom words for ``df[key]`` distributively: explode
    each key's k bit positions, OR them per word (map-side partial +
    final — one tiny shuffle of at most ``m_bits/64`` groups), and return
    the dense word list (driver payload = m_bits/8 bytes, e.g. 16 KB for
    a 2^17-bit filter — the whole point vs collecting the key set)."""
    if m_bits % _W != 0:
        raise ValueError(f"m_bits must be a multiple of {_W}, got {m_bits}")
    n_words = m_bits // _W
    got = (
        df.select(F.explode(F.array(*_positions(F.col(key), m_bits, k))).alias("pos"))
        .select(
            (F.col("pos") / _W).cast("int").alias("word"),
            (F.col("pos") % _W).cast("int").alias("bit"),
        )
        .select("word", F.expr("shiftleft(CAST(1 AS BIGINT), bit)").alias("mask"))
        .groupBy("word")
        .agg(F.bit_or("mask").alias("mask"))
        .collect()
    )
    words = [0] * n_words
    for r in got:
        words[r["word"]] = r["mask"]
    return words


def bloom_prune(big: DataFrame, key: str, words: list[int], k: int) -> DataFrame:
    """Keep the rows of ``big`` whose ``key`` MIGHT be in the filter.

    The word list enters the plan as one constant-folded array literal;
    each of the k probes is hash → element_at → shiftleft mask test —
    pure codegen bit arithmetic (shift amounts are column-valued, which
    SQL ``shiftleft`` supports even though the PySpark wrapper's
    signature does not — hence the expr probe over named helper columns).
    Bit-shift semantics are overflow-free, so bit 63 works under ANSI.
    """
    m_bits = len(words) * _W
    out = big.withColumn(
        "_bl_arr", F.array(*[F.lit(int(w)).cast("bigint") for w in words])
    )
    helper = ["_bl_arr"]
    for i, p in enumerate(_positions(F.col(key), m_bits, k)):
        out = out.withColumn(f"_bl_p{i}", p)
        helper.append(f"_bl_p{i}")
    cond = " AND ".join(
        f"(element_at(_bl_arr, CAST(_bl_p{i} DIV {_W} AS INT) + 1)"
        f" & shiftleft(CAST(1 AS BIGINT), CAST(_bl_p{i} % {_W} AS INT))) <> 0"
        for i in range(k)
    )
    return out.where(F.expr(cond)).drop(*helper)


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    fpp: float = 0.01,
    n_keys: int | None = None,
) -> DataFrame:
    """``big`` LEFT SEMI ``small`` on ``key``, with a bloom pre-filter on
    the big side so the shuffle (and sort, under SMJ) runs over the ~fpp
    superset instead of the whole fact table. The final semi join makes
    the result EXACT — bloom false positives are removed there, and false
    negatives cannot exist.

    ``n_keys`` sizes the filter; when omitted, one count of the small
    side's distinct keys (a column-pruned scan) decides it.
    """
    keys = small.select(key).distinct()
    if n_keys is None:
        n_keys = keys.count()
    m_bits, k = optimal_params(n_keys, fpp)
    words = build_bloom(keys, key, m_bits, k)
    return bloom_prune(big, key, words, k).join(keys, on=key, how="left_semi")
