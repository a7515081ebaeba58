"""Bloom-filter semi-join pruning: a KB-scale key digest that filters the
big side of a join BEFORE its shuffle.

The reference keeps join inputs small by partition-pruning both sides in
SQL (``sql/athena/07_optimization_guide.sql`` join guidance); the engine
analog at 100 TB is runtime filter pushdown: when the driving side's key
set is too large to broadcast raw (tens of millions of 8-byte keys) but
the FACT side is orders of magnitude larger still, a bloom filter of the
keys — a few hundred KB at a ~1% false-positive rate — removes most fact
rows before they are hashed, sorted, or shuffled. Spark's own runtime
row-level filtering (``spark.sql.optimizer.runtime.bloomFilter.enabled``)
applies this rewrite only between shuffle stages it plans itself; this
module makes the same structure available as an explicit operator with
deterministic hashing (``xxhash64`` seeded per probe — JVM-side,
whole-stage-codegen bit arithmetic, no UDF anywhere).

Scale contract: the bloom words NEVER leave the JVM and never enter the
plan tree as literals. ``build_bloom`` returns a one-row DataFrame whose
single dense ``array<bigint>`` column is assembled in-plan (zero-mask
filler union + ``array_sort(collect_list)`` — a constant number of
expressions regardless of filter size), and ``bloom_prune`` injects it
into the probe as an uncorrelated SCALAR SUBQUERY: Spark executes the
build once and plugs the resulting array into the filter as a runtime
constant. A 10M-key filter is a ~12 MB runtime value and an O(1)-size
plan; it is never a Python list, a py4j literal storm, or a million-node
expression tree. (Two rejected alternatives, measured: a broadcast
one-row cross join copies the word array into EVERY joined fact row —
tens of GB of memcpy at 600k rows; a single ``F.lit(words)`` ships every
word through py4j one element at a time.)

Exactness contract: the bloom admits false POSITIVES only, so the pruned
frame is a superset of the true matches; composing it with the real
(semi) join yields exactly the un-pruned result — the filter changes the
plan's cost, never its answer. Pinned in tests/test_bloom.py.

Selectivity contract: a bloom over keys that cover most of the fact
side's key domain prunes (almost) nothing and only adds probe cost, so
``bloom_semi_join`` skips the bloom entirely when the driving key count
exceeds ``max_key_fraction`` of the fact row count and plans the plain
semi join instead. When ``n_keys`` is not supplied the filter is sized
AT that guard boundary (no counting job): fewer actual keys only lower
the fpp, more only saturate the filter toward "prunes nothing" — never
toward wrong answers.
"""

from __future__ import annotations

import math
import uuid

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bits per bloom word (the filter is a dense array of bigint words).
_W = 64

#: Name of the dense word-array column carried by the bloom frame.
WORDS_COL = "_bl_words"

#: Default cap on probe count: past ~4 probes the per-row hash cost grows
#: linearly while the fpp improvement flattens; 3 probes at the 9.6
#: bits/key design point give ~1.9% fpp vs 1.0% for the textbook k=7 at
#: less than half the CPU — and the trailing exact join unmakes false
#: positives anyway.
DEFAULT_K_MAX = 3


def optimal_params(
    n_keys: int, fpp: float = 0.01, k_max: int | None = None
) -> tuple[int, int]:
    """Textbook (m_bits, k) for ``n_keys`` at false-positive rate ``fpp``;
    m is rounded up to a whole number of 64-bit words and k is clamped to
    ``k_max`` (see :data:`DEFAULT_K_MAX` for why a cap is the right
    default in a pre-filter whose false positives are free)."""
    if k_max is None:
        k_max = DEFAULT_K_MAX
    if n_keys <= 0:
        return _W, 1
    m = max(_W, int(math.ceil(-n_keys * math.log(fpp) / (math.log(2) ** 2))))
    m = ((m + _W - 1) // _W) * _W
    k = max(1, min(int(round(m / n_keys * math.log(2))), k_max))
    return m, k


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    # k independent probes from per-seed xxhash64; pmod keeps them in
    # [0, m) for negative hashes too
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(int(m_bits))).cast("bigint")
        for i in range(k)
    ]


def build_bloom(df: DataFrame, key: str, m_bits: int, k: int) -> DataFrame:
    """Aggregate the bloom for ``df[key]`` distributively and return it as
    a ONE-ROW frame with a single dense ``array<bigint>`` column
    (:data:`WORDS_COL`, length ``m_bits / 64``).

    Each key's k bit positions are exploded, OR-ed per word (map-side
    partial + final — one tiny shuffle; a single-partition zero-mask
    filler row per word rides along so every word index is present
    exactly once), then gathered dense with one
    ``array_sort(collect_list)`` + ``transform`` — plan size is constant
    no matter how large the filter is, and the words stay JVM-side end to
    end. Duplicate keys in ``df`` are harmless (bit insertion is
    idempotent), so callers need not pay a distinct shuffle first."""
    if m_bits % _W != 0:
        raise ValueError(f"m_bits must be a multiple of {_W}, got {m_bits}")
    n_words = m_bits // _W
    filler = df.sparkSession.range(0, n_words, 1, 1).select(
        F.col("id").cast("int").alias("word"),
        F.lit(0).cast("bigint").alias("mask"),
    )
    word_masks = (
        df.select(F.explode(F.array(*_positions(F.col(key), m_bits, k))).alias("pos"))
        .select(
            (F.col("pos") / _W).cast("int").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias(
                "mask"
            ),
        )
        .unionByName(filler)
        .groupBy("word")
        .agg(F.bit_or("mask").alias("mask"))
    )
    return word_masks.agg(
        F.array_sort(F.collect_list(F.struct("word", "mask"))).alias("_bl_sorted")
    ).select(F.transform(F.col("_bl_sorted"), lambda s: s["mask"]).alias(WORDS_COL))


def bloom_prune(
    big: DataFrame, key: str, bloom: DataFrame, k: int, m_bits: int | None = None
) -> DataFrame:
    """Keep the rows of ``big`` whose ``key`` MIGHT be in ``bloom`` (a
    one-row frame from :func:`build_bloom`).

    The bloom enters the probe as an uncorrelated scalar subquery over a
    per-call temp view (unique name; the view must outlive the returned
    DataFrame, which session-scoped temp views do): Spark executes the
    build side ONCE per query and treats the resulting array as a runtime
    constant in the filter — no per-row array copying (a one-row
    broadcast join would materialize the words into every fact row), no
    driver materialization, no plan-tree growth. Each probe hashes once
    into a helper column, then tests one bit via ``element_at`` +
    column-valued ``shiftleft`` (SQL supports it even though the PySpark
    wrapper's signature does not) — pure JVM bit arithmetic, bit 63
    included (shifts are overflow-free under ANSI). Pass the build's
    ``m_bits`` to keep the hash modulus a plan literal; when omitted it
    is derived from the bloom frame itself by a scalar subquery, so
    filter and probes can never disagree."""
    from aws_flight_data_pipeline_spark.functions.caching import tracked_view

    view = f"_bloom_{uuid.uuid4().hex}"
    bloom.createOrReplaceTempView(view)
    # views are per-call and session-scoped: register for drop at the next
    # release point so long-lived sessions don't accumulate catalog entries
    # (dropping later never breaks THIS call's result — the returned frame
    # is analyzed eagerly, binding the view's plan before any drop can run)
    tracked_view(bloom.sparkSession, view)
    if m_bits is not None:
        m_expr = str(int(m_bits))
    else:
        m_expr = f"(SELECT size({WORDS_COL}) * {_W} FROM {view})"
    out = big
    helper = []
    for i in range(k):
        out = out.withColumn(
            f"_bl_p{i}",
            F.expr(f"CAST(pmod(xxhash64({key}, {i}), {m_expr}) AS BIGINT)"),
        )
        helper.append(f"_bl_p{i}")
    cond = " AND ".join(
        f"(element_at((SELECT {WORDS_COL} FROM {view}),"
        f" CAST(_bl_p{i} DIV {_W} AS INT) + 1)"
        f" & shiftleft(CAST(1 AS BIGINT), CAST(_bl_p{i} % {_W} AS INT))) <> 0"
        for i in range(k)
    )
    return out.where(F.expr(cond)).drop(*helper)


def _estimated_rows(df: DataFrame) -> int:
    """Catalyst's size-based row estimate for ``df`` — zero jobs. Used
    only to SIZE the bloom (where a few-× error merely shifts the fpp),
    never for correctness."""
    stats = df._jdf.queryExecution().optimizedPlan().stats()
    if stats.rowCount().isDefined():
        return int(str(stats.rowCount().get()))
    # size-based fallback: rough per-row width from the (pruned) schema —
    # only the order of magnitude matters here
    _widths = {"long": 8, "double": 8, "integer": 4, "date": 4, "float": 4}
    width = max(1, sum(_widths.get(f.dataType.typeName(), 20) for f in df.schema))
    return max(1, int(str(stats.sizeInBytes())) // width)


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    fpp: float = 0.01,
    n_keys: int | None = None,
    n_big: int | None = None,
    max_key_fraction: float = 0.1,
    k_max: int | None = None,
) -> DataFrame:
    """``big`` LEFT SEMI ``small`` on ``key``, with a bloom pre-filter on
    the big side so the shuffle (and sort, under SMJ) runs over the ~fpp
    superset instead of the whole fact table. The final semi join makes
    the result EXACT — bloom false positives are removed there, and false
    negatives cannot exist (LEFT SEMI also tolerates duplicate build
    keys natively, so no distinct shuffle is ever paid).

    Sizing and the guard cost ZERO extra jobs by default: ``n_big``
    falls back to Catalyst's size-based row estimate, and when ``n_keys``
    is unknown the filter is sized at the guard boundary
    (``max_key_fraction * n_big``) — fewer actual keys only improve the
    fpp; more only saturate the bloom toward "prunes nothing", never
    toward wrong answers. Pass an exact ``n_keys`` (e.g. from a count you
    already ran) to enable the guard: when the driving key count exceeds
    ``max_key_fraction`` of the fact rows the bloom cannot pay for its
    probes and the plain semi join is planned instead (pass
    ``max_key_fraction=1.0`` to force the bloom path)."""
    keys = small.select(key)
    if n_big is None:
        n_big = _estimated_rows(big)
    boundary = max(1, int(max_key_fraction * n_big))
    if n_keys is not None:
        if n_keys == 0 or (max_key_fraction < 1.0 and n_keys > boundary):
            return big.join(keys, on=key, how="left_semi")
        size_for = n_keys
    else:
        size_for = boundary
    m_bits, k = optimal_params(size_for, fpp, k_max)
    bloom = build_bloom(keys, key, m_bits, k)
    return bloom_prune(big, key, bloom, k, m_bits).join(
        keys, on=key, how="left_semi"
    )
