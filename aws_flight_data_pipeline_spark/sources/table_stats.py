"""ANALYZE for the versioned table: mergeable per-file HLL column NDV.

The manifest's footer stats ([min, max] per file) answer range questions;
they say nothing about CARDINALITY. Distinct counts drive the decisions a
planner and an operator make at scale — which join side broadcasts,
whether a key is near-unique (dedup candidate) or low-cardinality (pivot
candidate), how many buckets a layout needs — and recomputing
COUNT(DISTINCT) per question rescans the table.

This module maintains a HyperLogLog sketch PER DATA FILE per column:

- Data files of the versioned table are immutable (copy-on-write), so a
  file's sketch never goes stale — it stays valid for every version that
  references the file. ``analyze`` therefore only sketches files not yet
  covered: O(churn) maintenance, same contract as the IVM and inverted-
  index tiers.
- HLL registers merge by element-wise MAX, so the table-level NDV at any
  version is the merge of that version's file sketches — no rescan, and
  the incremental result is BIT-IDENTICAL to a from-scratch analyze (the
  per-file registers don't depend on when they were computed).

Register computation is one Spark pass over the un-analyzed files, all
JVM-side: xxhash64 per value, low 8 bits pick 1 of m=256 registers, the
rank of the remaining 56 bits is derived INTEGER-EXACTLY from the length
of the binary string (``57 - length(bin(w))`` — no float log whose edge
rounding could flip a register), then ``groupBy(file, col, bucket).max``.
Output is m rows per (file, column): KB-scale state, like the manifest
blooms.

Sketches live in ``<table>/_stats/hll.json``, replaced atomically
(tmp + rename). Like OPTIMIZE, analyze assumes one maintenance actor at
a time; concurrent analyzers lose no correctness, only coverage (last
write wins, the next analyze tops the gap back up).
"""

from __future__ import annotations

import json
import math
import os
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from aws_flight_data_pipeline_spark.sources import versioned

M = 256  # registers per sketch (2^8); standard error ~ 1.04/sqrt(m) = 6.5%
_MAX_RANK = 57  # 56 usable bits after the 8-bit bucket index, +1


def _stats_path(path: str) -> str:
    return os.path.join(path, "_stats", "hll.json")


def _load(path: str) -> dict:
    try:
        with open(_stats_path(path)) as f:
            return json.load(f)
    except FileNotFoundError:
        return {}


def _store(path: str, payload: dict) -> None:
    d = os.path.dirname(_stats_path(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, _stats_path(path))


def analyze(
    spark: SparkSession, path: str, cols: tuple[str, ...], version: int | None = None
) -> dict:
    """Sketch every not-yet-covered data file of ``version`` (default head)
    for ``cols``. Returns ``{"files_sketched": n, "files_total": t}``."""
    v = versioned.latest_version(path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no versioned table at {path}")
    manifest = versioned._read_manifest(path, v)
    files = manifest["files"]
    stats = _load(path)
    covered = {f for f, per_col in stats.items() if all(c in per_col for c in cols)}
    missing = [f for f in files if f not in covered]
    if missing:
        df = spark.read.parquet(*[os.path.join(path, f) for f in missing])
        # map absolute scan URIs back to manifest-relative paths by
        # basename — part-file names carry a write-unique uuid
        base_to_rel = {os.path.basename(f): f for f in missing}
        present = [c for c in cols if c in df.columns]
        # NB: xxhash64(NULL) returns the seed hash, not NULL — nulls must
        # be excluded on the VALUE, or every null would count as one
        # spurious distinct
        entries = F.array(
            *[
                F.struct(
                    F.lit(c).alias("col"),
                    F.xxhash64(F.col(c)).alias("h"),
                    F.col(c).isNull().alias("is_null"),
                )
                for c in present
            ]
        )
        long = (
            df.select(F.input_file_name().alias("uri"), F.explode(entries).alias("s"))
            .where(~F.col("s.is_null"))
            .select("uri", "s.col", "s.h")
        )
        w = F.shiftrightunsigned(F.col("h"), 8)
        regs = (
            long.select(
                "uri",
                "col",
                F.expr("h & 255").cast("int").alias("bucket"),
                F.when(w == 0, F.lit(_MAX_RANK))
                .otherwise(F.lit(_MAX_RANK) - F.length(F.bin(w)))
                .cast("int")
                .alias("rank"),
            )
            .groupBy("uri", "col", "bucket")
            .agg(F.max("rank").alias("r"))
            .collect()
        )
        fresh: dict[str, dict[str, list[int]]] = {}
        for row in regs:
            rel = base_to_rel[os.path.basename(row["uri"])]
            arr = fresh.setdefault(rel, {}).setdefault(row["col"], [0] * M)
            arr[row["bucket"]] = row["r"]
        # files whose column is entirely NULL produce no rows: record the
        # all-zero sketch so coverage (and NDV 0) is explicit
        for rel in missing:
            for c in present:
                fresh.setdefault(rel, {}).setdefault(c, [0] * M)
        for rel, per_col in fresh.items():
            stats.setdefault(rel, {}).update(per_col)
        _store(path, stats)
    return {"files_sketched": len(missing), "files_total": len(files)}


def _estimate(regs: list[int]) -> int:
    alpha = 0.7213 / (1 + 1.079 / M)
    e = alpha * M * M / sum(2.0 ** -r for r in regs)
    zeros = regs.count(0)
    if e <= 2.5 * M and zeros:  # small-range (linear counting) correction
        e = M * math.log(M / zeros)
    return int(round(e))


def column_stats(
    path: str, cols: tuple[str, ...], version: int | None = None
) -> dict:
    """Merged NDV estimate per column at ``version`` (default head), from
    the per-file sketches alone — no scan. ``files_covered`` <
    ``files_total`` means analyze() hasn't caught up with a rewrite
    (OPTIMIZE / MERGE / DELETE produce new files); the estimate then
    covers only the sketched files and ``complete`` is False."""
    v = versioned.latest_version(path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no versioned table at {path}")
    files = versioned._read_manifest(path, v)["files"]
    stats = _load(path)
    out: dict[str, dict] = {}
    for c in cols:
        merged = [0] * M
        covered = 0
        for f in files:
            regs = stats.get(f, {}).get(c)
            if regs is None:
                continue
            covered += 1
            for i, r in enumerate(regs):
                if r > merged[i]:
                    merged[i] = r
        out[c] = {
            "ndv": _estimate(merged) if covered else None,
            "files_covered": covered,
            "files_total": len(files),
            "complete": covered == len(files),
        }
    return out


def prune(path: str) -> dict:
    """Drop sketches for data files no LIVE manifest references anymore —
    the stats-store companion to ``versioned.vacuum`` (a sketch of a
    vacuumed file is dead weight; one of a still-referenced historical
    file stays, since time-travel reads may ask for its version's NDV).
    Returns ``{"pruned": n, "kept": k}``."""
    stats = _load(path)
    if not stats:
        return {"pruned": 0, "kept": 0}
    live: set[str] = set()
    for v in versioned._list_versions(path):
        live.update(versioned._read_manifest(path, v)["files"])
    kept = {f: s for f, s in stats.items() if f in live}
    pruned = len(stats) - len(kept)
    if pruned:
        _store(path, kept)
    return {"pruned": pruned, "kept": len(kept)}


def row_count(path: str, version: int | None = None) -> int:
    """Exact row count at ``version`` (default head) from parquet FOOTER
    metadata — no data pages read, O(files) driver work. The lake-side
    input to planner decisions (broadcast thresholds, bucket counts)."""
    import pyarrow.parquet as pq

    v = versioned.latest_version(path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no versioned table at {path}")
    files = versioned._read_manifest(path, v)["files"]
    return sum(
        pq.ParquetFile(os.path.join(path, f)).metadata.num_rows for f in files
    )


def plan_join_tree(
    spark: SparkSession,
    tables: dict[str, str],
    edges: list[tuple[str, str, str, str]],
    broadcast_threshold_rows: int = 1_000_000,
    ensure_analyzed: bool = True,
    filters: dict[str, dict] | None = None,
):
    """Cost-based LEFT-DEEP ordering + per-edge strategy for a 3+ table
    equi-join over versioned tables, driven entirely by the ANALYZE tier:
    exact footer row counts pick the fact table (largest — always the
    streaming probe side, never broadcast) and the build-side strategy per
    edge; per-column HLL NDV drives the System-R output-cardinality
    estimate ``|A ⋈ B| ≈ |A|·|B| / max(ndv_A(k), ndv_B(k))`` that orders
    the remaining joins greedily (most-reducing edge first). This is the
    decision Catalyst cannot make for manifest-pinned file lists: its
    size-in-bytes estimates see whatever the scan relation reports, not
    the manifest's exact knowledge — and with the broadcast threshold off
    (or file sizes misreported) it plans shuffle joins for KB dimensions.
    Reference analog: the optimization guide's filter-before-join +
    small-dimension broadcast guidance
    (``sql/athena/07_optimization_guide.sql:193-234``), automated from
    maintained statistics instead of hand-written per query.

    ``tables``: name -> versioned table path. ``edges``: equi-join
    conditions ``(table_a, key_a, table_b, key_b)``; the edge set must
    connect all tables (tree or cyclic — a cyclic edge whose both sides
    are already joined is applied as a post-filter). When
    ``ensure_analyzed`` is set, join-key columns missing an HLL sketch are
    analyzed first (O(uncovered files), the ANALYZE tier's top-up
    contract); otherwise an unsketched key falls back to the table's row
    count (assume-unique — conservative for dimension keys).

    ``filters``: per-table range/equality predicates ``{table: {col:
    (lo, hi)}}`` — the optimization guide's FILTER-BEFORE-JOIN rule made a
    planner input: each filtered table is read stats-scoped
    (``versioned.read(where=...)`` — manifest file skipping + the row
    filter), and its row count for ordering/broadcast decisions is the
    FOOTER count of only the surviving files (an upper bound: a kept file
    may still hold non-matching rows — conservative, so a filter can only
    demote a table toward broadcast when its pruned size provably allows).

    Returns ``(df, facts)``: the joined DataFrame and a plan-facts dict
    (the monitor's evidence format) with the chosen order, per-step
    cardinality estimates, and per-edge strategies.
    """
    if len(tables) < 2:
        raise ValueError("plan_join_tree needs at least two tables")
    keys_by_table: dict[str, set[str]] = {t: set() for t in tables}
    for a, ka, b, kb in edges:
        if a not in tables or b not in tables:
            raise ValueError(f"edge ({a},{ka},{b},{kb}) references unknown table")
        keys_by_table[a].add(ka)
        keys_by_table[b].add(kb)

    filters = filters or {}

    def _pruned_rows(t: str) -> int:
        where = filters.get(t)
        if not where:
            return row_count(tables[t])
        import pyarrow.parquet as pq

        path = tables[t]
        v = versioned.latest_version(path)
        kept, _ = versioned.plan_files(path, v, where)
        return sum(
            pq.ParquetFile(os.path.join(path, f)).metadata.num_rows for f in kept
        )

    n: dict[str, int] = {t: _pruned_rows(t) for t in tables}
    ndv: dict[str, dict[str, int]] = {}
    for t, p in tables.items():
        cols = tuple(sorted(keys_by_table[t]))
        if not cols:
            ndv[t] = {}
            continue
        if ensure_analyzed:
            analyze(spark, p, cols)
        st = column_stats(p, cols)
        # assume-unique fallback for unsketched keys; cap at the (possibly
        # filter-pruned) row count — an NDV above the rows that survive
        # pruning is impossible among the surviving rows, and capping
        # tightens the join estimate exactly when a filter made the
        # table's key set smaller
        ndv[t] = {
            c: min(n[t], st[c]["ndv"]) if st[c]["ndv"] else n[t] for c in cols
        }

    fact = max(n, key=lambda t: (n[t], t))
    joined = {fact}
    df = versioned.read(spark, tables[fact], where=filters.get(fact))
    cur = n[fact]
    steps: list[dict] = []
    remaining = list(edges)

    while remaining:
        # Cycle-closing filter edges are FREE and strictly reducing (inner
        # joins and filters commute), so drain every edge whose both sides
        # are already joined before scoring join candidates — deferring one
        # behind a cheap-looking join would leave intermediates needlessly
        # large and later edge estimates looser. Equality selectivity
        # ~ 1/max(ndv) — System-R — so the running estimate tightens for
        # every subsequent candidate score.
        closable = [e for e in remaining if e[0] in joined and e[2] in joined]
        for e in sorted(closable, key=str):
            remaining.remove(e)
            a, ka, b, kb = e
            df = df.where(F.col(ka) == F.col(kb))
            sel_ndv = max(
                [ndv[x][k] for k in (ka, kb) for x in tables if k in ndv[x]]
                or [1]
            )
            cur = max(1, cur // max(1, sel_ndv))
            steps.append({"edge": e, "strategy": "filter", "est_rows_out": cur})
        if not remaining:
            break

        candidates = []
        for e in remaining:
            a, ka, b, kb = e
            if a in joined:
                t, tk, jk = b, kb, ka
            elif b in joined:
                t, tk, jk = a, ka, kb
            else:
                continue
            # joined-side key NDV: the base table's sketch for that column,
            # capped by the current estimated cardinality
            j_sketches = [ndv[x][jk] for x in joined if jk in ndv[x]]
            j_ndv = min(cur, max(j_sketches)) if j_sketches else cur
            est = max(1, (cur * n[t]) // max(1, max(j_ndv, ndv[t][tk])))
            candidates.append((est, e, (t, tk, jk)))
        if not candidates:
            raise ValueError(
                f"edge set does not connect {sorted(set(tables) - joined)} "
                "to the joined tree"
            )
        est, e, pick = min(candidates, key=lambda c: (c[0], str(c[1])))
        remaining.remove(e)
        a, ka, b, kb = e
        t, tk, jk = pick
        right = versioned.read(spark, tables[t], where=filters.get(t))
        bcast = n[t] <= broadcast_threshold_rows
        right_in = F.broadcast(right) if bcast else right
        df = df.join(right_in, on=F.col(jk) == F.col(tk), how="inner")
        joined.add(t)
        cur = est
        steps.append(
            {
                "edge": e,
                "table": t,
                "rows": n[t],
                "ndv_used": {jk: None, tk: ndv[t][tk]},
                "strategy": "broadcast" if bcast else "sort_merge",
                "est_rows_out": est,
            }
        )

    if joined != set(tables):
        raise ValueError(
            f"edge set does not connect {sorted(set(tables) - joined)} "
            "to the joined tree"
        )
    facts = {
        "fact_table": fact,
        "fact_rows": n[fact],
        "order": [fact] + [s["table"] for s in steps if "table" in s],
        "steps": steps,
        "broadcasts": sum(1 for s in steps if s["strategy"] == "broadcast"),
        "row_counts": n,
    }
    return df, facts


def stats_hinted_join(
    spark: SparkSession,
    left_path: str,
    right_path: str,
    on: list[str] | str,
    broadcast_threshold_rows: int = 1_000_000,
    how: str = "inner",
):
    """Join two versioned tables with a STATISTICS-DRIVEN strategy hint —
    the decision Catalyst cannot make for a file-list scan (its size
    estimate sees bytes, not the manifest's knowledge):

    - If either side's footer row count is under the threshold, that side
      gets an explicit ``broadcast()`` hint (ties pick the smaller side)
      — the hash table ships once, the big side never shuffles.
    - Otherwise neither is hinted and the planner's sort-merge join
      stands — broadcasting a huge build side is an OOM, not a win.

    Row counts come from footers (exact, no scan). Returns the joined
    DataFrame; the chosen strategy is observable in the plan (pinned in
    tests/test_stats_planner.py).
    """
    left = versioned.read(spark, left_path)
    right = versioned.read(spark, right_path)
    n_left = row_count(left_path)
    n_right = row_count(right_path)
    if how == "inner" and min(n_left, n_right) <= broadcast_threshold_rows:
        if n_left <= n_right:
            return F.broadcast(left).join(right, on, how)
        return left.join(F.broadcast(right), on, how)
    # outer joins can only broadcast the non-preserved side
    if how in ("left", "left_outer", "leftouter") and n_right <= broadcast_threshold_rows:
        return left.join(F.broadcast(right), on, how)
    if how in ("right", "right_outer", "rightouter") and n_left <= broadcast_threshold_rows:
        return F.broadcast(left).join(right, on, how)
    return left.join(right, on, how)
