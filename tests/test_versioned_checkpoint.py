"""Checkpoint manifest bounding the versioned table's metadata walks: a
~1,000-commit streaming-style chain must answer head / replay-ledger /
change-feed questions with a BOUNDED number of manifest reads (the
checkpoint interval, never the chain length), while time travel, vacuum,
and exactly-once semantics stay unchanged."""

from __future__ import annotations

import json
import os
import time

from aws_flight_data_pipeline_spark.sources import versioned as vt

N_COMMITS = 1_000


def _grow_chain(spark, tmp_path, n=N_COMMITS):
    """One real data commit, then ``n`` metadata-only maintenance commits
    (the cheap JSON path every real maintenance op takes through
    ``_publish``), with a streaming batch stamp every 50 commits — the
    30-second-trigger streaming chain's shape without paying n Spark
    writes."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, tag string")
    vt.commit(df, path, stats_cols=("id",))
    m0 = vt._read_manifest(path, 0)
    for v in range(1, n + 1):
        manifest = {
            "version": v,
            "parent": v - 1,
            "mode": "stamp",
            "files": m0["files"],
            "n_files": m0["n_files"],
            "stats": m0.get("stats", {}),
            "committed_at": time.time(),
        }
        if v % 50 == 0:
            manifest["batch_id"] = v
        vt._publish(path, v, manifest)
    return path


def test_thousand_commit_chain_reads_are_bounded(spark, tmp_path, monkeypatch):
    path = _grow_chain(spark, tmp_path)

    reads = {"n": 0}
    real = vt._read_manifest

    def counting(p, v):
        reads["n"] += 1
        return real(p, v)

    monkeypatch.setattr(vt, "_read_manifest", counting)

    # head resolution: the _head.json hint, zero manifest reads
    reads["n"] = 0
    assert vt.latest_version(path) == N_COMMITS
    assert reads["n"] == 0

    # replay ledger: the checkpoint horizon bounds the newest-first walk
    # to the interval, not the 1,000-commit chain
    reads["n"] = 0
    ids = vt._batch_versions(path)
    assert ids == {v for v in range(50, N_COMMITS + 1, 50)}
    assert reads["n"] <= vt.CHECKPOINT_EVERY + 2, (
        f"_batch_versions read {reads['n']} manifests — the walk is "
        "unbounded (checkpoint horizon not honored)"
    )

    # change feed across the whole chain: exactly the two endpoint manifests
    reads["n"] = 0
    vt.changed_files(path, 0, N_COMMITS)
    assert reads["n"] == 2


def test_checkpoint_written_and_horizon_advances(spark, tmp_path):
    path = _grow_chain(spark, tmp_path, n=2 * vt.CHECKPOINT_EVERY + 10)
    cp = vt._read_checkpoint(path)
    # auto-checkpoint from _publish: horizon within one interval of head
    assert cp["folded_through"] >= vt.CHECKPOINT_EVERY
    # explicit checkpoint folds the tail and lands on the head
    out = vt.checkpoint(path)
    assert out["folded_through"] == vt.latest_version(path)
    # every stamped id below the horizon is in the durable ledger file
    with open(vt._batches_path(path)) as fh:
        ledger = set(json.load(fh))
    assert {v for v in range(50, cp["folded_through"] + 1, 50)} <= ledger


def test_exactly_once_and_time_travel_survive_checkpointing(spark, tmp_path):
    path = _grow_chain(spark, tmp_path, n=vt.CHECKPOINT_EVERY + 5)
    head = vt.latest_version(path)

    # exactly-once: a replay of an already-stamped batch is still a no-op
    # (its id is ledger-folded by the checkpoint, not re-walked)
    df = spark.createDataFrame([(9, "z")], "id bigint, tag string")
    assert vt.commit_stream_batch(df, 50, path) is None
    assert vt.latest_version(path) == head

    # a NEW batch still commits and stamps
    v = vt.commit_stream_batch(df, 10_001, path)
    assert v == head + 1
    assert 10_001 in vt._batch_versions(path)

    # time travel to v0 unchanged
    assert vt.read(spark, path, version=0).count() == 2

    # vacuum unchanged: retains the head, folds dropped stamps durably
    vt.vacuum(path, keep_last=2, min_age_seconds=0)
    assert vt.read(spark, path).count() == 3
    assert 50 in vt._batch_versions(path)
