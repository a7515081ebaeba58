"""infer_round: monotonic across driver gaps, stable within one session's
multiple benches, pinnable via SPARK_GRAFT_ROUND."""

from __future__ import annotations

import json
import os

from aws_flight_data_pipeline_spark.functions.rounds import infer_round


def _touch(d, name):
    with open(os.path.join(d, name), "w") as f:
        json.dump({}, f)


def test_driver_artifacts_drive_plus_one(tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_ROUND", raising=False)
    d = str(tmp_path)
    _touch(d, "BENCH_r07.json")
    _touch(d, "CORRECTNESS_r09.json")  # driver gap at r08: still monotonic
    assert infer_round(d) == 10


def test_own_sidecars_do_not_increment_within_a_session(tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_ROUND", raising=False)
    d = str(tmp_path)
    _touch(d, "CORRECTNESS_r09.json")
    assert infer_round(d) == 10
    _touch(d, "BENCH_FULL_r10.json")  # this session's first bench
    assert infer_round(d) == 10  # the scaling sweep stays on r10
    _touch(d, "BENCH_SCALING_r10.json")
    assert infer_round(d) == 10


def test_sidecars_floor_prevents_backward_naming(tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_ROUND", raising=False)
    d = str(tmp_path)
    # the r9 inversion scenario: driver history ends at r07, but a sidecar
    # from a later session is already committed as r09
    _touch(d, "BENCH_r07.json")
    _touch(d, "BENCH_FULL_r09.json")
    assert infer_round(d) == 9  # never write below an existing sidecar


def test_driver_post_gate_bench_stays_on_current_round(tmp_path, monkeypatch):
    # the r11 stray-artifact scenario: the driver wrote CORRECTNESS_r11,
    # then ran bench.py BEFORE recording BENCH_r11 — with the builder's
    # round-11 sidecar already committed, that bench belongs to round 11,
    # not 12
    monkeypatch.delenv("SPARK_GRAFT_ROUND", raising=False)
    d = str(tmp_path)
    _touch(d, "BENCH_r10.json")
    _touch(d, "CORRECTNESS_r10.json")
    _touch(d, "BENCH_FULL_r11.json")  # builder benched during round 11
    _touch(d, "CORRECTNESS_r11.json")  # driver just stamped the gate
    assert infer_round(d) == 11  # BENCH_r11 not yet recorded: round 11 is CURRENT
    _touch(d, "BENCH_r11.json")  # driver records the bench line: round closed
    assert infer_round(d) == 12


def test_benchless_driver_round_still_advances(tmp_path, monkeypatch):
    # a gate-only round (CORRECTNESS recorded, bench crashed, and the
    # builder never benched either — no sidecar): the NEXT artifact belongs
    # to the next round, not to the closed one
    monkeypatch.delenv("SPARK_GRAFT_ROUND", raising=False)
    d = str(tmp_path)
    _touch(d, "BENCH_r07.json")
    _touch(d, "CORRECTNESS_r09.json")
    assert infer_round(d) == 10


def test_env_pin_wins(tmp_path, monkeypatch):
    d = str(tmp_path)
    _touch(d, "CORRECTNESS_r09.json")
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "12")
    assert infer_round(d) == 12


def test_post_gate_bench_never_clobbers_committed_artifact(tmp_path, monkeypatch):
    # the r12 clobber scenario (verdict r12 #3): the driver's post-gate
    # bench correctly names round 12 — and must therefore NOT overwrite the
    # builder's committed BENCH_FULL_r12.json; it diverts to _post (then
    # _post2 if a post artifact already exists)
    from aws_flight_data_pipeline_spark.functions.rounds import full_bench_path

    monkeypatch.delenv("SPARK_GRAFT_ROUND", raising=False)
    d = str(tmp_path)
    _touch(d, "BENCH_r11.json")
    _touch(d, "CORRECTNESS_r11.json")
    _touch(d, "BENCH_FULL_r12.json")  # builder's gated artifact, committed
    _touch(d, "CORRECTNESS_r12.json")  # driver stamps the gate...
    rn = infer_round(d)
    assert rn == 12  # ...and its post-gate bench stays on round 12
    p = full_bench_path(d, rn)
    assert os.path.basename(p) == "BENCH_FULL_r12_post.json"
    _touch(d, "BENCH_FULL_r12_post.json")
    assert os.path.basename(full_bench_path(d, rn)) == "BENCH_FULL_r12_post2.json"
    # _post artifacts are NOT sidecar stamps: round inference is unchanged
    assert infer_round(d) == 12


def test_builder_rebench_within_round_keeps_overwriting_own_sidecar(
    tmp_path, monkeypatch
):
    # before the gate stamps, the builder iterates: repeated benches in the
    # same round overwrite the builder's own in-progress sidecar (normal)
    from aws_flight_data_pipeline_spark.functions.rounds import full_bench_path

    monkeypatch.delenv("SPARK_GRAFT_ROUND", raising=False)
    d = str(tmp_path)
    _touch(d, "BENCH_r12.json")
    _touch(d, "CORRECTNESS_r12.json")
    rn = infer_round(d)
    assert rn == 13
    assert os.path.basename(full_bench_path(d, rn)) == "BENCH_FULL_r13.json"
    _touch(d, "BENCH_FULL_r13.json")  # first bench of the round
    assert infer_round(d) == 13
    # no CORRECTNESS_r13 yet -> still the builder's round: same path
    assert os.path.basename(full_bench_path(d, 13)) == "BENCH_FULL_r13.json"


def test_closed_round_rebench_diverts_to_rerun(tmp_path, monkeypatch):
    # the ADVICE r13 #1 scenario: the round is fully CLOSED (both driver
    # stamps present) and someone re-runs bench.py with SPARK_GRAFT_ROUND
    # pinned back to it — is_post_gate is False (BENCH_rN exists), so the
    # old logic returned the base path and clobbered the committed gated
    # artifact; now it diverts to _rerun (then _rerun2, ...)
    from aws_flight_data_pipeline_spark.functions.rounds import (
        full_bench_path,
        is_closed,
    )

    monkeypatch.setenv("SPARK_GRAFT_ROUND", "12")
    d = str(tmp_path)
    _touch(d, "CORRECTNESS_r12.json")
    _touch(d, "BENCH_r12.json")  # round 12 is closed
    _touch(d, "BENCH_FULL_r12.json")  # builder's committed gated artifact
    assert is_closed(d, 12)
    assert os.path.basename(full_bench_path(d, 12)) == "BENCH_FULL_r12_rerun.json"
    _touch(d, "BENCH_FULL_r12_rerun.json")
    assert os.path.basename(full_bench_path(d, 12)) == "BENCH_FULL_r12_rerun2.json"
    # an open round with no stamps is untouched by the closed-round divert
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "13")
    assert not is_closed(d, 13)
    assert os.path.basename(full_bench_path(d, 13)) == "BENCH_FULL_r13.json"
