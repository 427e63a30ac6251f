"""Unit tests for bench.py's sentinel noise policy (VERDICT r8 items
2 & 8): noise_scale computation, the >1.5× flag, and the committed-
record overwrite guard.  Pure-python — no SparkSession."""

import bench


def _committed(start=0.2, end=0.16, load_start=1.0, load_end=1.0):
    return {
        "noise_sentinel": {
            "sentinel_start_sec": start,
            "sentinel_end_sec": end,
            "loadavg_start": load_start,
            "loadavg_end": load_end,
        }
    }


def test_no_committed_record_writes_main():
    p = bench.noise_policy(None, 0.5)
    assert p == {
        "noise_scale": None,
        "flagged": False,
        "write_main": True,
        "quiet_ref_sec": None,
    }


def test_malformed_committed_record_treated_as_missing():
    for rec in ({}, {"noise_sentinel": {}}, {"noise_sentinel": {"sentinel_start_sec": 0}}):
        p = bench.noise_policy(rec, 0.5)
        assert p["noise_scale"] is None and p["write_main"]


def test_quiet_run_not_flagged_and_overwrites():
    # reference = min(start, end) = 0.16; 0.2/0.16 = 1.25 < 1.5
    p = bench.noise_policy(_committed(), 0.2)
    assert p["quiet_ref_sec"] == 0.16
    assert p["noise_scale"] == 1.25
    assert not p["flagged"] and p["write_main"]


def test_quieter_than_committed_reference_scales_to_one():
    """A run QUIETER than the committed reference is the new reference:
    scale 1.0, never < 1 (trustworthy timings are not inflated), and it
    self-heals a contaminated committed record — the r8 driver
    round-commit scenario, where the in-tree reference sentinel was the
    loaded-box 0.50 s."""
    p = bench.noise_policy(_committed(start=0.502, end=0.499), 0.2)
    assert p["quiet_ref_sec"] == 0.2
    assert p["noise_scale"] == 1.0
    assert not p["flagged"] and p["write_main"]


def test_loaded_run_flagged_and_guarded():
    # the r8 driver-box scenario: committed quiet 0.16/0.2, run at 0.5
    p = bench.noise_policy(_committed(), 0.5)
    assert p["noise_scale"] == 3.125
    assert p["flagged"] and not p["write_main"]


def test_flag_threshold_is_strict():
    p = bench.noise_policy(_committed(start=0.2, end=0.2), 0.3)  # exactly 1.5
    assert p["noise_scale"] == 1.5 and not p["flagged"] and p["write_main"]


def test_force_env_overrides_guard(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_FORCE", "1")
    p = bench.noise_policy(_committed(), 0.5)
    assert p["flagged"] and p["write_main"]


def test_ratchet_regression_anomalous_low_sentinel_under_load():
    """The r9 self-lock (VERDICT r9 defect 1): the committed record
    carried sentinel_end 0.077 s captured while loadavg fell 10.9→quiet.
    Its paired loadavg disqualifies it; the surviving start sentinel
    (0.326 at loadavg 0.9) is the reference, so a genuinely-quiet run at
    0.2 s reads scale 1.0 (self-heal, new low) and may write main —
    before the fix it computed 0.2/0.077 = 2.6 and was diverted."""
    p = bench.noise_policy(_committed(start=0.326, end=0.077, load_start=0.9, load_end=10.9), 0.2)
    assert p["quiet_ref_sec"] == 0.2
    assert p["noise_scale"] == 1.0
    assert not p["flagged"] and p["write_main"]


def test_floor_clamps_credibly_paired_artifact():
    """Even a sub-floor sentinel with a quiet paired loadavg can't
    ratchet the reference below the characterized quiet band."""
    sub = bench._QUIET_FLOOR_SEC * 0.4
    now = bench._QUIET_FLOOR_SEC * 1.2
    p = bench.noise_policy(
        _committed(start=sub, end=sub * 1.2, load_start=0.5, load_end=0.5), now
    )
    assert p["quiet_ref_sec"] == bench._QUIET_FLOOR_SEC
    assert p["noise_scale"] == round(now / bench._QUIET_FLOOR_SEC, 3)
    assert not p["flagged"] and p["write_main"]


def test_scale_never_below_one_when_run_beats_floor():
    """A run whose own sentinel lands under the floor is clamped to
    scale 1.0 — trustworthy timings are never inflated."""
    p = bench.noise_policy(_committed(), 0.1)
    assert p["noise_scale"] == 1.0
    assert not p["flagged"] and p["write_main"]


def test_both_sentinels_under_load_fall_back_to_min():
    """Both committed sentinels captured under load: biased HIGH, so
    min(vals) under-flags — acceptable, self-heals on next quiet commit."""
    p = bench.noise_policy(_committed(start=0.6, end=0.5, load_start=8.0, load_end=9.0), 0.5)
    assert p["quiet_ref_sec"] == 0.5
    assert p["noise_scale"] == 1.0 and p["write_main"]
