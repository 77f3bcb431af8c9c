"""The scaling pair's asymmetric probe gate (bench.run_scaling_qualified).

A suite measures absolute wall, so its gate treats both bracketing
probes alike; the scaling pair measures SCALING, where the control's
own 4-process efficiency is a hard ceiling on the engine number, so the
PRE bar is strict (0.85) while the POST keeps the standard 0.6 bar plus
the wall-drift refusal.  These tests pin those decisions with stubbed
probes and a stubbed pair — no Spark, no wall-clock.
"""
from __future__ import annotations

import bench


def _probe(eff_4: float, wall_1: float, ts: float = 0.0) -> dict:
    return {"ts": ts, "wall_1": wall_1, "wall_4": wall_1 / (4 * eff_4),
            "eff_4": eff_4, "wall_1_runs": [wall_1], "wall_4_runs": []}


FAKE_PAIR = {"efficiency": 0.85, "urls_per_sec_low": 1.0,
             "urls_per_sec_high": 3.4, "detail": {}}


def _run(monkeypatch, tmp_path, probes, **kw):
    """Drive run_scaling_qualified against a scripted probe sequence."""
    seq = iter(probes)
    pairs_run = []
    monkeypatch.setattr(bench, "_quick_probe", lambda: dict(next(seq)))
    monkeypatch.setattr(bench, "run_scaling",
                        lambda *a, **k: (pairs_run.append(1), FAKE_PAIR)[1])
    # isolate the persisted calibration from the real repo file
    monkeypatch.setattr(bench, "CALIB_PATH", str(tmp_path / "calib.json"))
    kw.setdefault("cooldown_s", 0.0)
    out = bench.run_scaling_qualified("/nonexistent", **kw)
    return out, len(pairs_run)


def test_strict_pre_refuses_without_running_the_pair(monkeypatch, tmp_path):
    # control eff 0.7 passes the old 0.6 bar but not the strict pre
    out, n_pairs = _run(monkeypatch, tmp_path,
                        [_probe(0.70, 1.0)] * 3,
                        min_eff4=0.85, attempts=3)
    assert out["qualified"] is False
    assert n_pairs == 0, "pair must not run inside a refused window"
    assert len(out["probes"]) == 3  # every refused pre stays in the output


def test_post_keeps_the_standard_bar(monkeypatch, tmp_path):
    # pre 0.9 (strict pass), post 0.65: >= 0.6 and drift-clean -> qualified.
    # This is the r5 run-B scenario: demanding 0.85 of a single closing
    # snapshot after a 20-minute pair refuses internally-consistent pairs.
    out, n_pairs = _run(monkeypatch, tmp_path,
                        [_probe(0.90, 1.0), _probe(0.65, 1.05)],
                        min_eff4=0.85, attempts=1)
    assert out["qualified"] is True
    assert n_pairs == 1
    assert out["efficiency"] == FAKE_PAIR["efficiency"]


def test_post_below_standard_bar_refuses(monkeypatch, tmp_path):
    out, n_pairs = _run(monkeypatch, tmp_path,
                        [_probe(0.90, 1.0), _probe(0.50, 1.0)],
                        min_eff4=0.85, attempts=1)
    assert out["qualified"] is False
    assert n_pairs == 1  # the pair ran, then the window was refused


def test_drift_refusal_survives_the_looser_post_bar(monkeypatch, tmp_path):
    # post eff is clean but wall drifted pre->post beyond DRIFT_LIMIT:
    # degradation DURING the pair is exactly what the post probe is for.
    drifted = 1.0 * bench.DRIFT_LIMIT * 1.05
    out, n_pairs = _run(monkeypatch, tmp_path,
                        [_probe(0.90, 1.0), _probe(0.90, drifted)],
                        min_eff4=0.85, attempts=1)
    assert out["qualified"] is False
    assert n_pairs == 1


def test_post_bar_never_exceeds_standard(monkeypatch, tmp_path):
    # explicit post_min_eff4 override is honored
    out, _ = _run(monkeypatch, tmp_path,
                  [_probe(0.90, 1.0), _probe(0.80, 1.0)],
                  min_eff4=0.85, post_min_eff4=0.85, attempts=1)
    assert out["qualified"] is False  # 0.80 < explicit 0.85 post bar


def test_calibration_median_resists_outliers(monkeypatch, tmp_path):
    """The rolling-median calibration: one hot-cache outlier must not
    set a bar that refuses every representative window (the r5
    over-refusal hole), and contended probes never enter the history."""
    monkeypatch.setattr(bench, "CALIB_PATH", str(tmp_path / "calib.json"))
    # one outlier fast probe, then a stream of representative ~2.0s ones
    bench._maybe_update_calibration(_probe(0.9, 1.26))
    assert bench._load_calibration() == 1.26  # single entry = itself
    for w in (2.02, 2.03, 2.12, 1.98):
        bench._maybe_update_calibration(_probe(0.9, w))
    calib = bench._load_calibration()
    assert calib is not None and calib >= 1.98  # median, not the 1.26 min
    # a representative window now QUALIFIES against the median bar...
    assert bench._probe_ok(_probe(0.9, 2.1), calib) == []
    # ...while a genuinely slow window still refuses
    assert bench._probe_ok(_probe(0.9, calib * 1.3), calib)
    # contended probes are never admitted to the history
    before = bench._calib_history()
    bench._maybe_update_calibration(_probe(0.3, 0.5))
    assert bench._calib_history() == before
    # history is bounded
    for w in [2.0] * 20:
        bench._maybe_update_calibration(_probe(0.9, w))
    assert len(bench._calib_history()) == bench.CALIB_KEEP


def test_calibration_reads_legacy_single_value_file(monkeypatch, tmp_path):
    import json as _json
    path = tmp_path / "calib.json"
    path.write_text(_json.dumps({"wall_1": 1.26, "updated": 0}))
    monkeypatch.setattr(bench, "CALIB_PATH", str(path))
    assert bench._load_calibration() == 1.26
    bench._maybe_update_calibration(_probe(0.9, 2.0))
    assert bench._calib_history() == [1.26, 2.0]


def _wprobe(eff_4: float, wall_1: float, wall_16: float | None) -> dict:
    p = _probe(eff_4, wall_1)
    if wall_16 is not None:
        p["wall_16"] = wall_16
        p["wall_16_runs"] = [wall_16]
    return p


def test_wide_rule_pins_the_r5_late_window(monkeypatch, tmp_path):
    """The r5-late failure mode: narrow probes clean (wall_1 at
    calibration, eff_4 healthy) while 32-wide throughput is halved.
    The wall_16 bar must refuse exactly that window."""
    monkeypatch.setattr(bench, "CALIB_PATH", str(tmp_path / "calib.json"))
    for w16 in (3.0, 3.1, 2.9, 3.0):
        bench._maybe_update_calibration(_wprobe(0.9, 2.1, w16))
    calib = bench._load_calibration()
    # narrow-clean + wide-clean -> qualifies
    assert bench._probe_ok(_wprobe(0.9, 2.1, 3.2), calib) == []
    # narrow-clean + wide 2x calibration -> refused on the wide bar
    why = bench._probe_ok(_wprobe(0.9, 2.1, 6.0), calib)
    assert why and "wall_16" in why[0]


def test_wide_rule_skips_probes_and_calibrations_without_wall_16(
        monkeypatch, tmp_path):
    """Back-compat: legacy probes (no wall_16) and fresh boxes (no wide
    calibration yet) must not trip the wide bar."""
    monkeypatch.setattr(bench, "CALIB_PATH", str(tmp_path / "calib.json"))
    # no calibration at all: wall_16-bearing probe passes
    assert bench._probe_ok(_wprobe(0.9, 2.0, 99.0), None) == []
    # narrow-only calibration: legacy probe passes, wide probe passes
    bench._maybe_update_calibration(_probe(0.9, 2.0))
    calib = bench._load_calibration()
    assert bench._probe_ok(_probe(0.9, 2.0), calib) == []
    assert bench._probe_ok(_wprobe(0.9, 2.0, 99.0), calib) == []


def test_wide_calibration_accumulates_only_from_clean_probes(
        monkeypatch, tmp_path):
    monkeypatch.setattr(bench, "CALIB_PATH", str(tmp_path / "calib.json"))
    bench._maybe_update_calibration(_wprobe(0.9, 2.0, 3.0))
    assert bench._load_calibration_16() == 3.0
    # contended probe: neither history advances
    bench._maybe_update_calibration(_wprobe(0.3, 2.0, 1.0))
    assert bench._calib_history("history_16") == [3.0]
    # narrow-only probe: wide history untouched, narrow advances
    bench._maybe_update_calibration(_probe(0.9, 2.2))
    assert bench._calib_history("history_16") == [3.0]
    assert len(bench._calib_history()) == 2
    # bounded
    for _ in range(20):
        bench._maybe_update_calibration(_wprobe(0.9, 2.0, 3.0))
    assert len(bench._calib_history("history_16")) == bench.CALIB_KEEP


def test_wide_drift_refusal(monkeypatch, tmp_path):
    monkeypatch.setattr(bench, "CALIB_PATH", str(tmp_path / "calib.json"))
    pre, post = _wprobe(0.9, 2.0, 3.0), _wprobe(0.9, 2.0, 3.0)
    assert bench._window_ok(pre, post, None) == []
    post = _wprobe(0.9, 2.0, 3.0 * bench.WIDE_DRIFT_LIMIT * 1.05)
    why = bench._window_ok(pre, post, None)
    assert why and "wide drift" in why[0]
    # legacy pre without wall_16: rule inactive
    assert bench._window_ok(_probe(0.9, 2.0), post, None) == []
