"""The bench contention detectors are measurement-integrity code (the
r14 official capture read 2.05x baseline for 0.95x code because both
old detectors passed a steal-contaminated run) — pin their arithmetic
so a refactor can't quietly reopen the hole. Pure-Python: no Spark
session, bench.py is imported as a module and main() never runs."""

from __future__ import annotations

import importlib.util
import os

import pytest


@pytest.fixture(scope="module")
def bench():
    root = os.path.join(os.path.dirname(__file__), "..")
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(root, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_steal_pct_arithmetic_and_degenerate_inputs(bench):
    # 10 steal jiffies out of a 100-jiffy window = 10%
    assert bench._steal_pct((100, 1000), (110, 1100)) == pytest.approx(10.0)
    # zero steal
    assert bench._steal_pct((5, 1000), (5, 1100)) == pytest.approx(0.0)
    # unreadable /proc/stat and zero-width windows report None (unknown),
    # never a crash or a false "clean" — the r15 ADVICE found the old
    # -1.0 sentinel comparing as clean in every consumer
    assert bench._steal_pct((-1, -1), (0, 0)) is None
    assert bench._steal_pct((0, 100), (0, 100)) is None
    assert bench._steal_pct((0, 100), (0, 90)) is None


def test_steal_unknown_is_not_clean_and_not_exceeding(bench):
    """_steal_exceeds is the ONLY comparison consumers may use: a
    measured excess trips it, a measured clean value doesn't, and an
    unknown reading doesn't trip it either (the probes carry the flag
    then) — but unknown must surface as null in the JSON, which
    _round_or_none preserves."""
    assert bench._steal_exceeds(bench.STEAL_PCT_MAX + 0.1)
    assert not bench._steal_exceeds(0.5)
    assert not bench._steal_exceeds(None)
    assert bench._round_or_none(None) is None
    assert bench._round_or_none(3.14159) == 3.14


def test_retry_policy_constants_hold_the_r15_post_mortem_lines(bench):
    # the r15 retry settled 90 s and landed inside the same steal burst
    # (bursts run minutes long on this box) — the settle must now
    # exceed the longest observed burst spacing, with more than one
    # attempt available, inside a bounded total wall
    assert bench.RETRY_SETTLE_SEC >= 300.0
    assert bench.RETRY_MAX_ATTEMPTS >= 2
    assert bench.RETRY_WALL_BUDGET_SEC <= 3000.0


def test_probe_rule_flags_the_r14_contaminated_capture(bench):
    """The recorded r14 driver probes (0.115/0.167/0.219/0.229) must
    trip the max-of-probes rule, and a clean capture's band
    (0.095-0.130 observed r7-r14) must clear it with margin — the exact
    adjudication the judge performed by hand, now executable."""
    flag_at = bench.CALIBRATION_LOADED_FACTOR * bench.CALIBRATION_CLEAN_FLOOR_SEC
    r14_contaminated = [0.115, 0.167, 0.219, 0.229]
    assert max(r14_contaminated) > flag_at
    # the old rule (median > 1.6 * 0.16 = 0.256) passed that run
    assert sorted(r14_contaminated)[2] < 0.256
    clean_band = [0.095, 0.111, 0.118, 0.130]
    assert max(clean_band) < flag_at


def test_preflight_and_steal_thresholds_hold_the_post_mortem_lines(bench):
    # the r14 capture started at loadavg 2.99 under the old 4.0 gate;
    # the new gate must refuse that start while clearing the 0.0-1.5
    # idle floor
    assert bench.PREFLIGHT_LOAD_MAX < 2.99
    assert bench.PREFLIGHT_LOAD_MAX >= 1.5
    # measured live: clean windows < 1% steal, the contaminated window
    # 10% — the flag line must separate them
    assert 1.0 < bench.STEAL_PCT_MAX < 10.0
