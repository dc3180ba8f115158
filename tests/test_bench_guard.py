"""Unit tests for bench.py's load_guard (VERDICT r9 #5): the bounded
refuse-or-retry on a loaded measurement window, driven with forced
fake load samples — no Spark session, no real sleeping."""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "fairy_bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
)
_bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_bench)


def _marker(la1: float) -> dict:
    return {"loadavg_1m": la1, "loadavg_5m": la1, "loadavg_15m": la1, "jvm_procs": 0}


def test_idle_window_passes_immediately():
    samples = iter([_marker(0.7)])
    slept = []
    marker, contaminated, waits = _bench.load_guard(
        lambda: next(samples), threshold=4.0, retries=3, sleep_sec=60, sleep_fn=slept.append
    )
    assert not contaminated and waits == 0 and slept == []
    assert marker["loadavg_1m"] == 0.7


def test_loaded_window_retries_until_clean():
    # forced load: two dirty samples, then the box drains
    samples = iter([_marker(8.8), _marker(6.1), _marker(1.2)])
    slept = []
    marker, contaminated, waits = _bench.load_guard(
        lambda: next(samples), threshold=4.0, retries=3, sleep_sec=60, sleep_fn=slept.append
    )
    assert not contaminated and waits == 2 and slept == [60, 60]
    assert marker["loadavg_1m"] == 1.2


def test_persistently_loaded_window_is_stamped_contaminated():
    # the box never drains: bounded retries, then proceed with the
    # stamp — the driver still gets its number, self-described
    samples = iter([_marker(9.0)] * 10)
    slept = []
    marker, contaminated, waits = _bench.load_guard(
        lambda: next(samples), threshold=4.0, retries=3, sleep_sec=60, sleep_fn=slept.append
    )
    assert contaminated and waits == 3 and slept == [60, 60, 60]
    assert marker["loadavg_1m"] == 9.0


def test_nonlinux_loadavg_fallback_never_contaminates():
    # host_load_marker reports -1.0 when loadavg is unavailable
    marker, contaminated, waits = _bench.load_guard(
        lambda: _marker(-1.0), threshold=4.0, retries=3, sleep_sec=60, sleep_fn=lambda s: None
    )
    assert not contaminated and waits == 0


def test_window_grade_three_way_classification():
    """VERDICT r12 #4: 'record' (≤ record threshold) vs 'clean'
    (merely under the contamination guard — the r12 loadavg-3.19
    lockstep case) vs 'contaminated'; the non-Linux -1 fallback
    grades record."""
    g = _bench.window_grade
    assert g(0.4, 4.0, 1.0) == "record"
    assert g(1.0, 4.0, 1.0) == "record"   # boundary inclusive
    assert g(3.19, 4.0, 1.0) == "clean"   # the r12 case
    assert g(4.0, 4.0, 1.0) == "clean"    # guard boundary inclusive
    assert g(8.8, 4.0, 1.0) == "contaminated"
    assert g(-1.0, 4.0, 1.0) == "record"  # non-Linux fallback


def _steal_marker(steal: int, busy: int) -> dict:
    return {"steal_ticks": steal, "busy_ticks": busy}


def test_steal_share_basic_and_fallback():
    """r15 (VERDICT r14 #2): steal share over a marker pair is
    Δsteal / (Δbusy + Δsteal); -1 when counters are unavailable;
    0 on a zero-delta window."""
    s = _bench.steal_share
    assert s(_steal_marker(100, 900), _steal_marker(200, 1800)) == 0.1
    assert s(_steal_marker(-1, -1), _steal_marker(10, 10)) == -1.0
    assert s(_steal_marker(5, 5), _steal_marker(5, 5)) == 0.0
    # the r14 contaminated window: 27.7% of busy stolen
    assert s(_steal_marker(0, 0), _steal_marker(277, 723)) == 0.277


def test_busy_ticks_include_nice_irq_softirq(tmp_path, monkeypatch):
    """ADVICE r14: busy must sum user+nice+system+irq+softirq so the
    steal share is not overstated under niced load. Driven with a fake
    /proc/stat."""
    fake = tmp_path / "stat"
    #           user nice system idle iowait irq softirq steal
    fake.write_text("cpu  10 20 30 999 5 40 50 7\n")
    real_open = open

    def fake_open(path, *a, **k):
        if path == "/proc/stat":
            return real_open(fake, *a, **k)
        return real_open(path, *a, **k)

    monkeypatch.setattr("builtins.open", fake_open)
    m = _bench.host_load_marker()
    assert m["steal_ticks"] == 7
    assert m["busy_ticks"] == 10 + 20 + 30 + 40 + 50
