"""bench.py outage behavior: the driver's round-end capture must emit parseable
JSON even when the TPU tunnel is down (VERDICT r4 weak #1 / next-step #3)."""

from __future__ import annotations

import io
import json
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_emit_stale_is_one_json_line():
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.emit_stale("unit test")
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert len(lines) == 1
    obj = json.loads(lines[0])
    assert obj["stale"] is True
    assert obj["stale_reason"] == "unit test"
    # the driver contract: metric/value/unit/vs_baseline keys present
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in obj


def test_wait_for_tpu_skips_on_forced_cpu(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert bench.wait_for_tpu(budget_s=0.1, probe_timeout=1)


def test_wait_for_tpu_respects_budget(monkeypatch):
    # axon = the TPU tunnel platform: must actually probe, and give up within
    # the budget when probes fail
    import time

    monkeypatch.setenv("JAX_PLATFORMS", "axon")

    calls = []

    def fake_run(*a, **k):
        calls.append(a)

        class R:
            returncode = 1
            stderr = b"backend init failed"
        return R()

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    t0 = time.time()
    assert not bench.wait_for_tpu(budget_s=0.5, probe_timeout=1)
    assert calls, "forced-axon must probe"
    assert time.time() - t0 < 30
