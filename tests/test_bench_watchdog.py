"""Simulated-outage tests for bench.py's device-discovery retry path.

VERDICT r3 weak#1 / next#1: round 3's official record was nulled because
discovery got exactly one 300-s window with no retry. These tests pin the
retry/backoff contract and the failure JSON without needing a real outage.
"""

import json
import sys

import bench


def test_retry_succeeds_after_transient_outage():
    attempts_seen = []
    sleeps = []

    def probe(timeout):
        attempts_seen.append(timeout)
        return "tpu" if len(attempts_seen) == 3 else None

    plat = bench.discover_device_with_retry(
        attempts=3, timeout=7.0, backoffs=(1.0, 2.0),
        probe=probe, sleep=sleeps.append)
    assert plat == "tpu"
    assert attempts_seen == [7.0, 7.0, 7.0]
    assert sleeps == [1.0, 2.0]  # backoff grows, no sleep after success


def test_retry_exhaustion_returns_none():
    n = []
    plat = bench.discover_device_with_retry(
        attempts=4, timeout=1.0, backoffs=(0.5,),
        probe=lambda t: n.append(t), sleep=lambda s: None)
    assert plat is None
    assert len(n) == 4  # every attempt was used before giving up


def test_probe_times_out_on_hung_discovery(monkeypatch):
    # a wedged tunnel == jax.devices() that never returns; the probe must
    # kill the subprocess at the timeout and report failure, not hang
    monkeypatch.setattr(bench, "_PROBE_CODE", "import time; time.sleep(60)")
    assert bench.probe_device(timeout=0.5) is None


def test_probe_returns_platform(monkeypatch):
    monkeypatch.setattr(bench, "_PROBE_CODE",
                        "import sys; sys.stdout.write('cpu')")
    assert bench.probe_device(timeout=30.0) == "cpu"


def test_probe_failure_rc(monkeypatch):
    monkeypatch.setattr(bench, "_PROBE_CODE", "import sys; sys.exit(3)")
    assert bench.probe_device(timeout=30.0) is None


def test_emit_discovery_failure_json(monkeypatch, capsys, tmp_path):
    codes = []
    monkeypatch.setattr(bench.os, "_exit", codes.append)
    monkeypatch.setattr(bench, "LAST_RECORD_PATH",
                        str(tmp_path / "last.json"))

    bench.emit_discovery_failure(3, 300.0)
    assert codes == [17]
    rec = json.loads(capsys.readouterr().out)
    assert rec["value"] is None and rec["vs_baseline"] is None
    assert "3 attempts" in rec["error"]
    assert "last_good" not in rec  # no sidecar record yet

    (tmp_path / "last.json").write_text(
        json.dumps({"ts": 1.25, "value": 6.0e8, "vs_baseline": 54.8}))
    bench.emit_discovery_failure(2, 10.0)
    rec = json.loads(capsys.readouterr().out)
    assert rec["last_good"] == {
        "ts": 1.25, "value": 6.0e8, "vs_baseline": 54.8}
