"""Tests for the flake-robust backend probe (VERDICT.md round-2 item #1).

The production path probes the axon TPU tunnel; here we exercise the probe
machinery itself on the CPU backend (success) and with an injected failing
probe (retry/backoff + structured failure JSON)."""

import json
import os

from vcr_tpu.utils import backend_probe


def _cpu_env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # disarm the axon sitecustomize
    env["JAX_PLATFORMS"] = "cpu"
    return env


def test_probe_once_success_on_cpu():
    ok, diag = backend_probe.probe_once(timeout_s=120, env=_cpu_env())
    assert ok, diag
    assert "PROBE_OK" in diag and "backend=cpu" in diag


def test_skip_probe_env(monkeypatch):
    monkeypatch.setenv("VCR_SKIP_PROBE", "1")
    ok, diag = backend_probe.ensure_backend()
    assert ok and "skipped" in diag


def test_retry_then_fail(monkeypatch):
    calls = []

    def fake_probe(timeout_s, env=None):
        calls.append(timeout_s)
        return False, "probe timed out after 1s (tunnel hang)"

    monkeypatch.delenv("VCR_SKIP_PROBE", raising=False)
    monkeypatch.setattr(backend_probe, "probe_once", fake_probe)
    ok, diag = backend_probe.ensure_backend(
        attempts=3, wait_s=0, timeout_s=1, verbose=False)
    assert not ok
    assert len(calls) == 3
    assert "tunnel hang" in diag


def test_retry_then_succeed(monkeypatch):
    outcomes = iter([(False, "down"), (True, "PROBE_OK backend=cpu")])

    def fake_probe(timeout_s, env=None):
        return next(outcomes)

    monkeypatch.delenv("VCR_SKIP_PROBE", raising=False)
    monkeypatch.setattr(backend_probe, "probe_once", fake_probe)
    ok, diag = backend_probe.ensure_backend(
        attempts=3, wait_s=0, timeout_s=1, verbose=False)
    assert ok and "PROBE_OK" in diag


def test_emit_failure_json(capsys):
    backend_probe.emit_failure_json("m", "u", "tunnel down")
    line = capsys.readouterr().out.strip()
    rec = json.loads(line)
    assert rec["metric"] == "m" and rec["value"] is None
    assert rec["unit"] == "u" and rec["vs_baseline"] is None
    assert "unavailable" in rec["error"]
    assert "tunnel down" in rec["diagnostic"]
