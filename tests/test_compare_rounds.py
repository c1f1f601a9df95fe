"""Cross-round bench tracker robustness (VERDICT r4 weak #2/#3).

The unattended on-chip capture feeds compare_rounds.py whatever the bench
entries emitted — including backend-probe FAILURE rows (``"value": null``)
and A/B-variant re-runs of the same metric. Round 4's capture lost its
whole r4->r5 regression report to the first null row, and a variant row
silently replaced the product row in the rebuilt comparison. These tests
are pure python (no jax).
"""

import json
import pathlib
import subprocess
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT / "scripts"))

import compare_rounds  # noqa: E402


def _write(d: pathlib.Path, name: str, lines):
    (d / name).write_text("\n".join(json.dumps(x) if isinstance(x, dict)
                                    else x for x in lines) + "\n")


def test_null_value_rows_are_skipped(tmp_path):
    """A backend-probe failure row (value=null) must not crash collect()
    nor shadow an earlier good row for the same metric."""
    old = tmp_path / "old"
    new = tmp_path / "new"
    old.mkdir(), new.mkdir()
    _write(old, "bench.log", [{"metric": "m1", "value": 100.0, "unit": "x"}])
    _write(new, "bench.log", [
        {"metric": "m1", "value": 99.0, "unit": "x"},
        # the retry that hit a dead tunnel — exactly the row that crashed
        # the r5 capture (onchip_r4/bench_train_tf_remat.log:217)
        {"metric": "m1", "value": None, "unit": "x",
         "error": "backend probe failed"},
    ])
    rows = compare_rounds.collect(new)
    assert rows == {"m1": 99.0}
    assert compare_rounds.main([str(old), str(new)]) == 0


def test_variant_rows_do_not_shadow_product_rows(tmp_path):
    """An A/B-variant invocation tagged via VCR_BENCH_TAG emits a DISTINCT
    metric string, so last-occurrence-wins can't swap it in for the
    product row (r4: the s2vt B=1024 row silently resolved to the
    gate-remat variant)."""
    d = tmp_path / "cap"
    d.mkdir()
    _write(d, "bench_train.log",
           [{"metric": "s2vt train videos/sec (B=1024)", "value": 34018.0}])
    # variant log sorts later; WITHOUT a tag it would win the key
    _write(d, "bench_train_s2vt_gremat.log",
           [{"metric": "s2vt train videos/sec (B=1024) [gate-remat]",
             "value": 37565.0}])
    rows = compare_rounds.collect(d)
    assert rows["s2vt train videos/sec (B=1024)"] == 34018.0
    assert rows["s2vt train videos/sec (B=1024) [gate-remat]"] == 37565.0


def test_emit_row_applies_bench_tag(monkeypatch, capsys):
    from vcr_tpu.utils.benchutil import emit_row

    monkeypatch.delenv("VCR_BENCH_TAG", raising=False)
    emit_row({"metric": "m", "value": 1.0})
    monkeypatch.setenv("VCR_BENCH_TAG", "gate-remat")
    emit_row({"metric": "m", "value": 2.0})
    out = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert out[0]["metric"] == "m"
    assert out[1]["metric"] == "m [gate-remat]"


def test_cli_survives_mixed_capture(tmp_path):
    """End-to-end through the real CLI: mixed good/null/variant rows,
    EXPECTED.json annotation, non-zero old metric GONE in new."""
    old = tmp_path / "r4"
    new = tmp_path / "r5"
    old.mkdir(), new.mkdir()
    _write(old, "a.log", [
        {"metric": "good", "value": 100.0},
        {"metric": "gone", "value": 5.0},
        {"metric": "expected-drop", "value": 10.0},
    ])
    _write(new, "a.log", [
        "some non-json noise line",
        {"metric": "good", "value": 101.0},
        {"metric": "expected-drop", "value": 7.0},
        {"metric": "flaky", "value": None, "error": "probe failed"},
        {"metric": "good [variant]", "value": 250.0},
    ])
    (new / "EXPECTED.json").write_text(
        json.dumps({"expected-drop": "intentional"}))
    proc = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / "compare_rounds.py"),
         str(old), str(new)],
        capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr
    out = proc.stdout
    assert "GONE  gone" in out
    assert "expected: intentional" in out
    assert "NEW   good [variant]" in out
    assert "no regressions beyond threshold" in out
