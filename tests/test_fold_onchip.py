"""fold_onchip.py: capture-log summarizer used after on-chip runs."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_fold_onchip_summarizes_logs(tmp_path):
    (tmp_path / "bench.log").write_text(
        '{"metric": "m1", "value": 5.5, "unit": "u", "mfu": 0.42}\n'
        "random non-json noise\n"
        "rc=0\n")
    (tmp_path / "fail.log").write_text("traceback...\nrc=1\n")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "fold_onchip.py"),
         str(tmp_path)], capture_output=True, text=True)
    assert r.returncode == 0
    assert "## bench (rc=0)" in r.stdout
    assert "| m1 | 5.5 | u | 0.42 |" in r.stdout
    assert "## fail (rc=1)" in r.stdout
    assert "(no JSON records)" in r.stdout


def test_fold_onchip_empty_dir(tmp_path):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "fold_onchip.py"),
         str(tmp_path)], capture_output=True, text=True)
    assert r.returncode == 1
