"""Serving-pool autotuner harness (scripts/tune_serving.py).

Runs the real grid driver over the synthetic model at tiny scale: every
config must serve every request exactly once, report sane metrics, and the
final "best" line must pick from the grid. (Throughput ORDERING between
configs is hardware-dependent and not asserted.)
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_tuner_grid_end_to_end():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "scripts/tune_serving.py", "--synthetic",
         "--platform", "cpu", "--slots", "2,4", "--admit_chunk", "2",
         "--step_chunk", "2", "--rate", "0,50", "--n_requests", "12"],
        capture_output=True, text=True, timeout=900, check=True,
        env=env, cwd=REPO)
    lines = [json.loads(l) for l in out.stdout.splitlines()
             if l.startswith("{")]
    rows = [l for l in lines if "slots" in l]
    # 2 geometries x 2 rates (the round-4 arrival-rate axis)
    assert len(rows) == 4, out.stderr[-2000:]
    for r in rows:
        assert r["served"] == 12
        assert r["throughput_caps_s"] > 0
        assert 0 < r["occupancy"] <= 1
        assert r["latency_p50_ms"] <= r["latency_p95_ms"]
        assert r["rate"] in (0.0, 50.0)
    best = [l for l in lines if "best" in l]
    # one best per rate, scored for capacity (rate 0) / latency (rate > 0)
    assert len(best) == 2
    for b in best:
        assert b["best"] in rows and b["best"]["rate"] == b["rate"]
