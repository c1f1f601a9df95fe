"""Quantify the continuous-batching scheduling win on a length-skewed load.

Whole-batch serving runs every row to max_len: its slot-step occupancy (the
fraction of decode slot-steps that produce a kept token) is mean_len/max_len
no matter how requests arrive. The continuous pool refills finished slots
mid-flight, so its occupancy approaches 1 - (drain tails + admission
granularity). This script builds a tiny random model, decodes a workload
with a heavy caption-length skew both ways, and prints the occupancy and
decode-step totals side by side — a hardware-independent measure of the
scheduler (token throughput then scales with it on any backend).

Usage: python scripts/demo_continuous_occupancy.py [--requests 64] [--slots 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=512)
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--max_len", type=int, default=20)
    ap.add_argument("--mean_len", type=float, default=7.0,
                    help="geometric caption-length mean (MSVD-like skew)")
    a = ap.parse_args(argv)

    import numpy as np

    from test_slot_scheduler import MockOps  # tests/: the fuzzed mock ops

    rng = np.random.default_rng(0)
    lengths = {
        k: int(np.clip(rng.geometric(1.0 / a.mean_len), 1, a.max_len))
        for k in range(a.requests)}

    from vcr_tpu.serving_continuous import run_slot_scheduler

    ops = MockOps(a.slots, min(8, a.slots), 1, a.max_len, lengths)
    got = dict(run_slot_scheduler(
        ops, ((k, np.full((1, 1), float(k), np.float32))
              for k in range(a.requests))))
    assert sorted(got) == list(range(a.requests))
    lens = np.array([len(t) for t in got.values()])
    s = ops.stats

    continuous_occ = s["useful_steps"] / s["slot_steps"]
    # whole-batch serving pays max_len slot-steps per row, in ceil(N/R)
    # full batches
    n_batches = -(-a.requests // a.slots)
    batch_steps = n_batches * a.slots * a.max_len
    out = {
        "requests": a.requests, "slots": a.slots, "max_len": a.max_len,
        "caption_len_mean": round(float(lens.mean()), 2),
        "caption_len_min_max": [int(lens.min()), int(lens.max())],
        "continuous_slot_steps": s["slot_steps"],
        "whole_batch_slot_steps": batch_steps,
        "continuous_occupancy": round(continuous_occ, 4),
        "whole_batch_occupancy": round(float(lens.sum()) / batch_steps, 4),
        "decode_step_reduction": round(1 - s["slot_steps"] / batch_steps, 4),
    }
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
