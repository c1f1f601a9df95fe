#!/usr/bin/env python
"""Summarize an on-chip capture directory (scripts/capture_onchip.sh output).

Reads every ``<name>.log`` under the given directory (default onchip_r3/),
extracts the one-JSON-line benchmark records, and prints a markdown summary
ordered by log name — the raw material for updating README.md's perf tables
after a capture. Non-JSON lines are ignored; each log's trailing ``rc=N`` is
reported so partial captures are obvious.

Usage: python scripts/fold_onchip.py [onchip_r3]
"""

from __future__ import annotations

import glob
import json
import os
import sys


def summarize(out_dir: str) -> int:
    logs = sorted(glob.glob(os.path.join(out_dir, "*.log")))
    if not logs:
        print(f"no logs under {out_dir}", file=sys.stderr)
        return 1
    for path in logs:
        name = os.path.splitext(os.path.basename(path))[0]
        rows, rc = [], None
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line.startswith("rc="):
                    rc = line[3:]
                    continue
                if line.startswith("{"):
                    try:
                        rows.append(json.loads(line))
                    except json.JSONDecodeError:
                        pass
        print(f"\n## {name} (rc={rc})")
        if not rows:
            print("(no JSON records)")
            continue
        keys = ["metric", "value", "unit", "mfu", "step_ms", "videos_per_s",
                "vs_baseline", "error"]
        used = [k for k in keys if any(k in r for r in rows)]
        print("| " + " | ".join(used) + " |")
        print("|" + "---|" * len(used))
        for r in rows:
            print("| " + " | ".join(str(r.get(k, "")) for k in used) + " |")
    return 0


if __name__ == "__main__":
    sys.exit(summarize(sys.argv[1] if len(sys.argv) > 1 else "onchip_r3"))
