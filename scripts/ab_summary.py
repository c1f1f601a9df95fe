"""Summarize interleaved A/B bench logs into a decision table.

Reads bench JSON rows ({"metric", "value", ...}) from the given log files,
groups repeats of the SAME metric string (variant runs carry a distinct
" [tag]" suffix via VCR_BENCH_TAG), and prints n / mean / min / max per
metric plus, for every (base, tagged) pair present, the mean delta — the
number the remat-default decision reads (scripts/ab_remat.sh).

    python scripts/ab_summary.py onchip_r5/ab_remat.log
"""

import json
import re
import statistics
import sys


def collect(paths):
    rows = {}
    for path in paths:
        try:
            text = open(path, errors="replace").read()
        except OSError as e:
            print(f"skip {path}: {e}")
            continue
        for line in text.splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "metric" not in obj or not isinstance(obj.get("value"),
                                                     (int, float)):
                continue
            rows.setdefault(obj["metric"], []).append(float(obj["value"]))
    return rows


def main(argv=None) -> int:
    paths = (argv if argv is not None else sys.argv[1:])
    if not paths:
        print("usage: ab_summary.py <log> [log...]")
        return 2
    rows = collect(paths)
    if not rows:
        print("no bench rows found")
        return 1
    for metric in sorted(rows):
        vs = rows[metric]
        print(f"n={len(vs):2d}  mean={statistics.mean(vs):12.2f}  "
              f"min={min(vs):12.2f}  max={max(vs):12.2f}  {metric}")
    print()
    tagged = {m: vs for m, vs in rows.items() if re.search(r" \[[^]]+\]$", m)}
    for m, vs in sorted(tagged.items()):
        base = re.sub(r" \[[^]]+\]$", "", m)
        if base not in rows:
            continue
        bmean, vmean = statistics.mean(rows[base]), statistics.mean(vs)
        if bmean <= 0:
            continue
        delta = (vmean - bmean) / bmean
        # a variant only earns the default if its win is outside the
        # interleaved same-config spread (tunnel weather)
        spread = ((max(rows[base]) - min(rows[base])) / bmean
                  if len(rows[base]) > 1 else float("nan"))
        print(f"A/B {delta:+7.1%}  (base spread {spread:6.1%})  "
              f"{base}  ->  [{m.rsplit('[', 1)[1].rstrip(']')}]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
