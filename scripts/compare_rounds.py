"""Cross-round bench regression tracker (VERDICT r3 #7).

Parses every one-line JSON bench row ({"metric": ..., "value": ...}) found in
two capture directories' *.log files (and BENCH_r*.json driver records, whose
rows live under "parsed"), matches rows by metric string, and warns loudly on
any value that dropped more than --threshold (default 5%). Exit code is 0
even on warnings — a tunnel-noise wobble must not abort an unattended
capture; the WARN lines in the committed log are the signal.

    python scripts/compare_rounds.py onchip_r3 onchip_r4 [--threshold 0.05]

EXPECTED regressions: a `EXPECTED.json` in the NEW capture directory maps a
metric substring to the reason the drop is intentional, e.g.

    {"KV-cache, lineage": "r3 number was the one-hot-contraction build that
     emitted wrong tokens on the MXU; r4 is the bit-exact-bookkeeping
     lineage (true gathers), ~21% slower and correct"}

Matching rows print as `ok (expected)` with the reason instead of WARN —
the drop stays visible, the unattended capture stays signal-clean.
"""

import argparse
import json
import pathlib
import sys


def collect(path: pathlib.Path, exclude=()) -> dict:
    """-> {metric: value} from every JSON line in *.log / *.json under path.
    A metric appearing multiple times keeps the LAST occurrence (retries
    overwrite earlier flaky attempts)."""
    rows = {}
    if path.is_file():
        files = [path]
    else:
        files = sorted(path.glob("*.log")) + sorted(path.glob("*.json"))
    if exclude:
        files = [f for f in files
                 if not any(sub in f.name for sub in exclude)]
    for f in files:
        try:
            text = f.read_text(errors="replace")
        except OSError:
            continue
        found_in_file = False
        for line in text.splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            for rec in _extract(obj):
                if not isinstance(rec.get("value"), (int, float)):
                    continue  # backend-probe failure rows emit value=null
                rows[rec["metric"]] = float(rec["value"])
                found_in_file = True
        # BENCH_r*.json driver records are concatenated pretty-printed
        # objects, not JSON lines — fall back per FILE, not per directory
        if f.suffix == ".json" and not found_in_file:
            for rec in _extract_concat(text):
                if not isinstance(rec.get("value"), (int, float)):
                    continue
                rows[rec["metric"]] = float(rec["value"])
    return rows


def _extract(obj):
    if isinstance(obj, dict):
        if "metric" in obj and "value" in obj:
            yield obj
        if isinstance(obj.get("parsed"), dict):
            yield from _extract(obj["parsed"])


def _extract_concat(text):
    dec = json.JSONDecoder()
    i = 0
    while i < len(text):
        while i < len(text) and text[i] not in "{[":
            i += 1
        if i >= len(text):
            break
        try:
            obj, end = dec.raw_decode(text, i)
        except json.JSONDecodeError:
            i += 1
            continue
        yield from _extract(obj)
        i = end


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old", type=pathlib.Path)
    ap.add_argument("new", type=pathlib.Path)
    ap.add_argument("--threshold", type=float, default=0.05,
                    help="warn when new < old by more than this fraction")
    ap.add_argument("--exclude", action="append", default=[],
                    help="skip capture files whose NAME contains this "
                         "substring (repeatable) — for pre-r5 variant logs "
                         "whose rows reuse the product metric string; new "
                         "captures tag variants via VCR_BENCH_TAG instead")
    args = ap.parse_args(argv)

    if args.exclude:
        print("excluding capture files matching: "
              + ", ".join(args.exclude))
    old, new = (collect(args.old, args.exclude),
                collect(args.new, args.exclude))
    if not old:
        print(f"no bench rows found under {args.old} — nothing to compare")
        return 0
    if not new:
        print(f"no bench rows found under {args.new} — nothing to compare")
        return 0

    expected = {}
    exp_path = (args.new if args.new.is_dir() else args.new.parent) \
        / "EXPECTED.json"
    if exp_path.is_file():
        try:
            expected = json.loads(exp_path.read_text())
        except json.JSONDecodeError as e:
            print(f"WARN  malformed {exp_path}: {e}")

    warns = 0
    for metric in sorted(old):
        if metric not in new:
            print(f"GONE  {metric}  (was {old[metric]:.4g}; no new row)")
            continue
        o, n = old[metric], new[metric]
        if o <= 0:
            continue
        delta = (n - o) / o
        tag, note = "ok   ", ""
        if delta < -args.threshold:
            reason = next((r for sub, r in expected.items() if sub in metric),
                          None)
            if reason is not None:
                tag = "ok   "
                note = f"  (expected: {reason})"
            else:
                tag = "WARN "
                warns += 1
        print(f"{tag} {delta:+7.1%}  {metric}: {o:.4g} -> {n:.4g}{note}")
    for metric in sorted(set(new) - set(old)):
        print(f"NEW   {metric} = {new[metric]:.4g}")
    if warns:
        print(f"\n{warns} metric(s) regressed more than "
              f"{args.threshold:.0%} — investigate before folding numbers "
              "into the docs")
    else:
        print("\nno regressions beyond threshold")
    return 0


if __name__ == "__main__":
    sys.exit(main())
