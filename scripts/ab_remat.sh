#!/usr/bin/env bash
# Interleaved remat-policy A/B (VERDICT r4 #3): single-shot r5 numbers said
# gate remat is +10% on s2vt but -4% on s2vt-att — decide the defaults with
# >=3 ALTERNATING pairs per family in one tunnel session, so tunnel weather
# averages out of the comparison instead of into it. Variant invocations are
# tagged (VCR_BENCH_TAG) so their rows can never shadow the product rows in
# compare_rounds.py; scripts/ab_summary.py turns this log into the decision
# table.
set -u
cd "$(dirname "$0")/.."
export VCR_COMPILE_CACHE="${VCR_COMPILE_CACHE:-/tmp/vcr_xla_cache}"
PAIRS="${VCR_AB_PAIRS:-3}"

for i in $(seq 1 "$PAIRS"); do
  echo "--- pair $i/$PAIRS ---"
  # s2vt: gate remat (cuts 2.42 -> 0.87 GiB of scan saves; bitwise step)
  python bench_train.py s2vt
  env VCR_GRU_GATES_REMAT=1 VCR_BENCH_TAG=gate-remat python bench_train.py s2vt
  # s2vt-att: same flag, opposite single-shot sign
  python bench_train.py s2vt-att
  env VCR_GRU_GATES_REMAT=1 VCR_BENCH_TAG=gate-remat python bench_train.py s2vt-att
  # transformer: selective ff remat is the DEFAULT (bitwise-identical step,
  # tests/test_ff_remat.py); A/B the escape hatch to confirm it on-chip
  env VCR_BENCH_BATCH=256 python bench_train.py transformer
  env VCR_BENCH_BATCH=256 VCR_TF_FF_REMAT=0 VCR_BENCH_TAG=ff-remat-off \
    python bench_train.py transformer
done
