#!/usr/bin/env bash
# Interleaved remat-policy A/B (VERDICT r4 #3): >=3 ALTERNATING pairs per
# family in one tunnel session, so tunnel weather averages out of the
# comparison instead of into it. Variant invocations are tagged
# (VCR_BENCH_TAG) so their rows can never shadow the product rows in
# compare_rounds.py; scripts/ab_summary.py turns this log into the decision
# table.
#
# DEFAULTS under test (round-5 final): s2vt AND s2vt-att train with gate
# remat ON by default (nn/rnn.gate_remat_default — the first interleaved
# run of this script measured s2vt remat-off -11.5% and s2vt-att remat
# +2.8% at 1.4% base spread, onchip_r5/ab_summary.log; the att flip
# overturned two weather-noisy single-shot negatives); the transformer's
# selective ff remat stays OFF (-6.2% same run). Each pair is
# default-vs-explicit-escape-hatch.
set -u
cd "$(dirname "$0")/.."
export VCR_COMPILE_CACHE="${VCR_COMPILE_CACHE:-/tmp/vcr_xla_cache}"
PAIRS="${VCR_AB_PAIRS:-3}"

for i in $(seq 1 "$PAIRS"); do
  echo "--- pair $i/$PAIRS ---"
  # s2vt: default = gate remat ON; escape hatch off
  python bench_train.py s2vt
  env VCR_GRU_GATES_REMAT=0 VCR_BENCH_TAG=gate-remat-off python bench_train.py s2vt
  # s2vt-att: default = gate remat ON; escape hatch off
  python bench_train.py s2vt-att
  env VCR_GRU_GATES_REMAT=0 VCR_BENCH_TAG=gate-remat-off python bench_train.py s2vt-att
  # transformer: default = plain autodiff; variant = selective ff remat
  env VCR_BENCH_BATCH=256 python bench_train.py transformer
  env VCR_BENCH_BATCH=256 VCR_TF_FF_REMAT=1 VCR_BENCH_TAG=ff-remat \
    python bench_train.py transformer
done
