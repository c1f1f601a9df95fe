#!/usr/bin/env bash
# Round-4 FOLLOW-UP on-chip capture — everything the main capture_onchip.sh
# run could not measure because it predated this session's changes or lost
# its tail to tunnel stalls:
#
#   * tpu_checks under the NEW lineage contract (bookkeeping bit-identity +
#     lineage-vs-gather envelope) — the round's headline claim;
#   * scripts/diag_lineage.py — op-level bisect evidence for the contract;
#   * bench_all.py — beam A/B rows (lineage opt-in vs gather default, both
#     timed), slot-decode rows, replay row with a real MFU;
#   * the bench_train families the 3600s timeout cut (rationale, spatial);
#   * scripts/diag_slot_tick.py — scatter vs masked cache-write A/B for the
#     slot stepper (VERDICT r3 #5);
#   * scripts/roofline_train.py --measure — XLA-cost-model roofline verdict
#     for the s2vt-att backward (VERDICT r3 #3);
#   * compare_rounds vs onchip_r3.
#
# Safe to run unattended:  VCR_CAPTURE_COMMIT=1 bash scripts/capture_followup.sh
set -u
cd "$(dirname "$0")/.."
OUT=onchip_r4
mkdir -p "$OUT"
FAILED=""
export VCR_COMPILE_CACHE="${VCR_COMPILE_CACHE:-/tmp/vcr_xla_cache}"

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 3600 "$@" >"$OUT/$name.log" 2>&1
  rc=$?
  echo "rc=$rc"
  tail -3 "$OUT/$name.log"
  echo "rc=$rc" >>"$OUT/$name.log"
  if [ "$rc" -ne 0 ]; then FAILED="$FAILED $name"; fi
}

run probe2 python -c "import jax,numpy as np,jax.numpy as jnp; print('TPU OK', np.asarray(jnp.ones((8,8))@jnp.ones((8,8)))[0,0], jax.devices())" || true
grep -q "TPU OK" "$OUT/probe2.log" || { echo "tunnel still down — aborting"; exit 1; }
FAILED=""

run tpu_checks     python tpu_checks.py
run diag_lineage   python scripts/diag_lineage.py
run bench_all      python bench_all.py
run bench_train_rationale python bench_train.py rationale
run bench_train_spatial   python bench_train.py spatial
run diag_slot_tick python scripts/diag_slot_tick.py
# Saturating sweep incl. big pools (VERDICT r3 #5: occupancy≈1 must compete;
# the slot-decode bandwidth roofline favors wider pools + longer step chunks)
run tune_serving2  python scripts/tune_serving.py --synthetic \
  --slots 64,128,256,512 --admit_chunk 16,32 --step_chunk 4,8,16 --rate 0 \
  --n_requests 4096
run roofline_s2vt_att python scripts/roofline_train.py --arch s2vt-att --measure
run compare_rounds python scripts/compare_rounds.py onchip_r3 "$OUT"

echo
if [ -n "$FAILED" ]; then
  echo "!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!"
  echo "!!! FOLLOW-UP CAPTURE HAD FAILURES:$FAILED"
  echo "!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!"
else
  echo "follow-up capture clean — all entries rc=0"
fi
if [ "${VCR_CAPTURE_COMMIT:-0}" = "1" ]; then
  if [ -n "$FAILED" ]; then
    msg="onchip_r4: follow-up capture (unattended) — FAILURES:$FAILED"
  else
    msg="onchip_r4: follow-up capture (unattended) — all entries rc=0"
  fi
  git add "$OUT" && git commit -m "$msg" \
    && echo "follow-up capture committed: $(git rev-parse --short HEAD)"
fi
[ -z "$FAILED" ]
