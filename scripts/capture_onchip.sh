#!/usr/bin/env bash
# One-shot round-4 on-chip evidence capture.
# Run the moment the axon tunnel is back:  bash scripts/capture_onchip.sh
# Writes logs under onchip_r4/ — commit the directory afterwards.
set -u
cd "$(dirname "$0")/.."
OUT=onchip_r4
mkdir -p "$OUT"
FAILED=""

# Persist compiled executables across entries and across watcher retries —
# a mid-capture tunnel death no longer pays every 20-40s compile again.
export VCR_COMPILE_CACHE="${VCR_COMPILE_CACHE:-/tmp/vcr_xla_cache}"

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 3600 "$@" >"$OUT/$name.log" 2>&1
  rc=$?
  echo "rc=$rc"
  tail -3 "$OUT/$name.log"
  echo "rc=$rc" >>"$OUT/$name.log"
  # VERDICT r3 #2: a failed check must be LOUD, not a quiet line in a log.
  if [ "$rc" -ne 0 ]; then FAILED="$FAILED $name"; fi
}

# 0. probe (flake-robust; fails fast if the tunnel is still down)
run probe python -c "import jax,numpy as np,jax.numpy as jnp; print('TPU OK', np.asarray(jnp.ones((8,8))@jnp.ones((8,8)))[0,0], jax.devices())" || true
grep -q "TPU OK" "$OUT/probe.log" || { echo "tunnel still down — aborting"; exit 1; }
FAILED=""   # probe noise doesn't count once TPU OK is confirmed

# 1. correctness FIRST (round-3 ran benches first and the tunnel died before
#    rerunning the failed identity check): compiled Pallas parity + the
#    lineage-beam identity row (now with forensic dumps on FAIL)
run tpu_checks     python tpu_checks.py

# 2. headline + per-family inference + per-family train
run bench          python bench.py
run bench_train    python bench_train.py all
run bench_all      python bench_all.py

# 3. serving-pool geometry sweep on the real chip — round 4 adds the
#    arrival-rate axis and enough requests that occupancy≈1 configs compete
#    (VERDICT r3 #5; rate 0 = closed-loop saturation)
run tune_serving   python scripts/tune_serving.py --synthetic \
  --slots 16,64,128 --admit_chunk 8,16 --step_chunk 2,4,8 --rate 0 \
  --n_requests 2048

# 4. round-4 specifics: s2vt-att backward fix A/B (remat'd scan vs r3
#    baseline) and the SpatialNet B=32 repro after the program-size fix
run diag_s2vt_att  python scripts/diag_s2vt_att.py
VCR_BENCH_BATCH=2048 run bench_train_s2vt_att_b2048 python bench_train.py s2vt-att
VCR_BENCH_BATCH=32 run bench_train_spatial_b32 python bench_train.py spatial

# 5. cross-round regression tracking (VERDICT r3 #7): compare this capture's
#    JSON rows against onchip_r3 and warn on >5% drops
run compare_rounds python scripts/compare_rounds.py onchip_r3 "$OUT"

echo
if [ -n "$FAILED" ]; then
  echo "!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!"
  echo "!!! CAPTURE HAD FAILURES:$FAILED"
  echo "!!! read the forensic dumps in $OUT/<name>.log"
  echo "!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!"
else
  echo "capture clean — all entries rc=0"
fi
echo "All logs in $OUT/ — review, then: git add $OUT && git commit"

# Unattended capture (the tunnel watcher sets VCR_CAPTURE_COMMIT=1): commit
# the raw logs immediately so the round's on-chip evidence survives even if
# no interactive session is alive afterwards. Doc folding stays a manual
# review step (scripts/fold_onchip.py). Failures go in the COMMIT MESSAGE so
# they cannot be missed from the log listing alone.
if [ "${VCR_CAPTURE_COMMIT:-0}" = "1" ]; then
  if [ -n "$FAILED" ]; then
    msg="onchip_r4: raw capture (unattended) — FAILURES:$FAILED"
  else
    msg="onchip_r4: raw capture (unattended) — all entries rc=0"
  fi
  git add "$OUT" && git commit -m "$msg" \
    && echo "capture committed: $(git rev-parse --short HEAD)"
fi
[ -z "$FAILED" ]
