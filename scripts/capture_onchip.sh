#!/usr/bin/env bash
# One-shot round-5 on-chip evidence capture.
# Run the moment the axon tunnel is back:  bash scripts/capture_onchip.sh
# Writes logs under onchip_r5/; VCR_CAPTURE_COMMIT=1 auto-commits them.
set -u
cd "$(dirname "$0")/.."
OUT="${VCR_CAPTURE_OUT:-onchip_r5}"
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
  # a failed check must be LOUD, not a quiet line in a log (VERDICT r3 #2)
  if [ "$rc" -ne 0 ]; then FAILED="$FAILED $name"; fi
}

# 0. probe (flake-robust; fails fast if the tunnel is still down)
run probe python -c "import jax,numpy as np,jax.numpy as jnp; print('TPU OK', np.asarray(jnp.ones((8,8))@jnp.ones((8,8)))[0,0], jax.devices())" || true
grep -q "TPU OK" "$OUT/probe.log" || { echo "tunnel still down — aborting"; exit 1; }
FAILED=""   # probe noise doesn't count once TPU OK is confirmed

# 1. correctness FIRST (a mid-capture tunnel death must not cost the
#    identity evidence): compiled Pallas parity, lineage bookkeeping
#    bit-identity, lineage-vs-gather envelope, continuous greedy/beam,
#    per-request sampling, int8 KV-cache pool (envelope contract)
run tpu_checks     python tpu_checks.py

# 2. headline + per-family inference (incl. int8 slot-decode A/B row) +
#    per-family train; the r4-found batch sweet spots as first-class rows
run bench          python bench.py
run bench_train    python bench_train.py all
run bench_all      python bench_all.py
run bench_train_s2vt_att_b512 env VCR_BENCH_BATCH=512 python bench_train.py s2vt-att
run bench_train_spatial_b32 env VCR_BENCH_BATCH=32 python bench_train.py spatial
# speculative: B=32 beat B=16 once the program-size fix landed — probe B=64
# (may exceed HBM; a loud rc!=0 here is informative, not a regression)
run bench_train_spatial_b64 env VCR_BENCH_BATCH=64 python bench_train.py spatial
# transformer B=256 beat B=128 by 5% in r4 (bench_train_tf_remat.log)
run bench_train_tf_b256 env VCR_BENCH_BATCH=256 python bench_train.py transformer
# bf16 residual stream (round-4: kills the six f32 encoder-stream stacks,
# 13.9 -> 6.1 GiB of scan saves at B=512 — diag_tf_saves.py): B=512 should
# now FIT (it OOMed by 4.0 GiB before); A/B the f32-stream escape hatch at
# B=256 to confirm the byte cut is also a time win on the memory-bound step
run bench_train_tf_b512 env VCR_BENCH_BATCH=512 python bench_train.py transformer
run bench_train_tf_b256_f32stream env VCR_BENCH_BATCH=256 VCR_TF_F32_STREAM=1 python bench_train.py transformer
# GRU gate remat (round-4: cuts s2vt stacked saves 2.42 -> 0.87 GiB/step,
# bitwise-identical step — diag_train_saves.py): A/B the memory-bound GRU
# flagships; if it wins, flip the default and update CLAUDE/PARITY
run bench_train_s2vt_gremat env VCR_GRU_GATES_REMAT=1 python bench_train.py s2vt
run bench_train_att_gremat env VCR_GRU_GATES_REMAT=1 python bench_train.py s2vt-att

# 3. serving-pool geometry sweep (closed-loop saturation; NOTE the
#    tune_serving.py docstring caveat — tunnel-side picks reward dispatch
#    count, occupancy is the transferable signal)
run tune_serving   python scripts/tune_serving.py --synthetic \
  --slots 64,128 --admit_chunk 16,32 --step_chunk 4,8 --rate 0 \
  --n_requests 2048

# 4. standing diagnostics: slot-tick write-mode A/B + roofline, s2vt-att
#    bisect (custom-VJP A/B + HBM triad), stream-bandwidth calibration
run diag_slot_tick python scripts/diag_slot_tick.py
run diag_s2vt_att  python scripts/diag_s2vt_att.py --bisect
run diag_hbm_bw    python scripts/diag_hbm_bw.py

# 5. cross-round regression tracking: compare against onchip_r4; expected
#    intentional drops belong in $OUT/EXPECTED.json (substring -> reason)
run compare_rounds python scripts/compare_rounds.py onchip_r4 "$OUT"

echo
if [ -n "$FAILED" ]; then
  echo "!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!"
  echo "!!! CAPTURE HAD FAILURES:$FAILED"
  echo "!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!"
else
  echo "capture clean — all entries rc=0"
fi
if [ "${VCR_CAPTURE_COMMIT:-0}" = "1" ]; then
  if [ -n "$FAILED" ]; then
    msg="$OUT: raw capture (unattended) — FAILURES:$FAILED"
  else
    msg="$OUT: raw capture (unattended) — all entries rc=0"
  fi
  git add "$OUT" && git commit -m "$msg" \
    && echo "capture committed: $(git rev-parse --short HEAD)"
fi
[ -z "$FAILED" ]
