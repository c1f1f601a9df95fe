#!/usr/bin/env bash
# One-shot round-3 on-chip evidence capture (VERDICT r2 "Next round" #1).
# Run the moment the axon tunnel is back:  bash scripts/capture_onchip.sh
# Writes logs under onchip_r3/ — commit the directory afterwards.
set -u
cd "$(dirname "$0")/.."
OUT=onchip_r3
mkdir -p "$OUT"

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
}

# 0. probe (flake-robust; fails fast if the tunnel is still down)
run probe python -c "import jax,numpy as np,jax.numpy as jnp; print('TPU OK', np.asarray(jnp.ones((8,8))@jnp.ones((8,8)))[0,0], jax.devices())" || true
grep -q "TPU OK" "$OUT/probe.log" || { echo "tunnel still down — aborting"; exit 1; }

# 1. headline + per-family inference + per-family train + compiled Pallas
run bench          python bench.py
run bench_train    python bench_train.py all
run bench_all      python bench_all.py
run tpu_checks     python tpu_checks.py

# 1b. serving-pool geometry sweep on the real chip (scripts/tune_serving.py
#     --synthetic: same model family as bench_all's slot-decode row) — the
#     empirical pool-sizing answer for the serving docs
# (small grid: each geometry compiles its own encode/admit/step programs,
#  20-40s each through the tunnel even with the compile cache cold)
run tune_serving   python scripts/tune_serving.py --synthetic \
  --slots 16,64 --admit_chunk 8 --step_chunk 2,4 --rate 0 \
  --n_requests 256

# 2. round-3 specifics: lineage-vs-gather beam A/B is inside bench_all;
#    s2vt-att anomaly diagnosis; SpatialNet B=32 repro (the HTTP-413 question
#    — our HLO is B-independent, so if this now passes the 413 was data
#    upload, not program size)
run diag_s2vt_att  python scripts/diag_s2vt_att.py
VCR_BENCH_BATCH=32 run bench_train_spatial_b32 python bench_train.py spatial
# if b32 still 413s, A/B the two hypotheses: sliced 100 MB data uploads
# ("data request too big") vs remat'd backward ("program too big")
grep -q "rc=0" "$OUT/bench_train_spatial_b32.log" || {
  VCR_BENCH_BATCH=32 VCR_UPLOAD_CHUNK_MB=100 \
    run bench_train_spatial_b32_chunked python bench_train.py spatial
  VCR_BENCH_BATCH=32 VCR_BENCH_REMAT=1 \
    run bench_train_spatial_b32_remat python bench_train.py spatial
  # third mitigation: gradient accumulation — effective B=32 through the
  # (known-compiling) B=16 program
  VCR_BENCH_BATCH=32 VCR_BENCH_ACCUM=2 \
    run bench_train_spatial_b32_accum2 python bench_train.py spatial
}

echo
echo "All logs in $OUT/ — review, then: git add $OUT && git commit"

# Unattended capture (the tunnel watcher sets VCR_CAPTURE_COMMIT=1): commit
# the raw logs immediately so the round's on-chip evidence survives even if
# no interactive session is alive afterwards (BENCH_r02 died exactly this
# way — VERDICT r2 "Next round" #1). Doc folding stays a manual review step
# (scripts/fold_onchip.py).
if [ "${VCR_CAPTURE_COMMIT:-0}" = "1" ]; then
  git add "$OUT" && git commit -m "onchip_r3: raw on-chip capture logs (unattended)" \
    && echo "capture committed: $(git rev-parse --short HEAD)"
fi
