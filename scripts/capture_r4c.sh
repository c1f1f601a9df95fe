#!/usr/bin/env bash
# Round-4c on-chip capture — the int8 KV-cache serving mode (e4d70e3):
#
#   * tpu_checks — now includes the compiled int8 pool check (serves +
#     logit envelope vs bf16 + masked==scatter bit-identity in int8);
#   * bench_all — adds the int8 slot-decode A/B row (expected ~1.3-1.6x the
#     bf16-cache row: the tick is bandwidth-bound on cache reads and int8
#     halves that stream);
#   * compare_rounds vs onchip_r3.
#
# Safe to run unattended:  VCR_CAPTURE_COMMIT=1 bash scripts/capture_r4c.sh
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

run probe4 python -c "import jax,numpy as np,jax.numpy as jnp; print('TPU OK', np.asarray(jnp.ones((8,8))@jnp.ones((8,8)))[0,0], jax.devices())" || true
grep -q "TPU OK" "$OUT/probe4.log" || { echo "tunnel down — aborting"; exit 1; }
FAILED=""

run tpu_checks      python tpu_checks.py
run bench_all       python bench_all.py
# the r4 bisect (diag_s2vt_att_bisect.log) found B=512 is s2vt-att's train
# throughput sweet spot (31.9k videos/s vs 30.1k at B=1024): record it as a
# first-class row
run bench_train_s2vt_att_b512 env VCR_BENCH_BATCH=512 python bench_train.py s2vt-att
# achievable-bandwidth calibration sweep (the 265 GB/s triad from the bisect
# needs layout/dtype/op-mix disambiguation before it anchors roofline claims)
run diag_hbm_bw     python scripts/diag_hbm_bw.py
run compare_rounds  python scripts/compare_rounds.py onchip_r3 "$OUT"

echo
if [ -n "$FAILED" ]; then
  echo "!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!"
  echo "!!! R4C CAPTURE HAD FAILURES:$FAILED"
  echo "!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!"
else
  echo "r4c capture clean — all entries rc=0"
fi
if [ "${VCR_CAPTURE_COMMIT:-0}" = "1" ]; then
  if [ -n "$FAILED" ]; then
    msg="onchip_r4: r4c capture (int8 KV cache) — FAILURES:$FAILED"
  else
    msg="onchip_r4: r4c capture (int8 KV cache) — all entries rc=0"
  fi
  git add "$OUT" scripts/capture_r4c.sh && git commit -m "$msg" \
    && echo "r4c capture committed: $(git rev-parse --short HEAD)"
fi
[ -z "$FAILED" ]
