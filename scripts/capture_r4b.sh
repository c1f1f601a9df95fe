#!/usr/bin/env bash
# Round-4b on-chip capture — re-measure after the masked-cache-write default
# flip (ec465d5) and the bench_all att-beam-row tunnel-amortization fix:
#
#   * tpu_checks — the compiled identity checks must hold under the NEW
#     masked-write default (continuous greedy/beam, per-request sampling);
#   * diag_slot_tick — scatter vs masked A/B with the new per-tick XLA
#     roofline verdict (how close is the masked tick to the HBM bound?);
#   * bench_all — slot-decode rows at the masked default + the att
#     continuous-beam row at 10x chained ticks;
#   * diag_lineage — op-level bisect evidence (import path fixed in 400ee72);
#   * compare_rounds vs onchip_r3.
#
# Safe to run unattended:  VCR_CAPTURE_COMMIT=1 bash scripts/capture_r4b.sh
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

run probe3 python -c "import jax,numpy as np,jax.numpy as jnp; print('TPU OK', np.asarray(jnp.ones((8,8))@jnp.ones((8,8)))[0,0], jax.devices())" || true
grep -q "TPU OK" "$OUT/probe3.log" || { echo "tunnel down — aborting"; exit 1; }
FAILED=""

run tpu_checks      python tpu_checks.py
run diag_slot_tick  python scripts/diag_slot_tick.py
run bench_all       python bench_all.py
run diag_lineage    python scripts/diag_lineage.py
run compare_rounds  python scripts/compare_rounds.py onchip_r3 "$OUT"

echo
if [ -n "$FAILED" ]; then
  echo "!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!"
  echo "!!! R4B CAPTURE HAD FAILURES:$FAILED"
  echo "!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!"
else
  echo "r4b capture clean — all entries rc=0"
fi
if [ "${VCR_CAPTURE_COMMIT:-0}" = "1" ]; then
  if [ -n "$FAILED" ]; then
    msg="onchip_r4: r4b capture (masked slot-write default) — FAILURES:$FAILED"
  else
    msg="onchip_r4: r4b capture (masked slot-write default) — all entries rc=0"
  fi
  git add "$OUT" scripts/capture_r4b.sh && git commit -m "$msg" \
    && echo "r4b capture committed: $(git rev-parse --short HEAD)"
fi
[ -z "$FAILED" ]
