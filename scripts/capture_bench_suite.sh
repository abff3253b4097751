#!/bin/bash
# Round TPU capture suite: runs every headline benchmark serially on the
# single-tenant tunnel (never two TPU processes at once), resuming across
# outages — each measurement is skipped once its JSON exists, so the script
# can be re-run any number of times until the suite is complete.
#
#   LOG_DIR=/tmp/bench_r4 CYCLES=8 bash scripts/capture_bench_suite.sh
#
# bench.py itself retries with backoff (BENCH_ATTEMPTS); this adds the
# outer loop across measurements plus a cool-down between cycles when the
# tunnel is down (docs/NOTES.md: outages recover on their own).

set -u
cd "$(dirname "$0")/.."
LOG_DIR=${LOG_DIR:-/tmp/bench_capture}
CYCLES=${CYCLES:-6}
COOLDOWN_S=${COOLDOWN_S:-600}
mkdir -p "$LOG_DIR"

run() { # run <name> <outer-timeout-s> [ENV=V ...]
  local name=$1 tmo=$2; shift 2
  if [ -s "$LOG_DIR/$name.json" ]; then
    return 0
  fi
  echo "[capture] $(date +%H:%M:%S) running $name ..."
  env "$@" timeout "$tmo" python bench.py \
    > "$LOG_DIR/$name.out" 2> "$LOG_DIR/$name.err"
  local rc=$?
  # accept only a real metric line (the supervisor's failure JSON carries
  # an "error" key and must not mark the measurement done)
  grep -m1 '"metric"' "$LOG_DIR/$name.out" | grep -v '"error"' \
    > "$LOG_DIR/$name.json" || true
  if [ -s "$LOG_DIR/$name.json" ]; then
    echo "[capture] $name OK: $(cat "$LOG_DIR/$name.json")"
    return 0
  fi
  rm -f "$LOG_DIR/$name.json"
  echo "[capture] $name failed (rc=$rc); tail of stderr:"
  tail -2 "$LOG_DIR/$name.err" || true
  return 1
}

probe() { # cheap tunnel-health check: claim + one tiny op, bounded
  timeout "${PROBE_TIMEOUT_S:-300}" python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
print(float(jnp.sum(jnp.ones((8, 8)))))
EOF
}

cycle() {
  local ok=0
  if ! probe; then
    echo "[capture] tunnel probe failed (claim did not complete) — outage"
    return 1
  fi
  echo "[capture] tunnel probe OK"
  # headline inference (driver-identical defaults: int8_static unrolled)
  run infer_headline 4200 \
    BENCH_ATTEMPTS=2 BENCH_ATTEMPT_TIMEOUT_S=1800 || return 1
  # headline training T=200 res=352 with the int8 fast+frozen passes
  run train_headline 4200 \
    BENCH_MODE=train BENCH_T=200 BENCH_RES=352 \
    BENCH_QUANT_FAST=int8_static BENCH_QUANT_FROZEN=int8_static \
    BENCH_ATTEMPTS=2 BENCH_ATTEMPT_TIMEOUT_S=1800 || ok=1
  # headline training, pure bf16 (exact reference semantics, no quant):
  # isolates the frozen-grad-mask + fast-pass-feature-reuse speedup
  run train_headline_bf16 4200 \
    BENCH_MODE=train BENCH_T=200 BENCH_RES=352 \
    BENCH_QUANT_FAST=none BENCH_QUANT_FROZEN=none \
    BENCH_ATTEMPTS=2 BENCH_ATTEMPT_TIMEOUT_S=1800 || ok=1
  # default training config (T=64 res=224 bf16)
  run train_default 4200 \
    BENCH_MODE=train \
    BENCH_ATTEMPTS=2 BENCH_ATTEMPT_TIMEOUT_S=1800 || ok=1
  # true end-to-end serving (uint8 -> device preprocess -> model)
  run e2e_serving 4200 \
    BENCH_MODE=e2e BENCH_ATTEMPTS=2 BENCH_ATTEMPT_TIMEOUT_S=1800 || ok=1
  # secondary published eval config k=2 res=224 (int8)
  run infer_k2_res224 4200 \
    BENCH_STRIDE=2 BENCH_RES=224 \
    BENCH_ATTEMPTS=2 BENCH_ATTEMPT_TIMEOUT_S=1800 || ok=1
  # EfficientNet family (VERDICT r3 #3): bf16 vs int8_static; int8 first
  # runs calibrate (observer compile) -> longer attempt timeout
  for b in b0 b3 b1 b2; do
    run "effnet_${b}_bf16" 4200 \
      BENCH_BACKBONE="timm_efficientnet_${b}" BENCH_QUANT=none \
      BENCH_ATTEMPTS=2 BENCH_ATTEMPT_TIMEOUT_S=1800 || ok=1
    run "effnet_${b}_int8" 6000 \
      BENCH_BACKBONE="timm_efficientnet_${b}" BENCH_QUANT=int8_static \
      BENCH_ATTEMPTS=2 BENCH_ATTEMPT_TIMEOUT_S=2700 || ok=1
  done
  # RegNet family (round 4): bf16 everywhere + int8 on the widest trunk
  # (regnety_032's 576/1512-ch stages are the only ones past the measured
  # >=256-channel int8 win threshold, docs/NOTES.md)
  for b in regnety_008 regnety_032 regnetx_032; do
    run "${b}_bf16" 4200 \
      BENCH_BACKBONE="timm_${b}" BENCH_QUANT=none \
      BENCH_ATTEMPTS=2 BENCH_ATTEMPT_TIMEOUT_S=1800 || ok=1
  done
  run regnety_032_int8 6000 \
    BENCH_BACKBONE=timm_regnety_032 BENCH_QUANT=int8_static \
    BENCH_ATTEMPTS=2 BENCH_ATTEMPT_TIMEOUT_S=2700 || ok=1
  # headline at B=2 (throughput record; B=1 stays the driver-comparable
  # default and the anchor)
  run infer_headline_b2 4200 \
    BENCH_B=2 BENCH_ATTEMPTS=2 BENCH_ATTEMPT_TIMEOUT_S=1800 || ok=1
  return $ok
}

for ((i = 1; i <= CYCLES; i++)); do
  echo "[capture] === cycle $i/$CYCLES ==="
  if cycle; then
    echo "[capture] suite complete:"
    for f in "$LOG_DIR"/*.json; do echo "  $f: $(cat "$f")"; done
    exit 0
  fi
  echo "[capture] incomplete; cooling down ${COOLDOWN_S}s"
  sleep "$COOLDOWN_S"
done
echo "[capture] gave up after $CYCLES cycles; partial results in $LOG_DIR"
exit 1
