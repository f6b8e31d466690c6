#!/bin/bash
# Round-5 FINAL quality gate (VERDICT r4 #1/#2).
#
# Round 4's replicate data lived in /tmp and did not survive the round
# boundary; the hash-encoding backward also changed mid-round-4 (face
# pairing fix), so every decision arm re-runs FRESH here with the current
# code, and every artifact the decision depends on is synced into the
# repo (gate_r5/) as it lands.
#
# Arm order is ARM-MAJOR across seeds so a truncated chain still yields
# a >=3-seed paired decision for the arms that completed:
#   bench throughputs (300-step fits, ~15 min total)
#   data+pretrain x {123,7,21}
#   accel16x2 x3  (incumbent; pairing anchor)
#   enc8x4 x3     (round-4 2-seed winner: +1.52/+3.37 pts, 21.6k rays/s)
#   enc8x4occ24 x3 (reduced sample budget on the candidate encoding —
#                   measured 24.9k rays/s, the fastest candidate)
#   prop32e8x4 x3 (proposal placement, VERDICT r4 #4: 32 TOTAL samples
#                  split 3:1 — 24 grid-CDF-placed + 8 importance-refined;
#                  proposal-ONLY measured to lose label sharpness)
#   face8x4 x3    (quality fallback: same speed as enc8x4, stochastic
#                  face-sampled forward)
#   face16x2 x3   (dominated fallback; only reached if time allows)
# (This is run_gate_r5.sh + the proposal arm, created as a separate file
# because the original was executing when the arm landed — bash reads
# scripts lazily, editing a running script corrupts it.)
# then scripts/gate_decision.py over all three roots -> gate_r5/decision.json.
#
# /tmp/gate.stop halts between phases (frees the chip for an interactive
# measurement or the driver's round-end bench) without killing a stage;
# the chain resumes from the per-phase .ok files.
set -u
BASE=${BASE:-/tmp/ucsa_gate_r5}
SYNC=/root/repo/gate_r5
SEEDS=${SEEDS:-123 7 21}
ARMS=${ARMS:-accel16x2 enc8x4 enc8x4occ24 prop32e8x4 face8x4 face16x2}
LOG=$BASE/logs
mkdir -p "$LOG" "$SYNC"
cd /root/repo
# APPEND to PYTHONPATH — the TPU tunnel's PJRT plugin registers via a
# sitecustomize.py already on PYTHONPATH; clobbering it kills the backend
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

arm_args() {
  case $1 in
    accel16x2)   echo "" ;;
    enc8x4)      echo "--enc 8x4" ;;
    face8x4)     echo "--enc 8x4 --render-arm face" ;;
    enc8x4occ24) echo "--enc 8x4 --occ-steps 24" ;;
    prop32e8x4)  echo "--enc 8x4 --render-arm proposal --occ-steps 32" ;;
    face16x2)    echo "--render-arm face" ;;
    *) echo "unknown arm $1" >&2; return 1 ;;
  esac
}

run() { # run <tag> <cmd...>
  local tag=$1; shift
  if [ -f "$LOG/$tag.ok" ]; then echo "[gate] skip $tag (done)"; return 0; fi
  if [ -f /tmp/gate.stop ]; then echo "[gate] stop sentinel — exiting"; exit 3; fi
  echo "[gate] $(date +%H:%M:%S) start $tag"
  if timeout 3600 "$@" > "$LOG/$tag.log" 2>&1; then
    touch "$LOG/$tag.ok"
    echo "[gate] $(date +%H:%M:%S) done  $tag"
  else
    local rc=$?
    echo "[gate] $(date +%H:%M:%S) FAIL  $tag (rc=$rc) — see $LOG/$tag.log"
    return 1
  fi
}

sync_reports() { # copy every seed's report JSONs + refresh the decision
  for s in $SEEDS; do
    mkdir -p "$SYNC/seed$s"
    cp "$BASE/seed$s/experiments/"report_*.json "$SYNC/seed$s/" 2>/dev/null
  done
  roots=$(for s in $SEEDS; do printf "%s/seed%s," "$BASE" "$s"; done)
  python scripts/gate_decision.py "${roots%,}" \
    > "$SYNC/decision.json" 2>"$SYNC/decision.err" || true
}

# ---- phase A: arm throughputs (fresh, current code, one session) ----
run bench_base python scripts/bench_encoding_variants.py \
  --enc 16x2,8x4 --skip-fused --steps 300 --out "$SYNC/bench_arm_base.json"
run bench_face python scripts/bench_encoding_variants.py \
  --enc 8x4,16x2 --sfwd face --skip-fused --steps 300 \
  --out "$SYNC/bench_arm_face.json"
run bench_occ python scripts/bench_encoding_variants.py \
  --enc 8x4 --occ-steps 24 --skip-fused --steps 300 \
  --out "$SYNC/bench_arm_occ.json"
run bench_prop python scripts/bench_encoding_variants.py \
  --enc 8x4 --proposal-total 32 --skip-fused --steps 300 \
  --out "$SYNC/bench_arm_prop.json"

# ---- phase B: per-seed data + pretrain anchors ----
common_for() { # common_for <seed>
  echo "--root $BASE/seed$1 --scenes 3 --hw 120x160 --frames 8 --seg-tiny \
        --nerf-epochs 10 --joint-epochs 5 --seed $1"
}
for s in $SEEDS; do
  run "data_s$s"     python scripts/exp_synthetic_cl.py $(common_for $s) --phase data     || exit 1
  run "pretrain_s$s" python scripts/exp_synthetic_cl.py $(common_for $s) --phase pretrain || exit 1
done

# ---- phase C: arms, ARM-MAJOR across seeds ----
for armtag in $ARMS; do
  extra=$(arm_args $armtag) || exit 1
  for s in $SEEDS; do
    for i in 0 1 2; do
      run "${armtag}_seed${s}_s$i" python scripts/exp_synthetic_cl.py \
        $(common_for $s) $extra --phase stage --stage-idx $i || exit 1
    done
    run "${armtag}_seed${s}_report" python scripts/exp_synthetic_cl.py \
      $(common_for $s) $extra --phase report || exit 1
    sync_reports
  done
done

sync_reports
echo "[gate] chain complete; decision in $SYNC/decision.json"
