#!/bin/bash
# Round-5 promotion robustness annex (PERFORMANCE.md round-5 decision
# caveat): two EXTRA seeds x {incumbent, promoted prop32e8x4, runner-up
# enc8x4occ24} so the promotion rests on a 5-seed mean instead of a
# 3-seed mean with a +/-2.5-pt standard error. Same protocol and pairing
# as scripts/run_gate_r5c.sh; separate BASE/SYNC so the main 3-seed
# decision artifacts (gate_r5/decision.json) are never overwritten.
#
# After it completes, the combined 5-seed verdict (runs entirely off the
# repo-synced roots — /tmp does not survive sessions on this host):
#   python scripts/gate_decision.py gate_r5/seed123,gate_r5/seed7,gate_r5/seed21,gate_r5/annex/seed31,gate_r5/annex/seed57 \
#     > gate_r5/decision_5seed.json
#
# Seed-MAJOR order: seed 31 finishes all three arms before seed 57 starts,
# so a chain cut short by the round boundary still yields a full 4-seed
# decision across every arm instead of 5-seed data for one arm only.
#
# /tmp/gate.stop halts between phases; resumes from per-phase .ok files.
set -u
BASE=${BASE:-/tmp/ucsa_gate_annex}
SYNC=/root/repo/gate_r5/annex
SEEDS=${SEEDS:-31 57}
ARMS=${ARMS:-accel16x2 prop32e8x4 enc8x4occ24}
LOG=$BASE/logs
mkdir -p "$LOG" "$SYNC"
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

arm_args() {
  case $1 in
    accel16x2)   echo "" ;;
    enc8x4occ24) echo "--enc 8x4 --occ-steps 24" ;;
    prop32e8x4)  echo "--enc 8x4 --render-arm proposal --occ-steps 32" ;;
    *) echo "unknown arm $1" >&2; return 1 ;;
  esac
}

run() {
  local tag=$1; shift
  if [ -f "$LOG/$tag.ok" ]; then echo "[annex] skip $tag (done)"; return 0; fi
  if [ -f /tmp/gate.stop ]; then echo "[annex] stop sentinel — exiting"; exit 3; fi
  echo "[annex] $(date +%H:%M:%S) start $tag"
  if timeout 3600 "$@" > "$LOG/$tag.log" 2>&1; then
    touch "$LOG/$tag.ok"
    echo "[annex] $(date +%H:%M:%S) done  $tag"
  else
    local rc=$?
    echo "[annex] $(date +%H:%M:%S) FAIL  $tag (rc=$rc) — see $LOG/$tag.log"
    return 1
  fi
}

sync_reports() {
  # same layout gate_decision.py expects (root/experiments/report_*.json)
  for s in $SEEDS; do
    mkdir -p "$SYNC/seed$s/experiments"
    cp "$BASE/seed$s/experiments/"report_*.json "$SYNC/seed$s/experiments/" \
      2>/dev/null
  done
}

common_for() {
  echo "--root $BASE/seed$1 --scenes 3 --hw 120x160 --frames 8 --seg-tiny \
        --nerf-epochs 10 --joint-epochs 5 --seed $1"
}
for s in $SEEDS; do
  run "data_s$s"     python scripts/exp_synthetic_cl.py $(common_for $s) --phase data     || exit 1
  run "pretrain_s$s" python scripts/exp_synthetic_cl.py $(common_for $s) --phase pretrain || exit 1
  for armtag in $ARMS; do
    extra=$(arm_args $armtag) || exit 1
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
echo "[annex] chain complete; reports in $SYNC"
