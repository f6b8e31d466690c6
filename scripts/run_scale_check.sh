#!/bin/bash
# Promotion scale check (VERDICT r4 #6): one synthetic-CL stage pair at
# 240x320 — the flagship protocol's resolution (scannet2transform.py:67-76)
# vs the gate's 120x160 — incumbent (accel16x2) vs the promoted arm, same
# seed and identical data, reported next to the 120x160 gate table in
# PERFORMANCE.md. The tiny seg backbone is kept (the full R101 pair does
# not fit a round's chip budget on this host); the resolution axis is the
# one the render/encoding levers touch.
#
# Usage: PROMOTED_ARGS="--enc 8x4 --render-arm proposal" bash scripts/run_scale_check.sh
set -u
BASE=${BASE:-/tmp/ucsa_scale_r5}
SEED=${SEED:-123}
HW=${HW:-240x320}
PROMOTED_ARGS=${PROMOTED_ARGS:---enc 8x4 --render-arm proposal}
LOG=$BASE/logs
mkdir -p "$LOG"
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

common="--root $BASE --scenes 3 --hw $HW --frames 8 --seg-tiny \
        --nerf-epochs 10 --joint-epochs 5 --seed $SEED"

run() {
  local tag=$1; shift
  if [ -f "$LOG/$tag.ok" ]; then echo "[scale] skip $tag (done)"; return 0; fi
  echo "[scale] $(date +%H:%M:%S) start $tag"
  if timeout 3600 "$@" > "$LOG/$tag.log" 2>&1; then
    touch "$LOG/$tag.ok"
    echo "[scale] $(date +%H:%M:%S) done  $tag"
  else
    echo "[scale] $(date +%H:%M:%S) FAIL  $tag (rc=$?) — see $LOG/$tag.log"
    return 1
  fi
}

run data     python scripts/exp_synthetic_cl.py $common --phase data     || exit 1
run pretrain python scripts/exp_synthetic_cl.py $common --phase pretrain || exit 1
# stage_0 only: the scale question is per-stage quality, not CL chaining
run incumbent_s0 python scripts/exp_synthetic_cl.py $common \
    --phase stage --stage-idx 0 || exit 1
run promoted_s0 python scripts/exp_synthetic_cl.py $common $PROMOTED_ARGS \
    --phase stage --stage-idx 0 || exit 1
# sync the per-arm stage_0 quality snapshots (final_val.json: per-scene
# val mIoU of the end-of-stage model) into the repo for the decision docs
for a in "$BASE"/experiments/*/; do
  an=$(basename "$a")
  mkdir -p "/root/repo/gate_r5/scale_check/$an"
  cp "$a"/stage_0/final_val.json "/root/repo/gate_r5/scale_check/$an/" \
    2>/dev/null
done
echo "[scale] complete; artifacts in gate_r5/scale_check/"
