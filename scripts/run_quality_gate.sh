#!/bin/bash
# Round-4 render/encoding quality gate (VERDICT r3 #1/#2).
#
# Runs the synthetic-CL protocol (scripts/exp_synthetic_cl.py) on identical
# data across the configuration arms the verdict asks to compare:
#   accel        occupancy 32+32, 16x2 encoding (the shipped default)
#   enc4x8       occupancy 32+32, 4 levels x 8 features (the row-count lever)
#   dense        reference-parity 256+256 stratified+importance, occupancy off
#   ladder       accel + fully stochastic-forward encoding (26k rays/s knob)
#   enc8x4       middle encoding point (time permitting)
#
# One fresh process per phase/stage (PERFORMANCE.md round-3 note: repeated
# stages in one long-lived process degrade through the axon tunnel).
# 120x160 keeps the slow dense arm affordable; the gate compares ARMS on
# identical data, budgets are the production ones (32+32 / 256+256, 4096-ray
# steps, full-size NeRF + hash table), so the sample-placement and encoding
# capacity questions are the production ones.
set -u
ROOT=${ROOT:-/tmp/ucsa_gate}
LOG=${LOG:-/tmp/gate_logs}
SCENES=${SCENES:-3}
SEED=${SEED:-123}
# ARMS: space-separated subset to run (seed replicates re-run only the
# decision-relevant arms; paired comparison = same seed, same data)
ARMS=${ARMS:-accel16x2 enc4x8 dense ladder enc8x4 enc4x8ladder face16x2}
COMMON="--root $ROOT --scenes $SCENES --hw 120x160 --frames 8 --seg-tiny \
        --nerf-epochs 10 --joint-epochs 5 --seed $SEED"
mkdir -p "$LOG"
cd /root/repo
# APPEND to PYTHONPATH — the TPU tunnel's PJRT plugin registers via a
# sitecustomize.py already on PYTHONPATH; clobbering it kills the backend
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

run() { # run <tag> <args...>
  local tag=$1; shift
  if [ -f "$LOG/$tag.ok" ]; then echo "[gate] skip $tag (done)"; return 0; fi
  # /tmp/gate.stop halts a long chain between phases (e.g. to free the
  # chip for the driver's round-end bench) without killing a live stage
  if [ -f /tmp/gate.stop ]; then echo "[gate] stop sentinel — exiting"; exit 3; fi
  echo "[gate] $(date +%H:%M:%S) start $tag"
  if timeout 3600 python scripts/exp_synthetic_cl.py $COMMON "$@" \
       > "$LOG/$tag.log" 2>&1; then
    touch "$LOG/$tag.ok"
    echo "[gate] $(date +%H:%M:%S) done  $tag"
  else
    local rc=$?   # capture BEFORE $(date) resets $? in the echo below
    echo "[gate] $(date +%H:%M:%S) FAIL  $tag (rc=$rc) — see $LOG/$tag.log"
    return 1
  fi
}

arm() { # arm <tag> <extra args...>
  local tag=$1; shift
  case " $ARMS " in *" $tag "*) ;; *) return 0 ;; esac
  for i in $(seq 0 $((SCENES - 1))); do
    run "${tag}_s$i" --phase stage --stage-idx "$i" "$@" || return 1
  done
  run "${tag}_report" --phase report "$@"
}

run data --phase data || exit 1
run pretrain --phase pretrain || exit 1
arm accel16x2
arm enc4x8 --enc 4x8
arm dense --render-arm dense
arm ladder --render-arm ladder
arm enc8x4 --enc 8x4
# combined row-count levers: only meaningful if both individually pass
arm enc4x8ladder --enc 4x8 --render-arm ladder
# stratified face-sampled forward: the middle rung between exact (8 rows)
# and ladder (1 row) — 4 rows at strictly lower estimator variance
arm face16x2 --render-arm face
echo "[gate] all arms attempted; reports in $ROOT/experiments/report_*.json"
