#!/bin/bash
# Round-5 follow-up chip chain, run AFTER the promotion:
#   1. pipeline wall-clock of the SHIPPED (promoted) program
#      -> pipeline_bench.json (bench.py surfaces stage_seconds_measured)
#   2. promotion scale check at 240x320 (VERDICT r4 #6)
#   3. 2-seed robustness annex for the promotion (PERFORMANCE.md caveat)
# One chain = one chip claim sequence; /tmp/gate.stop halts the annex
# between phases (scale check phases honor their own .ok resume files).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

echo "[followup] $(date +%H:%M:%S) pipeline bench (shipped program)"
if [ ! -f /tmp/r5_pipe_prop.ok ]; then
  if timeout 4800 python scripts/bench_pipeline.py --out pipeline_bench.json \
      > /tmp/pipe_r5_prop.log 2>&1; then
    touch /tmp/r5_pipe_prop.ok
  else
    echo "[followup] pipeline bench FAILED (rc=$?) — see /tmp/pipe_r5_prop.log"
  fi
fi

echo "[followup] $(date +%H:%M:%S) scale check 240x320"
PROMOTED_ARGS="--enc 8x4 --render-arm proposal --occ-steps 32" \
  bash scripts/run_scale_check.sh || echo "[followup] scale check FAILED"

echo "[followup] $(date +%H:%M:%S) robustness annex"
bash scripts/run_gate_annex.sh || echo "[followup] annex FAILED/stopped"

echo "[followup] $(date +%H:%M:%S) chain done"
