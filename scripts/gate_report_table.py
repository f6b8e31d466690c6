#!/usr/bin/env python
"""Assemble the round-4 quality-gate table from exp_synthetic_cl arm reports.

For each arm under <root>/experiments/report_<arm>.json, prints one row of
the metrics the gate decides on (VERDICT r3 #1/#2):
  * seg-level (what the protocol consumes): new-scene mIoU mean, old-scene
    final mIoU mean, and the same excluding scenes whose PRETRAIN transfer
    is ~0 (no adaptation signal to preserve: the pseudo-label loop never
    engages, so they only add noise to the mean);
  * nerf-level (what feeds replay/finetune data): per-stage rendered-label
    test mIoU from each stage's metrics.jsonl.
"""

import glob
import json
import os
import re
import sys

ROOT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ucsa_gate"
DEAD = set((sys.argv[2].split(",") if len(sys.argv) > 2 else
            ["scene0001_00"]))  # pretrain transfer ~0 (see gate notes)


def last_metric(path, key):
    if not os.path.exists(path):
        return None
    val = None
    pat = re.compile('"' + re.escape(key) + '": ([0-9.eE+-]+)')
    with open(path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                val = float(m.group(1))
    return val


def main():
    rows = []
    for rp in sorted(glob.glob(os.path.join(ROOT, "experiments",
                                            "report_*.json"))):
        with open(rp) as f:
            rep = json.load(f)
        arm = rep["arm"]
        scenes = rep["scenes"]
        mat = rep["val_mIoU"]
        n = len(scenes)
        live = [s for s in scenes if s not in DEAD]
        news = [mat[f"stage_{i}"][scenes[i]] for i in range(n)
                if f"stage_{i}" in mat and scenes[i] in mat[f"stage_{i}"]]
        news_live = [mat[f"stage_{i}"][scenes[i]] for i in range(n)
                     if scenes[i] in live and f"stage_{i}" in mat]
        last = mat.get(f"stage_{n - 1}", {})
        olds_live = [last[s] for s in live[:-1] if s in last
                     and s != scenes[n - 1]]
        nerf = []
        for i in range(n):
            mj = os.path.join(ROOT, "experiments", arm, f"stage_{i}",
                              "metrics.jsonl")
            v = last_metric(mj, "test/nerf_mean_IoU")
            nerf.append(round(v, 4) if v is not None else None)
        rows.append({
            "arm": arm,
            "new_scene_mIoU_mean": round(rep["new_scene_mIoU_mean"], 4),
            "new_scene_mIoU_live": round(sum(news_live) / len(news_live), 4)
            if news_live else None,
            "old_scene_final_live": round(sum(olds_live) / len(olds_live), 4)
            if olds_live else None,
            "nerf_test_mIoU_per_stage": nerf,
        })
    print(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
