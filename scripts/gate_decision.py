#!/usr/bin/env python
"""Round-4 quality-gate decision: paired per-seed deltas vs the incumbent.

The gate criterion (VERDICT r3 #1/#2): the FASTEST arm whose live new-scene
and old-scene seg mIoU are within 0.5 pt of the incumbent (accel16x2, the
shipped default) is promoted to the shipped default. Single-seed inter-arm
spreads on this protocol are >1 pt (e.g. dense vs accel swings +4.5/−4.3 pt
on the two axes in seed 123), so the comparison is PAIRED: each seed root
holds every arm run on identical data from an identical pretrain checkpoint,
and the decision statistic is the mean over seeds of the within-seed delta.

Usage: gate_decision.py root1[,root2,...] [--threshold 0.5]
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gate_report_table import DEAD, arm_row  # noqa: E402

INCUMBENT = "cl_replay_on"
# measured fit throughput per arm (PERFORMANCE.md round 4,
# scripts/bench_encoding_variants.py; rays/s on the v5e chip)
THROUGHPUT = {
    "cl_replay_on": 16_542,
    "cl_replay_on_enc8x4": 21_642,
    "cl_replay_on_enc4x8": 31_921,
    "cl_replay_on_ladder": 26_300,
    # levers measured by the round-4 chains (bench_enc_sfwd.json /
    # bench_face.json); filled from --throughput-json when present
    "cl_replay_on_ladder_enc4x8": None,
    "cl_replay_on_face": None,
    "cl_replay_on_face_enc4x8": None,
    # round-5 composition arms (VERDICT r4 #2): filled from
    # --throughput-json (gate_r5/bench_arm_*.json)
    "cl_replay_on_face_enc8x4": None,
    "cl_replay_on_enc8x4_occ24": None,
    # round-5 proposal-placement arm (VERDICT r4 #4): grid-density
    # placement of 32 TOTAL samples, one full-model pass, on the 8x4
    # encoding; filled from gate_r5/bench_arm_prop.json
    "cl_replay_on_proposal_enc8x4": None,
}

# bench_encoding_variants.py result tag -> gate arm name
_BENCH_TAG_TO_ARM = {
    "enc_16x2": "cl_replay_on",
    "enc_8x4": "cl_replay_on_enc8x4",
    "enc_4x8_sfwd": "cl_replay_on_ladder_enc4x8",
    "enc_4x8_sfwd_full": "cl_replay_on_ladder_enc4x8",
    "enc_16x2_sfwd": "cl_replay_on_ladder",
    "enc_16x2_sfwd_full": "cl_replay_on_ladder",
    "enc_16x2_sfwd_face": "cl_replay_on_face",
    "enc_4x8_sfwd_face": "cl_replay_on_face_enc4x8",
    "enc_8x4_sfwd_face": "cl_replay_on_face_enc8x4",
    "enc_8x4_occ24": "cl_replay_on_enc8x4_occ24",
    "enc_8x4_prop32": "cl_replay_on_proposal_enc8x4",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("roots")
    ap.add_argument("--threshold", type=float, default=0.5,
                    help="max allowed mean paired regression, in mIoU points")
    ap.add_argument("--throughput-json",
                    default="/tmp/bench_enc_sfwd.json,/tmp/bench_face.json,"
                            "/tmp/bench_face_hybrid.json,"
                            "/root/repo/gate_r5/bench_arm_base.json,"
                            "/root/repo/gate_r5/bench_arm_face.json,"
                            "/root/repo/gate_r5/bench_arm_occ.json,"
                            "/root/repo/gate_r5/bench_arm_prop.json",
                    help="comma-separated optional measured throughputs "
                         "{tag: {rays_per_sec}} from bench_encoding_variants")
    a = ap.parse_args()
    roots = a.roots.split(",")

    tp = dict(THROUGHPUT)
    for path in a.throughput_json.split(","):
        if not os.path.exists(path):
            continue
        with open(path) as f:
            extra = json.load(f)
        for tag, arm in _BENCH_TAG_TO_ARM.items():
            if tag in extra:
                tp[arm] = extra[tag]["rays_per_sec"]

    # per-root arm rows
    per_seed = []  # [{arm: row}]
    for root in roots:
        rows = {}
        for rp in sorted(glob.glob(os.path.join(root, "experiments",
                                                "report_*.json"))):
            row = arm_row(root, rp)
            rows[row["arm"]] = row
        per_seed.append(rows)

    arms = sorted({arm for rows in per_seed for arm in rows})
    out = []
    for arm in arms:
        if arm == INCUMBENT:
            continue
        dn, do = [], []
        for rows in per_seed:
            if arm in rows and INCUMBENT in rows:
                dn.append(rows[arm]["new_scene_mIoU_live"]
                          - rows[INCUMBENT]["new_scene_mIoU_live"])
                do.append(rows[arm]["old_scene_final_live"]
                          - rows[INCUMBENT]["old_scene_final_live"])
        if not dn:
            continue
        mean_dn = 100 * sum(dn) / len(dn)  # in mIoU points
        mean_do = 100 * sum(do) / len(do)
        passes = mean_dn >= -a.threshold and mean_do >= -a.threshold
        out.append({
            "arm": arm, "seeds": len(dn),
            "delta_new_live_pts": round(mean_dn, 2),
            "delta_old_live_pts": round(mean_do, 2),
            "per_seed_new_pts": [round(100 * d, 2) for d in dn],
            "per_seed_old_pts": [round(100 * d, 2) for d in do],
            "rays_per_sec": tp.get(arm),
            "passes_gate": passes,
        })
    out.sort(key=lambda r: -(r["rays_per_sec"] or 0))
    # promotion additionally requires being FASTER than the incumbent —
    # a quality-passing but slower arm must never replace the default
    passing = [r for r in out if r["passes_gate"] and r["rays_per_sec"]
               and r["rays_per_sec"] > tp[INCUMBENT]]
    decision = {
        "incumbent": INCUMBENT,
        "incumbent_rays_per_sec": tp[INCUMBENT],
        "threshold_pts": a.threshold,
        "candidates": out,
        "promote": passing[0]["arm"] if passing else None,
    }
    print(json.dumps(decision, indent=2))


if __name__ == "__main__":
    main()
