#!/usr/bin/env python
"""Apply a quality-gate promotion to every shipped-config surface.

The gate decision (scripts/gate_decision.py -> gate_r5/decision.json)
names the winning arm; this script flips the surfaces the VERDICT r4 #1
follow-through enumerates so they cannot drift apart:

  - ucsa_neural_rendering_tpu/config/shipped.py  (single source of truth:
    SHIPPED_NERF_ENC / SHIPPED_NERF_SFWD / SHIPPED_TRAIN_BUDGET /
    SHIPPED_PROPOSAL — bench.py, __graft_entry__.entry(), the exp-YAML
    defaults, and bench_pipeline.py all read these)
  - cfg/exp/{one_step_joint,multi_step}/*.yml `renderer:`/`nerf:` blocks
    (the explicit per-experiment mirror of the reference's YAML layout;
    one_step_finetune_nerf YAMLs carry no blocks and follow shipped.py)

Usage:
  python scripts/promote_shipped.py --enc 8x4 --budget 24+8 --proposal
  python scripts/promote_shipped.py --enc 8x4 --budget 24+24   # occ24 arm
"""

import argparse
import glob
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def flip_shipped(enc, budget, proposal, sfwd):
    p = os.path.join(ROOT, "ucsa_neural_rendering_tpu/config/shipped.py")
    s = open(p).read()
    L, F = enc
    s = re.sub(r"SHIPPED_NERF_ENC = \(\d+, \d+\)",
               f"SHIPPED_NERF_ENC = ({L}, {F})", s)
    s = re.sub(r"SHIPPED_TRAIN_BUDGET = \(\d+, \d+\)",
               f"SHIPPED_TRAIN_BUDGET = ({budget[0]}, {budget[1]})", s)
    s = re.sub(r"SHIPPED_PROPOSAL = (True|False)",
               f"SHIPPED_PROPOSAL = {proposal}", s)
    s = re.sub(r'SHIPPED_NERF_SFWD = [^\n]+',
               f'SHIPPED_NERF_SFWD = {sfwd!r}'.replace("'False'", "False")
               .replace("'True'", "True"), s)
    open(p, "w").write(s)
    print(f"shipped.py: enc={L}x{F} budget={budget} proposal={proposal} "
          f"sfwd={sfwd}")


def flip_yaml(path, enc, budget, proposal):
    L, F = enc
    s = open(path).read()
    placement = ("grid-density proposal placement"
                 if proposal else "occupancy-guided placement")
    s = re.sub(r"occupancy-guided placement at \d+\+\d+ samples/ray",
               f"{placement} at {budget[0]}+{budget[1]} samples/ray", s)
    s = re.sub(r"\(round-\d+ quality gate",
               "(round-5 quality gate", s)
    block = (f"renderer:\n  num_steps: {budget[0]}\n"
             f"  upsample_steps: {budget[1]}\n")
    if proposal:
        block += "  proposal_placement: true\n"
    block += (f"nerf:\n  use_occupancy: true\n"
              f"  n_levels: {L}\n  n_features: {F}\n")
    new, n = re.subn(
        r"renderer:\n(?:  [^\n]*\n)+nerf:\n(?:  [^\n]*\n?)+", block, s)
    if n != 1:
        raise SystemExit(f"{path}: expected exactly one renderer+nerf "
                         f"block, found {n}")
    open(path, "w").write(new)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--enc", default="8x4")
    ap.add_argument("--budget", default="24+8",
                    help="train num_steps+upsample_steps")
    ap.add_argument("--proposal", action="store_true")
    ap.add_argument("--sfwd", default=False)
    a = ap.parse_args()
    enc = tuple(int(x) for x in a.enc.split("x"))
    budget = tuple(int(x) for x in a.budget.split("+"))
    flip_shipped(enc, budget, a.proposal, a.sfwd)
    paths = sorted(glob.glob(os.path.join(ROOT, "cfg/exp/one_step_joint/*.yml"))
                   + glob.glob(os.path.join(ROOT, "cfg/exp/multi_step/*.yml")))
    for p in paths:
        flip_yaml(p, enc, budget, a.proposal)
    print(f"updated {len(paths)} exp YAMLs")


if __name__ == "__main__":
    main()
