#!/usr/bin/env python
"""North-star feasibility arithmetic (VERDICT r4 #3).

BASELINE.md's north star is >=5x the tiny-cuda-nn A100 fit throughput
(1e5 rays/s, derivation in bench.py) = 500,000 rays/s/chip. This script
computes the per-config CEILING of the gather-bound train step on this
toolchain from first principles + the measured cost constants, so the
"can any config reach 5x?" question is arithmetic, not opinion.

Cost model (every constant measured, PERFORMANCE.md):
  step_s >= fwd_rows * NS_FWD + bwd_rows * NS_BWD + C_FIXED
  - fwd_rows: hash-table gather rows for the forward encode. Per sample
    point: packed coarse levels read 1 cell row; unpacked (hashed fine)
    levels read 8 corner rows exact, 4 with the face estimator, 1 with
    the fully stochastic forward. Packing counted by the real
    `choose_n_packed` over the real `make_spec` geometry (bound 4,
    2^19 table, pk21 train packing -- the shipped defaults).
  - NS_FWD = 4.5e-9 s/row: the measured big-op per-row floor of XLA's
    TPU gather (scripts/bench_gather_curve.py, 8.4M-row ops; small
    1-2 MB tables reach 2.8 ns -- the OPTIMISTIC column uses that).
  - bwd_rows: stochastic-corner table grads contribute 1 row per
    (point, level); the sort + one-hot-MXU + block-RMW accumulation
    measures 104 ms for 4.2M rows at occupancy scale
    (scripts/bench_scatter_free.py) => NS_BWD = 24.8e-9 s/row.
  - C_FIXED = 0.040 s: everything row-count-independent at 4096 rays --
    MLPs, sampling, compositing, Adam, occupancy-refresh amortization,
    per-op dispatch. Calibrated so the model reproduces the measured
    incumbent step (247.6 ms at 16x2 pk21) and cross-checked against the
    round-2 step decomposition residual (~20-50 ms).

Ceilings are FLOORS of step time, i.e. the throughput if everything
except the irreducible row traffic became free. Reference workload
being modeled: 4096 rays x 64 samples (occ 32+32), the accelerated
stand-in for /root/reference/nr4seg/nerf/renderer_semantics.py:127-218's
256+256 dense march (8x more rows; its ceiling is ~8x lower).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NS_FWD = 4.5e-9          # measured big-op gather floor, s/row
NS_FWD_SMALL = 2.8e-9    # 1-2 MB table floor (optimistic bound)
NS_BWD = 104e-3 / 4.2e6  # measured scatter-free accumulation, s/row
C_FIXED = 0.040          # calibrated row-independent step cost, s
N_RAYS = 4096
BASELINE_RAYS_S = 1e5    # bench.py's cited instant-ngp-derived A100 number
NORTH_STAR = 5 * BASELINE_RAYS_S


def rows_per_point(n_levels, n_features, sfwd=False,
                   pack_budget=2 ** 21, bound=4.0):
    """(fwd_rows, bwd_rows) per sample point from the real geometry."""
    from ucsa_neural_rendering_tpu.models.hash_encoding import (
        make_spec, ngp_per_level_scale)
    from ucsa_neural_rendering_tpu.models.packed_table import choose_n_packed
    spec = make_spec(n_levels=n_levels, n_features=n_features,
                     per_level_scale=ngp_per_level_scale(bound, n_levels))
    k = choose_n_packed(spec, pack_budget)
    fine_rows = {False: 8, "face": 4, True: 1, "fine": 1}[sfwd]
    fwd = k * 1 + (n_levels - k) * fine_rows
    bwd = n_levels * 1  # stochastic-corner grads: one sampled row/level
    return fwd, bwd, k


def config_ceiling(n_levels, n_features, sfwd=False, samples=64,
                   n_rays=N_RAYS, measured_ms=None):
    fwd_pt, bwd_pt, k = rows_per_point(n_levels, n_features, sfwd)
    pts = n_rays * samples
    fwd_rows, bwd_rows = pts * fwd_pt, pts * bwd_pt
    step_floor = fwd_rows * NS_FWD + bwd_rows * NS_BWD + C_FIXED
    step_opt = fwd_rows * NS_FWD_SMALL + bwd_rows * NS_BWD + C_FIXED
    fwd_only = fwd_rows * NS_FWD
    row = {
        "config": f"{n_levels}x{n_features}"
                  + {False: "", "face": "+face", True: "+ladder",
                     "fine": "+fine"}[sfwd],
        "packed_levels": k,
        "rows_per_ray_fwd": fwd_pt * samples,
        "rows_per_ray_bwd": bwd_pt * samples,
        "ceiling_rays_s": round(n_rays / step_floor),
        "ceiling_rays_s_optimistic": round(n_rays / step_opt),
        "fwd_only_ceiling_rays_s": round(n_rays / fwd_only),
        "ceiling_x_baseline": round(n_rays / step_floor / BASELINE_RAYS_S, 3),
    }
    if measured_ms:
        row["measured_rays_s"] = round(n_rays / (measured_ms / 1e3))
        row["ceiling_frac"] = round(
            (n_rays / (measured_ms / 1e3)) / row["ceiling_rays_s"], 3)
    return row


# measured 300-step fits (PERFORMANCE.md round 4) for ceiling_frac
MEASURED_MS = {
    ("16x2", False): 247.6,
    ("8x4", False): 189.3,
    ("4x8", False): 128.3,
    ("16x2", "face"): 213.2,   # packed hybrid
    ("16x2", True): 164.7,
    ("4x8", True): 115.5,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    a = ap.parse_args()
    rows = []
    for (enc, sfwd) in [("16x2", False), ("8x4", False), ("4x8", False),
                        ("16x2", "face"), ("8x4", "face"),
                        ("16x2", True), ("4x8", True)]:
        L, F = (int(v) for v in enc.split("x"))
        rows.append(config_ceiling(L, F, sfwd,
                                   measured_ms=MEASURED_MS.get((enc, sfwd))))
    out = {
        "north_star_rays_s": NORTH_STAR,
        "model": {"ns_fwd": NS_FWD, "ns_fwd_small_table": NS_FWD_SMALL,
                  "ns_bwd": NS_BWD, "c_fixed_s": C_FIXED,
                  "samples_per_ray": 64, "n_rays": N_RAYS},
        "configs": rows,
        "max_ceiling_x_baseline": max(r["ceiling_x_baseline"] for r in rows),
    }
    if a.json:
        print(json.dumps(out, indent=2))
        return
    print(f"north star: {NORTH_STAR:,.0f} rays/s/chip "
          f"(5x the {BASELINE_RAYS_S:,.0f} A100 baseline)\n")
    hdr = ("config       pk  rows/ray(f/b)   ceiling    opt-ceiling  "
           "fwd-only   x-baseline  measured  frac")
    print(hdr)
    for r in rows:
        meas = (f"{r['measured_rays_s']:>8,}  {r['ceiling_frac']:.2f}"
                if "measured_rays_s" in r else "       —     —")
        print(f"{r['config']:<12} {r['packed_levels']:>2}  "
              f"{r['rows_per_ray_fwd']:>5}/{r['rows_per_ray_bwd']:<5}  "
              f"{r['ceiling_rays_s']:>8,}  {r['ceiling_rays_s_optimistic']:>10,}  "
              f"{r['fwd_only_ceiling_rays_s']:>8,}  "
              f"{r['ceiling_x_baseline']:>8.3f}  {meas}")
    print(f"\nmax ceiling across configs: "
          f"{out['max_ceiling_x_baseline']:.3f}x baseline "
          f"(north star needs 5.0x)")


if __name__ == "__main__":
    main()
