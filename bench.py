#!/usr/bin/env python
"""Benchmark: Semantic-NeRF fit throughput (rays/sec/chip) on real hardware.

Measures the reference's training hot loop (SURVEY.md §6): 4096-ray batches
through the full-size model (2^19 hash table, 64-wide sigma/color/semantics
MLPs, bound 4) — forward + backward + Adam update, i.e. exactly
`training_step_nerf`'s per-image work (ref: joint_train_lightning_net.py:
473-513). Two modes:
  * accelerated (default): occupancy-grid-guided sampling, 32+32 samples/ray
    (the TPU-native replacement for the reference's dead CUDA occupancy
    path; quality-neutral sample placement, ~8x fewer hash-table accesses —
    the single-chip bottleneck is XLA gather ~7ns/row + scatter ~52ns/row).
  * BENCH_DENSE=1: the reference's dense 256+256 stratified+importance
    workload for apples-to-apples parity.

Baseline: the reference publishes no numbers (BASELINE.md); the comparison
value is the estimated tiny-cuda-nn A100 throughput for its dense-sampling
workload, ~100k rays/s. vs_baseline > 1 means faster than that estimate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_RAYS_PER_SEC = 100_000.0  # tiny-cuda-nn A100 estimate (see above)
HBM_ROOF_GBPS = 819.0  # TPU v5e HBM bandwidth ceiling


def _table_traffic_bytes(n_rays, samples, n_levels, stochastic=True):
    """Hash-table bytes touched per train step — the roofline accounting
    (VERDICT r1 #7). Forward: 8 corner rows x n_levels per sample, bf16 F=2
    (4 B/row). Backward (stochastic): 1 contribution per (point, level),
    12 B (int32 idx + 2xf32), moved ~5x by the sort + one read/write of the
    dense blocks. This counts ROW traffic, not cache lines: the measured
    gather/scatter cost (~7/85 ns/row) is latency-bound, so achieved GB/s
    vs the 819 GB/s roof quantifies how far from bandwidth-bound we run."""
    pts = n_rays * samples
    fwd = pts * n_levels * 8 * 4
    rows_bwd = pts * n_levels * (1 if stochastic else 8)
    bwd = rows_bwd * 12 * 5
    return fwd + bwd


def main():
    import jax
    import jax.numpy as jnp

    from ucsa_neural_rendering_tpu.models import SemanticNeRF
    from ucsa_neural_rendering_tpu.ops.renderer import RenderConfig
    from ucsa_neural_rendering_tpu.train import NeRFTrainer

    H, W = 240, 320
    n_rays = int(os.environ.get("BENCH_RAYS", 4096))
    steps = int(os.environ.get("BENCH_STEPS", 10))
    dense = os.environ.get("BENCH_DENSE", "0") == "1"

    model = SemanticNeRF(bound=4.0, num_semantic_classes=40)
    remat = {"0": False, "1": True}.get(os.environ.get("BENCH_REMAT", ""),
                                        "auto")
    if dense:
        cfg = RenderConfig(num_steps=256, upsample_steps=256, remat=remat)
    else:
        cfg = RenderConfig(num_steps=32, upsample_steps=32,
                           occ_candidates=128, remat=remat)
    tr = NeRFTrainer(model, cfg, lr=1e-2, n_rays=n_rays, image_hw=(H, W))
    params, opt_state = tr.init(jax.random.key(0))
    grid = None if dense else tr.init_occupancy()

    rng = jax.random.key(1)
    img = jax.random.uniform(jax.random.key(2), (H, W, 3))
    batch = {
        "pose": jnp.eye(4),
        "intrinsics": jnp.array([277.0, 277.0, W / 2, H / 2]),
        "image": img,
        "label": jnp.zeros((H, W), jnp.int32),
        "depth": jnp.ones((H, W)) * 2.0,
        "one_m_to_scene_uom": jnp.float32(1.0),
    }

    # warmup / compile (axon backend: force a readback, block_until_ready is
    # not reliable here)
    rng, k = jax.random.split(rng)
    params, opt_state, parts = tr.train_step(params, opt_state, batch, k,
                                             occ_grid=grid)
    _ = float(parts["loss_nerf_total"])

    t0 = time.perf_counter()
    for _ in range(steps):
        rng, k = jax.random.split(rng)
        params, opt_state, parts = tr.train_step(params, opt_state, batch, k,
                                                 occ_grid=grid)
        _ = float(parts["loss_nerf_total"])
    dt = time.perf_counter() - t0

    rays_per_sec = n_rays * steps / dt
    name = ("nerf_fit_rays_per_sec_per_chip_dense" if dense
            else "nerf_fit_rays_per_sec_per_chip")

    # roofline: achieved hash-table GB/s for the train step vs the HBM roof
    samples = cfg.num_steps + cfg.upsample_steps
    step_s = dt / steps
    hbm_gbps = _table_traffic_bytes(n_rays, samples, 16,
                                    stochastic=not dense) / step_s / 1e9

    # full-frame render at the test/predict DEFAULT configuration (early-
    # stop at the train budget + cell-packed tables — what JointTrainer
    # uses for joint-phase pseudo-labels and predict dumps; the pipeline
    # bottleneck, VERDICT r1 #1)
    extras = {}
    if not dense and os.environ.get("BENCH_RENDER", "1") == "1":
        from ucsa_neural_rendering_tpu.data.rays import get_rays
        rays = get_rays(batch["pose"], batch["intrinsics"], H, W)
        render = jax.jit(lambda p, g, pt: tr._render_image_impl(
            p, batch["pose"], batch["intrinsics"], rays, g, pt))
        import dataclasses
        tr.cfg = dataclasses.replace(cfg, early_stop=True, stage1_steps=16,
                                     refine_fraction=0.25)
        packed = tr.packed_for(params)
        out = render(params, grid, packed)
        _ = float(jnp.sum(out["nerf_rgb"]))
        t0 = time.perf_counter()
        out = render(params, grid, packed)
        _ = float(jnp.sum(out["nerf_rgb"]))
        extras["render_ms_per_frame"] = round(
            (time.perf_counter() - t0) * 1000, 1)

    print(json.dumps({
        "metric": name,
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
        "hbm_gbps": round(hbm_gbps, 2),
        "hbm_roof_frac": round(hbm_gbps / HBM_ROOF_GBPS, 5),
        **extras,
    }))


if __name__ == "__main__":
    main()
