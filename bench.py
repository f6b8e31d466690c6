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
    if dense:
        cfg = RenderConfig(num_steps=256, upsample_steps=256)
    else:
        cfg = RenderConfig(num_steps=32, upsample_steps=32, occ_candidates=128)
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
    print(json.dumps({
        "metric": name,
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
