#!/usr/bin/env python
"""Benchmark: Semantic-NeRF fit throughput (rays/sec/chip) on real hardware.

Measures the reference's training hot loop (SURVEY.md §6): 4096-ray batches
x 512 samples/ray (256 stratified + 256 importance) through the full-size
model (2^19 hash table, 64-wide sigma/color/semantics MLPs, bound 4) —
forward + backward + Adam update, i.e. exactly `training_step_nerf`'s
per-image work (ref: joint_train_lightning_net.py:473-513).

Baseline: the reference publishes no numbers (BASELINE.md); the comparison
value is the estimated tiny-cuda-nn A100 throughput for this exact
dense-sampling workload, ~100k rays/s (≈25 it/s at 4096 rays with two
density passes + color/semantics over 2.1M samples). vs_baseline > 1 means
faster than that estimate.

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
    steps = int(os.environ.get("BENCH_STEPS", 30))

    model = SemanticNeRF(bound=4.0, num_semantic_classes=40)
    cfg = RenderConfig(num_steps=256, upsample_steps=256)
    tr = NeRFTrainer(model, cfg, lr=1e-2, n_rays=n_rays, image_hw=(H, W))
    params, opt_state = tr.init(jax.random.key(0))

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

    # warmup / compile
    rng, k = jax.random.split(rng)
    params, opt_state, parts = tr.train_step(params, opt_state, batch, k)
    jax.block_until_ready(parts)

    t0 = time.perf_counter()
    for _ in range(steps):
        rng, k = jax.random.split(rng)
        params, opt_state, parts = tr.train_step(params, opt_state, batch, k)
    jax.block_until_ready(parts)
    dt = time.perf_counter() - t0

    rays_per_sec = n_rays * steps / dt
    print(json.dumps({
        "metric": "nerf_fit_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
