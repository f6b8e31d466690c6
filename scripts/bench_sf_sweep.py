#!/usr/bin/env python
"""Sweep (tile, range) of the scatter-free accumulator INSIDE the real train
step (the isolated numbers don't transfer 1:1 — XLA schedules the tile scan
differently in the full backward graph).

--dense sweeps the reference-parity dense workload instead (256+256
samples, exact trilinear grads — VERDICT r1 #9): 268M backward rows/step,
where the tile count (M/tile scan iterations) rather than the one-hot
volume dominates, so the optimum shifts to much larger tiles."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dense", action="store_true")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ucsa_neural_rendering_tpu.models import SemanticNeRF
    from ucsa_neural_rendering_tpu.models import hash_encoding as he
    from ucsa_neural_rendering_tpu.ops.renderer import RenderConfig
    from ucsa_neural_rendering_tpu.train import NeRFTrainer

    H, W = 240, 320
    if args.dense:
        model = SemanticNeRF(bound=4.0, num_semantic_classes=40,
                             stochastic_table_grad=False)
        cfg = RenderConfig(num_steps=256, upsample_steps=256)
    else:
        model = SemanticNeRF(bound=4.0, num_semantic_classes=40)
        cfg = RenderConfig(num_steps=32, upsample_steps=32,
                           occ_candidates=128)
    batch = {
        "pose": jnp.eye(4),
        "intrinsics": jnp.array([277.0, 277.0, W / 2, H / 2]),
        "image": jax.random.uniform(jax.random.key(2), (H, W, 3)),
        "label": jnp.zeros((H, W), jnp.int32),
        "depth": jnp.ones((H, W)) * 2.0,
        "one_m_to_scene_uom": jnp.float32(1.0),
    }

    def time_step(tile, r_forced=None):
        he._SF_TILE = tile
        if r_forced == "scatter":
            he._scatter_free_range = lambda *a, **k: None  # exact scatter
        elif r_forced is not None:
            he._scatter_free_range = lambda *a, **k: r_forced
        else:
            he._scatter_free_range = ORIG_RANGE
        tr = NeRFTrainer(model, cfg, lr=1e-2, n_rays=4096, image_hw=(H, W))
        params, opt_state = tr.init(jax.random.key(0))
        grid = None if args.dense else tr.init_occupancy()
        params, opt_state, parts = tr.train_step(params, opt_state, batch,
                                                 jax.random.key(1), occ_grid=grid)
        _ = float(parts["loss_nerf_total"])
        ts = []
        for i in range(args.reps):
            t0 = time.perf_counter()
            params, opt_state, parts = tr.train_step(
                params, opt_state, batch, jax.random.key(i), occ_grid=grid)
            _ = float(parts["loss_nerf_total"])
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1000

    global ORIG_RANGE
    ORIG_RANGE = he._scatter_free_range
    if args.dense:
        # scatter baseline (r=None disables the scatter-free path)
        combos = ((1024, "scatter"), (1024, 2048), (4096, 2048),
                  (8192, 4096), (16384, 4096), (32768, 8192))
    else:
        combos = ((256, 2048), (512, 2048), (512, 4096), (1024, 4096),
                  (1024, 2048))
    for tile, r in combos:
        ms = time_step(tile, r)
        print(f"tile={tile:5d} r={r}  step {ms:8.1f} ms "
              f"({4096 * 1000 / ms:.0f} rays/s)", flush=True)


if __name__ == "__main__":
    main()
