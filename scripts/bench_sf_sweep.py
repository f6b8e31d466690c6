#!/usr/bin/env python
"""Sweep (tile, range) of the scatter-free accumulator INSIDE the real train
step (the isolated numbers don't transfer 1:1 — XLA schedules the tile scan
differently in the full backward graph)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from ucsa_neural_rendering_tpu.models import SemanticNeRF
    from ucsa_neural_rendering_tpu.models import hash_encoding as he
    from ucsa_neural_rendering_tpu.ops.renderer import RenderConfig
    from ucsa_neural_rendering_tpu.train import NeRFTrainer

    H, W = 240, 320
    model = SemanticNeRF(bound=4.0, num_semantic_classes=40)
    cfg = RenderConfig(num_steps=32, upsample_steps=32, occ_candidates=128)
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
        if r_forced is not None:
            he._scatter_free_range = lambda *a, **k: r_forced
        else:
            he._scatter_free_range = ORIG_RANGE
        tr = NeRFTrainer(model, cfg, lr=1e-2, n_rays=4096, image_hw=(H, W))
        params, opt_state = tr.init(jax.random.key(0))
        grid = tr.init_occupancy()
        params, opt_state, parts = tr.train_step(params, opt_state, batch,
                                                 jax.random.key(1), occ_grid=grid)
        _ = float(parts["loss_nerf_total"])
        ts = []
        for i in range(5):
            t0 = time.perf_counter()
            params, opt_state, parts = tr.train_step(
                params, opt_state, batch, jax.random.key(i), occ_grid=grid)
            _ = float(parts["loss_nerf_total"])
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1000

    global ORIG_RANGE
    ORIG_RANGE = he._scatter_free_range
    for tile, r in ((256, 2048), (512, 2048), (512, 4096), (1024, 4096),
                    (1024, 2048)):
        ms = time_step(tile, r)
        print(f"tile={tile:5d} r={r}  step {ms:8.1f} ms "
              f"({4096 * 1000 / ms:.0f} rays/s)", flush=True)


if __name__ == "__main__":
    main()
