#!/usr/bin/env python
"""Measure the stochastic-forward encoding (models/hash_encoding.py
hash_encode_stochastic_fwd): train-step speed AND fit quality vs the exact
trilinear forward, at production scale (240x320, full-size model)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(stochastic_fwd, steps, H, W, train_packed=0):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ucsa_neural_rendering_tpu.data import get_rays
    from ucsa_neural_rendering_tpu.data.synthetic import make_synthetic_scene
    from ucsa_neural_rendering_tpu.models import SemanticNeRF
    from ucsa_neural_rendering_tpu.ops.renderer import RenderConfig
    from ucsa_neural_rendering_tpu.train import NeRFTrainer

    frames, intr = make_synthetic_scene(6, H, W)
    model = SemanticNeRF(bound=1.0, num_semantic_classes=40,
                         stochastic_fwd=stochastic_fwd)
    cfg = RenderConfig(num_steps=32, upsample_steps=32, occ_candidates=128,
                       train_packed_max_entries=train_packed)
    tr = NeRFTrainer(model, cfg, lr=1e-2, n_rays=4096, image_hw=(H, W))
    params, opt_state = tr.init(jax.random.key(0))
    grid = tr.init_occupancy()

    key = jax.random.key(1)
    times = []
    for step in range(steps):
        fr = frames[step % len(frames)]
        batch = {
            "pose": jnp.asarray(fr["pose"]), "intrinsics": jnp.asarray(intr),
            "image": jnp.asarray(fr["image"]),
            "label": jnp.asarray(fr["label"]),
            "depth": jnp.asarray(fr["depth"]),
            "one_m_to_scene_uom": jnp.float32(1.0),
        }
        key, k = jax.random.split(key)
        t0 = time.perf_counter()
        params, opt_state, parts = tr.train_step(params, opt_state, batch, k,
                                                 occ_grid=grid)
        _ = float(parts["loss_nerf_total"])
        if step > 0:
            times.append(time.perf_counter() - t0)
        if (step + 1) % tr.occ_cfg.update_every == 0:
            key, k = jax.random.split(key)
            grid = tr.update_occupancy(params, grid, k)

    fr = frames[0]
    rays = get_rays(jnp.asarray(fr["pose"]), jnp.asarray(intr), H, W)
    out = tr.render_image(params, jnp.asarray(fr["pose"]),
                          jnp.asarray(intr), rays, occ_grid=grid)
    pred = np.clip(np.asarray(out["nerf_rgb"]), 0, 1)
    mse = float(((pred - fr["image"]) ** 2).mean())
    psnr = -10 * np.log10(mse)
    acc = float((np.asarray(out["nerf_semantics"]) == fr["label"]).mean())
    ms = float(np.median(times) * 1000)
    return ms, psnr, acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--hw", type=int, nargs=2, default=(240, 320))
    args = ap.parse_args()
    variants = (
        ("exact-fwd", False, 0),
        ("exact-fwd + train-pk21", False, 2 ** 21),
        ("hybrid fine-sampled pk21", "fine", 2 ** 21),
        ("hybrid fine-sampled pk23", "fine", 2 ** 23),
        ("stochastic-fwd (all)", True, 0),
    )
    for name, flag, tp in variants:
        ms, psnr, acc = run(flag, args.steps, *args.hw, train_packed=tp)
        print(f"{name:26s}  {ms:7.1f} ms/step ({4096e3 / ms:7.0f} rays/s)  "
              f"PSNR {psnr:.2f} dB  sem-acc {acc:.3f}", flush=True)


if __name__ == "__main__":
    main()
