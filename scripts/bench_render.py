#!/usr/bin/env python
"""Render-budget / early-termination measurement on real hardware.

Fits the procedural room at production scale (240x320, full-size model:
2^19 table, 16 levels, 40 classes), then times full-frame renders and PSNR
across budgets, including the two-stage early-termination path
(ops/renderer.py render_rays_early_stop). Produces the numbers that decide
the default test/predict config (VERDICT round-1 item #1: <=400 ms/frame at
PSNR within 0.1 dB of the 32+32 render).

Usage: python scripts/bench_render.py [--steps 300] [--hw 240 320]
Writes a markdown table to stdout and render_bench.json next to the repo.
"""

import argparse
import json
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--hw", type=int, nargs=2, default=(240, 320))
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ucsa_neural_rendering_tpu.data import get_rays
    from ucsa_neural_rendering_tpu.data.synthetic import make_synthetic_scene
    from ucsa_neural_rendering_tpu.models import SemanticNeRF
    from ucsa_neural_rendering_tpu.ops.renderer import (RenderConfig,
                                                        render_rays_staged)
    from ucsa_neural_rendering_tpu.train import NeRFTrainer

    H, W = args.hw
    frames, intr = make_synthetic_scene(args.frames, H, W)
    model = SemanticNeRF(bound=1.0, num_semantic_classes=40)
    train_cfg = RenderConfig(num_steps=32, upsample_steps=32,
                             occ_candidates=128)
    tr = NeRFTrainer(model, train_cfg, lr=1e-2, n_rays=4096, image_hw=(H, W))
    params, opt_state = tr.init(jax.random.key(0))
    grid = tr.init_occupancy()

    print(f"fitting {args.steps} steps on {jax.devices()[0].platform}...",
          flush=True)
    key = jax.random.key(1)
    t0 = time.time()
    for step in range(args.steps):
        fr = frames[step % len(frames)]
        batch = {
            "pose": jnp.asarray(fr["pose"]), "intrinsics": jnp.asarray(intr),
            "image": jnp.asarray(fr["image"]),
            "label": jnp.asarray(fr["label"]),
            "depth": jnp.asarray(fr["depth"]),
            "one_m_to_scene_uom": jnp.float32(1.0),
        }
        key, k = jax.random.split(key)
        params, opt_state, parts = tr.train_step(params, opt_state, batch, k,
                                                 occ_grid=grid)
        if (step + 1) % tr.occ_cfg.update_every == 0:
            key, k = jax.random.split(key)
            grid = tr.update_occupancy(params, grid, k)
    _ = float(parts["loss_nerf_total"])
    print(f"fit done in {time.time() - t0:.0f}s "
          f"(rgb {float(parts['loss_nerf_rgb']):.4f})", flush=True)

    fr = frames[0]
    gt = fr["image"]
    rays = get_rays(jnp.asarray(fr["pose"]), jnp.asarray(intr), H, W)

    configs = {
        "32+32 (parity)": RenderConfig(num_steps=32, upsample_steps=32,
                                       packed_max_entries=0),
        "32+32 pk23": RenderConfig(num_steps=32, upsample_steps=32,
                                   packed_max_entries=2 ** 23,
                                   packed_dtype="bf16"),
        "16+16 pk23": RenderConfig(num_steps=16, upsample_steps=16,
                                   packed_max_entries=2 ** 23,
                                   packed_dtype="bf16"),
        # the test/predict DEFAULT (JointTrainer): train budget +
        # early-stop stage-1 at half budget + packed tables
        "es16->32+32 k/4 pk23": RenderConfig(num_steps=32, upsample_steps=32,
                                             early_stop=True, stage1_steps=16,
                                             refine_fraction=0.25,
                                             packed_max_entries=2 ** 23,
                                             packed_dtype="bf16"),
        # fast knob
        "es8->16+16 k/8 pk23": RenderConfig(num_steps=16, upsample_steps=16,
                                            early_stop=True, stage1_steps=8,
                                            refine_fraction=0.125,
                                            packed_max_entries=2 ** 23,
                                            packed_dtype="bf16"),
        # fp8 cell rows (VERDICT r2 #4): 16 B rows on the packed levels +
        # a doubled level budget per byte — measure the PSNR cost here
        "16+16 pk23 fp8": RenderConfig(num_steps=16, upsample_steps=16,
                                       packed_max_entries=2 ** 23,
                                       packed_dtype="fp8"),
        "es16->32+32 k/4 pk23 fp8": RenderConfig(
            num_steps=32, upsample_steps=32, early_stop=True,
            stage1_steps=16, refine_fraction=0.25,
            packed_max_entries=2 ** 23, packed_dtype="fp8"),
        "es16->32+32 k/4 pk24 fp8": RenderConfig(
            num_steps=32, upsample_steps=32, early_stop=True,
            stage1_steps=16, refine_fraction=0.25,
            packed_max_entries=2 ** 24, packed_dtype="fp8"),
    }

    from ucsa_neural_rendering_tpu.ops.renderer import normalize_semantics

    # --- cell-packed render tables: build once per budget, time the build --
    packed_tables = {}

    def get_packed(max_entries, dtype="bf16"):
        key = (max_entries, dtype)
        if key not in packed_tables:
            pack = jax.jit(lambda p: model.pack_table(p, max_entries, dtype))
            pt = pack(params)
            _ = float(jnp.sum(pt.data.astype(jnp.float32)))
            t0 = time.perf_counter()
            pt = pack(params)
            _ = float(jnp.sum(pt.data.astype(jnp.float32)))
            dt = time.perf_counter() - t0
            print(f"pack(max_entries=2^{int(np.log2(max_entries))}, "
                  f"{dtype}): n_packed={pt.n_packed}, "
                  f"rows={pt.data.shape[0]:,}, {dt * 1000:.0f} ms",
                  flush=True)
            packed_tables[key] = (pt, dt)
        return packed_tables[key]

    def render_with(cfg, packed=None):
        def impl(p, g, pt):
            out = render_rays_staged(
                model, {"params": p}, rays["rays_o"], rays["rays_d"],
                rays["direction_norms"], cfg, g, packed=pt)
            sem, _ = normalize_semantics(out["semantics"])
            return out["image"], jnp.argmax(sem, -1)
        f = jax.jit(impl)
        img, lab = f(params, grid, packed)
        _ = float(jnp.sum(img))  # force readback (axon)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            img, lab = f(params, grid, packed)
            _ = float(jnp.sum(img))
            times.append(time.perf_counter() - t0)
        pred = np.clip(np.asarray(img).reshape(H, W, 3), 0, 1)
        mse = float(((pred - gt) ** 2).mean())
        psnr = -10 * np.log10(mse)
        return min(times), psnr, np.asarray(lab).reshape(H, W)

    results = {}
    ref_label = None
    gt_label = fr["label"]
    for name, cfg in configs.items():
        packed = None
        if cfg.packed_max_entries:
            packed, _ = get_packed(cfg.packed_max_entries, cfg.packed_dtype)
        ms, psnr, label = render_with(cfg, packed)
        if ref_label is None:
            ref_label = label  # first config = the 32+32 parity budget
        agree = float((label == ref_label).mean())
        gt_acc = float((label == gt_label).mean())
        results[name] = {"ms_per_frame": round(ms * 1000, 1),
                         "psnr_db": round(psnr, 3),
                         "label_agree_vs_3232": round(agree, 4),
                         "label_acc_vs_gt": round(gt_acc, 4)}
        print(f"{name:18s}  {ms * 1000:8.1f} ms/frame   PSNR {psnr:.2f} dB"
              f"   label≡32+32 {agree * 100:.2f}%   label=GT "
              f"{gt_acc * 100:.2f}%", flush=True)

    # stage-1 saturation fractions (how many rays terminate early)
    from ucsa_neural_rendering_tpu.ops.renderer import render_rays
    for s1 in (4, 8, 16):
        cfg1 = RenderConfig(num_steps=s1, upsample_steps=0)
        f = jax.jit(lambda p, g: render_rays_staged(
            model, {"params": p}, rays["rays_o"], rays["rays_d"],
            rays["direction_norms"], cfg1, g))
        out = f(params, grid)
        acc = np.asarray(jnp.sum(out["semantics"], -1))
        frac = float((acc > 1 - 1e-4).mean())
        results[f"saturated@{s1}"] = round(frac, 4)
        print(f"stage1={s1:3d} samples: {frac * 100:.1f}% rays terminated",
              flush=True)

    for (me, dtype), (pt, dt) in packed_tables.items():
        results[f"pack_ms@2^{int(np.log2(me))}_{dtype}"] = round(dt * 1000, 1)

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "render_bench.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
