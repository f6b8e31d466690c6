#!/usr/bin/env python
"""Row-count levers, measured (round-4 verdict #2):

1. Encoding re-parameterization at constant 32-dim output: 16 levels x F=2
   (reference geometry) vs 8 x F=4 vs 4 x F=8. Gather rows per point scale
   with LEVEL COUNT while wider rows are nearly free (round-2 gather
   curve: 4 B 5.6 ns -> 16 B 7.5 ns per row), so halving levels should
   cut encode cost almost 2x. Measures 300-step occupancy-32+32 fits:
   ms/step, endpoint PSNR, semantic acc.

2. Fused multi-image stepping (nerf.fused_image_step): B images' ray
   batches in ONE Adam step vs the scanned per-image loop. Same total ray
   count per measurement; reports per-step wall and rays/s.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fit_variant(n_levels, n_features, steps, H, W, n_rays=4096,
                log2_size=19, train_packed=2 ** 21, sfwd=False,
                occ_steps=32, proposal_total=None):
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
                         n_levels=n_levels, n_features=n_features,
                         log2_hashmap_size=log2_size,
                         stochastic_fwd=sfwd)
    if proposal_total:
        # proposal placement (ops/renderer.py proposal_placement): the
        # TOTAL budget split 3:1 between the grid-CDF draw and a small
        # importance refine (matches exp_synthetic_cl's proposal arm;
        # proposal-only measured to lose label sharpness)
        cfg = RenderConfig(num_steps=max(1, proposal_total * 3 // 4),
                           upsample_steps=proposal_total // 4,
                           occ_candidates=128, proposal_placement=True,
                           train_packed_max_entries=train_packed)
    else:
        cfg = RenderConfig(num_steps=occ_steps, upsample_steps=occ_steps,
                           occ_candidates=128,
                           train_packed_max_entries=train_packed)
    tr = NeRFTrainer(model, cfg, lr=1e-2, n_rays=n_rays, image_hw=(H, W))
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
    psnr = -10 * np.log10(float(((pred - fr["image"]) ** 2).mean()))
    acc = float((np.asarray(out["nerf_semantics"]) == fr["label"]).mean())
    ms = float(np.median(times) * 1000)
    return {"ms_per_step": round(ms, 1),
            "rays_per_sec": round(n_rays / (ms / 1000), 1),
            "psnr": round(psnr, 2), "sem_acc": round(acc, 4)}


def fit_fused(batch_images, steps, H, W, fused, n_rays=4096):
    """Fit via JointTrainer's nerf-phase paths: scanned per-image Adam
    (reference numerics) vs the fused one-step mode, same total rays."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ucsa_neural_rendering_tpu.data import get_rays
    from ucsa_neural_rendering_tpu.data.synthetic import make_synthetic_scene
    from ucsa_neural_rendering_tpu.models import SemanticNeRF
    from ucsa_neural_rendering_tpu.ops.renderer import RenderConfig
    from ucsa_neural_rendering_tpu.train.joint_trainer import JointTrainer

    frames, intr = make_synthetic_scene(6, H, W)
    exp = {"optimizer": {"lr_seg": 1e-5, "lr_nerf": 1e-2, "name": "Adam"},
           "nerf": {"fused_image_step": fused}}
    trainer = JointTrainer(
        exp, image_hw=(H, W), num_classes=40,
        render_cfg=RenderConfig(num_steps=32, upsample_steps=32,
                                occ_candidates=128,
                                train_packed_max_entries=2 ** 21),
        n_rays=n_rays,
        nerf_model=SemanticNeRF(bound=1.0, num_semantic_classes=40),
        seg_model=object())  # seg never touched on this path
    state = trainer.init_nerf(jax.random.key(0))
    grid = trainer.init_occupancy()

    b = batch_images
    key = jax.random.key(1)
    times = []
    for step in range(steps):
        idx = [(step * b + j) % len(frames) for j in range(b)]
        imgs = jnp.asarray(np.stack([frames[i]["image"] for i in idx]))
        labs = jnp.asarray(np.stack([frames[i]["label"] for i in idx]))
        deps = jnp.asarray(np.stack([frames[i]["depth"] for i in idx]))
        poses = jnp.asarray(np.stack([frames[i]["pose"] for i in idx]))
        intrs = jnp.asarray(np.stack([intr] * b))
        uoms = jnp.ones(b, jnp.float32)
        key, k = jax.random.split(key)
        t0 = time.perf_counter()
        state, parts = trainer._nerf_update_all(
            state, imgs, labs, deps, poses, intrs, uoms, k, grid)
        _ = float(parts["loss_nerf_total"])
        if step > 0:
            times.append(time.perf_counter() - t0)
        if (step + 1) % (trainer.occ_cfg.update_every // b + 1) == 0:
            key, k = jax.random.split(key)
            grid = trainer.update_occupancy(state, grid, k)

    fr = frames[0]
    rays = get_rays(jnp.asarray(fr["pose"]), jnp.asarray(intr), H, W)
    out = trainer.render_frames(state[0], jnp.asarray(fr["pose"])[None],
                                jnp.asarray(intr), grid, group=1)
    pred = np.clip(np.asarray(out["nerf_rgb"][0]), 0, 1)
    psnr = -10 * np.log10(float(((pred - fr["image"]) ** 2).mean()))
    acc = float((np.asarray(out["nerf_semantics"][0]) == fr["label"]).mean())
    ms = float(np.median(times) * 1000)
    return {"ms_per_dispatch": round(ms, 1),
            "rays_per_sec": round(b * n_rays / (ms / 1000), 1),
            "psnr": round(psnr, 2), "sem_acc": round(acc, 4)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--hw", type=int, nargs=2, default=(240, 320))
    ap.add_argument("--skip-encodings", action="store_true")
    ap.add_argument("--skip-fused", action="store_true")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--sfwd", nargs="?", const="full", default=None,
                    choices=["full", "face"],
                    help="stochastic-forward encoding on every variant: "
                         "'full' = single-corner (the 26k accel-ladder "
                         "knob), 'face' = stratified one-axis face "
                         "sampling (4 rows, exact bilinear face blend)")
    ap.add_argument("--enc", default="16x2,8x4,4x8",
                    help="comma-separated LxF variants to measure")
    ap.add_argument("--occ-steps", type=int, default=32,
                    help="occupancy-sampling budget per pass (the reduced-"
                         "budget gate arms: 24/16; VERDICT r4 #2)")
    ap.add_argument("--proposal-total", type=int, default=None,
                    help="proposal-placement arm (VERDICT r4 #4): TOTAL "
                         "sample budget, split 3:1 between the grid-CDF "
                         "draw and a small importance refine "
                         "(proposal_placement=true); overrides --occ-steps")
    ap.add_argument("--out", default=None,
                    help="also write the results JSON to this path")
    args = ap.parse_args()
    # honor JAX_PLATFORMS=cpu via live config (the axon plugin's discovery
    # ignores the env var; PERFORMANCE.md round-3 environment notes)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    H, W = args.hw
    results = {}
    if not args.skip_encodings:
        variants = [tuple(int(v) for v in e.split("x"))
                    for e in args.enc.split(",")]
        sfwd = {None: False, "full": True, "face": "face"}[args.sfwd]
        for (L, F) in variants:
            r = fit_variant(L, F, args.steps, H, W, sfwd=sfwd,
                            occ_steps=args.occ_steps,
                            proposal_total=args.proposal_total)
            tag = (f"enc_{L}x{F}"
                   + (f"_sfwd_{args.sfwd}" if args.sfwd else "")
                   + (f"_prop{args.proposal_total}" if args.proposal_total
                      else (f"_occ{args.occ_steps}"
                            if args.occ_steps != 32 else "")))
            results[tag] = r
            print(f"{tag}: {r}", flush=True)
    if not args.skip_fused:
        for fused in (False, True):
            steps = args.steps // args.batch
            r = fit_fused(args.batch, steps, H, W, fused)
            results[f"fused_{fused}_b{args.batch}"] = r
            print(f"fused={fused} b={args.batch}: {r}", flush=True)
    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
