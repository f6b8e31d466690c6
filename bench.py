#!/usr/bin/env python
"""Benchmark: Semantic-NeRF fit throughput (rays/sec/chip) on real hardware.

Measures the reference's training hot loop (SURVEY.md §6): 4096-ray batches
through the full-size model (2^19 hash table, 64-wide sigma/color/semantics
MLPs, bound 4) — forward + backward + Adam update, i.e. exactly
`training_step_nerf`'s per-image work (ref: joint_train_lightning_net.py:
473-513). ONE default run measures BOTH modes:
  * accelerated: occupancy-grid-guided sampling, 32+32 samples/ray (the
    TPU-native replacement for the reference's dead CUDA occupancy path;
    quality-neutral sample placement, ~8x fewer hash-table accesses).
  * dense: the reference's dense 256+256 stratified+importance workload —
    the apples-to-apples parity number.

Baseline derivation (see BASELINE_SOURCE below): the reference publishes no
numbers (BASELINE.md), so the comparison value is derived from instant-ngp's
published full-pipeline training throughput scaled to this workload.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} where
the headline metric is the accelerated mode and dense appears alongside.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Derivation (2026-08, VERDICT r2 #5 — replaces the earlier uncited guess):
# instant-ngp (Mueller et al., SIGGRAPH 2022, arXiv:2201.05989) trains NeRF
# with 2^18-sample batches at ~200 steps/s on an RTX 3090 (lego reaches
# paper quality in ~5 s / ~1000 steps), i.e. ~5e7 point-evals/s through the
# FULL pipeline (march + hash+MLP fwd/bwd + composite + Adam). Scaled ~2x
# for A100-class tensor-core/HBM headroom: ~1e8 point-evals/s. The
# reference's dense workload runs ~1000 point-evals/ray (256 stratified +
# 256 importance density passes + <=512 masked color/semantics evals, ref
# renderer_semantics.py:154-267), giving ~1e5 rays/s. This is GENEROUS to
# the reference: its renderer is unfused torch around tcnn, not
# instant-ngp's CUDA marching. The same number is used for both modes so
# vs_baseline always compares against the reference's estimated wall-clock
# rate of consuming training rays.
BASELINE_RAYS_PER_SEC = 100_000.0
BASELINE_SOURCE = (
    "instant-ngp (arXiv:2201.05989) ~2^18-sample batches @ ~200 steps/s on "
    "RTX 3090 ≈ 5e7 point-evals/s full pipeline, x2 to A100-class ≈ 1e8, "
    "/ ~1e3 point-evals per dense 256+256 ray ≈ 1e5 rays/s")
HBM_ROOF_GBPS = 819.0  # TPU v5e HBM bandwidth ceiling


def _table_traffic_bytes(n_rays, samples, n_levels, n_features=2,
                         stochastic=True):
    """Hash-table bytes touched per train step — the roofline accounting
    (VERDICT r1 #7). Forward: 8 corner rows x n_levels per sample, bf16
    rows of n_features (2 B each). Backward (stochastic): 1 contribution
    per (point, level), (4 + 4*n_features) B (int32 idx + f32 features),
    moved ~5x by the sort + one read/write of the dense blocks. This
    counts ROW traffic, not cache lines: the measured gather/scatter cost
    (~7/85 ns/row) is latency-bound, so achieved GB/s vs the 819 GB/s
    roof quantifies how far from bandwidth-bound we run."""
    pts = n_rays * samples
    fwd = pts * n_levels * 8 * (2 * n_features)
    rows_bwd = pts * n_levels * (1 if stochastic else 8)
    bwd = rows_bwd * (4 + 4 * n_features) * 5
    return fwd + bwd


def _measure_fit(model, cfg, n_rays, steps, use_occupancy, H, W):
    """Compile + time `steps` train steps; returns (rays/s, hbm_gbps)."""
    import jax
    import jax.numpy as jnp

    from ucsa_neural_rendering_tpu.train import NeRFTrainer

    tr = NeRFTrainer(model, cfg, lr=1e-2, n_rays=n_rays, image_hw=(H, W))
    params, opt_state = tr.init(jax.random.key(0))
    grid = tr.init_occupancy() if use_occupancy else None

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

    samples = cfg.num_steps + cfg.upsample_steps
    # the backward's row count follows the MODEL's gradient estimator (its
    # stochastic_table_grad default applies in BOTH modes), not the
    # sampling mode — keying on use_occupancy overstated the dense step's
    # accounted traffic ~5x (r3 review fix)
    hbm_gbps = _table_traffic_bytes(
        n_rays, samples, model.n_levels, model.n_features,
        stochastic=model.stochastic_table_grad) / (dt / steps) / 1e9
    return n_rays * steps / dt, hbm_gbps, tr, params, grid, batch


def main():
    import jax
    import jax.numpy as jnp

    from ucsa_neural_rendering_tpu.models import SemanticNeRF
    from ucsa_neural_rendering_tpu.ops.renderer import RenderConfig

    H, W = 240, 320
    n_rays = int(os.environ.get("BENCH_RAYS", 4096))
    steps = int(os.environ.get("BENCH_STEPS", 10))
    dense_steps = int(os.environ.get("BENCH_DENSE_STEPS", 3))
    remat = {"0": False, "1": True}.get(os.environ.get("BENCH_REMAT", ""),
                                        "auto")

    # headline encoding geometry follows the SHIPPED config (single source
    # of truth: ucsa_neural_rendering_tpu/config/shipped.py — the quality
    # gate's promotion target; BENCH_ENC / BENCH_SFWD override, e.g. "16x2"
    # for the reference geometry; BENCH_SFWD: "1" = fully stochastic
    # forward (the accel-ladder knob), "fine" = stochastic fine levels
    # only, "face" = stratified face-sampled forward)
    from ucsa_neural_rendering_tpu.config import (SHIPPED_PROPOSAL,
                                                  SHIPPED_TRAIN_BUDGET,
                                                  shipped_enc_str,
                                                  shipped_sfwd_env)
    enc = os.environ.get("BENCH_ENC", shipped_enc_str())
    enc_L, enc_F = (int(x) for x in enc.split("x"))
    _sfwd_modes = {"0": False, "1": True, "fine": "fine", "face": "face"}
    _sfwd_env = os.environ.get("BENCH_SFWD", shipped_sfwd_env())
    if _sfwd_env not in _sfwd_modes:
        raise SystemExit(f"BENCH_SFWD={_sfwd_env!r}: expected one of "
                         f"{sorted(_sfwd_modes)}")
    sfwd = _sfwd_modes[_sfwd_env]
    model = SemanticNeRF(bound=4.0, num_semantic_classes=40,
                         n_levels=enc_L, n_features=enc_F,
                         stochastic_fwd=sfwd)

    # --- accelerated mode (the headline): the SHIPPED train budget +
    # placement (config/shipped.py; BENCH_BUDGET "32+32" / BENCH_PROP "0|1"
    # override for A/Bs) ---
    _budget_env = os.environ.get(
        "BENCH_BUDGET", "%d+%d" % SHIPPED_TRAIN_BUDGET)
    n_coarse, n_fine = (int(x) for x in _budget_env.split("+"))
    proposal = {None: SHIPPED_PROPOSAL, "0": False, "1": True}[
        os.environ.get("BENCH_PROP")]
    accel_cfg = RenderConfig(num_steps=n_coarse, upsample_steps=n_fine,
                             proposal_placement=proposal,
                             occ_candidates=128, remat=remat)
    accel_rays, accel_gbps, tr, params, grid, batch = _measure_fit(
        model, accel_cfg, n_rays, steps, True, H, W)

    # --- dense reference-parity mode: 256+256, no occupancy ---
    extras = {}
    # north-star ceiling arithmetic (VERDICT r4 #3): how close the measured
    # headline sits to the gather-floor ceiling of ITS OWN config
    # (scripts/northstar_ceiling.py; PERFORMANCE.md "North-star feasibility")
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "scripts"))
        from northstar_ceiling import config_ceiling
        ceil = config_ceiling(enc_L, enc_F, sfwd,
                              samples=n_coarse + n_fine)
        extras["headline_ceiling_rays_s"] = ceil["ceiling_rays_s"]
        extras["headline_ceiling_frac"] = round(
            accel_rays / ceil["ceiling_rays_s"], 3)
    except Exception as e:  # ceiling accounting is additive, never fatal
        extras["headline_ceiling_error"] = str(e)[:120]
    if os.environ.get("BENCH_SKIP_DENSE", "0") != "1":
        dense_cfg = RenderConfig(num_steps=256, upsample_steps=256,
                                 remat=remat)
        # dense parity ALWAYS measures the reference's exact model geometry
        # (16x2, network_tcnn_semantics.py:36-46) regardless of BENCH_ENC
        dense_model = SemanticNeRF(bound=4.0, num_semantic_classes=40)
        # NOTE: on TPU the dense step engages the default train packing
        # (train_packed_max_entries=2^21) — an exact relayout whose step is
        # bit-equal on the table / 1-ULP on MLP leaves (tests), i.e. the
        # SAME workload faster; the +25% r2->r3 dense delta is attributed
        # to it in PERFORMANCE.md.
        dense_rays, dense_gbps, *_ = _measure_fit(
            dense_model, dense_cfg, n_rays, dense_steps, False, H, W)
        extras["dense_rays_per_sec"] = round(dense_rays, 1)
        extras["dense_vs_baseline"] = round(
            dense_rays / BASELINE_RAYS_PER_SEC, 3)
        extras["dense_hbm_gbps"] = round(dense_gbps, 2)

    # full-frame render at the test/predict DEFAULT configuration (early-
    # stop at the train budget + cell-packed tables — what JointTrainer
    # uses for joint-phase pseudo-labels and predict dumps; the pipeline
    # bottleneck, VERDICT r1 #1)
    render_s = predict_s = None
    if os.environ.get("BENCH_RENDER", "1") == "1":
        import dataclasses

        from ucsa_neural_rendering_tpu.data.rays import get_rays
        rays = get_rays(batch["pose"], batch["intrinsics"], H, W)
        render = jax.jit(lambda p, g, pt: tr._render_image_impl(
            p, batch["pose"], batch["intrinsics"], rays, g, pt))
        tr.cfg = dataclasses.replace(accel_cfg, early_stop=True,
                                     stage1_steps=16, refine_fraction=0.25)
        packed = tr.packed_for(params)
        out = render(params, grid, packed)
        _ = float(jnp.sum(out["nerf_rgb"]))
        t0 = time.perf_counter()
        out = render(params, grid, packed)
        _ = float(jnp.sum(out["nerf_rgb"]))
        render_s = time.perf_counter() - t0
        extras["render_ms_per_frame"] = round(render_s * 1000, 1)

        # predict-phase render at the JointTrainer-derived fast default
        # (es8->16+16 k/8 — the budget the predict PNG dumps actually run)
        tr.cfg = dataclasses.replace(
            accel_cfg, early_stop=True, stage1_steps=8,
            num_steps=16, upsample_steps=16, refine_fraction=0.125)
        render_p = jax.jit(lambda p, g, pt: tr._render_image_impl(
            p, batch["pose"], batch["intrinsics"], rays, g, pt))
        packed = tr._packed_cache(params, tr.cfg)
        out = render_p(params, grid, packed)
        _ = float(jnp.sum(out["nerf_rgb"]))
        t0 = time.perf_counter()
        out = render_p(params, grid, packed)
        _ = float(jnp.sum(out["nerf_rgb"]))
        predict_s = time.perf_counter() - t0
        extras["predict_render_ms_per_frame"] = round(predict_s * 1000, 1)

    # --- per-scene adaptation wall-clock estimate (BASELINE.md tracked
    # metric; VERDICT r3 #6). Same protocol shape as the round-2 pipeline
    # baseline (scripts/bench_pipeline.py: 6-frame scene, 2 NeRF + 2 joint
    # epochs, bs 2, NeRF test + predict dumps) composed from THIS run's
    # measured phase times, so the driver gets a per-round trend without
    # bench.py paying the full stage's wall-clock. Components:
    #   nerf phase:   epochs * frames * train-step
    #   joint phase:  epochs * (frames/bs) * (bs renders + bs train-steps
    #                 + one seg Adam step, measured at bs*3 assembled imgs)
    #   tests:        2 passes * frames * test render
    #   predict:      frames * predict render
    # (occupancy refresh ~13 ms/step amortized is inside the step medians;
    # host dispatch overhead ~35 ms/dispatch is NOT modeled — the measured
    # 481 s round-2 stage vs this estimate quantifies it.)
    if render_s is not None and predict_s is not None and \
            os.environ.get("BENCH_STAGE_EST", "1") == "1":
        n_frames, bs_joint, nerf_ep, joint_ep = 6, 2, 2, 2
        step_s = n_rays / accel_rays
        seg_s = None
        try:
            from ucsa_neural_rendering_tpu.models import DeepLabV3
            from ucsa_neural_rendering_tpu.train.seg_trainer import SegTrainer
            seg_tr = SegTrainer(DeepLabV3(num_classes=40),
                                {"lr": 1e-5, "name": "Adam"})
            seg_state = seg_tr.init(jax.random.key(0), image_hw=(H, W))
            seg_img = jax.random.uniform(jax.random.key(3),
                                         (bs_joint * 3, H, W, 3))
            seg_lab = jnp.zeros((bs_joint * 3, H, W), jnp.int32)
            seg_state, loss, _ = seg_tr.train_step(seg_state, seg_img,
                                                   seg_lab, 1e-5)
            _ = float(loss)
            t0 = time.perf_counter()
            seg_state, loss, _ = seg_tr.train_step(seg_state, seg_img,
                                                   seg_lab, 1e-5)
            _ = float(loss)
            seg_s = time.perf_counter() - t0
            extras["seg_step_ms"] = round(seg_s * 1000, 1)
        except Exception as e:  # seg bench is additive, never fatal
            extras["seg_step_error"] = str(e)[:120]
        if seg_s is not None:
            est = (nerf_ep * n_frames * step_s
                   + joint_ep * (n_frames // bs_joint)
                   * (bs_joint * (render_s + step_s) + seg_s)
                   + 2 * n_frames * render_s
                   + n_frames * predict_s)
            extras["stage_seconds_est"] = round(est, 1)

    # measured stage wall-clock (VERDICT r4 #5): scripts/bench_pipeline.py
    # --out pipeline_bench.json records the real fresh-process stage on this
    # chip (orchestration + host IO + every phase); surfaced here with its
    # config + date so the driver's BENCH file carries the trend. The
    # composed stage_seconds_est above deliberately models device work only.
    pipe_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "pipeline_bench.json")
    if os.path.exists(pipe_path):
        try:
            with open(pipe_path) as f:
                pipe = json.load(f)
            extras["stage_seconds_measured"] = pipe.get("stage_seconds_warm")
            extras["stage_seconds_measured_cold"] = pipe.get(
                "stage_seconds_cold")
            extras["stage_measured_meta"] = {
                "date": pipe.get("measured_date"), **pipe.get("config", {})}
        except Exception as e:
            extras["stage_measured_error"] = str(e)[:120]

    print(json.dumps({
        "metric": "nerf_fit_rays_per_sec_per_chip",
        "value": round(accel_rays, 1),
        "unit": "rays/s",
        "headline_config": {"enc": enc, "sfwd": sfwd,
                            "sampling": ("prop" if proposal else "occ")
                                        + f"{n_coarse}+{n_fine}"},
        "vs_baseline": round(accel_rays / BASELINE_RAYS_PER_SEC, 3),
        "baseline_rays_per_sec": BASELINE_RAYS_PER_SEC,
        "baseline_source": BASELINE_SOURCE,
        "hbm_gbps": round(accel_gbps, 2),
        "hbm_roof_frac": round(accel_gbps / HBM_ROOF_GBPS, 5),
        **extras,
    }))


if __name__ == "__main__":
    main()


