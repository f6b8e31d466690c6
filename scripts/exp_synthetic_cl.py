#!/usr/bin/env python
"""Multi-stage continual-learning experiment on synthetic scenes.

The reference's headline experiment (ref: scripts/cl_deeplab.py:11-91,
BASELINE.md) is a 10-scene ScanNet continual-learning run: pretrain DeepLab
on scannet_frames_25k, then per scene fit a Semantic-NeRF on the seg model's
pseudo-labels, joint-train with rendered replay, and track per-scene val
mIoU over stages. No ScanNet data exists in this environment, so this
script reproduces the experiment's STRUCTURE end-to-end on analytic cube
rooms (`data.synthetic.scene_palette` variants): each stage's scene has six
wall classes and colors no earlier stage saw, so stability (old-scene mIoU)
and plasticity (new-scene mIoU) are both measurable, with and without
replay.

Phases (one process per phase/stage — see PERFORMANCE.md round-3 note on
long-lived-process degradation through the axon tunnel):

  python scripts/exp_synthetic_cl.py --phase data
  python scripts/exp_synthetic_cl.py --phase pretrain
  python scripts/exp_synthetic_cl.py --phase stage --stage-idx 0
  ...
  python scripts/exp_synthetic_cl.py --phase report

or `--phase all` to run everything in one process (CPU-sized runs).
Results land in <root>/experiments/<arm>/stage_i/metrics.jsonl and the
report phase assembles the stage x scene mIoU matrix into
<root>/experiments/report_<arm>.json.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_hw(s):
    h, w = s.lower().split("x")
    return int(h), int(w)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/ucsa_cl_exp")
    p.add_argument("--phase", default="all",
                   choices=["data", "pretrain", "stage", "report", "all"])
    p.add_argument("--stage-idx", type=int, default=None,
                   help="with --phase stage: which stage to run")
    p.add_argument("--scenes", type=int, default=3)
    p.add_argument("--hw", type=parse_hw, default=(240, 320),
                   help="HxW, e.g. 240x320 (TPU) or 48x64 (CPU)")
    p.add_argument("--frames", type=int, default=8, help="frames per scene")
    p.add_argument("--tiny", action="store_true",
                   help="tiny seg backbone + small NeRF (CPU-sized)")
    p.add_argument("--seg-tiny", action="store_true",
                   help="tiny seg backbone but FULL-SIZE NeRF + budgets: "
                        "the render-config quality gate varies the NeRF "
                        "side, and a from-scratch R101 cannot reach a "
                        "useful operating point on the tiny synthetic "
                        "corpus (no ImageNet init here)")
    p.add_argument("--replay", choices=["on", "off"], default="on",
                   help="CL replay arm: rendered replay + 25k fraction (the "
                        "reference protocol) vs naive finetuning")
    p.add_argument("--enc", default="16x2",
                   help="hash-encoding geometry LxF at constant L*F=32 "
                        "output (full-size arms only): 16x2 (reference), "
                        "8x4, 4x8 — the row-count lever measured by "
                        "scripts/bench_encoding_variants.py")
    p.add_argument("--render-arm",
                   choices=["accel", "dense", "ladder", "face", "proposal"],
                   default="accel",
                   help="render/train configuration arm for the quality "
                        "gate (round-4 verdict #1): 'accel' = occupancy "
                        "32+32 (the shipped default), 'dense' = the "
                        "reference's 256+256 stratified+importance with "
                        "occupancy off, 'ladder' = accel + fully "
                        "stochastic-forward encoding (the 26k rays/s "
                        "train knob, PERFORMANCE.md accel ladder), "
                        "'face' = accel + stratified face-sampled "
                        "forward (4 rows, exact bilinear face blend), "
                        "'proposal' = grid-density proposal placement of "
                        "--occ-steps TOTAL samples in one draw, one "
                        "full-model pass (VERDICT r4 #4)")
    p.add_argument("--occ-steps", type=int, default=32,
                   help="occupancy-sampling budget per pass (coarse AND "
                        "refine): 32 = the shipped 32+32 default; 24/16 = "
                        "the reduced-budget gate arms (rows scale linearly "
                        "with the budget; VERDICT r4 #2)")
    p.add_argument("--pretrain-epochs", type=int, default=30)
    p.add_argument("--pretrain-lr", type=float, default=1e-3,
                   help="the reference pretrains at 1e-4 for 150 epochs on "
                        "25k images; the tiny synthetic corpus needs a "
                        "hotter schedule to reach a comparable operating "
                        "point in hundreds of steps")
    p.add_argument("--nerf-epochs", type=int, default=15)
    p.add_argument("--joint-epochs", type=int, default=5)
    p.add_argument("--frame-gain", type=float, default=0.25,
                   help="per-frame exposure gain range (U(1-g,1+g)) — makes "
                        "pseudo-label errors view-dependent so NeRF fusion "
                        "has something to denoise")
    p.add_argument("--pixel-noise", type=float, default=0.05)
    p.add_argument("--lr-seg", type=float, default=1e-5,
                   help="joint-stage seg LR (reference cl_base.yml: 1e-5)")
    p.add_argument("--lr-nerf", type=float, default=1e-2)
    p.add_argument("--seed", type=int, default=123)
    return p.parse_args()


def scene_names(n):
    return [f"scene{i:04d}_00" for i in range(n)]


def arm_name(a):
    base = f"cl_replay_{a.replay}"
    if a.render_arm != "accel":
        base += f"_{a.render_arm}"
    if getattr(a, "enc", "16x2") != "16x2":
        base += f"_enc{a.enc}"
    if getattr(a, "occ_steps", 32) != 32:
        base += f"_occ{a.occ_steps}"
    return base


def env_dict(a):
    return {"results": os.path.join(a.root, "experiments"),
            "scannet": os.path.join(a.root, "scans"),
            "scannet_frames_25k": os.path.join(a.root, "frames25k")}


def models_for(a, num_classes=40):
    """(seg_model, trainer_kwargs-for-joint). Full-size by default; --tiny
    swaps the structurally-identical small layouts used by the test suite."""
    from ucsa_neural_rendering_tpu.models import DeepLabV3, SemanticNeRF
    # the ladder arm trains with the fully stochastic-forward encoding
    # (PERFORMANCE.md accel ladder: 26.3k rays/s vs 13.9k exact); the face
    # arm uses the stratified one-axis face estimator (half the rows of
    # exact at strictly lower variance than ladder)
    sfwd = {"ladder": True, "face": "face"}.get(
        getattr(a, "render_arm", "accel"), False)
    if a.tiny:
        from ucsa_neural_rendering_tpu.models import TINY_LAYOUT
        seg = DeepLabV3(num_classes=num_classes, backbone_layout=TINY_LAYOUT,
                        aspp_channels=32, head_channels=32)
        nerf = SemanticNeRF(bound=1.0, num_semantic_classes=num_classes,
                            n_levels=8, log2_hashmap_size=15,
                            stochastic_fwd=sfwd)
        n_rays = 1024
    else:
        L, F = (int(x) for x in getattr(a, "enc", "16x2").split("x"))
        if getattr(a, "seg_tiny", False):
            from ucsa_neural_rendering_tpu.models import TINY_LAYOUT
            seg = DeepLabV3(num_classes=num_classes,
                            backbone_layout=TINY_LAYOUT,
                            aspp_channels=32, head_channels=32)
        else:
            seg = DeepLabV3(num_classes=num_classes)
        nerf = SemanticNeRF(bound=4.0, num_semantic_classes=num_classes,
                            n_levels=L, n_features=F, stochastic_fwd=sfwd)
        n_rays = 4096
    return seg, {"seg_model": seg, "nerf_model": nerf, "n_rays": n_rays}


def render_cfg_for(a):
    from ucsa_neural_rendering_tpu.ops.renderer import RenderConfig
    h, w = a.hw
    if getattr(a, "render_arm", "accel") == "dense":
        # the reference's dense stratified+importance budget (occupancy off
        # via exp["nerf"]["use_occupancy"] in joint_exp)
        if a.tiny:
            return RenderConfig(num_steps=64, upsample_steps=64,
                                max_ray_batch=h * w)
        return RenderConfig(num_steps=256, upsample_steps=256)
    if getattr(a, "render_arm", "accel") == "proposal":
        # --occ-steps is the TOTAL budget here, split 3:1 between the
        # grid-CDF proposal placement and a small importance refine —
        # measured (tests/test_proposal_placement.py A/B): proposal-only
        # keeps PSNR but loses label sharpness; a small fine pass restores
        # it at a fraction of the incumbent's 32+32 row count
        if a.tiny:
            return RenderConfig(num_steps=18, upsample_steps=6,
                                proposal_placement=True, max_ray_batch=h * w)
        total = getattr(a, "occ_steps", 32)
        return RenderConfig(num_steps=max(1, total * 3 // 4),
                            upsample_steps=total // 4,
                            proposal_placement=True)
    if a.tiny:
        return RenderConfig(num_steps=24, upsample_steps=24,
                            max_ray_batch=h * w)
    s = getattr(a, "occ_steps", 32)
    return RenderConfig(num_steps=s, upsample_steps=s)


def phase_data(a):
    from ucsa_neural_rendering_tpu.data.splits import create_split, save_split
    from ucsa_neural_rendering_tpu.data.synthetic import (
        write_synthetic_25k_dir, write_synthetic_scene_dir)
    env = env_dict(a)
    h, w = a.hw
    assert a.scenes <= 6, "7+ scenes wrap the 7 class families"
    # CL scenes are variants 1..N; the pretrain/replay corpus holds their
    # family TWINS (k+7, k+14): same classes, different color jitter — so
    # the pretrained model transfers imperfectly to each CL scene, like a
    # 25k-pretrained DeepLab on an unseen ScanNet room
    cl_variants = list(range(1, a.scenes + 1))
    corpus_variants = [k + 7 for k in cl_variants] + \
                      [k + 14 for k in cl_variants]
    for i, scene in enumerate(scene_names(a.scenes)):
        write_synthetic_scene_dir(env["scannet"], scene, n_frames=a.frames,
                                  H=h, W=w, variant=cl_variants[i],
                                  frame_gain=a.frame_gain,
                                  pixel_noise=a.pixel_noise)
    os.makedirs(env["scannet_frames_25k"], exist_ok=True)
    write_synthetic_25k_dir(env["scannet_frames_25k"],
                            n_scenes=len(corpus_variants),
                            n_frames_per_scene=a.frames, H=h, W=w,
                            variants=corpus_variants,
                            frame_gain=a.frame_gain,
                            pixel_noise=a.pixel_noise)
    split = create_split(env["scannet_frames_25k"], val_ratio=0.25,
                         seed=a.seed)
    for name in ("split.npz", "split_cl.npz"):
        save_split(split, os.path.join(env["scannet_frames_25k"], name))
    print(f"[data] {a.scenes} scenes @ {h}x{w}, {a.frames} frames each, "
          f"25k corpus + splits under {a.root}")


def pretrain_exp(a):
    return {
        "general": {"name": "pretrain25k", "clean_up_folder_if_exists": True,
                    "checkpoint_load": None},
        "model": {"num_classes": 40},
        # the reference's pretrain yaml shape: Adam + POLY to 1e-6 (lr
        # rescaled for the synthetic corpus via --pretrain-lr)
        "optimizer": {"lr": a.pretrain_lr, "name": "Adam"},
        "lr_scheduler": {"active": True, "name": "POLY",
                         "poly_cfg": {"power": 0.9,
                                      "max_epochs": a.pretrain_epochs,
                                      "target_lr": 1e-6}},
        "trainer": {"max_epochs": a.pretrain_epochs,
                    # no 700 MB-per-epoch resume anchors on the tiny corpus
                    "save_last": False},
        "data_module": {"root": env_dict(a)["scannet_frames_25k"],
                        "batch_size": 4, "drop_last": False,
                        "data_preprocessing": {"split_file": "split.npz"}},
        "output_size": list(a.hw),
    }


def phase_pretrain(a):
    from ucsa_neural_rendering_tpu.train import pretrain_loop
    seg, _ = models_for(a)
    args = argparse.Namespace(seed=a.seed, project_name="pretrain")
    pretrain_exp_d = pretrain_exp(a)
    pretrain_loop.train(pretrain_exp_d, env_dict(a), args, model=seg)
    print("[pretrain] done ->",
          os.path.join(env_dict(a)["results"], "pretrain25k"))


def joint_exp(a, stage_i):
    env = env_dict(a)
    arm = arm_name(a)
    replay = a.replay == "on"
    exp = {
        "general": {"name": f"{arm}/stage_{stage_i}",
                    "clean_up_folder_if_exists": True,
                    "load_pretrain": stage_i == 0},
        "model": {"num_classes": 40},
        "lr_scheduler": {"active": False},
        # reference multi_step cl_base.yml: Adam, lr_seg 1e-5, lr_nerf 1e-2
        "optimizer": {"lr_seg": a.lr_seg, "lr_nerf": a.lr_nerf,
                      "name": "Adam"},
        "trainer": {"max_epochs": a.joint_epochs,
                    "resume_from_checkpoint": False,
                    "load_from_checkpoint": True,
                    # no resume anchors in the experiment harness: per-epoch
                    # R101 params+opt orbax writes would dominate the tiny
                    # stages' wall-clock
                    "save_last": False},
        "data_module": {"batch_size": 2, "shuffle": True, "num_workers": 0,
                        "drop_last": True,
                        "data_preprocessing": {"split_file": "split.npz",
                                               "split_file_cl":
                                                   "split_cl.npz"}},
        "visualizer": {"store": False,
                       "store_n": {"train": 0, "val": 0, "test": 0}},
        "scenes": scene_names(stage_i + 1),
        "cl": {"active": replay, "25k_fraction": 1.0,
               "ngp_25k_ratio": 1, "use_novel_viewpoints": False,
               "replay_buffer_size": 100 if replay else 0},
        "output_size": list(a.hw),
        "exp_name": arm,
        # dense arm = reference-parity sampling (occupancy placement off)
        "nerf": {"use_occupancy": a.render_arm != "dense"},
    }
    if stage_i == 0:
        exp["general"]["checkpoint_load"] = os.path.join(
            env["results"], "pretrain25k", "best_ckpt")
    else:
        exp["general"]["checkpoint_load"] = os.path.join(
            env["results"], arm, f"stage_{stage_i - 1}", "deeplab_ckpt")
    return exp


def phase_stage(a, stage_i):
    from ucsa_neural_rendering_tpu.metrics import SemanticsMeter
    from ucsa_neural_rendering_tpu.train import joint_loop
    _, tkw = models_for(a)
    exp = joint_exp(a, stage_i)
    env = env_dict(a)
    args = argparse.Namespace(exp_name=arm_name(a), seed=a.seed,
                              fix_nerf=False, nerf_train_epoch=a.nerf_epochs,
                              joint_train_epoch=a.joint_epochs,
                              project_name="cl_exp")
    _, seg_state = joint_loop.train(exp, env, args,
                                    render_cfg=render_cfg_for(a),
                                    val_scene_list=scene_names(a.scenes),
                                    trainer_kwargs=tkw)
    # end-of-stage model quality on EVERY scene's val split (the stage's own
    # in-loop val runs every 10 joint epochs like the reference; the CL
    # matrix needs the final model regardless of epoch count)
    exp_eval = dict(exp, scenes=scene_names(a.scenes))
    trainer = joint_loop.JointTrainer(exp_eval, image_hw=a.hw,
                                      num_classes=40,
                                      render_cfg=render_cfg_for(a), **tkw)
    dm = joint_loop.build_datamodule(exp_eval, env, a.hw,
                                     val_scene_list=scene_names(a.scenes),
                                     seed=a.seed)
    results = joint_loop.validate_seg(trainer, seg_state, dm["val"],
                                      lambda: SemanticsMeter(40), None,
                                      "final")
    final = {scene: {"mIoU": m, "total_acc": t, "mean_acc": c}
             for scene, (m, t, c) in results.items()}
    dst = os.path.join(env["results"], arm_name(a), f"stage_{stage_i}",
                       "final_val.json")
    with open(dst, "w") as f:
        json.dump(final, f, indent=2)
    print(f"[stage {stage_i}] final per-scene val mIoU:",
          {s: round(v["mIoU"], 4) for s, v in final.items()})


def phase_report(a):
    """Assemble the stage x scene val-mIoU matrix from each stage's
    metrics.jsonl (last val_e* entry per scene wins = end-of-stage model)."""
    env = env_dict(a)
    arm = arm_name(a)
    scenes = scene_names(a.scenes)
    matrix = {}
    for i in range(a.scenes):
        stage_dir = os.path.join(env["results"], arm, f"stage_{i}")
        final = os.path.join(stage_dir, "final_val.json")
        if not os.path.exists(final):
            print(f"[report] missing {final}; ran --phase stage "
                  f"--stage-idx {i}?")
            continue
        with open(final) as f:
            row = {s: v["mIoU"] for s, v in json.load(f).items()}
        matrix[f"stage_{i}"] = row
    out = {"arm": arm, "hw": list(a.hw), "scenes": scenes,
           "frames_per_scene": a.frames, "tiny": a.tiny,
           "pretrain_epochs": a.pretrain_epochs,
           "nerf_epochs": a.nerf_epochs, "joint_epochs": a.joint_epochs,
           "val_mIoU": matrix}
    # summary scalars: plasticity = mean mIoU on each stage's NEW scene at
    # that stage; stability = mean mIoU on PREVIOUS scenes at the final stage
    news, olds = [], []
    for i in range(a.scenes):
        row = matrix.get(f"stage_{i}", {})
        if scenes[i] in row:
            news.append(row[scenes[i]])
    last = matrix.get(f"stage_{a.scenes - 1}", {})
    for s in scenes[:-1]:
        if s in last:
            olds.append(last[s])
    out["new_scene_mIoU_mean"] = sum(news) / len(news) if news else None
    out["old_scene_final_mIoU_mean"] = (sum(olds) / len(olds)
                                        if olds else None)
    dst = os.path.join(env["results"], f"report_{arm}.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    print("[report] ->", dst)


def main():
    a = parse_args()
    # honor JAX_PLATFORMS=cpu via live config too: the axon plugin's device
    # discovery ignores the env var and can block behind another process's
    # chip claim (PERFORMANCE.md round-3 environment notes)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    if a.phase in ("data", "all"):
        phase_data(a)
    if a.phase in ("pretrain", "all"):
        phase_pretrain(a)
    if a.phase == "stage":
        assert a.stage_idx is not None, "--phase stage needs --stage-idx"
        phase_stage(a, a.stage_idx)
    elif a.phase == "all":
        for i in range(a.scenes):
            phase_stage(a, i)
    if a.phase in ("report", "all"):
        phase_report(a)


if __name__ == "__main__":
    main()
