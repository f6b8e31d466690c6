"""Segmentation fine-tuning on NeRF-rendered pseudo-labels.

Equivalent of the reference's finetune entry (ref: scripts/
train_finetune.py:17-118 + nr4seg/lightning/finetune_data_module.py):
val on gt/gt pairs of the scene's last 20% frames, train on NeRF renders
(`train_image`/`train_label` = "nerf"), optionally mixed with 25k replay
via ScanNetCL; phase order validate → test → fit → test.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data import (DataLoader, ScanNet, ScanNetCL, ScanNetNGP, load_split)
from ..metrics import SemanticsMeter
from ..models import DeepLabV3, seg_compute_dtype
from .checkpoints import load_deeplab, load_tree, save_deeplab, save_tree
from .seg_eval import build_test_25k, eval_25k
from .experiment import seed_everything, setup_experiment
from .pretrain_loop import run_epoch
from .seg_trainer import SegTrainer


def _eval_per_scene(trainer, state, dataset, num_classes, logger, prefix):
    meters = {}
    for i in range(len(dataset)):
        item = dataset[i]
        img, label, scene = item[0], item[1], item[3]
        preds, _ = trainer.eval_step(state[0], state[1],
                                     jnp.asarray(img)[None])
        meters.setdefault(scene, SemanticsMeter(num_classes)).update(
            preds[0], jnp.asarray(label))
    out = {}
    for scene, meter in meters.items():
        miou, tacc, macc = meter.measure()
        out[scene] = (miou, tacc, macc)
        if logger is not None:
            logger.log({f"{prefix}/mean_IoU_{scene}": miou,
                        f"{prefix}/total_accuracy_{scene}": tacc})
    return out


def _eval_25k(trainer, state, dataset, num_classes, logger, tag):
    """25k generalization test (ref scripts/train_finetune.py:115-118 runs
    trainer.test on `scannet_test_gen` before and after fitting,
    finetune_data_module.py:109-117). Shared batched loop: seg_eval.py."""
    miou, tacc, macc = eval_25k(
        lambda im: trainer.eval_step(state[0], state[1], im)[0],
        dataset, num_classes)
    if logger is not None:
        logger.log({f"test/25k_mean_IoU_{tag}": miou,
                    f"test/25k_total_accuracy_{tag}": tacc,
                    f"test/25k_mean_accuracy_{tag}": macc})
    return miou, tacc, macc


def train(exp, env, args, exp_cfg_path=None, env_cfg_path=None,
          prev_exp_name="one_step_nerf_only", model=None):
    seed_everything(args.seed)
    from ..config.key_audit import audit_exp_keys
    audit_exp_keys(exp, "finetune")
    model_path, logger = setup_experiment(
        exp, env, exp_cfg_path, env_cfg_path,
        getattr(args, "project_name", "finetune"))

    num_classes = exp["model"]["num_classes"]
    output_size = tuple(exp.get("output_size", (240, 320)))
    cfg_dm = exp["data_module"]
    scenes = exp["scenes"]

    val_ds = ScanNetNGP(root=env["scannet"], mode="val", val_mode="gtgt",
                        scene_list=scenes, output_size=output_size)
    # seed threads through so --seed changes augmentation/"half"-mode/replay
    # streams too (the reference's seed_everything reseeds all of these)
    train_ds = ScanNetNGP(root=env["scannet"], mode="train",
                          train_image=cfg_dm.get("train_image", "nerf"),
                          train_label=cfg_dm.get("train_label", "nerf"),
                          scene_list=scenes, prev_exp_name=prev_exp_name,
                          output_size=output_size, seed=args.seed)
    collate = None
    if exp["cl"].get("active"):
        split = load_split(os.path.join(
            env["scannet_frames_25k"],
            cfg_dm["data_preprocessing"]["split_file_cl"]))
        img_list_cl = split["train_cl"]
        img_list_cl = img_list_cl[:int(exp["cl"]["25k_fraction"]
                                       * len(img_list_cl))]
        scannet_25k = ScanNet(root=env["scannet_frames_25k"],
                              img_list=img_list_cl, mode="train",
                              output_size=output_size, seed=args.seed)
        train_ds = ScanNetCL(scannet_25k, train_ds,
                             ngp_25k_ratio=exp["cl"]["ngp_25k_ratio"],
                             seed=args.seed)
        collate = ScanNetCL.collate

    bs = cfg_dm["batch_size"]
    # shuffle/drop_last are hardcoded like the reference's finetune train
    # loader (ref finetune_data_module.py:90-91); the data_module.shuffle /
    # drop_last YAML keys are consumed by the PRETRAIN entry only
    # (ref pretrain_data_module.py:39-40)
    train_dl = DataLoader(train_ds, batch_size=bs, shuffle=True,
                          drop_last=True, collate_fn=collate, seed=args.seed)

    # finetune stays single-device-jit (per-scene data is small and the val
    # path runs bs=1 frames, which an 8-way data sharding can't split); the
    # pretrain loop is the multi-device seg workload, as in the reference
    model = model or DeepLabV3(num_classes=num_classes,
                               dtype=seg_compute_dtype(exp["model"]))
    trainer = SegTrainer(model, exp["optimizer"])
    state = trainer.init(jax.random.key(args.seed), image_hw=output_size)

    if exp.get("trainer", {}).get("load_from_checkpoint") and \
            exp["general"].get("checkpoint_load"):
        params, batch_stats = load_deeplab(exp["general"]["checkpoint_load"])
        params = jax.tree.map(jnp.asarray, params)
        batch_stats = jax.tree.map(jnp.asarray, batch_stats)
        state = (params, batch_stats, trainer.tx.init(params))

    # per-epoch last checkpoint + resume (the reference's
    # ModelCheckpoint(save_last=True) + resume_from_checkpoint,
    # ref scripts/train_finetune.py:62-91); shuffle/augmentation/dropout
    # streams are pure functions of (seed, epoch, i), so a resumed run
    # replays the uninterrupted trajectory
    last_dir = os.path.join(model_path, "last_ckpt")
    save_last = bool(exp.get("trainer", {}).get("save_last", True))
    start_epoch = 0
    resume = exp.get("trainer", {}).get("resume_from_checkpoint")
    if resume:
        rdir = resume if isinstance(resume, str) else last_dir
        if os.path.isdir(rdir):
            target = {"params": state[0], "batch_stats": state[1],
                      "opt_state": state[2], "epoch": np.zeros((), np.int64)}
            tree = load_tree(rdir, target=target)
            state = (tree["params"], tree["batch_stats"], tree["opt_state"])
            start_epoch = int(tree["epoch"])
            print(f"[finetune] resumed from {rdir} at epoch {start_epoch}",
                  flush=True)
        else:
            print(f"[finetune] resume requested but no checkpoint at "
                  f"{rdir}; starting fresh", flush=True)

    # validate → test → fit → test (ref train_finetune.py:115-118); the
    # 25k generalization test runs when the split file exists on disk.
    # The pre-fit evals are skipped on resume (they only log)
    test_25k = build_test_25k(exp, env, output_size)
    if start_epoch == 0:
        _eval_per_scene(trainer, state, val_ds, num_classes, logger,
                        "val_pre")
        if test_25k is not None:
            _eval_25k(trainer, state, test_25k, num_classes, logger, "pre")

    lr = float(exp["optimizer"]["lr"])
    meter = SemanticsMeter(num_classes)
    # the effective train batch grows by ngp_25k_ratio when CL is active
    eff_bs = bs * (1 + exp["cl"].get("ngp_25k_ratio", 0)) \
        if exp["cl"].get("active") else bs
    for epoch in range(start_epoch, exp["trainer"]["max_epochs"]):
        meter.clear()
        # epoch/seed thread through so each epoch reshuffles and draws fresh
        # dropout keys (the stream is a pure function of (seed, epoch, i))
        state = run_epoch(trainer, state, train_dl, eff_bs, None, lr, meter,
                          logger, "train", train=True, epoch=epoch,
                          seed=args.seed)
        miou, tacc, _ = meter.measure()
        logger.log({"train/mean_IoU": miou, "train/total_accuracy": tacc},
                   step=epoch)
        if save_last:
            save_tree(last_dir, {"params": state[0], "batch_stats": state[1],
                                 "opt_state": state[2],
                                 "epoch": np.int64(epoch + 1)})

    _eval_per_scene(trainer, state, val_ds, num_classes, logger, "val")
    if test_25k is not None:
        _eval_25k(trainer, state, test_25k, num_classes, logger, "post")
    save_deeplab(os.path.join(model_path, "deeplab_ckpt"), state[0], state[1])
    logger.close()
    return state
