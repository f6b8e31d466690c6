"""DeepLabV3 pretraining loop on scannet_frames_25k.

Equivalent of the reference's pretrain entry
(ref: scripts/pretrain.py:17-114 + nr4seg/lightning/
semantics_lightning_net.py + pretrain_data_module.py): train/val/test
datasets from the shipped split.npz, POLY LR schedule per epoch, best
checkpoint by val mean_IoU, resume support. Data parallelism runs over the
jax mesh (params replicated, batch sharded) instead of Lightning DDP; the
per-step metric all_gather becomes the device-side confusion matrix.
"""

import os

import jax
import numpy as np

from ..data import DataLoader, ScanNet, load_split
from ..metrics import SemanticsMeter
from ..models import DeepLabV3, seg_compute_dtype
from ..parallel import get_mesh, shard_batch
from .checkpoints import load_deeplab, save_deeplab, save_tree, load_tree
from ..utils.profiling import StepTimer, maybe_trace
from .experiment import seed_everything, setup_experiment
from .seg_trainer import SegTrainer, poly_lr_factor


def _pad_to(batch, size):
    """Pad (img, label) leading dim to `size` so shapes stay static and
    mesh-divisible. Pads repeat REAL images (wraparound) so BatchNorm batch
    statistics stay in-distribution — zero images would skew running stats —
    while pad labels of -1 keep them out of the loss and the confusion
    matrix."""
    img, label = batch
    n = img.shape[0]
    if n == size:
        return img, label, n
    reps = np.arange(size - n) % n
    img = np.concatenate([img, img[reps]], 0)
    label = np.concatenate(
        [label, np.full((size - n, *label.shape[1:]), -1, label.dtype)], 0)
    return img, label, n


def run_epoch(trainer, state, loader, batch_size, mesh, lr, meter, logger,
              mode, train=True, epoch=0, seed=0):
    losses = []
    # pad the batch to a mesh-divisible static size (ignore labels on pads)
    n_mesh = mesh.devices.size if mesh is not None else 1
    target = -(-batch_size // n_mesh) * n_mesh
    if train:
        # shuffle order + dropout keys are pure functions of (seed, epoch, i)
        # so resume-from-checkpoint replays the identical stream
        loader.set_epoch(epoch)
        epoch_key = jax.random.fold_in(jax.random.key(seed), epoch)
    for i, batch in enumerate(loader):
        img, label = batch[0], batch[1]
        img, label, n_real = _pad_to((img, label), target)
        if mesh is not None:
            img, label = shard_batch((img, label), mesh)
        if train:
            # n_real keeps the CE mean normalized by the REAL batch's
            # pixels — pads (−1 labels) are invisible to the reference
            state, loss, conf = trainer.train_step(
                state, img, label, lr,
                dropout_key=jax.random.fold_in(epoch_key, i), n_real=n_real)
            losses.append(float(loss))
            meter.update_confmat(conf)
        else:
            preds, _ = trainer.eval_step(state[0], state[1], img)
            meter.update(preds, label)
    if losses and logger is not None:
        logger.log({f"{mode}/loss": float(np.mean(losses))})
    return state


def train(exp: dict, env: dict, args, exp_cfg_path=None, env_cfg_path=None,
          model=None):
    """Full pretraining run. Returns final (state, best_miou)."""
    seed_everything(getattr(args, "seed", 123))
    from ..config.key_audit import audit_exp_keys
    audit_exp_keys(exp, "pretrain")
    if exp.get("model", {}).get("pretrained_backbone") and not (
            exp.get("trainer", {}).get("load_from_checkpoint")
            and exp["general"].get("checkpoint_load")):
        import warnings
        warnings.warn(
            "model.pretrained_backbone requested but torchvision ImageNet "
            "weights cannot be downloaded here and no checkpoint_load is "
            "set — the backbone will train FROM SCRATCH. Convert a torch "
            "checkpoint (scripts/convert_checkpoint.py) and point "
            "general.checkpoint_load at it to reproduce the reference's "
            "initialization.")
    model_path, logger = setup_experiment(
        exp, env, exp_cfg_path, env_cfg_path,
        getattr(args, "project_name", "pretrain"))

    cfg_dm = exp["data_module"]
    split = load_split(os.path.join(cfg_dm["root"],
                                    cfg_dm["data_preprocessing"]["split_file"]))
    output_size = tuple(exp.get("output_size", (240, 320)))
    mk = lambda key, mode: ScanNet(root=cfg_dm["root"], img_list=split[key],
                                   mode=mode, output_size=output_size)
    bs = cfg_dm["batch_size"]
    train_dl = DataLoader(mk("train", "train"), batch_size=bs,
                          shuffle=cfg_dm.get("shuffle", True),
                          drop_last=cfg_dm.get("drop_last", False),
                          seed=getattr(args, "seed", 123))
    val_dl = DataLoader(mk("val", "val"), batch_size=bs)
    test_dl = DataLoader(mk("test", "test"), batch_size=bs)

    mesh = get_mesh() if jax.device_count() > 1 else None
    model = model or DeepLabV3(num_classes=exp["model"]["num_classes"],
                               dtype=seg_compute_dtype(exp["model"]))
    trainer = SegTrainer(model, exp["optimizer"], mesh=mesh)
    state = trainer.init(jax.random.key(getattr(args, "seed", 123)),
                         image_hw=output_size)

    ckpt_load = exp["general"].get("checkpoint_load")
    if exp.get("trainer", {}).get("load_from_checkpoint") and ckpt_load:
        params, batch_stats = load_deeplab(ckpt_load)
        state = (params, batch_stats, trainer.tx.init(params))

    start_epoch = 0
    resume_dir = os.path.join(model_path, "last_ckpt")
    if exp.get("trainer", {}).get("resume_from_checkpoint") and \
            os.path.isdir(resume_dir):
        # restore with a structure target so the optax opt_state comes back
        # as its NamedTuple tree — Lightning's resume_from_checkpoint keeps
        # optimizer moments too (ref scripts/pretrain.py:97-101); re-initing
        # Adam here would silently reset them
        target = {"params": state[0], "batch_stats": state[1],
                  "opt_state": state[2], "epoch": np.zeros((), np.int64),
                  "best_miou": np.zeros((), np.float64)}
        try:
            tree = load_tree(resume_dir, target=target)
            # restore the best score too (Lightning ModelCheckpoint keeps
            # best_model_score across resume); restarting it at -1 would
            # let the first post-resume epoch overwrite best_ckpt with a
            # worse model
            resumed_best = float(tree["best_miou"])
        except Exception:
            # checkpoint written before best_miou was tracked: restore the
            # old structure rather than failing the resume outright
            target.pop("best_miou")
            tree = load_tree(resume_dir, target=target)
            resumed_best = -1.0
        state = (tree["params"], tree["batch_stats"], tree["opt_state"])
        start_epoch = int(tree["epoch"])
    else:
        resumed_best = -1.0

    sched = exp.get("lr_scheduler", {})
    max_epochs = exp["trainer"]["max_epochs"]
    init_lr = float(exp["optimizer"]["lr"])
    best_miou = resumed_best
    meters = {m: SemanticsMeter(exp["model"]["num_classes"])
              for m in ("train", "val", "test")}

    # opt-in profiler (ref: scripts/pretrain.py:89-94): jax trace of the
    # first post-resume epoch + per-epoch wall-clock log
    profile = bool(exp.get("trainer", {}).get("profiler", False))
    timer = StepTimer(os.path.join(model_path, "profile_steps.jsonl")
                      if profile else None)
    for epoch in range(start_epoch, max_epochs):
        if sched.get("active") and sched.get("name") == "POLY":
            p = sched["poly_cfg"]
            lr = poly_lr_factor(epoch, p["max_epochs"], p["power"], init_lr,
                                float(p["target_lr"]))
        else:
            lr = init_lr

        meters["train"].clear()
        with maybe_trace(profile and epoch == start_epoch,
                         os.path.join(model_path, "jax_trace")):
            state = run_epoch(trainer, state, train_dl, bs, mesh, lr,
                              meters["train"], logger, "train", train=True,
                              epoch=epoch, seed=getattr(args, "seed", 123))
        timer.tick("train_epoch", epoch=epoch)
        miou, tacc, macc = meters["train"].measure()
        logger.log({"train/mean_IoU": miou, "train/total_accuracy": tacc,
                    "train/mean_accuracy": macc, "lr": lr}, step=epoch)

        # validation cadence honors trainer.check_val_every_n_epoch (the
        # reference passes it into Trainer(**exp["trainer"]); 1 in the
        # shipped config). best-ckpt can only move on a val epoch, like
        # Lightning's val-monitored ModelCheckpoint
        check_val_every = max(1, int(exp.get("trainer", {}).get(
            "check_val_every_n_epoch", 1)))
        if (epoch + 1) % check_val_every == 0:
            meters["val"].clear()
            run_epoch(trainer, state, val_dl, bs, mesh, lr, meters["val"],
                      None, "val", train=False)
            miou, tacc, macc = meters["val"].measure()
            logger.log({"val/mean_IoU": miou, "val/total_accuracy": tacc,
                        "val/mean_accuracy": macc}, step=epoch)

            # best on val mean_IoU + last (ref pretrain.py:70-78)
            if miou > best_miou:
                best_miou = miou
                save_deeplab(os.path.join(model_path, "best_ckpt"), state[0],
                             state[1])
        # trainer.save_last=false disables the per-epoch resume anchor
        # (default True = the reference's ModelCheckpoint(save_last); the
        # R101+opt tree is ~700 MB per write — experiment harnesses on tiny
        # corpora opt out)
        if exp.get("trainer", {}).get("save_last", True):
            save_tree(resume_dir,
                      {"params": state[0], "batch_stats": state[1],
                       "opt_state": state[2],
                       "epoch": np.int64(epoch + 1),
                       "best_miou": np.float64(best_miou)})

    meters["test"].clear()
    run_epoch(trainer, state, test_dl, bs, mesh, init_lr, meters["test"],
              None, "test", train=False)
    miou, tacc, macc = meters["test"].measure()
    logger.log({"test/mean_IoU": miou, "test/total_accuracy": tacc,
                "test/mean_accuracy": macc})
    logger.close()
    return state, best_miou
