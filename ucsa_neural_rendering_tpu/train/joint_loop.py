"""One adaptation stage: NeRF fit → joint training → predict dumps.

Equivalent of the reference's train_joint entry
(ref: scripts/train_joint.py:47-186) and the Lightning epoch plumbing around
`JointTrainLightningNet`:
  phase order = NeRF-only fit (nerf_train_epoch epochs) → NeRF test on the
  train split → seg validation → joint fit (joint_train_epoch epochs, val
  every 10) → NeRF test → predict (pseudo-label/replay PNG dumps) → save
  `deeplab_ckpt` for the next stage.
"""

import os
import shutil

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..data import DataLoader, ScanNet, ScanNetCLJoint, ScanNetNGPJoint, load_split
from ..metrics import SemanticsMeter
from ..ops.renderer import RenderConfig
from ..utils.profiling import StepTimer, maybe_trace
from ..viz import Visualizer
from ..viz.colormaps import NYU40_COLOUR_CODE
from .checkpoints import load_deeplab, load_tree, save_deeplab, save_tree
from .experiment import seed_everything, setup_experiment
from .joint_trainer import JointTrainer
from .seg_eval import build_test_25k, eval_25k

PREDICT_SUBFOLDERS = ("nerf_image", "nerf_label", "nerf_label_vis",
                      "seg_label", "seg_label_vis")


def render_cfgs_from_exp(exp):
    """(train RenderConfig, test RenderConfig | None, predict RenderConfig
    | None) from the optional `renderer:` block of an experiment YAML — an
    extension over the reference's config surface; defaults match the
    reference's 256+256 budget. Any RenderConfig field passes through
    verbatim; `test_`-prefixed keys configure the full-frame test/predict
    renders separately (e.g. test_num_steps, test_early_stop), and
    `predict_`-prefixed keys configure the predict PNG-dump phase on top
    of the resolved test config (e.g. the measured fast knob
    predict_stage1_steps: 8 / predict_num_steps: 16 — PERFORMANCE.md
    round-3 render table). As before, test_num_steps without
    test_upsample_steps implies a symmetric test budget (same for
    predict_)."""
    from dataclasses import fields
    r = dict(exp.get("renderer", {}))
    types = {f.name: f.type for f in fields(RenderConfig)}
    known = set(types)

    def coerce(k, v):
        # YAML values pass by field type: a quoted number ("256") becomes
        # an int/float instead of surfacing as an opaque trace-time error
        # (bools pass through: bool("false") would be True). f.type is the
        # class object here (renderer.py has no string annotations), but
        # accept the string form too in case that ever changes.
        t = {"int": int, "float": float, int: int, float: float}.get(types[k])
        return t(v) if t is not None and not isinstance(v, bool) else v

    def prefixed(prefix):
        return {k[len(prefix):]: coerce(k[len(prefix):], v)
                for k, v in r.items()
                if k.startswith(prefix) and k[len(prefix):] in known}

    unknown = [k for k in r
               if k not in known
               and not any(k.startswith(p) and k[len(p):] in known
                           for p in ("test_", "predict_"))]
    if unknown:
        import warnings
        warnings.warn(f"renderer config keys not recognized: {unknown} "
                      f"(known: sorted RenderConfig fields, optionally "
                      f"test_- or predict_-prefixed)")
    base = {k: coerce(k, v) for k, v in r.items() if k in known}
    base.setdefault("num_steps", 256)
    base.setdefault("upsample_steps", 256)
    test = prefixed("test_")
    test_cfg = None
    if test:
        test.setdefault("upsample_steps",
                        test.get("num_steps", base["upsample_steps"]))
        test_cfg = RenderConfig(**{**base, **test})
    predict = prefixed("predict_")
    predict_cfg = None
    if predict:
        predict.setdefault("upsample_steps",
                           predict.get("num_steps",
                                       (test or base)["upsample_steps"]))
        predict_cfg = RenderConfig(**{**base, **test, **predict})
    return RenderConfig(**base), test_cfg, predict_cfg


def nerf_model_from_exp(exp, num_classes):
    """SemanticNeRF from the optional `nerf:` YAML block — the TPU
    extension surface over the reference's fixed tcnn config
    (network_tcnn_semantics.py:36-46). Consumed keys are enumerated in
    config/key_audit.py (_ENTRY_CONSUMED['joint']); stochastic_fwd values
    are validated here so a typo'd mode fails loudly instead of training
    a different estimator than intended."""
    from ..config import SHIPPED_NERF_ENC, SHIPPED_NERF_SFWD
    from ..models import SemanticNeRF
    n = exp.get("nerf", {})
    # defaults follow the SHIPPED configuration (config/shipped.py — the
    # quality gate's promotion target), so an exp without explicit nerf
    # keys trains the same program bench.py measures and entry() compiles
    sfwd = n.get("stochastic_fwd", SHIPPED_NERF_SFWD)
    if sfwd not in (False, True, "fine", "face"):
        raise ValueError(
            f"nerf.stochastic_fwd={sfwd!r}: expected false, true, "
            f"'fine', or 'face' (models/semantic_nerf.py)")
    return SemanticNeRF(
        bound=float(n.get("bound", 4.0)),
        num_semantic_classes=num_classes,
        n_levels=int(n.get("n_levels", SHIPPED_NERF_ENC[0])),
        n_features=int(n.get("n_features", SHIPPED_NERF_ENC[1])),
        log2_hashmap_size=int(n.get("log2_hashmap_size", 19)),
        stochastic_table_grad=bool(n.get("stochastic_table_grad", True)),
        stochastic_fwd=sfwd)


def _stage_state_tree(done, nerf_state, seg_state, occ_grid, key, occ_step,
                      occ_slab):
    """Full mid-stage training state as one checkpoint tree: both models'
    params AND optimizer states, the occupancy grid, the threaded PRNG key,
    and the epoch counters. This is what the reference's Lightning
    `ModelCheckpoint(save_last=True)` captures every epoch
    (ref scripts/train_joint.py:90-94); everything the RNG touches is a pure
    function of (seed, epoch, index) here, so restoring this tree and
    re-pinning the loader epoch reproduces the uninterrupted trajectory."""
    # counters as 0-d arrays: orbax's target-structure restore rejects bare
    # numpy scalars as template leaves
    tree = {"done": np.asarray(done, np.int64),
            "occ_step": np.asarray(occ_step, np.int64),
            "occ_slab": np.asarray(occ_slab, np.int64),
            "key": np.asarray(jax.random.key_data(key)),
            "nerf_params": nerf_state[0], "nerf_opt": nerf_state[1],
            "seg_params": seg_state[0], "seg_stats": seg_state[1],
            "seg_opt": seg_state[2]}
    if occ_grid is not None:
        tree["occ_grid"] = occ_grid
    return tree


def _save_stage_state(path, *args):
    save_tree(path, _stage_state_tree(*args))


def _restore_stage_state(path, nerf_state, seg_state, occ_grid, key):
    """Load a `last_ckpt` written by `_save_stage_state`, using the current
    (freshly initialized) states as the structure target so optax opt_states
    come back as their NamedTuple trees. Returns
    (done, nerf_state, seg_state, occ_grid, key, occ_step, occ_slab)."""
    template = _stage_state_tree(0, nerf_state, seg_state, occ_grid, key,
                                 0, 0)
    tree = load_tree(path, target=template)
    # orbax restores arrays COMMITTED to device 0; under a multi-device mesh
    # the sharded steps then refuse them. Re-enter through host numpy so
    # every leaf is uncommitted and free to take the step's sharding.
    tree = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), tree)
    nerf_state = (tree["nerf_params"], tree["nerf_opt"])
    seg_state = (tree["seg_params"], tree["seg_stats"], tree["seg_opt"])
    if occ_grid is not None:
        occ_grid = tree["occ_grid"]
    key = jax.random.wrap_key_data(jnp.asarray(tree["key"]))
    return (int(tree["done"]), nerf_state, seg_state, occ_grid, key,
            int(tree["occ_step"]), int(tree["occ_slab"]))


def _nerf_batch(item_batch):
    """Numpy collated joint items → device arrays for nerf_fit_step."""
    return {
        "img": jnp.asarray(item_batch["img"]),
        "depth": jnp.asarray(item_batch["depth"]),
        "pose": jnp.asarray(item_batch["pose"]),
        "intrinsics": jnp.asarray(item_batch["intrinsics"]),
        "one_m_to_scene_uom": jnp.asarray(item_batch["one_m_to_scene_uom"]),
    }


def _resident_fit_buffers(trainer, seg_state, dataset):
    """Device-resident phase-1 buffers (VERDICT r4 #5): every train_nerf
    item read + decoded ONCE (the items are deterministic per index — mode
    "train" with only_new_scene never hits the augmentation branch,
    data/scannet_ngp_joint.py __getitem__), stacked, transferred once, and
    pseudo-labeled once (seg_state is frozen during phase 1). The per-epoch
    step loop re-decoded and re-labeled every image every epoch."""
    items = [dataset[i] for i in range(len(dataset))]
    bufs = {k: jnp.asarray(np.stack([it[k] for it in items]))
            for k in ("img", "depth", "pose", "intrinsics",
                      "one_m_to_scene_uom")}
    bufs["pseudo"] = trainer.seg_pseudo_labels(seg_state, bufs["img"])
    return bufs


def build_datamodule(exp, env, output_size, val_scene_list=None, seed=0):
    """The six datasets of the reference's JointTrainDataModule
    (ref: nr4seg/lightning/joint_train_data_module.py:30-117). `seed`
    threads into the train-mode datasets' augmentation/replay RNG streams
    (the reference's seed_everything reseeds these; the deliberate
    random.Random(0) replay-frame shuffle stays seed-independent for
    bit-parity with the reference)."""
    scenes = exp["scenes"]
    exp_name = exp["exp_name"]
    root = env["scannet"]
    dm = {}
    dm["val"] = ScanNetNGPJoint(root=root, mode="val", scene_list=scenes,
                                exp_name=exp_name, only_new_scene=False,
                                output_size=output_size,
                                val_scene_list=val_scene_list)
    dm["train_val"] = ScanNetNGPJoint(root=root, mode="train_val",
                                      scene_list=scenes, exp_name=exp_name,
                                      only_new_scene=False,
                                      output_size=output_size,
                                      val_scene_list=val_scene_list)
    dm["predict"] = ScanNetNGPJoint(
        root=root, mode="predict", scene_list=scenes, exp_name=exp_name,
        use_novel_viewpoints=exp["cl"].get("use_novel_viewpoints", False),
        only_new_scene=True, output_size=output_size)
    dm["train_nerf"] = ScanNetNGPJoint(root=root, mode="train",
                                       scene_list=scenes, exp_name=exp_name,
                                       only_new_scene=True,
                                       output_size=output_size, seed=seed)
    train_joint = ScanNetNGPJoint(
        root=root, mode="train", scene_list=scenes, exp_name=exp_name,
        only_new_scene=False, seed=seed,
        use_novel_viewpoints=exp["cl"].get("use_novel_viewpoints", False),
        # hardcoded False exactly like the reference's data module (ref
        # joint_train_data_module.py:85): --fix_nerf only gates the NeRF
        # update in the trainer; the dataset's fix_nerf routing is dead
        # code upstream too
        fix_nerf=False,
        replay_buffer_size=exp["cl"].get("replay_buffer_size"),
        output_size=output_size)
    if exp["cl"].get("active"):
        cfg_dm = exp["data_module"]
        split = load_split(os.path.join(
            env["scannet_frames_25k"],
            cfg_dm["data_preprocessing"]["split_file_cl"]))
        img_list_cl = split["train_cl"]
        img_list_cl = img_list_cl[:int(exp["cl"]["25k_fraction"]
                                       * len(img_list_cl))]
        scannet_25k = ScanNet(root=env["scannet_frames_25k"],
                              img_list=img_list_cl, mode="train",
                              output_size=output_size, seed=seed)
        train_joint = ScanNetCLJoint(scannet_25k, train_joint,
                                     ngp_25k_ratio=exp["cl"]["ngp_25k_ratio"],
                                     seed=seed)
    dm["train_joint"] = train_joint
    # 25k generalization test set (ref joint_train_data_module.py:55-66);
    # only when the split file is configured and on disk (shared helper
    # with the finetune loop: seg_eval.py)
    dm["test_25k"] = build_test_25k(exp, env, output_size)
    return dm


def validate_seg(trainer, seg_state, dataset, meter_factory, logger, prefix,
                 visualizer=None, visu_n=0):
    """Per-scene seg validation (ref validation_step :541-639): bs=1 frames
    grouped by scene, one meter per scene; first visu_n frames plotted
    (ref visu :304-341)."""
    results = {}
    meter = meter_factory()
    prev_scene = None
    for i in range(len(dataset)):
        item = dataset[i]
        scene = item["current_scene_name"]
        if prev_scene is not None and scene != prev_scene:
            results[prev_scene] = meter.measure()
            meter = meter_factory()
        prev_scene = scene
        pred, _, _ = trainer.seg_infer(seg_state,
                                       jnp.asarray(item["img"])[None])
        meter.update(pred[0], jnp.asarray(item["label"]))
        if visualizer is not None and i < visu_n:
            visualizer.plot_image(item["img"], tag=f"{prefix}_vis/gt_image_{i}")
            visualizer.plot_segmentation(
                np.asarray(pred[0]) + 1, tag=f"{prefix}_vis/pred_seg_{i}")
            visualizer.plot_segmentation(
                item["label"] + 1, tag=f"{prefix}_vis/target_{i}")
            visualizer.plot_detectron(item["img"], item["label"] + 1,
                                      tag=f"{prefix}_vis/detectron_{i}")
    if prev_scene is not None:
        results[prev_scene] = meter.measure()
    if logger is not None:
        for scene, (miou, tacc, macc) in results.items():
            logger.log({f"{prefix}/seg_mean_IoU_{scene}": miou,
                        f"{prefix}/seg_total_accuracy_{scene}": tacc,
                        f"{prefix}/seg_mean_accuracy_{scene}": macc})
    return results


def test_nerf(trainer, nerf_state, dataset, num_classes, logger, prefix,
              occ_grid=None, group=4, visualizer=None, visu_n=0):
    """NeRF pseudo-label quality on train frames (ref test_step :648-660),
    `group` frames per dispatch like run_predict (the per-frame host
    roundtrip is ~35 ms; the render compiles are shared with predict
    unless a distinct predict_* budget is configured). The first `visu_n`
    frames plot gt image, nerf render, predicted nerf labels, target, and
    the detectron overlay (ref test_step visu :654-660,
    visualizer.store_n.test)."""
    meter = SemanticsMeter(num_classes)
    n = len(dataset)
    for s in range(0, n, group):
        items = [dataset[i] for i in range(s, min(s + group, n))]
        poses = jnp.asarray(np.stack([it["pose"] for it in items]))
        outs = trainer.render_frames(nerf_state[0], poses,
                                     jnp.asarray(items[0]["intrinsics"]),
                                     occ_grid, group=group)
        labels = jnp.asarray(np.stack([np.asarray(it["label"])
                                       for it in items]))
        meter.update(outs["nerf_semantics"], labels)
        if visualizer is not None:
            for j, item in enumerate(items):
                c = s + j
                if c >= visu_n:
                    break
                visualizer.plot_image(item["img"],
                                      tag=f"{prefix}_vis/gt_image_{c}")
                visualizer.plot_image(np.asarray(outs["nerf_rgb"][j]),
                                      tag=f"{prefix}_vis/nerf_image_{c}")
                visualizer.plot_segmentation(
                    np.asarray(outs["nerf_semantics"][j]) + 1,
                    tag=f"{prefix}_vis/pred_nerf_{c}")
                visualizer.plot_segmentation(
                    np.asarray(item["label"]) + 1,
                    tag=f"{prefix}_vis/target_{c}")
                visualizer.plot_detectron(item["img"],
                                          np.asarray(item["label"]) + 1,
                                          tag=f"{prefix}_vis/detectron_{c}")
    miou, tacc, macc = meter.measure()
    if logger is not None:
        logger.log({f"{prefix}/nerf_mean_IoU": miou,
                    f"{prefix}/nerf_total_accuracy": tacc,
                    f"{prefix}/nerf_mean_accuracy": macc})
    return miou, tacc, macc


def make_predict_dirs(root_folder):
    """(ref on_predict_epoch_start :695-712)"""
    for sub in ("", "novel_viewpoints"):
        for name in PREDICT_SUBFOLDERS:
            p = os.path.join(root_folder, sub, name)
            if os.path.exists(p):
                shutil.rmtree(p)
            os.makedirs(p)


def write_predict_outputs(root_folder, item, out):
    """PNG dumps of one predict frame (ref predict_step :722-782)."""
    sub = "novel_viewpoints" if item["viewpoint_is_novel"] else ""
    idx = item["current_index"]
    rgb = (np.clip(np.asarray(out["nerf_rgb"]), 0, 1) * 255).astype(np.uint8)
    cv2.imwrite(os.path.join(root_folder, sub, "nerf_image", idx + ".png"),
                cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
    nerf_label = np.asarray(out["nerf_semantics"]).astype(np.int64) + 1
    cv2.imwrite(os.path.join(root_folder, sub, "nerf_label", idx + ".png"),
                nerf_label.astype(np.uint8))
    cv2.imwrite(
        os.path.join(root_folder, sub, "nerf_label_vis", idx + ".png"),
        cv2.cvtColor(NYU40_COLOUR_CODE[nerf_label], cv2.COLOR_RGB2BGR))
    seg_label = np.asarray(out["seg_semantics"]).astype(np.int64) + 1
    cv2.imwrite(os.path.join(root_folder, sub, "seg_label", idx + ".png"),
                seg_label.astype(np.uint8))
    cv2.imwrite(
        os.path.join(root_folder, sub, "seg_label_vis", idx + ".png"),
        cv2.cvtColor(NYU40_COLOUR_CODE[seg_label], cv2.COLOR_RGB2BGR))


def run_predict(trainer, nerf_state, seg_state, dataset, root_folder,
                occ_grid=None, group=4):
    """Predict dump (ref predict_step :714-782), `group` frames per
    dispatch: the phase renders hundreds of frames per stage and the axon
    host roundtrip is ~35 ms/dispatch, so frames batch through one staged
    render + one seg forward per group instead of two dispatches each.

    PNG encoding (5 files/frame, cv2 releases the GIL) runs on a small
    thread pool so it overlaps the NEXT group's device render instead of
    idling the chip — round-5 pipeline lever (PERFORMANCE.md "Pipeline
    wall-clock, round 5"). The queue is bounded so at most ~32 frames of
    pixel buffers are held at once; any worker exception is re-raised."""
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    make_predict_dirs(root_folder)
    n = len(dataset)
    with ThreadPoolExecutor(max_workers=4) as pool:
        pending = deque()
        for s in range(0, n, group):
            items = [dataset[i] for i in range(s, min(s + group, n))]
            poses = jnp.asarray(np.stack([it["pose"] for it in items]))
            outs = trainer.render_frames(nerf_state[0], poses,
                                         jnp.asarray(items[0]["intrinsics"]),
                                         occ_grid, group=group,
                                         which="predict")
            # seg input: the gt image, or the render itself for novel views
            # (ref :717-720)
            seg_in = jnp.asarray(np.stack([
                np.zeros((trainer.H, trainer.W, 3), np.float32)
                if it["viewpoint_is_novel"] else np.asarray(it["img"])
                for it in items]))
            novel = jnp.asarray(np.array(
                [bool(it["viewpoint_is_novel"]) for it in items]))
            seg_in = jnp.where(novel[:, None, None, None], outs["nerf_rgb"],
                               seg_in)
            seg_pred, _, _ = trainer.seg_infer(seg_state, seg_in)
            for j, item in enumerate(items):
                out = {k: v[j] for k, v in outs.items()}
                out["seg_semantics"] = seg_pred[j]
                pending.append(pool.submit(write_predict_outputs,
                                           root_folder, item, out))
            while len(pending) > 32:
                pending.popleft().result()
        while pending:
            pending.popleft().result()


def train(exp, env, args, exp_cfg_path=None, env_cfg_path=None,
          render_cfg: RenderConfig | None = None, val_scene_list=None,
          trainer_kwargs: dict | None = None):
    """Full one-stage run (ref scripts/train_joint.py:47-186)."""
    seed_everything(args.seed)
    exp["exp_name"] = args.exp_name
    exp["fix_nerf"] = getattr(args, "fix_nerf", False)
    from ..config.key_audit import audit_exp_keys
    audit_exp_keys(exp, "joint")
    model_path, logger = setup_experiment(exp, env, exp_cfg_path, env_cfg_path,
                                          getattr(args, "project_name",
                                                  "joint"))

    # val scene set: reference hardcodes scenes 0000-0009
    # (scannet_ngp_joint.py:66-93); overridable via exp["val_scenes"]
    val_scene_list = val_scene_list or exp.get("val_scenes")
    output_size = tuple(exp.get("output_size", (240, 320)))
    num_classes = exp["model"]["num_classes"]
    test_render_cfg = predict_render_cfg = None
    if render_cfg is None and "renderer" in exp:
        render_cfg, test_render_cfg, predict_render_cfg = \
            render_cfgs_from_exp(exp)
    trainer_kwargs = dict(trainer_kwargs or {})
    if test_render_cfg is not None:
        trainer_kwargs.setdefault("test_render_cfg", test_render_cfg)
    if predict_render_cfg is not None:
        trainer_kwargs.setdefault("predict_render_cfg", predict_render_cfg)
    if "nerf" in exp and "nerf_model" not in trainer_kwargs:
        trainer_kwargs["nerf_model"] = nerf_model_from_exp(exp, num_classes)
        if "n_rays" in exp["nerf"]:
            trainer_kwargs.setdefault("n_rays", int(exp["nerf"]["n_rays"]))
    if "mesh" not in trainer_kwargs and jax.device_count() > 1:
        from ..parallel import get_mesh
        trainer_kwargs["mesh"] = get_mesh()
    trainer = JointTrainer(exp, image_hw=output_size, num_classes=num_classes,
                           render_cfg=render_cfg, **trainer_kwargs)
    # log the active render budgets at stage start: the derived test/predict
    # defaults under occupancy sampling differ from the train budget, and a
    # quality regression on a new scene must be traceable to them
    print(f"[joint] render budgets: {trainer.budget_summary()}", flush=True)
    logger.log_hyperparams({"render_budgets": trainer.budget_summary()})
    key = jax.random.key(args.seed)
    key, k1, k2 = jax.random.split(key, 3)
    nerf_state = trainer.init_nerf(k1)
    seg_state = trainer.init_seg(k2)
    occ_grid = trainer.init_occupancy()
    occ_step = 0

    # checkpoint load with aux-head surgery (ref :111-132)
    if exp.get("trainer", {}).get("load_from_checkpoint") and \
            exp["general"].get("checkpoint_load"):
        params, batch_stats = load_deeplab(exp["general"]["checkpoint_load"])
        params = jax.tree.map(jnp.asarray, params)
        batch_stats = jax.tree.map(jnp.asarray, batch_stats)
        seg_state = (params, batch_stats, trainer.seg_tx.init(params))

    # --- per-epoch last checkpoint + mid-stage resume (the reference's
    # Lightning ModelCheckpoint(save_last=True) + trainer
    # resume_from_checkpoint, ref scripts/train_joint.py:90-109). `done`
    # counts completed epochs linearly across both phases; a truthy
    # `trainer.resume_from_checkpoint` restores from `<run>/last_ckpt`
    # (or an explicit checkpoint dir path) and skips the finished epochs —
    # loader shuffles, dataset augmentation, and dropout streams are pure
    # functions of (seed, epoch, index), so the trajectory continues
    # exactly where the interrupted run stopped. ---
    last_dir = os.path.join(model_path, "last_ckpt")
    save_last = bool(exp.get("trainer", {}).get("save_last", True))
    start_done = 0
    resume = exp.get("trainer", {}).get("resume_from_checkpoint")
    if resume:
        rdir = resume if isinstance(resume, str) else last_dir
        if os.path.isdir(rdir):
            (start_done, nerf_state, seg_state, occ_grid, key, occ_step,
             occ_slab) = _restore_stage_state(rdir, nerf_state, seg_state,
                                              occ_grid, key)
            trainer._occ_slab = occ_slab
            print(f"[joint] resumed from {rdir}: "
                  f"{start_done}/{args.nerf_train_epoch}"
                  f"+{args.joint_train_epoch} epochs done", flush=True)
        else:
            print(f"[joint] resume requested but no checkpoint at {rdir}; "
                  f"starting fresh", flush=True)

    def save_last_ckpt(done):
        if save_last:
            _save_stage_state(last_dir, done, nerf_state, seg_state,
                              occ_grid, key, occ_step,
                              getattr(trainer, "_occ_slab", 0))

    dm = build_datamodule(exp, env, output_size, val_scene_list,
                          seed=args.seed)
    bs = exp["data_module"]["batch_size"]
    viz_cfg = exp.get("visualizer", {})
    visualizer = Visualizer(os.path.join(model_path, "visu"),
                            store=viz_cfg.get("store", False))
    # every plot also goes to the experiment logger, like the reference's
    # wandb image logging (ref visualizer.py:60-81)
    visualizer.set_logger(logger.log_image)
    # store_n budgets per split (ref visualizer.store_n.{train,val,test} —
    # the reference plots during its validation passes over the val AND
    # train_val loaders and during test_step, ref visu :304-341,581,654)
    store_n = viz_cfg.get("store_n", {}) if viz_cfg.get("store", False) \
        else {}
    visu_n = store_n.get("val", 0)
    visu_train = store_n.get("train", 0)
    visu_test = store_n.get("test", 0)
    # validation cadence (ref Trainer(**exp["trainer"]) honors
    # check_val_every_n_epoch — 1 in the shipped configs); the %10 predict
    # dump keeps the reference's hardcoded manual cadence (ref :344-355)
    check_val_every = max(1, int(exp.get("trainer", {}).get(
        "check_val_every_n_epoch", 1)))

    profile = bool(exp.get("trainer", {}).get("profiler", False))
    timer = StepTimer(os.path.join(model_path, "profile_steps.jsonl")
                      if profile else None)

    # --- phase 1: NeRF-only fit (bs=1 loader order, ref :119-127,163-165).
    # Default: each epoch is ONE scanned dispatch over device-resident
    # buffers with the same shuffle order and key stream as the step loop
    # (trainer.nerf_fit_epoch; VERDICT r4 #5 — the loop paid ~2 tunnel
    # dispatches per image per epoch plus a PNG re-decode). The step loop
    # remains for datasets too large to stay device-resident and as the
    # `nerf.scan_epoch_fit: false` escape hatch. ---
    scan_fit = (bool(exp.get("nerf", {}).get("scan_epoch_fit", True))
                and args.nerf_train_epoch > start_done
                and len(dm["train_nerf"]) > 0
                and len(dm["train_nerf"]) <= int(exp.get("nerf", {}).get(
                    "scan_fit_max_images", 512)))
    if scan_fit:
        fit_bufs = _resident_fit_buffers(trainer, seg_state,
                                         dm["train_nerf"])
        n_fit = len(dm["train_nerf"])
    for epoch in range(args.nerf_train_epoch):
        if epoch < start_done:
            continue
        if scan_fit:
            # the DataLoader's shuffle: rng(seed + epoch) over arange(n)
            order = np.arange(n_fit)
            np.random.default_rng(args.seed + epoch).shuffle(order)
            nerf_state, occ_grid, key, occ_step, parts = \
                trainer.nerf_fit_epoch(nerf_state, fit_bufs, order, key,
                                       occ_step, occ_grid)
            logger.log({f"train/{n}": float(v) for n, v in parts.items()},
                       step=epoch)
        else:
            nerf_dl = DataLoader(dm["train_nerf"], batch_size=1,
                                 shuffle=True, seed=args.seed)
            nerf_dl.set_epoch(epoch)
            epoch_logs, n_batches = {}, 0
            for batch in nerf_dl:
                key, k = jax.random.split(key)
                nerf_state, logs = trainer.nerf_fit_step(
                    nerf_state, seg_state, _nerf_batch(batch), k, occ_grid)
                n_batches += 1
                for n, v in logs.items():
                    epoch_logs[n] = epoch_logs.get(n, 0.0) + v
                occ_step += 1
                if occ_grid is not None and \
                        occ_step % trainer.occ_cfg.update_every == 0:
                    key, k = jax.random.split(key)
                    occ_grid = trainer.update_occupancy(nerf_state, occ_grid,
                                                        k)
            if n_batches:
                logger.log({f"train/{n}": float(v) / n_batches
                            for n, v in epoch_logs.items()}, step=epoch)
        timer.tick("nerf_epoch", epoch=epoch)
        save_last_ckpt(epoch + 1)

    # initial nerf quality + seg validation (ref :167-169); skipped when a
    # resume lands past them — they only log, never touch training state
    if start_done <= args.nerf_train_epoch:
        test_nerf(trainer, nerf_state, dm["train_nerf"], num_classes, logger,
                  "test_pre", occ_grid, visualizer=visualizer,
                  visu_n=visu_test)
        timer.tick("test_pre")
        validate_seg(trainer, seg_state, dm["val"],
                     lambda: SemanticsMeter(num_classes), logger, "val_pre",
                     visualizer, visu_n)
        timer.tick("val_pre")

    # --- phase 2: joint training (ref :171-177) ---
    joint_dl = DataLoader(dm["train_joint"], batch_size=bs, shuffle=True,
                          drop_last=True, collate_fn=ScanNetNGPJoint.collate,
                          seed=args.seed)
    scene_root = os.path.join(env["scannet"], exp["scenes"][-1],
                              exp["exp_name"])
    for epoch in range(args.joint_train_epoch):
        if args.nerf_train_epoch + epoch < start_done:
            continue
        joint_dl.set_epoch(epoch)
        epoch_logs, n_batches = {}, 0
        for batch_old, batch_new, batch_cl in joint_dl:
            key, k = jax.random.split(key)
            nerf_state, seg_state, logs = trainer.joint_step(
                nerf_state, seg_state, batch_old, batch_new, batch_cl, k,
                occ_grid)
            n_batches += 1
            for n, v in logs.items():
                epoch_logs[n] = epoch_logs.get(n, 0.0) + v
            occ_step += 1
            if occ_grid is not None and not exp.get("fix_nerf") and \
                    occ_step % trainer.occ_cfg.update_every == 0:
                key, k = jax.random.split(key)
                occ_grid = trainer.update_occupancy(nerf_state, occ_grid, k)
        if n_batches:
            logger.log({f"train/{n}": float(v) / n_batches
                        for n, v in epoch_logs.items()},
                       step=args.nerf_train_epoch + epoch)
        timer.tick("joint_epoch", epoch=epoch)
        save_last_ckpt(args.nerf_train_epoch + epoch + 1)
        if (epoch + 1) % check_val_every == 0:
            validate_seg(trainer, seg_state, dm["val"],
                         lambda: SemanticsMeter(num_classes), logger,
                         f"val_e{epoch + 1}", visualizer, visu_n)
            validate_seg(trainer, seg_state, dm["train_val"],
                         lambda: SemanticsMeter(num_classes), logger,
                         f"train_val_e{epoch + 1}", visualizer, visu_train)
            timer.tick("joint_val", epoch=epoch)
        if (epoch + 1) % 10 == 0:
            # mid-training predict dump (ref :344-355,784-874)
            run_predict(trainer, nerf_state, seg_state, dm["predict"],
                        f"{scene_root}_epoch_{epoch + 1}", occ_grid)
            timer.tick("predict_mid", epoch=epoch)

    # --- final tests + predict + ckpt (ref :179-186) ---
    test_nerf(trainer, nerf_state, dm["train_nerf"], num_classes, logger,
              "test", occ_grid, visualizer=visualizer, visu_n=visu_test)
    timer.tick("test_final")
    if dm["test_25k"] is not None:
        miou, tacc, macc = eval_25k(
            lambda im: trainer.seg_infer(seg_state, im)[0],
            dm["test_25k"], num_classes)
        logger.log({"test/25k_mean_IoU": miou,
                    "test/25k_total_accuracy": tacc,
                    "test/25k_mean_accuracy": macc})
    run_predict(trainer, nerf_state, seg_state, dm["predict"], scene_root,
                occ_grid)
    timer.tick("predict_final")
    save_deeplab(os.path.join(model_path, "deeplab_ckpt"), seg_state[0],
                 seg_state[1])
    # also persist the per-scene NeRF (the reference's save_last Lightning
    # ckpt carries it, ref train_joint.py:90-94; scene NeRFs are not chained
    # across stages but are needed to re-render replay views on demand)
    save_tree(os.path.join(model_path, "nerf_ckpt"),
              {"params": nerf_state[0]})
    logger.close()
    return nerf_state, seg_state
