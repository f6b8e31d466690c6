"""Joint NeRF + segmentation training: the continual-adaptation core.

TPU-native equivalent of the reference's `JointTrainLightningNet`
(ref: nr4seg/lightning/joint_train_lightning_net.py):
  * phase 1 `nerf_fit_step` (ref training_step_nerf :473-513): DeepLab
    pseudo-labels (eval mode, no grad) supervise the NeRF; one Adam step per
    image, 4096 random rays each, rgb/semantics/depth losses.
  * phase 2 `joint_step` (ref training_step_joint :363-471): full-frame NeRF
    render of the new-scene batch (no grad) → augmented rendered
    pseudo-labels ⊕ old-scene replay renders ⊕ 25k replay → one seg Adam
    step; plus the per-image NeRF updates (unless fix_nerf), with the
    reference's BN trick (seg in eval mode but BN stats updating when
    batch > 1, :373-379).
  * `predict_images` (ref predict_step :714-782): full-frame rgb + label
    renders for the replay buffer / finetune data, written host-side.

The Lightning manual-optimization + AMP GradScaler machinery collapses into
explicit jitted steps over (params, opt_state) pytrees driven by plain
Python loops; randomness is threaded PRNG keys; augmentation of rendered
images runs ON DEVICE inside the jit (the reference does it with
torchvision transforms on GPU tensors mid-step).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.augmentation import augment
from ..data.rays import get_rays, get_rays_sampled
from ..models.deeplabv3 import DeepLabV3, seg_compute_dtype
from ..models.semantic_nerf import SemanticNeRF
from ..ops.occupancy import OccupancyConfig, init_grid, update_grid
from ..ops.renderer import (RenderConfig, normalize_semantics, render_rays,
                            render_rays_staged, train_packing_enabled)
from .nerf_trainer import make_nerf_optimizer, nerf_losses
from .seg_trainer import cross_entropy_ignore, make_seg_optimizer


class JointTrainer:
    """Owns both models and all jitted steps for one adaptation stage."""

    def __init__(self, exp: dict, image_hw=(240, 320), num_classes=40,
                 render_cfg: RenderConfig | None = None, n_rays=4096,
                 nerf_model: SemanticNeRF | None = None,
                 seg_model=None, test_render_cfg: RenderConfig | None = None,
                 predict_render_cfg: RenderConfig | None = None,
                 mesh=None):
        """mesh: optional 1-D jax Mesh with a `data` axis. Both models'
        params stay replicated; the NeRF ray batches, the full-frame render
        chunks, and the assembled seg batch shard across it (XLA psums the
        grads over ICI). The reference's joint path is single-GPU
        (SURVEY §2.3) — this is the TPU-native scaling of the flagship
        workload."""
        self.exp = exp
        self.mesh = mesh
        self.H, self.W = image_hw
        self.num_classes = num_classes
        self.n_rays = n_rays
        self.fix_nerf = exp.get("fix_nerf", False)
        self.cfg = render_cfg or RenderConfig()

        # occupancy-guided sampling (TPU accel; exp["nerf"]["use_occupancy"]
        # = false restores the reference's dense stratified placement)
        self.use_occupancy = exp.get("nerf", {}).get("use_occupancy", True)

        # full-frame (test/predict) renders use their own configuration
        # (exp["renderer"]["test_*"] keys). Default under occupancy
        # sampling: the full train budget with early termination — stage-1
        # renders every ray at half the budget, and only rays whose
        # transmittance hasn't saturated (the reference's T < 1e-4 exit)
        # re-render at the full budget. Measured on the fitted room
        # (render_bench.json): 1524 ms/frame at 39.38 dB vs the flat 16+16
        # budget's 1860 ms at 39.26 and the full 32+32's 3671 ms at 39.82 —
        # better quality AND faster than the previous default, identical
        # semantic labels across all of them. Without occupancy (reference-
        # parity dense mode) the budget stays shared with training,
        # matching the reference (ref renderer_semantics.py:301-358).
        if test_render_cfg is not None:
            self.test_cfg = test_render_cfg
        elif self.use_occupancy:
            from dataclasses import replace
            # derived cfgs keep the standard early-stop render program even
            # when TRAINING uses proposal placement (renderer:
            # test_proposal_placement can opt test renders in explicitly).
            # Under proposal placement the train budget is deliberately
            # ASYMMETRIC and small (e.g. 24+8 — placement quality lets the
            # fine pass shrink for gradient steps); full-frame test/predict
            # label dumps must NOT inherit that shrink (replay/pseudo-label
            # sharpness is what old-scene stability rides on), so they
            # derive from the symmetric TOTAL-equivalent budget: 24+8 train
            # -> 32+32 test -> es8->16+16 predict, exactly the programs the
            # incumbent 32+32 training derives.
            if self.cfg.proposal_placement:
                total = self.cfg.num_steps + self.cfg.upsample_steps
                base = replace(self.cfg, num_steps=total,
                               upsample_steps=total,
                               proposal_placement=False)
            else:
                base = self.cfg
            self.test_cfg = replace(
                base, early_stop=True,
                stage1_steps=max(1, min(16, base.num_steps // 2)),
                refine_fraction=0.25, proposal_placement=False)
        else:
            self.test_cfg = self.cfg

        # predict-phase renders (PNG pseudo-label/replay dumps — hundreds of
        # frames per stage) may use a cheaper budget than the logged test
        # metrics. Default under occupancy sampling (when neither a predict
        # nor a test config was given explicitly): the measured fast knob —
        # stage-1 at a quarter budget, half-budget refine on the top 1/8
        # unsaturated rays (PERFORMANCE.md round-3 render table: es8→16+16
        # k/8, 551 ms vs the 1188 ms test default at comparable PSNR —
        # 29.27 vs 29.06 dB on the 300-step room, between 39.26 and 39.82 on
        # the deep fit — and bit-identical semantic labels on both).
        # Explicit `renderer: predict_*` keys override; dense reference-
        # parity mode (use_occupancy=false) keeps predict == test == train.
        if predict_render_cfg is not None:
            self.predict_cfg = predict_render_cfg
        elif test_render_cfg is None and self.use_occupancy:
            from dataclasses import replace
            # derived FROM test_cfg so the two defaults scale consistently:
            # stage-1 at half the test stage-1 (capped via the test cap at
            # 8), refine the top 1/8, composite budget halved. At the
            # measured 32+32 train budget this is exactly the benchmarked
            # fast knob (es8→16+16 k/8); at larger budgets the stage-1 cost
            # stays bounded instead of growing as num_steps//4.
            self.predict_cfg = replace(
                self.test_cfg, early_stop=True,
                stage1_steps=max(1, self.test_cfg.stage1_steps // 2),
                num_steps=max(1, self.test_cfg.num_steps // 2),
                upsample_steps=max(1, self.test_cfg.upsample_steps // 2),
                refine_fraction=0.125)
        else:
            self.predict_cfg = self.test_cfg

        # bound=4 and the hash/MLP geometry follow the reference's joint net
        # (ref :29-35); overridable for tests / other scene scales.
        self.nerf_model = nerf_model or SemanticNeRF(
            bound=4.0, num_semantic_classes=num_classes)
        self.seg_model = seg_model or DeepLabV3(
            num_classes=num_classes,
            dtype=seg_compute_dtype(exp.get("model")))

        opt = exp["optimizer"]
        self.nerf_tx = make_nerf_optimizer(float(opt.get("lr_nerf", 1e-2)))
        self.seg_tx = make_seg_optimizer(opt, lr_key="lr_seg")

        # opt-in throughput mode: ONE Adam step over the concatenated ray
        # batches of all B images instead of B sequential per-image steps
        # (the reference steps per image, ref :481-513 — this is a
        # deliberate, documented numerics divergence; see _nerf_update_fused)
        self.fused_image_step = bool(exp.get("nerf", {}).get(
            "fused_image_step", False))
        # dispatch coalescing (round-5 wall-clock work, VERDICT r4 #5):
        # run joint_step as ONE jitted program instead of 5 dispatches
        # (render / pseudo-label / nerf updates / augment / seg update) —
        # ~35 ms/dispatch on this host's tunnel, so 4 saved dispatches per
        # batch. Same ops in the same order with the same key stream; only
        # XLA's fusion boundaries move. Escape hatch: false restores the
        # separate-dispatch path.
        self.fused_joint_step = bool(exp.get("nerf", {}).get(
            "fused_joint_step", True))

        self.occ_cfg = OccupancyConfig()
        # reference-parity knob: the reference applies CE to SOFTMAX outputs
        # in the joint seg update too (joint_train_lightning_net.py:37,456-458)
        self.double_softmax = bool(exp.get("parity", {}).get(
            "double_softmax", False))

        self._seg_infer = jax.jit(self._seg_infer_impl,
                                  static_argnames=("update_bn",))
        # one jitted wrapper per impl: jax.jit keys its cache on the arg
        # pytree structure, so occ_grid=None vs an array trace separately
        self._nerf_update_image = jax.jit(self._nerf_update_image_impl,
                                          donate_argnums=(0,))
        self._nerf_update_batch = jax.jit(self._nerf_update_batch_impl,
                                          donate_argnums=(0,))
        self._nerf_update_fused = jax.jit(self._nerf_update_fused_impl,
                                          donate_argnums=(0,))
        from functools import partial
        self._render_frames_jit = jax.jit(
            partial(self._render_frames_impl, cfg=self.test_cfg))
        # predict shares the test program (and its compiles) unless a
        # distinct predict config was given
        self._render_frames_predict_jit = (
            self._render_frames_jit if self.predict_cfg == self.test_cfg
            else jax.jit(partial(self._render_frames_impl,
                                 cfg=self.predict_cfg)))
        self._seg_update = jax.jit(self._seg_update_impl,
                                   donate_argnums=(0,))
        self._augment_rendered = jax.jit(self._augment_rendered_impl)
        self._update_grid = jax.jit(self._update_grid_impl,
                                    donate_argnums=(1,))
        self._joint_step_fused = jax.jit(self._joint_step_fused_impl,
                                         donate_argnums=(0, 1))
        self._nerf_fit_epoch = jax.jit(self._nerf_fit_epoch_impl,
                                       donate_argnums=(0,))
        from ..models.packed_table import PackedTableCache
        self._packed_cache = PackedTableCache(self.nerf_model)

    def budget_summary(self) -> str:
        """One-line description of the active render budgets — logged at
        stage start so a quality regression on a new scene is traceable to
        the derived test/predict defaults (they may differ from the train
        budget under occupancy sampling)."""

        def one(cfg):
            s = f"{cfg.num_steps}+{cfg.upsample_steps}"
            if cfg.early_stop:
                s = (f"es{cfg.stage1_steps}->{s} "
                     f"k{cfg.refine_fraction:g}")
            return s

        return (f"train={one(self.cfg)} test={one(self.test_cfg)} "
                f"predict={one(self.predict_cfg)} "
                f"occupancy={self.use_occupancy} "
                f"packed_dtype={self.test_cfg.packed_dtype}")

    # ------------------------------------------------------------------- init
    def init_nerf(self, key):
        x = jnp.zeros((8, 3))
        d = jnp.zeros((8, 3)).at[:, 2].set(1.0)
        params = self.nerf_model.init(key, x, d)["params"]
        return params, self.nerf_tx.init(params)

    def init_seg(self, key):
        variables = self.seg_model.init(
            key, jnp.zeros((1, self.H, self.W, 3)),
            use_running_average=False)
        params = variables["params"]
        return params, variables["batch_stats"], self.seg_tx.init(params)

    def _shard_data(self, *arrays):
        """Leading-axis `data` sharding constraint; skips arrays whose batch
        doesn't divide the mesh (assembled seg batches vary in size)."""
        if self.mesh is None:
            return arrays
        from jax.sharding import NamedSharding, PartitionSpec as P
        n = self.mesh.devices.size
        sh = NamedSharding(self.mesh, P("data"))
        return tuple(
            jax.lax.with_sharding_constraint(a, sh)
            if a.shape[0] % n == 0 else a for a in arrays)

    # --------------------------------------------------------------- seg fwd
    def _seg_infer_impl(self, seg_params, seg_batch_stats, images,
                        update_bn=False):
        """forward_seg (ref :159-165). update_bn=True replicates the BN trick:
        eval-mode forward that still updates running stats (ref :373-379)."""
        variables = {"params": seg_params, "batch_stats": seg_batch_stats}
        if update_bn:
            out, mutated = self.seg_model.apply(
                variables, images, use_running_average=False,
                deterministic=True, mutable=["batch_stats"])
            new_stats = mutated["batch_stats"]
        else:
            out = self.seg_model.apply(variables, images,
                                       use_running_average=True,
                                       deterministic=True)
            new_stats = seg_batch_stats
        probs = jax.nn.softmax(out["out"], axis=-1)
        return jnp.argmax(probs, axis=-1), probs, new_stats

    def seg_infer(self, seg_state, images, update_bn=False):
        params, stats, opt = seg_state
        pred, probs, new_stats = self._seg_infer(params, stats, images,
                                                 update_bn=update_bn)
        return pred, probs, (params, new_stats, opt)

    # ------------------------------------------------------------ nerf update
    def init_occupancy(self):
        self._occ_slab = 0
        return init_grid(self.occ_cfg) if self.use_occupancy else None

    def _update_grid_impl(self, nerf_params, grid, key, slab_index):
        if self.occ_cfg.probe_sampled:
            density_fn = lambda pts: self.nerf_model.apply(
                {"params": nerf_params}, pts, method="density_probe")
        else:
            def density_fn(pts):
                sigma, _ = self.nerf_model.apply({"params": nerf_params},
                                                 pts, method="density")
                return sigma
        return update_grid(grid, density_fn, self.nerf_model.bound, key,
                           self.occ_cfg, slab_index=slab_index)

    def update_occupancy(self, nerf_state, grid, key):
        if grid is None:
            return None
        slab = getattr(self, "_occ_slab", 0) % self.occ_cfg.refresh_slabs
        self._occ_slab = slab + 1
        return self._update_grid(nerf_state[0], grid, key, jnp.int32(slab))

    def _nerf_update_image_impl(self, nerf_state, image, pseudo_label, depth,
                                pose, intrinsics, one_m_to_scene_uom, key,
                                occ_grid=None):
        """One Adam step on one image's 4096-ray batch
        (ref forward_nerf_train :167-223 + scaler step :509-513)."""
        params, opt_state = nerf_state
        k_rays, k_render = jax.random.split(key)
        rays_o, rays_d, dnorms, inds = get_rays_sampled(
            pose, intrinsics, self.H, self.W, k_rays, self.n_rays)
        gt_rgb = image.reshape(-1, 3)[inds]
        labels = pseudo_label.reshape(-1)[inds]
        gt_depth = depth.reshape(-1)[inds]
        rays_o, rays_d, dnorms, gt_rgb, labels, gt_depth = self._shard_data(
            rays_o, rays_d, dnorms, gt_rgb, labels, gt_depth)

        def loss_fn(p):
            packed = None
            if self.cfg.train_packed_max_entries > 0 and \
                    train_packing_enabled():
                packed = jax.lax.stop_gradient(self.nerf_model.pack_table(
                    p, self.cfg.train_packed_max_entries))
                if packed.n_packed == 0:
                    packed = None
            out = render_rays(self.nerf_model, {"params": p}, rays_o, rays_d,
                              dnorms, k_render, self.cfg, occ_grid,
                              mesh=self.mesh, packed=packed)
            return nerf_losses(out, gt_rgb, labels, gt_depth,
                               one_m_to_scene_uom, self.num_classes)

        (_, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = self.nerf_tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), parts

    def _nerf_update_batch_impl(self, nerf_state, images, labels, depths,
                                poses, intrs, uoms, keys, occ_grid=None):
        """The reference's per-image NeRF update loop (ref :481-513) as ONE
        lax.scan dispatch: B sequential Adam steps (identical numerics to B
        separate calls) without B host roundtrips (~35 ms each on this
        host). Returns (state, image-mean of the loss parts)."""

        def body(state, xs):
            img, lab, dep, pose, intr, uom, key = xs
            return self._nerf_update_image_impl(state, img, lab, dep, pose,
                                                intr, uom, key, occ_grid)

        nerf_state, parts = jax.lax.scan(
            body, nerf_state, (images, labels, depths, poses, intrs, uoms,
                               keys))
        return nerf_state, jax.tree_util.tree_map(
            lambda x: jnp.mean(x, axis=0), parts)

    def _nerf_update_fused_impl(self, nerf_state, images, labels, depths,
                                poses, intrs, uoms, key, occ_grid=None):
        """Throughput mode (`nerf.fused_image_step: true`): sample n_rays
        from EACH of the B images, concatenate into one B*n_rays ray batch,
        and take ONE Adam step on its mean loss.

        vs the reference's per-image stepping (ref :481-513): the gradient
        is the mean over B images of the per-image gradients AT THE SAME
        params (per-image stepping evaluates each image's gradient at
        sequentially-updated params), and Adam's moments update once per
        batch instead of B times — a standard large-batch trade. Loss parts
        are ray-means over the fused batch; the depth part normalizes by
        the GLOBAL valid-ray count rather than per-image. Throughput win:
        1/B of the fixed per-op costs (~28 ms/gather-op on this chip) and
        1/B of the Adam/table-gradient accumulation passes."""
        params, opt_state = nerf_state
        b = images.shape[0]
        key, k_render = jax.random.split(key)
        sample_keys = jax.random.split(key, b)

        def sample(img, lab, dep, pose, intr, uom, k):
            rays_o, rays_d, dnorms, inds = get_rays_sampled(
                pose, intr, self.H, self.W, k, self.n_rays)
            return (rays_o, rays_d, dnorms, img.reshape(-1, 3)[inds],
                    lab.reshape(-1)[inds], dep.reshape(-1)[inds],
                    jnp.full((self.n_rays,), uom))

        parts_v = jax.vmap(sample)(images, labels, depths, poses, intrs,
                                   uoms, sample_keys)
        flat = lambda a: a.reshape(b * self.n_rays, *a.shape[2:])
        rays_o, rays_d, dnorms, gt_rgb, lab, gt_depth, uom_per_ray = \
            map(flat, parts_v)
        rays_o, rays_d, dnorms, gt_rgb, lab, gt_depth, uom_per_ray = \
            self._shard_data(rays_o, rays_d, dnorms, gt_rgb, lab, gt_depth,
                             uom_per_ray)

        def loss_fn(p):
            packed = None
            if self.cfg.train_packed_max_entries > 0 and \
                    train_packing_enabled():
                packed = jax.lax.stop_gradient(self.nerf_model.pack_table(
                    p, self.cfg.train_packed_max_entries))
                if packed.n_packed == 0:
                    packed = None
            out = render_rays(self.nerf_model, {"params": p}, rays_o, rays_d,
                              dnorms, k_render, self.cfg, occ_grid,
                              mesh=self.mesh, packed=packed)
            return nerf_losses(out, gt_rgb, lab, gt_depth, uom_per_ray,
                               self.num_classes)

        (_, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = self.nerf_tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), parts

    # ------------------------------------------------------------- rendering
    def packed_for(self, nerf_params, cfg: RenderConfig | None = None):
        """Cell-packed render table for these params (cached per
        (table array identity, budget, dtype) — one repack per NeRF update,
        amortized over the batch's full-frame renders; see
        models/packed_table.py PackedTableCache)."""
        return self._packed_cache(nerf_params, cfg or self.test_cfg)

    def _render_frame(self, nerf_params, pose, intrinsics, occ_grid, which):
        """forward_nerf_test for one frame (ref :225-257) — the g=1 slice of
        the batched frame render (one shared jit program). `which` is
        required ("test" | "predict"): the public render_frames defaults to
        the test budget, and a silent default here could hand a metrics
        path the cheap predict budget."""
        fn = (self._render_frames_predict_jit if which == "predict"
              else self._render_frames_jit)
        cfg = self.predict_cfg if which == "predict" else self.test_cfg
        out = fn(nerf_params, jnp.asarray(pose)[None],
                 intrinsics, occ_grid,
                 self.packed_for(nerf_params, cfg))
        return {k: v[0] for k, v in out.items()}

    def _render_frames_impl(self, nerf_params, poses, intrinsics,
                            occ_grid=None, packed=None, *, cfg=None):
        """G frames in ONE dispatch: per-pose rays concatenate into a single
        staged render (lax.map already bounds memory per 4096-ray chunk, so
        G frames only add chunks). The per-frame dispatch roundtrip is
        ~35 ms on this host (PERFORMANCE.md) and the predict phase renders
        hundreds of frames per stage — batching frames is pure win."""
        g = poses.shape[0]

        def rays_of(pose):
            r = get_rays(pose, intrinsics, self.H, self.W)
            return r["rays_o"], r["rays_d"], r["direction_norms"]

        ro, rd, dn = jax.vmap(rays_of)(poses)
        out = render_rays_staged(self.nerf_model, {"params": nerf_params},
                                 ro.reshape(-1, 3), rd.reshape(-1, 3),
                                 dn.reshape(-1), cfg or self.test_cfg,
                                 occ_grid, mesh=self.mesh, packed=packed)
        # `invalid` (zero semantic mass) is deliberately discarded: the
        # reference renormalizes those rays to uniform and lets predict dump
        # their argmax (class 0) as a confident label (ref forward_nerf_test
        # :249-251 + predict_step :763-768) — keep that for parity.
        sem, invalid = normalize_semantics(out["semantics"])
        H, W = self.H, self.W
        return {
            "nerf_rgb": out["image"].reshape(g, H, W, 3),
            "nerf_semantics": jnp.argmax(sem, -1).reshape(g, H, W),
            "nerf_semantics_raw": sem.reshape(g, H, W, -1),
            "nerf_depth": out["depth"].reshape(g, H, W),
        }

    def render_frames(self, nerf_params, poses, intrinsics, occ_grid=None,
                      group=4, which="test"):
        """Render B frames in batched dispatches of up to `group` frames.

        One compile per distinct slice size (the joint batch is constant per
        stage and predict tails produce at most one extra size).
        `which`: "test" (logged metrics + in-training pseudo-label renders)
        or "predict" (PNG dump phase; may run a cheaper configured budget).
        """
        poses = jnp.asarray(poses)
        fn = (self._render_frames_predict_jit if which == "predict"
              else self._render_frames_jit)
        cfg = self.predict_cfg if which == "predict" else self.test_cfg
        packed = self.packed_for(nerf_params, cfg)
        outs = []
        for s in range(0, poses.shape[0], group):
            outs.append(fn(
                nerf_params, poses[s:s + group], intrinsics, occ_grid,
                packed))
        return {k: jnp.concatenate([o[k] for o in outs], 0) for k in outs[0]}

    # ---------------------------------------------------------- augmentation
    def _augment_rendered_impl(self, key, rgbs, labels):
        """On-device data_aug of rendered pseudo-label images
        (ref data_aug :259-302): jitter + rotate + crop + flip per image."""

        def one(k, img, label):
            aimg, alabels = augment(k, img,
                                    [(label + 1).astype(jnp.float32)],
                                    out_hw=(self.H, self.W))
            return aimg, alabels[0].astype(jnp.int32) - 1

        keys = jax.random.split(key, rgbs.shape[0])
        return jax.vmap(one)(keys, rgbs, labels)

    # ------------------------------------------------------------ seg update
    def _seg_update_impl(self, seg_state, images, labels, dropout_key):
        """One seg Adam step on assembled images/labels (ref :456-461);
        dropout active, matching the reference's train-mode forward."""
        params, batch_stats, opt_state = seg_state
        images, labels = self._shard_data(images, labels)

        def loss_fn(p):
            out, mutated = self.seg_model.apply(
                {"params": p, "batch_stats": batch_stats}, images,
                use_running_average=False, deterministic=False,
                rngs={"dropout": dropout_key},
                mutable=["batch_stats"])
            loss = cross_entropy_ignore(out["out"], labels,
                                        self.double_softmax)
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = self.seg_tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, new_stats, opt_state), loss

    # ============================================================== phases ==
    def _nerf_update(self, nerf_state, image, label, depth, pose, intr, uom,
                     key, occ_grid):
        return self._nerf_update_image(nerf_state, image, label, depth,
                                       pose, intr, uom, key, occ_grid)

    def _nerf_update_all(self, nerf_state, images, pseudo, depths, poses,
                         intrs, uoms, key, occ_grid):
        """B per-image Adam steps in one scanned dispatch; returns
        (state, image-mean loss parts) — the mean of per-image means is what
        the reference's epoch logging reduces to (ref :496-507)."""
        if self.fused_image_step:
            return self._nerf_update_fused(
                nerf_state, jnp.asarray(images), pseudo, jnp.asarray(depths),
                jnp.asarray(poses), jnp.asarray(intrs), jnp.asarray(uoms),
                key, occ_grid)
        b = images.shape[0]
        keys = jax.random.split(key, b)
        return self._nerf_update_batch(
            nerf_state, jnp.asarray(images), pseudo, jnp.asarray(depths),
            jnp.asarray(poses), jnp.asarray(intrs), jnp.asarray(uoms), keys,
            occ_grid)

    def nerf_fit_step(self, nerf_state, seg_state, batch, key, occ_grid=None):
        """Phase-1 step (ref training_step_nerf :473-513): seg pseudo-labels
        (no BN update), then one NeRF Adam step per image (scanned into a
        single dispatch).

        batch: numpy/JAX dict with img [B,H,W,3], depth [B,H,W], pose [B,4,4],
        intrinsics [B,4], one_m_to_scene_uom [B]. Returns (nerf_state, logs).
        """
        pseudo, _, _ = self.seg_infer(seg_state, batch["img"], update_bn=False)
        nerf_state, parts = self._nerf_update_all(
            nerf_state, batch["img"], pseudo, batch["depth"], batch["pose"],
            batch["intrinsics"], batch["one_m_to_scene_uom"], key, occ_grid)
        return nerf_state, dict(parts)

    # ----------------------------------------------- phase-1 epoch coalescing
    def seg_pseudo_labels(self, seg_state, images, chunk=8):
        """Pseudo-labels for a stack of images, chunked to bound memory.
        seg_state is FROZEN during the phase-1 NeRF fit (eval-mode forward,
        no BN update — ref training_step_nerf :477-479), so the per-epoch
        per-image pseudo-label recomputation of the step loop is redundant
        work: computing them once up front is mathematically identical and
        drops E*N seg forwards to ceil(N/chunk) dispatches per stage."""
        images = jnp.asarray(images)
        n = images.shape[0]
        pad = (-n) % chunk
        if pad:
            images = jnp.concatenate(
                [images, jnp.repeat(images[:1], pad, 0)], 0)
        preds = []
        for s in range(0, n + pad, chunk):
            pred, _, _ = self.seg_infer(seg_state, images[s:s + chunk],
                                        update_bn=False)
            preds.append(pred)
        return jnp.concatenate(preds, 0)[:n]

    def _nerf_fit_epoch_impl(self, nerf_state, imgs, pseudo, depths, poses,
                             intrs, uoms, order, key, occ_step, slab,
                             occ_grid):
        """One phase-1 epoch as ONE dispatch: lax.scan over the epoch's
        shuffled image indices with the occupancy refresh folded in as a
        lax.cond at its host cadence (VERDICT r4 #5 — the step loop paid
        ~2 dispatches x ~35 ms tunnel latency per image). The key stream
        replicates the host loop exactly (split per image; an extra split
        only on refresh steps), so the trajectory matches the per-step
        path bit-for-bit up to XLA fusion boundaries."""

        def body(carry, i):
            state, grid, key, step, slab = carry
            key, k = jax.random.split(key)
            if self.fused_image_step:
                state, parts = self._nerf_update_fused_impl(
                    state, imgs[i][None], pseudo[i][None], depths[i][None],
                    poses[i][None], intrs[i][None], uoms[i][None], k, grid)
            else:
                # _nerf_update_all with b=1: keys = split(k, 1)
                kimg = jax.random.split(k, 1)[0]
                state, parts = self._nerf_update_image_impl(
                    state, imgs[i], pseudo[i], depths[i], poses[i], intrs[i],
                    uoms[i], kimg, grid)
            step = step + 1
            if grid is not None:
                def refresh(args):
                    key, grid, slab = args
                    key, k2 = jax.random.split(key)
                    s = slab % self.occ_cfg.refresh_slabs
                    grid = self._update_grid_impl(state[0], grid, k2, s)
                    return key, grid, s + 1

                key, grid, slab = jax.lax.cond(
                    step % self.occ_cfg.update_every == 0,
                    refresh, lambda a: a, (key, grid, slab))
            return (state, grid, key, step, slab), parts

        (nerf_state, occ_grid, key, occ_step, slab), parts = jax.lax.scan(
            body, (nerf_state, occ_grid, key, occ_step, slab), order)
        parts = jax.tree_util.tree_map(lambda x: jnp.mean(x, axis=0), parts)
        return nerf_state, occ_grid, key, occ_step, slab, parts

    def nerf_fit_epoch(self, nerf_state, buffers, order, key, occ_step,
                       occ_grid=None):
        """Run one phase-1 epoch over device-resident buffers (from
        joint_loop._resident_fit_buffers) in a single dispatch. Returns
        (nerf_state, occ_grid, key, occ_step, epoch-mean loss parts);
        syncs the trainer's rotating occupancy-slab counter."""
        slab = jnp.int32(getattr(self, "_occ_slab", 0))
        (nerf_state, occ_grid, key, occ_step, slab, parts) = \
            self._nerf_fit_epoch(
                nerf_state, buffers["img"], buffers["pseudo"],
                buffers["depth"], buffers["pose"], buffers["intrinsics"],
                buffers["one_m_to_scene_uom"], jnp.asarray(order),
                key, jnp.int32(occ_step), slab, occ_grid)
        if occ_grid is not None:
            self._occ_slab = int(slab)
        return nerf_state, occ_grid, key, int(occ_step), dict(parts)

    def _joint_step_fused_impl(self, nerf_state, seg_state, new, old_img,
                               old_label, cl_img, cl_label, key, occ_grid,
                               packed_test):
        """joint_step's five dispatches (render / pseudo-label / per-image
        NeRF updates / augment / seg update) traced as ONE program
        (VERDICT r4 #5: ~35 ms tunnel latency per dispatch on this host).
        Same ops, same order, same key stream as the separate-dispatch
        path below — only XLA's fusion boundaries move. `new` is the
        array-only slice of batch_new; jit re-traces per batch composition
        (None vs array args), exactly like the separate paths recompile
        per composition today."""
        logs = {}
        rendered = None
        if new is not None:
            rendered = self._render_frames_impl(
                nerf_state[0], new["pose"], new["intrinsics"][0], occ_grid,
                packed_test, cfg=self.test_cfg)
            if not self.fix_nerf:
                b = new["img"].shape[0]
                params, stats, opt = seg_state
                pseudo, _, stats = self._seg_infer_impl(
                    params, stats, new["img"], update_bn=b > 1)
                seg_state = (params, stats, opt)
                key, k = jax.random.split(key)
                if self.fused_image_step:
                    nerf_state, parts = self._nerf_update_fused_impl(
                        nerf_state, new["img"], pseudo, new["depth"],
                        new["pose"], new["intrinsics"],
                        new["one_m_to_scene_uom"], k, occ_grid)
                else:
                    keys = jax.random.split(k, b)
                    nerf_state, parts = self._nerf_update_batch_impl(
                        nerf_state, new["img"], pseudo, new["depth"],
                        new["pose"], new["intrinsics"],
                        new["one_m_to_scene_uom"], keys, occ_grid)
                logs.update(parts)

        imgs, labels = [], []
        if rendered is not None:
            key, k = jax.random.split(key)
            aug_rgb, aug_label = self._augment_rendered_impl(
                k, rendered["nerf_rgb"], rendered["nerf_semantics"])
            imgs.append(aug_rgb)
            labels.append(aug_label)
        if old_img is not None:
            imgs.append(old_img)
            labels.append(old_label)
        if cl_img is not None:
            imgs.append(cl_img.reshape(-1, *cl_img.shape[2:]))
            labels.append(cl_label.reshape(-1, *cl_label.shape[2:]))

        rgb_seg = jnp.concatenate(imgs, 0)
        label_seg = jnp.concatenate(labels, 0)
        key, k = jax.random.split(key)
        seg_state, seg_loss = self._seg_update_impl(seg_state, rgb_seg,
                                                    label_seg, k)
        logs["loss_seg"] = seg_loss
        return nerf_state, seg_state, logs

    def joint_step(self, nerf_state, seg_state, batch_old, batch_new,
                   batch_cl, key, occ_grid=None):
        """Phase-2 step (ref training_step_joint :363-471).

        Returns (nerf_state, seg_state, logs). Default path: one fused
        dispatch (`nerf.fused_joint_step: false` restores the separate
        dispatches)."""
        if self.fused_joint_step:
            new = None
            packed = None
            if batch_new is not None:
                new = {k: jnp.asarray(batch_new[k])
                       for k in ("img", "depth", "pose", "intrinsics",
                                 "one_m_to_scene_uom")}
                packed = self.packed_for(nerf_state[0], self.test_cfg)
            old_img = old_label = cl_img = cl_label = None
            if batch_old is not None:
                old_img = jnp.asarray(batch_old["img"])
                old_label = jnp.asarray(batch_old["nerf_label"])
            if batch_cl is not None:
                cl_img = jnp.asarray(batch_cl["replay_img"])
                cl_label = jnp.asarray(batch_cl["replay_label"])
            nerf_state, seg_state, logs = self._joint_step_fused(
                nerf_state, seg_state, new, old_img, old_label, cl_img,
                cl_label, key, occ_grid, packed)
            return nerf_state, seg_state, dict(logs)

        logs = {}
        rendered = None
        if batch_new is not None:
            rendered = self.render_frames(
                nerf_state[0], jnp.asarray(batch_new["pose"]),
                jnp.asarray(batch_new["intrinsics"][0]), occ_grid)

            if not self.fix_nerf:
                b = batch_new["img"].shape[0]
                pseudo, _, seg_state = self.seg_infer(
                    seg_state, jnp.asarray(batch_new["img"]),
                    update_bn=b > 1)
                key, k = jax.random.split(key)
                # image-MEAN loss parts (ref logs per-image; an epoch mean
                # of per-image means is the equivalent)
                nerf_state, parts = self._nerf_update_all(
                    nerf_state, batch_new["img"], pseudo, batch_new["depth"],
                    batch_new["pose"], batch_new["intrinsics"],
                    batch_new["one_m_to_scene_uom"], k, occ_grid)
                logs.update(parts)

        # ---- assemble seg batch (ref :419-454) ----
        imgs, labels = [], []
        if rendered is not None:
            key, k = jax.random.split(key)
            aug_rgb, aug_label = self._augment_rendered(
                k, rendered["nerf_rgb"], rendered["nerf_semantics"])
            imgs.append(aug_rgb)
            labels.append(aug_label)
        if batch_old is not None:
            imgs.append(jnp.asarray(batch_old["img"]))
            labels.append(jnp.asarray(batch_old["nerf_label"]))
        if batch_cl is not None:
            r_img = jnp.asarray(batch_cl["replay_img"])
            r_lab = jnp.asarray(batch_cl["replay_label"])
            imgs.append(r_img.reshape(-1, *r_img.shape[2:]))
            labels.append(r_lab.reshape(-1, *r_lab.shape[2:]))

        rgb_seg = jnp.concatenate(imgs, 0)
        label_seg = jnp.concatenate(labels, 0)
        key, k = jax.random.split(key)
        seg_state, seg_loss = self._seg_update(seg_state, rgb_seg, label_seg,
                                               k)
        logs["loss_seg"] = seg_loss
        return nerf_state, seg_state, logs

    # ------------------------------------------------------------ prediction
    def predict_frame(self, nerf_state, seg_state, pose, intrinsics,
                      image=None, occ_grid=None):
        """One predict item (ref predict_step :714-782): NeRF render + seg
        forward (on the render itself for novel viewpoints). Returns device
        dict; host IO belongs to the caller."""
        out = self._render_frame(nerf_state[0], pose, intrinsics, occ_grid,
                                 which="predict")
        seg_input = (out["nerf_rgb"][None] if image is None
                     else jnp.asarray(image)[None])
        seg_pred, _, _ = self.seg_infer(seg_state, seg_input, update_bn=False)
        out["seg_semantics"] = seg_pred[0]
        return out
