"""Per-scene Semantic-NeRF fitting: jitted train / render steps.

TPU-native equivalent of the reference's NeRF-side training logic
(ref: nr4seg/lightning/joint_train_lightning_net.py):
  * ray sampling: 4096 uniform random pixels per image        (:108-157)
  * losses: MSE(rgb) + 0.04 * NLL(semantics, ignore -1)
            + 0.1 * L1(depth / one_m_to_scene_uom, gt != 0)   (:167-223)
  * optimizer: Adam(lr 1e-2, betas (0.9, 0.99), eps 1e-15) with weight decay
    1e-6 on the MLPs but NOT on the hash encoder               (:897-919)
The reference's fp16 autocast + GradScaler + manual optimization collapse
into one jitted bf16 step with fp32 master params — no loss scaling needed
on TPU bf16.
"""

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..data.rays import get_rays_sampled
from ..models.semantic_nerf import SemanticNeRF
from ..ops.occupancy import OccupancyConfig, init_grid, update_grid
from ..ops.renderer import (RenderConfig, normalize_semantics, render_rays,
                            render_rays_staged, train_packing_enabled)


def make_nerf_optimizer(lr: float = 1e-2, weight_decay: float = 1e-6):
    """Adam with the reference's two param groups: decay on MLPs, none on the
    hash table (ref :897-919). Torch-Adam-style coupled decay (wd added to
    the gradient before the moment updates)."""

    def decay_mask(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: not any(
                getattr(p, "key", None) == "encoder" for p in path),
            params)

    return optax.chain(
        optax.add_decayed_weights(weight_decay, mask=decay_mask),
        optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-15, eps_root=0.0),
        optax.scale(-lr),
    )


def nerf_losses(outputs: dict, gt_rgb: jnp.ndarray, labels: jnp.ndarray,
                gt_depth: jnp.ndarray, one_m_to_scene_uom: jnp.ndarray,
                num_classes: int):
    """The reference's 3-loss objective on one ray batch
    (ref :201-222). labels use -1 as ignore; gt_depth 0 as invalid.

    Returns (total, dict of parts).
    """
    pred_rgb = outputs["image"]
    pred_depth = outputs["depth"]

    loss_rgb = jnp.mean((pred_rgb - gt_rgb) ** 2)

    sem, invalid = normalize_semantics(outputs["semantics"])
    labels = jnp.where(invalid, -1, labels)
    logp = jnp.log(sem + 1e-15)
    valid = labels >= 0
    picked = jnp.take_along_axis(
        logp, jnp.clip(labels, 0, num_classes - 1)[..., None], axis=-1)[..., 0]
    # torch NLLLoss(reduction='none') yields 0 at ignored targets and the
    # reference then takes .mean() over ALL rays — keep that normalization.
    loss_sem = jnp.mean(jnp.where(valid, -picked, 0.0))

    depth_valid = gt_depth != 0
    l1 = jnp.abs(pred_depth / one_m_to_scene_uom - gt_depth)
    n_valid = jnp.maximum(jnp.sum(depth_valid), 1)
    loss_depth = jnp.sum(jnp.where(depth_valid, l1, 0.0)) / n_valid

    total = loss_rgb + 0.04 * loss_sem + 0.1 * loss_depth
    return total, {"loss_nerf_rgb": loss_rgb, "loss_nerf_semantics": loss_sem,
                   "loss_depth": loss_depth, "loss_nerf_total": total}


class NeRFTrainer:
    """Owns the jitted steps for fitting one scene's Semantic-NeRF.

    Not a framework object — a thin namespace of compiled functions over
    (params, opt_state) pytrees, driven by a plain Python epoch loop.
    """

    def __init__(self, model: SemanticNeRF, render_cfg: RenderConfig = None,
                 lr: float = 1e-2, n_rays: int = 4096,
                 image_hw: tuple[int, int] = (240, 320), mesh=None):
        """mesh: optional 1-D jax Mesh with a "data" axis — the ray batch is
        sharded across it inside the jitted step (params replicated, XLA
        inserts the gradient psum over ICI). This is the TPU-native scaling
        story for NeRF fitting: the ray axis is the reference's only
        intra-step parallel dimension (SURVEY.md §2.3)."""
        self.model = model
        self.cfg = render_cfg or RenderConfig()
        self.tx = make_nerf_optimizer(lr)
        self.n_rays = n_rays
        self.H, self.W = image_hw
        self.mesh = mesh
        self.occ_cfg = OccupancyConfig()
        # single jitted wrapper per impl — jax.jit retraces on pytree
        # structure, so occ_grid None-vs-array get separate cache entries
        self._train_step = jax.jit(self._step_body, donate_argnums=(0, 1))
        self._render_image = jax.jit(self._render_image_impl)
        self._update_grid = jax.jit(self._update_grid_impl,
                                    donate_argnums=(1,))
        from ..models.packed_table import PackedTableCache
        self._packed_cache = PackedTableCache(self.model)

    def _shard_rays(self, *arrays):
        if self.mesh is None:
            return arrays
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(self.mesh, P("data"))
        return tuple(jax.lax.with_sharding_constraint(a, sh) for a in arrays)

    def init(self, key: jax.Array):
        x = jnp.zeros((8, 3))
        d = jnp.zeros((8, 3)).at[:, 2].set(1.0)
        variables = self.model.init(key, x, d)
        params = variables["params"]
        return params, self.tx.init(params)

    # --- occupancy state ---
    def init_occupancy(self):
        self._occ_slab = 0
        return init_grid(self.occ_cfg)

    def _density_probe_fn(self, params):
        """Density for grid refresh: sampled-corner probe (8x fewer table
        reads) unless the config asks for exact."""
        if self.occ_cfg.probe_sampled:
            return lambda pts: self.model.apply({"params": params}, pts,
                                                method="density_probe")

        def exact(pts):
            sigma, _ = self.model.apply({"params": params}, pts,
                                        method="density")
            return sigma
        return exact

    def _update_grid_impl(self, params, grid, key, slab_index):
        return update_grid(grid, self._density_probe_fn(params),
                           self.model.bound, key, self.occ_cfg,
                           slab_index=slab_index)

    def update_occupancy(self, params, grid, key):
        """Refresh the density EMA grid (call every occ_cfg.update_every
        steps). Rotates through refresh_slabs grid slabs."""
        slab = getattr(self, "_occ_slab", 0) % self.occ_cfg.refresh_slabs
        self._occ_slab = slab + 1
        return self._update_grid(params, grid, key, jnp.int32(slab))

    # --- jitted impls ---
    def _step_body(self, params, opt_state, batch, key, occ_grid):
        """One image, one ray batch, one Adam step.

        batch: dict with pose [4,4], intrinsics [4], image [H,W,3],
        label [H,W] int32 (-1 ignore), depth [H,W] (0 invalid),
        one_m_to_scene_uom scalar.
        """
        k_rays, k_render = jax.random.split(key)
        rays_o, rays_d, dnorms, inds = get_rays_sampled(
            batch["pose"], batch["intrinsics"], self.H, self.W, k_rays,
            self.n_rays)
        gt_rgb = batch["image"].reshape(-1, 3)[inds]
        labels = batch["label"].reshape(-1)[inds]
        gt_depth = batch["depth"].reshape(-1)[inds]
        rays_o, rays_d, dnorms, gt_rgb, labels, gt_depth = self._shard_rays(
            rays_o, rays_d, dnorms, gt_rgb, labels, gt_depth)

        def loss_fn(p):
            packed = None
            if self.cfg.train_packed_max_entries > 0 and \
                    train_packing_enabled():
                # per-step relayout of the coarse levels: forward gathers one
                # row per (point, packed level); the custom VJP still writes
                # gradients to the raw table (hash_encode_packed_train)
                packed = jax.lax.stop_gradient(self.model.pack_table(
                    p, self.cfg.train_packed_max_entries))
                if packed.n_packed == 0:
                    packed = None
            outputs = render_rays(self.model, {"params": p}, rays_o, rays_d,
                                  dnorms, k_render, self.cfg, occ_grid,
                                  packed=packed)
            return nerf_losses(outputs, gt_rgb, labels, gt_depth,
                               batch["one_m_to_scene_uom"],
                               self.model.num_semantic_classes)

        (_, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, parts

    def _render_image_impl(self, params, pose, intrinsics, rays,
                           occ_grid=None, packed=None):
        """Full-frame deterministic render → rgb [H,W,3], semantic argmax
        [H,W], semantic probs [H,W,C], depth [H,W]
        (ref forward_nerf_test, joint_train_lightning_net.py:225-257)."""
        out = render_rays_staged(self.model, {"params": params},
                                 rays["rays_o"], rays["rays_d"],
                                 rays["direction_norms"], self.cfg, occ_grid,
                                 packed=packed)
        sem, invalid = normalize_semantics(out["semantics"])
        pred_sem = jnp.argmax(sem, axis=-1)
        H, W = self.H, self.W
        return {
            "nerf_rgb": out["image"].reshape(H, W, 3),
            "nerf_semantics": pred_sem.reshape(H, W),
            "nerf_semantics_raw": sem.reshape(H, W, -1),
            "nerf_depth": out["depth"].reshape(H, W),
            "nerf_invalid": invalid.reshape(H, W),
        }

    # --- public API ---
    def train_step(self, params, opt_state, batch, key, occ_grid=None):
        return self._train_step(params, opt_state, batch, key, occ_grid)

    def packed_for(self, params):
        """Cell-packed render table for these params (cached per
        (table array identity, budget, dtype) — see PackedTableCache)."""
        return self._packed_cache(params, self.cfg)

    def render_image(self, params, pose, intrinsics, rays, occ_grid=None):
        return self._render_image(params, pose, intrinsics, rays, occ_grid,
                                  self.packed_for(params))
