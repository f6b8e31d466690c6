"""Volumetric Semantic-NeRF renderer — jit-compiled, static shapes.

TPU-native re-design of the reference's `SemanticNeRFRenderer.run/render`
(ref: nr4seg/nerf/renderer_semantics.py:123-358):

  coarse: AABB slab test → 256 stratified z (optionally jittered) →
          density(hash + sigma MLP)
  fine:   stop-gradient compositing weights → inverse-CDF resample 256 more →
          second density pass → merge + sort 512 samples
  shade:  alpha compositing; color MLP (SH dir + geo feat) and semantics MLP
          evaluated densely (the reference's dynamic `weights > 1e-4` gather
          becomes a weight mask in the reduction — static shapes on TPU)
  out:    rgb [N,3], semantic probs [N,C], z-depth [N]

Differences from the reference, by design:
  * one traced function instead of Python-loop chunking — full-image renders
    use `lax.map` over fixed-size ray chunks (ref staged loop :321-342);
  * randomness via explicit jax.random keys;
  * fp32 compositing over bf16 MLP outputs (ref uses fp16 AMP + GradScaler);
  * `bg_color` is omitted: the reference accepts it but never mixes it in
    (quirk, ref :288-293).
"""

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..models.semantic_nerf import SemanticNeRF
from .aabb import near_far_from_aabb
from .compositing import composite, composite_weights
from .sampling import sample_pdf, stratified_samples


@dataclass(frozen=True)
class RenderConfig:
    num_steps: int = 256
    upsample_steps: int = 256
    density_scale: float = 1.0
    min_near: float = 0.2
    weight_mask_threshold: float = 1e-4
    max_ray_batch: int = 4096
    # early-termination rendering (test/predict path): the TPU-native
    # equivalent of the reference's alive-ray compaction + T<1e-4 early exit
    # (ref raymarching.cu:528-864 kernel_march/composite/compact_rays). A
    # cheap stage-1 pass (stage1_steps occupancy-guided samples) renders all
    # rays; rays whose residual transmittance stays above term_threshold
    # (the reference's exact exit criterion) are compacted — top-K by
    # residual, K = refine_fraction * chunk — and re-rendered at the full
    # num_steps+upsample_steps budget. Static shapes throughout: top_k +
    # gather + scatter instead of the CUDA stream compaction.
    early_stop: bool = False
    stage1_steps: int = 8
    refine_fraction: float = 0.25
    term_threshold: float = 1e-4
    # occupancy-guided coarse placement (render_rays occ_grid argument):
    # number of probe depths per ray + the sampling floor/threshold (single
    # source of truth for sampling; OccupancyConfig keeps only grid-EMA
    # parameters)
    occ_candidates: int = 128
    occ_floor: float = 0.01
    occ_density_threshold: float = 0.01
    # cell-packed render tables (models/packed_table.py): levels whose cell
    # count fits this budget are relaid out so all 8 corner features arrive
    # in ONE gather row — exact, ~8x memory on those levels, and the frame's
    # gather-row count (its whole cost on TPU) drops by the packed fraction.
    # 2^23 packs through res~194 of the bound-4 grid (~340 MB bf16, rows per
    # sample 128 → 79). 0 disables. Trainers build/cache the PackedTable per
    # params version and hand it to the render entry points.
    packed_max_entries: int = 8 * 1024 * 1024
    # storage dtype of the packed cell rows: "fp8" (float8_e4m3 rows — 16 B
    # instead of 32 B per cell row) or "bf16" (exact relayout). Measured on
    # the fitted room (scripts/bench_render.py, round 3): fp8 renders
    # 10-14% faster at -0.01 dB with bit-identical semantic labels, so it
    # is the default; render-only — training always reads the f32 table
    # (train packing stays bf16).
    packed_dtype: str = "fp8"
    # probe-placement rendering (render-only): the coarse density pass runs
    # with the CHEAP probe encoding (packed levels exact + fine levels
    # single-corner-sampled, ~n_levels rows/point instead of 8*n_levels) and
    # is used purely to PLACE the final samples via inverse-CDF importance —
    # probe samples are never composited. The exact encoding then only pays
    # for the final num_steps samples. upsample_steps is ignored in this
    # mode (placement is already importance-driven).
    probe_placement: bool = False
    num_probe: int = 16
    # proposal placement (VERDICT r4 #4; requires an occupancy grid):
    # coarse samples are drawn from the grid's EMA-density ALPHAS
    # (graded, 1-exp(-sigma*dz)) instead of the binary {floor,1} occupancy
    # weights — zero extra cost (same candidate gathers), but placement
    # now concentrates at surfaces the way a NeRF-evaluated proposal
    # would (mip-NeRF 360's proposal-sampling shape with the grid as the
    # free proposal model). That lets the fine importance pass SHRINK
    # (e.g. 24 proposal-placed + 8 fine vs the shipped 32+32): the fine
    # pass's remaining job is only sub-grid-cell localization. Measured
    # (tests/test_proposal_placement.py A/B): proposal-only (no fine
    # pass) keeps PSNR but loses label sharpness — keep a small
    # upsample_steps. Without a grid the flag is ignored.
    proposal_placement: bool = False
    # TRAIN-step packing: rebuild a small cell-packed prefix (levels within
    # this budget) inside every train step and gather the forward through it
    # (backward still writes the raw table via the custom VJP —
    # hash_encode_packed_train). Rebuild cost is one ~budget-row gather;
    # profitable when the per-step forward reads far more rows than the
    # pack writes. Measured on-chip (PERFORMANCE.md train-step ladder):
    # pk21 drops the 32+32 step 295 -> 265 ms with updates equal to the
    # unpacked step (table leaf exact, MLP leaves within 1 ULP of XLA
    # matmul reassociation) — default ON at 2^21 since round 3; trainers
    # gate it to the TPU backend (on CPU it only adds compile time).
    # 0 disables.
    train_packed_max_entries: int = 2 ** 21
    # rematerialize the MLP/hash-encoding evaluations in the backward pass,
    # trading an extra density evaluation (the expensive gathers!) for
    # activation memory. Since the hash VJP recomputes indices/weights in
    # bounded chunks itself (models/hash_encoding.py _chunked_scatter_bwd),
    # the reference's 256+256 workload FITS on the 16 GB chip without
    # remat — and runs 2.3x faster (567 -> 1,284 rays/s measured; the remat
    # was re-paying the full forward gather bill in backward). "auto" now
    # remats only beyond the reference's densest budget (> 512 samples).
    remat: bool | str = "auto"

    def use_remat(self) -> bool:
        if self.remat == "auto":
            return self.num_steps + self.upsample_steps > 512
        return bool(self.remat)


def _clip_to_aabb(xyz, aabb):
    return jnp.minimum(jnp.maximum(xyz, aabb[:3]), aabb[3:])


def _shard_rays(mesh, *arrays):
    """Constrain the leading (ray) axis onto the mesh's `data` axis. The
    per-sample work then runs fully parallel across devices; parameter
    gradients psum over ICI when taken through this. No-op when the ray
    count doesn't divide the mesh (shapes are static so this is a trace-time
    Python check)."""
    if mesh is None:
        return arrays
    from jax.sharding import NamedSharding, PartitionSpec as P
    n = mesh.devices.size
    sh = NamedSharding(mesh, P("data"))
    return tuple(
        jax.lax.with_sharding_constraint(a, sh) if a.shape[0] % n == 0 else a
        for a in arrays)


def train_packing_enabled() -> bool:
    """Whether train-step packing (RenderConfig.train_packed_max_entries)
    actually engages: TPU only — on CPU backends (tests, virtual meshes) it
    only adds compile time. UCSA_TRAIN_PACKED_ON_CPU=1 forces it on for the
    CPU equality tests."""
    import os
    import jax
    return (jax.default_backend() == "tpu"
            or os.environ.get("UCSA_TRAIN_PACKED_ON_CPU") == "1")


def render_rays(model: SemanticNeRF, variables: Any, rays_o: jnp.ndarray,
                rays_d: jnp.ndarray, direction_norms: jnp.ndarray,
                key: jax.Array | None, cfg: RenderConfig = RenderConfig(),
                occ_grid: jnp.ndarray | None = None, mesh=None,
                packed=None):
    """Render a flat batch of rays.

    Args:
      rays_o, rays_d: [N, 3] origins / unit directions (scene units).
      direction_norms: [N] norms of the unnormalized pixel directions
        (converts distance-along-ray to z-depth, ref :274-277).
      key: PRNG key → perturbed (training) sampling; None → deterministic.
      mesh: optional jax Mesh with a `data` axis — rays shard across it
        (params/occ grid replicated), the TPU-native replacement for the
        reference's single-GPU renders.

    Returns dict: image [N,3], semantics [N,C] (unnormalized probability
    mass, sums to accumulated weight), depth [N] (z-depth in scene units).
    """
    rays_o, rays_d, direction_norms = _shard_rays(
        mesh, rays_o, rays_d, direction_norms)
    bound = model.bound
    aabb = jnp.array([-bound, -bound, -bound, bound, bound, bound],
                     jnp.float32)
    n_rays = rays_o.shape[0]

    # key is not None ⇔ training-step render: density may use the sampled
    # single-corner encoding when the model enables stochastic_fwd
    is_train = key is not None

    def _density(v, pts):
        # kwarg only when set: test stand-in models densities take (x, train)
        if packed is None:
            return model.apply(v, pts, is_train, method="density")
        return model.apply(v, pts, is_train, packed=packed, method="density")

    def _color(v, d, g):
        return model.apply(v, d, g, method="color")

    def _semantics(v, g):
        return model.apply(v, g, method="semantics")

    if cfg.use_remat():
        _density = jax.checkpoint(_density)
        _color = jax.checkpoint(_color)
        _semantics = jax.checkpoint(_semantics)

    density_fn = lambda pts: _density(variables, pts)
    color_fn = lambda d, g: _color(variables, d, g)
    semantics_fn = lambda g: _semantics(variables, g)

    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, cfg.min_near)

    if key is not None:
        k_coarse, k_fine = jax.random.split(key)
    else:
        k_coarse = k_fine = None

    # --- probe placement (render-only fast path; see RenderConfig) ---
    if cfg.probe_placement and not is_train:
        if occ_grid is not None:
            from .occupancy import occupancy_at
            cand_z = stratified_samples(nears, fars, cfg.occ_candidates, None)
            cand_xyz = (rays_o[:, None, :]
                        + rays_d[:, None, :] * cand_z[..., None])
            w_occ = occupancy_at(occ_grid, cand_xyz, bound,
                                 cfg.occ_floor, cfg.occ_density_threshold)
            z_mid_cand = 0.5 * (cand_z[..., 1:] + cand_z[..., :-1])
            z_probe = sample_pdf(z_mid_cand, w_occ[..., 1:-1], cfg.num_probe,
                                 None)
            z_probe = jnp.sort(z_probe, axis=-1)
        else:
            z_probe = stratified_samples(nears, fars, cfg.num_probe, None)
        xyz_p = _clip_to_aabb(
            rays_o[:, None, :] + rays_d[:, None, :] * z_probe[..., None],
            aabb)
        sigma_p = model.apply(variables, xyz_p.reshape(-1, 3), packed,
                              method="density_probe")
        sigma_p = sigma_p.reshape(n_rays, cfg.num_probe)
        w_probe = composite_weights(z_probe, sigma_p, cfg.density_scale)
        z_mid_p = 0.5 * (z_probe[..., 1:] + z_probe[..., :-1])
        z_vals = jnp.sort(sample_pdf(z_mid_p, w_probe[:, 1:-1],
                                     cfg.num_steps, None), axis=-1)
        xyz = _clip_to_aabb(
            rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None], aabb)
        sigma, geo = density_fn(xyz.reshape(-1, 3))
        sigma = sigma.reshape(n_rays, cfg.num_steps)
        geo = geo.reshape(n_rays, cfg.num_steps, -1)
        weights = composite_weights(z_vals, sigma, cfg.density_scale)
        t_total = cfg.num_steps
        dirs = jnp.broadcast_to(rays_d[:, None, :], (n_rays, t_total, 3))
        rgbs = color_fn(dirs.reshape(-1, 3),
                        geo.reshape(-1, geo.shape[-1])
                        ).reshape(n_rays, t_total, 3)
        sems = semantics_fn(geo.reshape(-1, geo.shape[-1])).reshape(
            n_rays, t_total, -1)
        image, semantics, depth = composite(weights, z_vals, rgbs, sems,
                                            direction_norms,
                                            cfg.weight_mask_threshold)
        return {"image": image, "semantics": semantics, "depth": depth}

    # --- coarse pass ---
    if occ_grid is not None:
        # occupancy-guided placement: weight uniformly-spaced candidate
        # depths by grid occupancy and draw the sample budget from that CDF
        # (static-shape replacement for occupancy-grid ray marching; see
        # ops/occupancy.py)
        from .occupancy import density_at, occupancy_at
        n_cand = cfg.occ_candidates
        cand_z = stratified_samples(nears, fars, n_cand, None)
        cand_xyz = rays_o[:, None, :] + rays_d[:, None, :] * cand_z[..., None]
        if cfg.proposal_placement:
            # proposal placement: graded per-candidate local opacity from
            # the grid's EMA density instead of the binary {floor, 1}
            # occupancy weights. At the all-ones warmup grid every alpha
            # ties -> uniform-over-volume placement (same as the binary
            # path's optimistic init); converged empty cells fall to the
            # floor trickle; occupied cells place in proportion to
            # 1-exp(-sigma*dz). Local alpha (not transmittance-weighted)
            # so warmup has no near-camera bias; compositing handles
            # occlusion exactly. This upgrades the coarse placement enough
            # that the fine importance pass can SHRINK (upsample_steps
            # 32 -> 8-16) or vanish — the row-count lever; placement finer
            # than a grid cell still needs a small fine pass (measured:
            # proposal-only keeps PSNR but costs label sharpness).
            sigma_c = density_at(occ_grid, cand_xyz, bound)
            dz = ((fars - nears) / n_cand)[:, None]
            alpha = 1.0 - jnp.exp(-sigma_c * dz * cfg.density_scale)
            w_occ = jnp.maximum(alpha, cfg.occ_floor)
        else:
            w_occ = occupancy_at(occ_grid, cand_xyz, bound,
                                 cfg.occ_floor, cfg.occ_density_threshold)
        z_mid_cand = 0.5 * (cand_z[..., 1:] + cand_z[..., :-1])
        z_vals = sample_pdf(z_mid_cand, w_occ[..., 1:-1], cfg.num_steps,
                            k_coarse)
        z_vals = jnp.sort(z_vals, axis=-1)
    else:
        z_vals = stratified_samples(nears, fars, cfg.num_steps, k_coarse)
    xyz = _clip_to_aabb(
        rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None], aabb)
    sigma, geo = density_fn(xyz.reshape(-1, 3))
    sigma = sigma.reshape(n_rays, cfg.num_steps)
    geo = geo.reshape(n_rays, cfg.num_steps, -1)

    # --- fine pass: importance-resample from detached coarse weights ---
    if cfg.upsample_steps > 0:
        w_coarse = jax.lax.stop_gradient(
            composite_weights(z_vals, sigma, cfg.density_scale))
        z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        new_z = sample_pdf(z_mid, w_coarse[:, 1:-1], cfg.upsample_steps,
                           k_fine)
        new_z = jax.lax.stop_gradient(new_z)
        new_xyz = _clip_to_aabb(
            rays_o[:, None, :] + rays_d[:, None, :] * new_z[..., None], aabb)
        new_sigma, new_geo = density_fn(new_xyz.reshape(-1, 3))
        new_sigma = new_sigma.reshape(n_rays, cfg.upsample_steps)
        new_geo = new_geo.reshape(n_rays, cfg.upsample_steps, -1)

        z_all = jnp.concatenate([z_vals, new_z], axis=-1)
        order = jnp.argsort(z_all, axis=-1)
        z_vals = jnp.take_along_axis(z_all, order, axis=-1)
        sigma = jnp.take_along_axis(
            jnp.concatenate([sigma, new_sigma], axis=-1), order, axis=-1)
        geo = jnp.take_along_axis(
            jnp.concatenate([geo, new_geo], axis=1), order[..., None], axis=1)

    # --- shade + composite ---
    weights = composite_weights(z_vals, sigma, cfg.density_scale)
    t_total = z_vals.shape[-1]
    dirs = jnp.broadcast_to(rays_d[:, None, :], (n_rays, t_total, 3))
    rgbs = color_fn(dirs.reshape(-1, 3),
                    geo.reshape(-1, geo.shape[-1])).reshape(n_rays, t_total, 3)
    sems = semantics_fn(geo.reshape(-1, geo.shape[-1])).reshape(
        n_rays, t_total, -1)

    image, semantics, depth = composite(weights, z_vals, rgbs, sems,
                                        direction_norms,
                                        cfg.weight_mask_threshold)
    return {"image": image, "semantics": semantics, "depth": depth}


def render_rays_early_stop(model: SemanticNeRF, variables: Any,
                           rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                           direction_norms: jnp.ndarray,
                           cfg: RenderConfig = RenderConfig(),
                           occ_grid: jnp.ndarray | None = None, mesh=None,
                           packed=None, valid: jnp.ndarray | None = None):
    """Two-stage early-termination render of one ray batch (deterministic,
    render-only — training keeps the single-pass differentiable path).

    Stage 1 renders every ray with a small occupancy-guided budget
    (cfg.stage1_steps, no importance pass). Rays that saturate — residual
    transmittance 1 - sum(weights) < cfg.term_threshold, the reference's
    early-exit test (ref raymarching.cu:627-650 `if (T < 1e-4) break`) —
    keep their stage-1 result: once transmittance is gone, extra samples
    carry ~zero weight. The top refine_fraction rays by residual (the "alive
    rays" of ref kernel_compact_rays :821-864, here a static-K top_k) are
    re-rendered at the full budget and scattered back.

    Cost: N*stage1 + K*(num_steps+upsample) samples instead of
    N*(num_steps+upsample) — the hash-table gather traffic (the whole cost
    of a render on TPU, PERFORMANCE.md) drops by the same factor.
    """
    from dataclasses import replace
    n = rays_o.shape[0]
    cfg_a = replace(cfg, num_steps=cfg.stage1_steps, upsample_steps=0,
                    early_stop=False)
    out_a = render_rays(model, variables, rays_o, rays_d, direction_norms,
                        None, cfg_a, occ_grid, mesh, packed)
    # accumulated (masked) weight per ray == total semantic mass (semantics
    # heads output a probability distribution weighted by detached w).
    # Note t_rem is NOT pure residual transmittance: the synthetic last
    # delta (1e10) hands any residual to the final sample, so t_rem counts
    # (a) mass the weight threshold masked out and (b) truly-zero-density
    # paths (vacuum ⇒ last alpha = 0). Both are exactly the rays whose
    # stage-1 result is untrustworthy; fully saturated rays score ~0.
    acc = jnp.sum(out_a["semantics"], axis=-1)
    t_rem = 1.0 - acc
    if valid is not None:
        # padded filler lanes (the staged render's last chunk) must never
        # win refine slots over real unsaturated rays — an empty filler
        # path looks maximally "alive" and would displace up to K real
        # rays, silently leaving them at stage-1 quality
        t_rem = jnp.where(valid, t_rem, -jnp.inf)

    k = max(1, int(round(n * cfg.refine_fraction)))
    _, inds = jax.lax.top_k(t_rem, k)
    cfg_b = replace(cfg, early_stop=False)
    out_b = render_rays(model, variables, rays_o[inds], rays_d[inds],
                        direction_norms[inds], None, cfg_b, occ_grid, mesh,
                        packed)

    # overwrite only genuinely unsaturated rays (top_k pads with saturated
    # ones when fewer than K are alive; their stage-1 result already stands)
    alive = t_rem[inds] > cfg.term_threshold
    out = {}
    for name, a in out_a.items():
        b = out_b[name]
        sel = alive.reshape(alive.shape + (1,) * (b.ndim - 1))
        out[name] = a.at[inds].set(jnp.where(sel, b, a[inds]))
    return out


def render_rays_staged(model: SemanticNeRF, variables: Any,
                       rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                       direction_norms: jnp.ndarray,
                       cfg: RenderConfig = RenderConfig(),
                       occ_grid: jnp.ndarray | None = None, mesh=None,
                       packed=None):
    """Full-frame render: lax.map over fixed-size ray chunks.

    Replaces the reference's Python `while head < N` staging loop
    (ref :321-342). Rays are padded to a multiple of max_ray_batch; the
    sequential map bounds peak memory to one chunk's activations.
    """
    n = rays_o.shape[0]
    chunk = cfg.max_ray_batch
    n_pad = (-n) % chunk

    def pad(x, fill=0.0):
        if n_pad == 0:
            return x
        return jnp.concatenate(
            [x, jnp.full((n_pad,) + x.shape[1:], fill, x.dtype)], 0)

    ro = pad(rays_o).reshape(-1, chunk, 3)
    # pad directions with +z unit vectors so padded lanes stay finite
    rd = rays_d
    if n_pad:
        unit_z = jnp.tile(jnp.array([[0.0, 0.0, 1.0]], rays_d.dtype),
                          (n_pad, 1))
        rd = jnp.concatenate([rays_d, unit_z], 0)
    rd = rd.reshape(-1, chunk, 3)
    dn = pad(direction_norms, fill=1.0).reshape(-1, chunk)
    vm = pad(jnp.ones((n,), jnp.bool_), fill=False).reshape(-1, chunk)

    def one_chunk(args):
        o, d, nrm, v = args
        if cfg.early_stop:
            return render_rays_early_stop(model, variables, o, d, nrm, cfg,
                                          occ_grid, mesh, packed, valid=v)
        return render_rays(model, variables, o, d, nrm, None, cfg, occ_grid,
                           mesh, packed)

    out = jax.lax.map(one_chunk, (ro, rd, dn, vm))
    return {k: v.reshape((-1,) + v.shape[2:])[:n] for k, v in out.items()}


def normalize_semantics(semantics: jnp.ndarray):
    """Renormalize accumulated semantic mass to a distribution; rays with no
    mass become uniform and are flagged invalid
    (ref: joint_train_lightning_net.py:201-206,248-251)."""
    total = jnp.sum(semantics, axis=-1, keepdims=True)
    invalid = total[..., 0] == 0
    sem = jnp.where(invalid[..., None], 1.0, semantics)
    sem = sem / jnp.sum(sem, axis=-1, keepdims=True)
    return sem, invalid
