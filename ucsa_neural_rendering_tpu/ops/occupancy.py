"""Occupancy grid: density-driven sample placement.

TPU-native replacement for the reference's *dead* CUDA occupancy-grid ray
marcher (ref: nr4seg/nerf/raymarching/src/raymarching.cu:138-307 — the
`cuda_ray` path is hard-disabled in the reference,
joint_train_lightning_net.py:33, but the density-grid skip is the main
instant-ngp speed trick). Instead of marching variable-length rays (dynamic
shapes — hostile to XLA), we keep STATIC shapes and use the grid as a prior
for inverse-CDF sample placement: candidate depths get occupancy weights and
`sample_pdf` concentrates the fixed per-ray sample budget inside occupied
space. This cuts the per-step hash-table traffic (the single-chip
bottleneck: TPU gathers/scatters cost ~5-85 ns/row) by the sample-reduction
factor while keeping the compositing math identical.

Grid: RES³ cells over the cubic [-bound, bound]³ volume; maintained as an
EMA of jittered cell-center densities (instant-ngp style decay-and-max),
refreshed every few steps by one extra density pass.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

DEFAULT_RES = 128


@dataclass(frozen=True)
class OccupancyConfig:
    resolution: int = DEFAULT_RES
    # decay fast enough that the optimistic all-ones init falls below the
    # density threshold within a few hundred steps of a short per-scene fit
    # (0.62^11 < 0.01 → selective after ~176 steps at update_every=16;
    # instant-ngp's 0.95 suits 30k+-step runs, not the reference's
    # 10-60-epoch scene fits). A full-grid refresh costs ~1.8 s on v5e, so
    # every 16 steps keeps the amortized overhead ~7% of a train step.
    decay: float = 0.62
    update_every: int = 16
    # rotating partial refresh: each update re-probes 1/refresh_slabs of the
    # grid (a contiguous x-slab selected by a traced index — one compiled
    # variant) while the whole grid decays. Cuts the refresh's density-pass
    # cost by the slab count; occupied cells survive the extra staleness
    # because sigma >> threshold (0.62^4 of a wall's sigma is still far
    # above 0.01). instant-ngp's partial grid updates, TPU-static.
    refresh_slabs: int = 4
    # probe densities through the single-corner sampled encoding (8x fewer
    # table reads; see models/hash_encoding.py hash_encode_sampled)
    probe_sampled: bool = True
    # NOTE: the sampling-side knobs (weight floor for "empty" cells, density
    # threshold) live on RenderConfig (occ_floor / occ_density_threshold) —
    # the renderer owns sample placement; this config owns only grid
    # maintenance (EMA decay + refresh cadence).


def init_grid(cfg: OccupancyConfig = OccupancyConfig()) -> jnp.ndarray:
    """Optimistic init (everything occupied) so early training samples the
    whole volume, like instant-ngp's warmup."""
    r = cfg.resolution
    return jnp.ones((r, r, r), jnp.float32)


def update_grid(grid: jnp.ndarray, density_fn, bound: float, key: jax.Array,
                cfg: OccupancyConfig = OccupancyConfig(),
                chunk: int = 262144,
                slab_index: jax.Array | int | None = None) -> jnp.ndarray:
    """EMA-update the grid with fresh densities at jittered cell centers.

    density_fn: [M, 3] → sigma [M]. With slab_index (traced scalar is fine),
    only cells in the slab_index-th of cfg.refresh_slabs contiguous x-slabs
    are re-probed (the whole grid still decays); None refreshes everything.
    """
    r = cfg.resolution
    n_cells = r ** 3
    n_slabs = cfg.refresh_slabs if slab_index is not None else 1
    assert r % n_slabs == 0, (
        f"refresh_slabs ({n_slabs}) must divide resolution ({r})")
    slab_cells = n_cells // n_slabs
    cells = jnp.stack(jnp.meshgrid(jnp.arange(r), jnp.arange(r),
                                   jnp.arange(r), indexing="ij"),
                      axis=-1).reshape(-1, 3).astype(jnp.float32)
    offset = 0
    if slab_index is not None:
        offset = jnp.asarray(slab_index, jnp.int32) * slab_cells
        cells = jax.lax.dynamic_slice(cells, (offset, 0), (slab_cells, 3))
    jitter = jax.random.uniform(key, cells.shape)
    xyz = (cells + jitter) / r * (2.0 * bound) - bound

    n_probe = xyz.shape[0]
    chunk = min(chunk, n_probe)
    pad = (-n_probe) % chunk  # any resolution, not just powers of two
    if pad:
        xyz = jnp.concatenate([xyz, jnp.zeros((pad, 3), xyz.dtype)], 0)

    def one_chunk(pts):
        return density_fn(pts)

    sigmas = jax.lax.map(one_chunk, xyz.reshape(-1, chunk, 3))
    sigmas = sigmas.reshape(-1)[:n_probe]
    flat = grid.reshape(-1) * cfg.decay
    if slab_index is None:
        return jnp.maximum(flat, sigmas).reshape(r, r, r)
    cur = jax.lax.dynamic_slice(flat, (offset,), (slab_cells,))
    flat = jax.lax.dynamic_update_slice(flat, jnp.maximum(cur, sigmas),
                                        (offset,))
    return flat.reshape(r, r, r)


def occupancy_at(grid: jnp.ndarray, xyz: jnp.ndarray, bound: float,
                 floor: float = 0.01,
                 density_threshold: float = 0.01) -> jnp.ndarray:
    """Occupancy weights in [floor, 1] for points xyz [..., 3]."""
    sigma = density_at(grid, xyz, bound)
    occ = sigma > density_threshold
    return jnp.where(occ, 1.0, floor)


def density_at(grid: jnp.ndarray, xyz: jnp.ndarray, bound: float
               ) -> jnp.ndarray:
    """Raw EMA density at points xyz [..., 3] (nearest cell).

    The proposal-placement density source (RenderConfig.proposal_placement):
    the grid doubles as a zero-hash-row proposal field — one arithmetic
    index + one gather per point on the dense RES^3 table, vs the ~8
    hash-table rows per point per level a NeRF density eval costs."""
    r = grid.shape[0]
    cell = jnp.clip(((xyz + bound) / (2.0 * bound) * r).astype(jnp.int32),
                    0, r - 1)
    flat = (cell[..., 0] * r + cell[..., 1]) * r + cell[..., 2]
    return jnp.take(grid.reshape(-1), flat.reshape(-1),
                    axis=0).reshape(flat.shape)
