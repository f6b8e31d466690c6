"""Multi-resolution hash-grid encoding (instant-ngp style), TPU-native.

Replaces the reference's external tiny-cuda-nn HashGrid encoding
(ref: nr4seg/nerf/network_tcnn_semantics.py:36-46 — 16 levels x 2 features,
2^19 table, base resolution 16, per_level_scale = exp2(log2(2048*bound/16)/15)).

Design notes (TPU-first):
  * All per-level geometry (scale, resolution, table offset, dense-vs-hashed)
    is static Python metadata baked into the jitted graph; the only traced
    inputs are the points and one concatenated parameter table.
  * Levels whose dense grid fits in the per-level budget use collision-free
    dense indexing; finer levels use the instant-ngp spatial hash
    (x ^ y*2654435761 ^ z*805459861 mod T).
  * The 8-corner trilinear gather is expressed as one `take` per level over a
    [N, 8] index array; XLA lowers this to dynamic-gather and derives the
    scatter-add backward into the table automatically (the equivalent of
    tcnn's hand-written scatter-add backward kernel).
  * A fused Pallas version (hash-gather in VMEM-resident tiles) can slot in
    behind the same interface later; this implementation is the reference
    oracle for it.
"""

import math
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_PRIMES = (1, 2654435761, 805459861)


@dataclass(frozen=True)
class HashGridSpec:
    n_levels: int = 16
    n_features: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    per_level_scale: float = 1.5
    # derived, filled by make_spec
    resolutions: tuple = field(default=())
    offsets: tuple = field(default=())
    sizes: tuple = field(default=())
    hashed: tuple = field(default=())

    @property
    def table_size(self) -> int:
        return self.offsets[-1] + self.sizes[-1]

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features


def make_spec(n_levels=16, n_features=2, log2_hashmap_size=19,
              base_resolution=16, per_level_scale=1.5) -> HashGridSpec:
    max_entries = 2 ** log2_hashmap_size
    resolutions, offsets, sizes, hashed = [], [], [], []
    off = 0
    for lvl in range(n_levels):
        v = base_resolution * per_level_scale ** lvl
        # tolerate fp error when the scale is an exact power (e.g. 8192)
        res = int(round(v)) if abs(v - round(v)) < 1e-4 else int(math.floor(v))
        dense = (res + 1) ** 3
        if dense <= max_entries:
            size, is_hashed = dense, False
        else:
            size, is_hashed = max_entries, True
        size = -(-size // 8) * 8  # align like tcnn
        resolutions.append(res)
        offsets.append(off)
        sizes.append(size)
        hashed.append(is_hashed)
        off += size
    return HashGridSpec(n_levels, n_features, log2_hashmap_size,
                        base_resolution, per_level_scale,
                        tuple(resolutions), tuple(offsets), tuple(sizes),
                        tuple(hashed))


def ngp_per_level_scale(bound: float, n_levels: int = 16,
                        max_resolution_at_bound1: int = 2048,
                        base_resolution: int = 16) -> float:
    """per_level_scale = exp2(log2(2048*bound/16)/(L-1))
    (ref: network_tcnn_semantics.py:34)."""
    return float(np.exp2(
        np.log2(max_resolution_at_bound1 * bound / base_resolution)
        / (n_levels - 1)))


def _level_indices(x01: jnp.ndarray, res: int, size: int, is_hashed: bool):
    """x01: [N, 3] in [0,1] → ([N, 8] corner indices within level, [N, 8] tri-
    linear weights). Static per-level geometry."""
    pos = x01.astype(jnp.float32) * res  # grid has res+1 vertices per axis
    grid = jnp.floor(pos)
    frac = pos - grid
    grid = grid.astype(jnp.uint32)

    # 8 corners: bit c selects floor/ceil per axis.
    corners = np.array([[(c >> a) & 1 for a in range(3)] for c in range(8)],
                       dtype=np.uint32)  # [8, 3]
    cidx = grid[:, None, :] + corners[None, :, :]  # [N, 8, 3]
    cidx = jnp.minimum(cidx, res)  # clamp to grid edge

    if is_hashed:
        idx = ((cidx[..., 0] * np.uint32(_PRIMES[0]))
               ^ (cidx[..., 1] * np.uint32(_PRIMES[1]))
               ^ (cidx[..., 2] * np.uint32(_PRIMES[2])))
        idx = idx % np.uint32(size)
    else:
        stride = res + 1
        idx = (cidx[..., 2] * stride + cidx[..., 1]) * stride + cidx[..., 0]

    # Trilinear weights: prod over axes of (frac if corner-bit else 1-frac).
    w = jnp.ones((x01.shape[0], 8), dtype=jnp.float32)
    for a in range(3):
        fa = frac[:, a][:, None]
        w = w * jnp.where(corners[None, :, a] == 1, fa, 1.0 - fa)
    return idx.astype(jnp.int32), w


def _level_weights(x01: jnp.ndarray, res: int) -> jnp.ndarray:
    """[N, 3] → [N, 8] trilinear corner weights for one level (the weight
    half of _level_indices, without building the index tensor)."""
    pos = x01.astype(jnp.float32) * res
    frac = pos - jnp.floor(pos)
    corners = np.array([[(c >> a) & 1 for a in range(3)] for c in range(8)],
                       dtype=np.uint32)
    w = jnp.ones((x01.shape[0], 8), dtype=jnp.float32)
    for a in range(3):
        fa = frac[:, a][:, None]
        w = w * jnp.where(corners[None, :, a] == 1, fa, 1.0 - fa)
    return w


def _level_corner_index(x01: jnp.ndarray, res: int, size: int,
                        is_hashed: bool, corner: jnp.ndarray) -> jnp.ndarray:
    """Table index (within the level) of ONE chosen corner per point,
    computed arithmetically from the corner id — no [N, 8] index tensor and
    no take_along_axis (which XLA lowers to a second latency-bound gather;
    it used to make the sampled encodes as expensive per ROW as the exact
    ones). corner: [N] int32 in [0, 8)."""
    pos = x01.astype(jnp.float32) * res
    grid = jnp.floor(pos).astype(jnp.uint32)
    c = corner.astype(jnp.uint32)
    cidx = [jnp.minimum(grid[:, a] + ((c >> a) & 1), np.uint32(res))
            for a in range(3)]
    if is_hashed:
        idx = ((cidx[0] * np.uint32(_PRIMES[0]))
               ^ (cidx[1] * np.uint32(_PRIMES[1]))
               ^ (cidx[2] * np.uint32(_PRIMES[2]))) % np.uint32(size)
    else:
        stride = res + 1
        idx = (cidx[2] * stride + cidx[1]) * stride + cidx[0]
    return idx.astype(jnp.int32)


def sampled_corner_indices(x01: jnp.ndarray, spec: HashGridSpec,
                           levels: range | None = None):
    """Per (point, level): draw ONE corner with probability equal to its
    trilinear weight (deterministic position-hash uniforms — see
    _corner_uniform) and return its GLOBAL table index. [N, |levels|] int32.
    Shared by the sampled forward, the stochastic backward, and the packed
    probe so every path picks identical corners."""
    levels = levels if levels is not None else range(spec.n_levels)
    u = _corner_uniform(x01, spec.n_levels)
    idx_all = []
    for lvl in levels:
        w = _level_weights(x01, spec.resolutions[lvl])
        cdf = jnp.cumsum(w, axis=-1)
        corner = jnp.clip(
            jnp.sum((u[:, lvl, None] >= cdf).astype(jnp.int32), axis=-1),
            0, 7)
        idx = _level_corner_index(x01, spec.resolutions[lvl],
                                  spec.sizes[lvl], spec.hashed[lvl], corner)
        idx_all.append(idx + spec.offsets[lvl])
    return jnp.stack(idx_all, axis=1)


def packed_indices_weights(x01: jnp.ndarray, spec: HashGridSpec):
    """[N, 3] → (global corner indices [N, L, 8] int32 into the concatenated
    table, trilinear weights [N, L, 8] fp32). One array per quantity across
    all levels so downstream gathers/scatters are a single fused op."""
    idx_all, w_all = [], []
    for lvl in range(spec.n_levels):
        idx, w = _level_indices(x01, spec.resolutions[lvl], spec.sizes[lvl],
                                spec.hashed[lvl])
        idx_all.append(idx + spec.offsets[lvl])
        w_all.append(w)
    return jnp.stack(idx_all, axis=1), jnp.stack(w_all, axis=1)


# above this point count the fused all-level gather enters XLA's degraded
# big-op regime (per-row cost rises from ~6 to ~12 ns by 128M rows) and
# per-level ops win decisively; below it the fused gather is slightly
# faster in-step (277 vs 289 ms at the 131k-point occupancy workload).
_PER_LEVEL_MIN_POINTS = 196_608


def _hash_encode_raw(table: jnp.ndarray, x01: jnp.ndarray, spec: HashGridSpec,
                     compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Exact trilinear forward.

    Gather op structure is workload-dependent on TPU (measured, see
    PERFORMANCE.md gather notes): one fused all-level gather wins at
    train-step scale (~131k points), while large batches — the dense
    256+256 parity mode's 1M-point density calls, whose fused gather would
    be 134M rows deep in the degraded regime — run one gather per level.
    Identical math either way (the per-(point, level) blend is unchanged)."""
    n = x01.shape[0]
    if n < _PER_LEVEL_MIN_POINTS:
        idx, w = packed_indices_weights(x01, spec)  # [N, L, 8]
        corner_feats = jnp.take(table.astype(compute_dtype), idx.reshape(-1),
                                axis=0)
        corner_feats = corner_feats.reshape(n, spec.n_levels, 8,
                                            spec.n_features)
        feats = jnp.sum(corner_feats * w[..., None].astype(compute_dtype),
                        axis=2)
        return feats.reshape(n, spec.n_levels * spec.n_features)
    tb = table.astype(compute_dtype)
    feats = []
    for lvl in range(spec.n_levels):
        idx, w = _level_indices(x01, spec.resolutions[lvl], spec.sizes[lvl],
                                spec.hashed[lvl])
        rows = jnp.take(tb, (idx + spec.offsets[lvl]).reshape(-1),
                        axis=0).reshape(n, 8, spec.n_features)
        feats.append(jnp.sum(rows * w[..., None].astype(compute_dtype),
                             axis=1))
    return jnp.concatenate(feats, axis=1)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _hash_encode_f32grad(table, x01, spec: HashGridSpec):
    return _hash_encode_raw(table, x01, spec)


def _hef_fwd(table, x01, spec):
    return _hash_encode_raw(table, x01, spec), x01


_BWD_CHUNK = 262144  # points per backward chunk (bounds idx/weight temps)

# --- scatter-free table-gradient accumulation -------------------------------
# XLA's TPU scatter-add processes rows serially (~85 ns/row measured) and is
# the whole cost of the hash backward. The replacement: sort contributions by
# table index, cut the sorted stream into tiles; a tile of `tile` rows spans
# a narrow index range (mean gap = table/M entries), so its one-hot matrix
# against a [tile, R] window is small enough to build in VMEM and multiply on
# the MXU into a dense [R, F] block, which lands in the accumulator with a
# contiguous dynamic_update_slice — no scatter anywhere. Measured at
# occupancy scale (M=4.2M rows, T=6.5M): 105 ms vs 364 ms scatter (3.5x),
# zero overflow (scripts/bench_scatter_free.py).

_SF_TILE = 1024
_SF_MAX_RANGE = 32768
_SF_BACKENDS = ("tpu",)  # tests extend this to exercise the path on CPU


def _choose_tile(m_rows: int) -> int:
    """Sweep-chosen tile (scripts/bench_sf_sweep.py): 1024 at occupancy
    scale (4.2M rows/step, 332 vs 430 ms at bigger tiles), 4096 at dense-
    chunk scale (33.5M rows, 9.46 vs 10.0 s/step) — at huge M the sort, not
    the tile scan, dominates, and larger tiles shave scan iterations."""
    return _SF_TILE if m_rows < 8 * 1024 * 1024 else 4 * _SF_TILE


def _scatter_free_range(table_size: int, m_rows: int,
                        tile: int = _SF_TILE) -> int | None:
    """Static choice of the one-hot window R, or None → use plain scatter.

    The one-hot volume (M x R compares) dominates the accumulator's cost,
    so R hugs the mean tile span: mean + 8 standard deviations, rounded up
    to a power of two with a 2048 floor (in-step sweep: R=2048 at tile=1024
    gave 332 ms/step vs 430 ms at R=8192, scripts/bench_sf_sweep.py). A
    tile's span is a sum of `tile` near-iid index gaps — Gamma-concentrated,
    so +8 sigma makes window overflow (which only clamps one row's target)
    statistically unreachable. Tiny workloads (huge mean gaps — e.g. module
    init probes) fall back to the exact scatter."""
    if jax.default_backend() not in _SF_BACKENDS:
        # the tile scan + one-hot matmul targets the MXU; on CPU (tests,
        # virtual meshes) XLA's scatter is the faster primitive
        return None
    if m_rows < 4 * tile:
        return None
    mean_span = tile * table_size / m_rows
    sigma8 = 8.0 * mean_span / math.sqrt(tile)
    r = 1 << max(11, math.ceil(math.log2(mean_span + sigma8)))
    if r > _SF_MAX_RANGE or r > table_size:
        return None
    return r


def _accumulate_rows(acc: jnp.ndarray, idx: jnp.ndarray,
                     contrib: jnp.ndarray, tile: int | None = None):
    """acc[idx] += contrib, scatter-free when profitable.

    acc: [T, F] f32; idx: [M] int32; contrib: [M, F] f32.
    """
    table_size, n_feat = acc.shape
    m = idx.shape[0]
    tile = tile or _choose_tile(m)
    r = _scatter_free_range(table_size, m, tile)
    if r is None:
        return acc.at[idx].add(contrib)

    pad = (-m) % tile
    if pad:
        idx = jnp.concatenate(
            [idx, jnp.full((pad,), table_size - 1, idx.dtype)])
        contrib = jnp.concatenate(
            [contrib, jnp.zeros((pad, n_feat), contrib.dtype)])
    ops = (idx,) + tuple(contrib[:, j] for j in range(n_feat))
    srt = jax.lax.sort(ops, dimension=0, num_keys=1)
    si, sc = srt[0], jnp.stack(srt[1:], axis=-1)
    n_tiles = si.shape[0] // tile
    si_t = si.reshape(n_tiles, tile)
    sc_t = sc.reshape(n_tiles, tile, n_feat)
    base = jnp.minimum(si_t[:, 0], table_size - r)
    # rows past the window clamp to its edge — never happens at 4x-mean R
    # (see _scatter_free_range); the clamp keeps the kernel total-mass exact
    rel = jnp.minimum(si_t - base[:, None], r - 1)
    iota = jnp.arange(r, dtype=jnp.int32)

    def body(a, xs):
        relt, ct, bt = xs
        oh = (relt[:, None] == iota[None, :]).astype(jnp.float32)
        block = jax.lax.dot_general(
            oh, ct, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)              # [R, F]
        cur = jax.lax.dynamic_slice(a, (bt, 0), (r, n_feat))
        return jax.lax.dynamic_update_slice(a, cur + block, (bt, 0)), None

    acc, _ = jax.lax.scan(body, acc, (rel, sc_t, base))
    return acc


def _chunked_scatter_bwd(x01, g, spec, per_chunk):
    """Scan point-chunks, accumulating the [T, F] gradient as the carry —
    temps stay O(chunk) instead of O(N) (the dense 4096x512 workload would
    otherwise materialize ~4 GB of index/weight buffers in backward)."""
    n = x01.shape[0]
    if n <= _BWD_CHUNK:
        return per_chunk(
            jnp.zeros((spec.table_size, spec.n_features), jnp.float32),
            (x01, g))[0]
    pad = (-n) % _BWD_CHUNK
    if pad:
        x01 = jnp.concatenate([x01, jnp.zeros((pad, 3), x01.dtype)], 0)
        g = jnp.concatenate([g, jnp.zeros((pad, g.shape[1]), g.dtype)], 0)
    xs = (x01.reshape(-1, _BWD_CHUNK, 3),
          g.reshape(-1, _BWD_CHUNK, g.shape[1]))
    grad0 = jnp.zeros((spec.table_size, spec.n_features), jnp.float32)
    grad_table, _ = jax.lax.scan(
        lambda acc, xg: (per_chunk(acc, xg)[0], None), grad0, xs)
    return grad_table


def _hef_bwd(spec, x01, g):
    """Exact trilinear backward with F32 scatter accumulation. Autodiff
    through the bf16 forward would scatter-accumulate in bf16, silently
    losing ~20% of gradient mass once per-entry sums exceed bf16 precision
    (measured: grad total 62.6k vs the exact 80k on a 20k-point probe)."""

    def per_chunk(acc, xg):
        xc, gc = xg
        m = xc.shape[0]
        idx, w = packed_indices_weights(xc, spec)        # [M, L, 8]
        gc = gc.reshape(m, spec.n_levels, 1,
                        spec.n_features).astype(jnp.float32)
        contrib = (w[..., None] * gc).reshape(-1, spec.n_features)
        return _accumulate_rows(acc, idx.reshape(-1), contrib), None

    grad_table = _chunked_scatter_bwd(
        x01, g.reshape(x01.shape[0], -1), spec, per_chunk)
    return grad_table, jnp.zeros_like(x01)


_hash_encode_f32grad.defvjp(_hef_fwd, _hef_bwd)


def hash_encode(table: jnp.ndarray, x01: jnp.ndarray, spec: HashGridSpec,
                compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """table: [table_size, F]; x01: [N, 3] in [0,1] → [N, L*F] features.

    All L levels' 8-corner lookups are packed into ONE gather over the
    concatenated table — XLA gather on TPU has a large per-op overhead, so
    one [N*L*8]-row gather beats L separate ones by a wide margin. The
    gathered features and trilinear blend run in bf16 (tcnn stores its hash
    tables in fp16; fp32 master params live in the optimizer). The backward
    is a custom VJP that recomputes indices/weights and scatter-accumulates
    in F32 (see _hef_bwd).
    """
    if compute_dtype == jnp.bfloat16:
        return _hash_encode_f32grad(table, x01, spec)
    return _hash_encode_raw(table, x01, spec, compute_dtype)


def _corner_uniform(x01: jnp.ndarray, n_levels: int,
                    salt: int = 0) -> jnp.ndarray:
    """Deterministic per-(point, level) uniform in [0,1) from the position
    bits — used to pick a stochastic gradient corner without threading PRNG
    keys through the model. Positions vary every step (jittered ray
    sampling), so these act as fresh draws across steps. `salt` derives an
    independent stream (e.g. the face estimator's per-axis draws); salt=0
    reproduces the original stream, so forward/backward recomputations
    stay draw-identical."""
    bits = jax.lax.bitcast_convert_type(x01.astype(jnp.float32), jnp.uint32)
    h = (bits[:, 0] * np.uint32(_PRIMES[1])) ^ \
        (bits[:, 1] * np.uint32(_PRIMES[2])) ^ \
        (bits[:, 2] * np.uint32(0x9E3779B9)) ^ np.uint32(salt)
    lvl = jnp.arange(n_levels, dtype=jnp.uint32) * np.uint32(0x85EBCA6B)
    h = h[:, None] ^ lvl[None, :]
    h = (h ^ (h >> 15)) * np.uint32(0x2C1B3C6D)
    h = h ^ (h >> 12)
    return (h >> 8).astype(jnp.float32) / jnp.float32(1 << 24)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def hash_encode_stochastic_grad(table, x01, spec: HashGridSpec):
    """hash_encode with an UNBIASED single-corner backward: the table
    cotangent scatters each (point, level) gradient to ONE corner drawn with
    probability equal to its trilinear weight (E[update] equals the full
    8-corner scatter). Cuts backward scatter rows 8x — the train-step
    bottleneck on TPU (scatter ~85 ns/row; see PERFORMANCE.md). Forward is
    bit-identical to hash_encode."""
    return hash_encode(table, x01, spec)


def _hesg_fwd(table, x01, spec):
    return hash_encode(table, x01, spec), x01


def _hesg_bwd(spec, res, g):
    x01 = res

    def per_chunk(acc, xg):
        xc, gc = xg
        m = xc.shape[0]
        chosen = sampled_corner_indices(xc, spec)       # [M, L]
        gc = gc.reshape(m, spec.n_levels,
                        spec.n_features).astype(jnp.float32)
        return _accumulate_rows(acc, chosen.reshape(-1),
                                gc.reshape(-1, spec.n_features)), None

    grad_table = _chunked_scatter_bwd(
        x01, g.reshape(x01.shape[0], -1), spec, per_chunk)
    return grad_table, jnp.zeros_like(x01)


hash_encode_stochastic_grad.defvjp(_hesg_fwd, _hesg_bwd)


def hash_encode_sampled(table: jnp.ndarray, x01: jnp.ndarray,
                        spec: HashGridSpec,
                        compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Unbiased single-corner forward: per (point, level), ONE corner drawn
    with probability equal to its trilinear weight (E[feature] equals the
    full 8-corner blend). 8x fewer gather rows — for probe workloads that
    tolerate feature noise (occupancy-grid refresh, where sigma is
    thresholded anyway). Not differentiable (no VJP); render/train paths
    keep the exact trilinear forward."""
    n = x01.shape[0]
    chosen = sampled_corner_indices(x01, spec)          # [N, L]
    feats = jnp.take(table.astype(compute_dtype), chosen.reshape(-1), axis=0)
    return feats.reshape(n, spec.n_levels * spec.n_features)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def hash_encode_stochastic_fwd(table, x01, spec: HashGridSpec):
    """Fully stochastic single-corner encoding for TRAINING: forward gathers
    ONE corner per (point, level) drawn w.p. its trilinear weight
    (E[feature] = trilinear blend), backward scatters the cotangent to the
    SAME corner (E[grad] = trilinear scatter — the estimator stays unbiased
    and self-consistent because the draw is a deterministic hash of the
    position bits, recomputable in backward). 8x fewer table reads AND
    writes than exact trilinear — the training hot loop is gather-bound
    (PERFORMANCE.md), so this attacks the remaining forward wall. Feature
    noise is fresh every step (ray sampling jitters positions), acting like
    per-level feature dropout. Render/eval paths keep the exact blend."""
    return hash_encode_sampled(table, x01, spec)


def _hesf_fwd(table, x01, spec):
    return hash_encode_sampled(table, x01, spec), x01


def _hesf_bwd(spec, x01, g):

    def per_chunk(acc, xg):
        xc, gc = xg
        m = xc.shape[0]
        chosen = sampled_corner_indices(xc, spec)       # same draw as fwd
        gc = gc.reshape(m, spec.n_levels,
                        spec.n_features).astype(jnp.float32)
        return _accumulate_rows(acc, chosen.reshape(-1),
                                gc.reshape(-1, spec.n_features)), None

    grad_table = _chunked_scatter_bwd(
        x01, g.reshape(x01.shape[0], -1), spec, per_chunk)
    return grad_table, jnp.zeros_like(x01)


hash_encode_stochastic_fwd.defvjp(_hesf_fwd, _hesf_bwd)


# Per-axis salts for the face estimator's independent Bernoulli draws.
# The trilinear corner distribution factorizes over axes
# (w_c = prod_a [frac_a if bit_a else 1-frac_a]), so sampling axis bits
# independently IS sampling the corner w.p. its trilinear weight.
_FACE_SALT_E1 = 0x7F4A7C15
_FACE_SALT_E2 = 0x94D049BB


def _level_face_axes(x01: jnp.ndarray, res: int):
    """Per point: the SAMPLED axis a (the one whose frac is most certain —
    argmax |frac-0.5| — so the Bernoulli draw carries the least variance)
    and the two exact axes e1/e2, plus each axis's frac.
    Returns (a, e1, e2, fa, f1, f2), all [N]."""
    pos = x01.astype(jnp.float32) * res
    frac = pos - jnp.floor(pos)
    a = jnp.argmax(jnp.abs(frac - 0.5), axis=-1).astype(jnp.uint32)
    e1 = (a + 1) % 3
    e2 = (a + 2) % 3

    def sel(axis):
        return jnp.where(axis == 0, frac[:, 0],
                         jnp.where(axis == 1, frac[:, 1], frac[:, 2]))

    return a, e1, e2, sel(a), sel(e1), sel(e2)


def _level_face_rows(x01, res, size, is_hashed, u):
    """One level's face sampling: draw the sampled axis's corner bit w.p.
    its frac (u: [N] uniform) and return the chosen cell FACE — the 4
    within-level corner indices [N, 4] and their exact bilinear weights
    over the two remaining axes [N, 4] (sum to 1)."""
    a, e1, e2, fa, f1, f2 = _level_face_axes(x01, res)
    one = jnp.ones_like(a)
    ca = (u < fa).astype(jnp.uint32)
    base = ca * (one << a)
    idxs, ws = [], []
    for b1 in (0, 1):
        for b2 in (0, 1):
            corner = base + (jnp.uint32(b1) * (one << e1)) \
                + (jnp.uint32(b2) * (one << e2))
            w = (f1 if b1 else 1.0 - f1) * (f2 if b2 else 1.0 - f2)
            idxs.append(_level_corner_index(x01, res, size, is_hashed,
                                            corner.astype(jnp.int32)))
            ws.append(w)
    return jnp.stack(idxs, 1), jnp.stack(ws, 1)


def _level_face_choice(x01, res, size, is_hashed, u, u1, u2):
    """The backward's single chosen corner WITHIN the forward's face: the
    sampled-axis bit recomputes from the SAME u as the forward (gradient
    only ever flows to rows the forward read), the two exact axes' bits
    draw independently w.p. their fracs (u1/u2) — importance sampling the
    face's bilinear weights, so the unweighted scatter is an unbiased
    estimate of the exact face adjoint. [N] within-level indices."""
    a, e1, e2, fa, f1, f2 = _level_face_axes(x01, res)
    one = jnp.ones_like(a)
    corner = ((u < fa).astype(jnp.uint32) * (one << a)
              + (u1 < f1).astype(jnp.uint32) * (one << e1)
              + (u2 < f2).astype(jnp.uint32) * (one << e2))
    return _level_corner_index(x01, res, size, is_hashed,
                               corner.astype(jnp.int32))


def sampled_face_rows(x01: jnp.ndarray, spec: HashGridSpec):
    """[N, 3] → (global face-corner indices [N, L, 4] int32, bilinear
    weights [N, L, 4] f32). E over the axis draw of the weighted blend
    equals the exact trilinear blend."""
    u = _corner_uniform(x01, spec.n_levels)
    idx_all, w_all = [], []
    for lvl in range(spec.n_levels):
        idx, w = _level_face_rows(x01, spec.resolutions[lvl],
                                  spec.sizes[lvl], spec.hashed[lvl],
                                  u[:, lvl])
        idx_all.append(idx + spec.offsets[lvl])
        w_all.append(w)
    return jnp.stack(idx_all, 1), jnp.stack(w_all, 1)


def hash_encode_face_sampled(table: jnp.ndarray, x01: jnp.ndarray,
                             spec: HashGridSpec,
                             compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Stratified HALF-stochastic forward: per (point, level), sample ONE
    axis bit (the most-certain axis) and blend the resulting cell face
    EXACTLY with bilinear weights. 4 gather rows per (point, level) — 2x
    fewer than exact trilinear, with strictly less estimator variance than
    the single-corner forward (two of three axes interpolate exactly, and
    the sampled axis is the one closest to a vertex)."""
    n = x01.shape[0]
    idx, w = sampled_face_rows(x01, spec)
    feats = jnp.take(table.astype(compute_dtype), idx.reshape(-1), axis=0)
    feats = feats.reshape(n, spec.n_levels, 4, spec.n_features)
    return jnp.sum(feats * w[..., None].astype(compute_dtype),
                   axis=2).reshape(n, spec.n_levels * spec.n_features)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def hash_encode_stochastic_face(table, x01, spec: HashGridSpec):
    """`stochastic_fwd="face"`: the stratified face forward (see
    hash_encode_face_sampled) with a single-corner backward drawn WITHIN
    the forward's face (importance-cancelled bilinear weight — unbiased
    for the face adjoint, 1 scatter row per (point, level) like the other
    stochastic estimators). The middle ladder rung between the exact
    trilinear forward (8 rows) and the fully stochastic one (1 row)."""
    return hash_encode_face_sampled(table, x01, spec)


def _hesface_fwd(table, x01, spec):
    return hash_encode_face_sampled(table, x01, spec), x01


def _hesface_bwd(spec, x01, g):

    def per_chunk(acc, xg):
        xc, gc = xg
        m = xc.shape[0]
        u = _corner_uniform(xc, spec.n_levels)          # same draw as fwd
        u1 = _corner_uniform(xc, spec.n_levels, salt=_FACE_SALT_E1)
        u2 = _corner_uniform(xc, spec.n_levels, salt=_FACE_SALT_E2)
        idx_all = []
        for lvl in range(spec.n_levels):
            idx = _level_face_choice(xc, spec.resolutions[lvl],
                                     spec.sizes[lvl], spec.hashed[lvl],
                                     u[:, lvl], u1[:, lvl], u2[:, lvl])
            idx_all.append(idx + spec.offsets[lvl])
        chosen = jnp.stack(idx_all, 1)                  # [M, L]
        gc = gc.reshape(m, spec.n_levels,
                        spec.n_features).astype(jnp.float32)
        return _accumulate_rows(acc, chosen.reshape(-1),
                                gc.reshape(-1, spec.n_features)), None

    grad_table = _chunked_scatter_bwd(
        x01, g.reshape(x01.shape[0], -1), spec, per_chunk)
    return grad_table, jnp.zeros_like(x01)


hash_encode_stochastic_face.defvjp(_hesface_fwd, _hesface_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def hash_encode_hybrid_train(table, packed, x01, spec: HashGridSpec):
    """Training encode with the measured sweet spot per level class:
    packed (coarse) levels read EXACTLY via one cell row each; fine levels
    sample ONE corner w.p. its trilinear weight (unbiased — the coarse
    structure that carries geometry stays exact, only high-frequency
    features get estimator noise, fresh each step via the position-hash
    draw). Backward scatters the cotangent to one sampled corner per
    (point, level) for every level — the stochastic-corner estimator that
    already beats exact trilinear gradients on convergence
    (PERFORMANCE.md). Cuts forward table reads 8x on every level."""
    from .packed_table import hash_encode_packed_probe
    return hash_encode_packed_probe(table, packed, x01, spec)


def _heht_fwd(table, packed, x01, spec):
    from .packed_table import hash_encode_packed_probe
    out = hash_encode_packed_probe(table, packed, x01, spec)
    aux = (jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), packed), x01)
    return out, aux


def _heht_bwd(spec, aux, g):
    packed_shape, x01 = aux
    grad_table, grad_x = _hesg_bwd(spec, x01, g)
    zero_packed = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), packed_shape)
    return grad_table, zero_packed, grad_x


hash_encode_hybrid_train.defvjp(_heht_fwd, _heht_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def hash_encode_hybrid_face_train(table, packed, x01, spec: HashGridSpec):
    """Face-hybrid training encode (`stochastic_fwd="face"` with a packed
    table): packed (coarse) levels read EXACTLY via one cell row each; fine
    levels use the stratified face forward (one sampled axis bit, exact
    bilinear face blend — 4 rows/level, half of exact at strictly less
    noise than the single-corner ladder). Backward is the face-consistent
    single-corner scatter (_hesface_bwd): the sampled-axis bit recomputes
    from the forward's own draw, so fine-level gradients only ever land on
    rows the forward read. Pairing the face forward with the trilinear-CDF
    draw (_hesg_bwd) instead would be BIASED — both consume the same salt-0
    uniform, and small u picks the HIGH face forward but the all-low corner
    backward, anti-correlating the scatter target with the cotangent. (On
    the exact coarse levels any single-corner draw is unbiased; the face
    draw's corner distribution equals the trilinear weights there.) Still
    1 scatter row per (point, level); the only change vs the shipped
    default is the fine-level forward: 8 exact rows -> 4 face rows."""
    from .packed_table import hash_encode_packed_face
    return hash_encode_packed_face(table, packed, x01, spec)


def _hehft_fwd(table, packed, x01, spec):
    from .packed_table import hash_encode_packed_face
    out = hash_encode_packed_face(table, packed, x01, spec)
    aux = (jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), packed), x01)
    return out, aux


def _hehft_bwd(spec, aux, g):
    packed_shape, x01 = aux
    grad_table, grad_x = _hesface_bwd(spec, x01, g)
    zero_packed = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), packed_shape)
    return grad_table, zero_packed, grad_x


hash_encode_hybrid_face_train.defvjp(_hehft_fwd, _hehft_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def hash_encode_packed_train(table, packed, x01, spec: HashGridSpec,
                             stochastic: bool):
    """Differentiable encoding whose FORWARD gathers from the cell-packed
    relayout (models/packed_table.py — n_packed + 8*(L-n_packed) rows per
    point instead of 8L) while the BACKWARD writes the table gradient
    exactly as the unpacked custom VJPs do (recomputed indices/weights, f32
    accumulation; stochastic=True → unbiased single-corner rows). The packed
    table is a pure function of `table`, so no gradient flows to it — the
    caller builds it per step under stop_gradient. Forward output is
    bit-identical to hash_encode when the packed rows are stored at the
    table dtype (the train-packing default, bf16); fp8-stored rows (the
    RENDER default) quantize the packed levels' features."""
    from .packed_table import hash_encode_packed
    return hash_encode_packed(table, packed, x01, spec)


def _hept_fwd(table, packed, x01, spec, stochastic):
    from .packed_table import hash_encode_packed
    out = hash_encode_packed(table, packed, x01, spec)
    aux = (jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), packed), x01)
    return out, aux


def _hept_bwd(spec, stochastic, aux, g):
    packed_shape, x01 = aux
    bwd = _hesg_bwd if stochastic else _hef_bwd
    grad_table, grad_x = bwd(spec, x01, g)
    zero_packed = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), packed_shape)
    return grad_table, zero_packed, grad_x


hash_encode_packed_train.defvjp(_hept_fwd, _hept_bwd)


class HashGridEncoding(nn.Module):
    """Flax module owning the hash table parameter.

    Init: uniform(-1e-4, 1e-4), tcnn's default for hash grids.
    stochastic_grad=True uses the unbiased single-corner backward (8x fewer
    scatter rows; see hash_encode_stochastic_grad). stochastic_fwd=True
    additionally samples the FORWARD corner (8x fewer gathers too; see
    hash_encode_stochastic_fwd) — training accel, keep off for parity.
    """
    spec: HashGridSpec
    param_dtype: jnp.dtype = jnp.float32
    stochastic_grad: bool = False
    stochastic_fwd: bool | str = False   # True = all levels; "fine" =
    # hybrid (packed coarse exact + sampled fine; needs a packed table)

    @nn.compact
    def __call__(self, x01: jnp.ndarray, probe: bool = False,
                 train: bool = False, packed=None) -> jnp.ndarray:
        table = self.param(
            "table",
            lambda key, shape: jax.random.uniform(
                key, shape, self.param_dtype, minval=-1e-4, maxval=1e-4),
            (self.spec.table_size, self.spec.n_features))
        if train and self.stochastic_fwd == "fine" and packed is not None:
            # hybrid accel: exact packed coarse + sampled fine forward,
            # stochastic-corner backward (see hash_encode_hybrid_train)
            return hash_encode_hybrid_train(table, packed, x01, self.spec)
        if train and self.stochastic_fwd == "face":
            # stratified half-stochastic forward: one sampled axis bit,
            # exact bilinear face blend (4 fine rows). With a packed table,
            # coarse levels stay exact one-row reads (the incumbent's
            # layout) and only the fine forward changes.
            if packed is not None:
                return hash_encode_hybrid_face_train(table, packed, x01,
                                                     self.spec)
            return hash_encode_stochastic_face(table, x01, self.spec)
        if packed is not None and not (train and self.stochastic_fwd):
            # cell-packed lookups (see models/packed_table.py): one row per
            # (point, packed level). probe=True additionally single-corner-
            # samples the unpacked fine levels (placement-quality density at
            # ~n_levels rows/point). The non-probe path goes through the
            # train-aware custom VJP so table gradients stay correct if the
            # caller differentiates (render paths simply never do).
            from .packed_table import hash_encode_packed_probe
            if probe:
                return hash_encode_packed_probe(table, packed, x01, self.spec)
            return hash_encode_packed_train(table, packed, x01, self.spec,
                                            self.stochastic_grad)
        if probe:
            return hash_encode_sampled(table, x01, self.spec)
        if train and self.stochastic_fwd is True:
            # "fine" without a packed table falls back to exact (the hybrid
            # needs the packed coarse levels; sampling ALL levels here would
            # silently be the heavy-noise mode, ~-12 dB)
            return hash_encode_stochastic_fwd(table, x01, self.spec)
        if self.stochastic_grad:
            return hash_encode_stochastic_grad(table, x01, self.spec)
        return hash_encode(table, x01, self.spec)
