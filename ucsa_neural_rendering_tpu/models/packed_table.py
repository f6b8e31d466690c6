"""Cell-packed hash-grid tables: 8x fewer gather rows for rendering.

The full-frame render is gather-bound: every (sample, level) lookup costs 8
table rows of F=2 features, and XLA's TPU gather runs at a flat ~7 ns/row
for ANY row width from 2 to 128 fp32 values (PERFORMANCE.md primitive
table). So the per-row payload is the lever: this module precomputes, per
level, a CELL-packed table whose row `cell_id` holds all 8 corner features
of that cell ([8*F] values) — one gather row per (sample, level) instead of
eight, at 8x the memory for the packed levels.

Exactness: packing is a pure relayout of the trained table. For dense
(collision-free) levels the cell row is a copy of its 8 vertex entries; for
hashed levels the vertex grid is first expanded by evaluating the spatial
hash at every vertex (exactly the lookup the unpacked path would do), so a
packed lookup returns bit-identical corner features WHEN the packed rows are
stored at the table dtype (bf16/f32 — the train-packing configuration, with
a bit-equal-step test). The render default stores rows as float8_e4m3
(`RenderConfig.packed_dtype="fp8"`): a quantized relayout, ~2.5% mean
feature error, measured -0.01 dB / identical labels (PERFORMANCE.md r3). Levels whose vertex
count exceeds the configured budget stay unpacked (the fine levels of a
2048-resolution grid would need GBs); the encode below mixes one packed
gather for the coarse levels with the classic 8-corner gather for the rest.

This is the TPU-native answer to the reference's fused tcnn HashGrid reads
(ref: nr4seg/nerf/network_tcnn_semantics.py:36-46): where CUDA hides the 8
scattered reads behind thousands of threads, the TPU wants fewer, wider,
contiguous rows.

Intended use: RENDERING (no-grad full-frame passes — the joint-phase and
predict bottleneck). Packing cost is one gather of the vertex grids (~10^7
rows for an 8M-entry budget), amortized over the 76,800-ray frames that
follow; trainers cache the packed table per params version.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .hash_encoding import _PRIMES, HashGridSpec, _level_indices

# corner c of a cell offsets axis a by bit (c >> a) & 1 — same order as
# hash_encoding._level_indices so trilinear weights line up.
_CORNERS = np.array([[(c >> a) & 1 for a in range(3)] for c in range(8)],
                    dtype=np.int32)


def choose_n_packed(spec: HashGridSpec, max_entries: int) -> int:
    """Number of leading levels whose res^3 cell count fits max_entries.
    Resolutions grow monotonically, so packable levels are a prefix."""
    n = 0
    for lvl in range(spec.n_levels):
        if spec.resolutions[lvl] ** 3 > max_entries:
            break
        n += 1
    return n


def packed_offsets(spec: HashGridSpec, n_packed: int):
    """Static row offsets of each packed level in the concatenated packed
    array, plus the total row count."""
    offs, total = [], 0
    for lvl in range(n_packed):
        offs.append(total)
        total += spec.resolutions[lvl] ** 3
    return tuple(offs), total


@jax.tree_util.register_pytree_node_class
@dataclass
class PackedTable:
    """data: [total_cells, 8*F] cell-packed rows for levels [0, n_packed).
    n_packed is static (pytree aux) so jitted code can specialize on it."""
    data: jnp.ndarray
    n_packed: int

    def tree_flatten(self):
        return (self.data,), self.n_packed

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)


def _vertex_grid(table: jnp.ndarray, spec: HashGridSpec, lvl: int, dtype):
    """[res+1, res+1, res+1, F] vertex features of one level, exactly as the
    unpacked lookup would read them (z-major like the dense index formula in
    hash_encoding._level_indices)."""
    res = spec.resolutions[lvl]
    off = spec.offsets[lvl]
    size = spec.sizes[lvl]
    stride = res + 1
    if not spec.hashed[lvl]:
        v = jax.lax.dynamic_slice_in_dim(table, off, stride ** 3, axis=0)
        return v.astype(dtype).reshape(stride, stride, stride, -1)
    ax = np.arange(stride, dtype=np.uint32)
    hx = ax * np.uint32(_PRIMES[0])
    hy = ax * np.uint32(_PRIMES[1])
    hz = ax * np.uint32(_PRIMES[2])
    idx = (hz[:, None, None] ^ hy[None, :, None] ^ hx[None, None, :])
    idx = (idx % np.uint32(size)).astype(np.int32) + off
    v = jnp.take(table.astype(dtype), jnp.asarray(idx.reshape(-1)), axis=0)
    return v.reshape(stride, stride, stride, -1)


def _cell_pack(v: jnp.ndarray, res: int) -> jnp.ndarray:
    """[res+1,...,F] vertex grid → [res^3, 8*F] cell rows (corner-major,
    feature-minor — matches the blend in hash_encode_packed)."""
    parts = [v[cz:cz + res, cy:cy + res, cx:cx + res, :]
             for cx, cy, cz in _CORNERS]
    return jnp.stack(parts, axis=3).reshape(res ** 3, 8 * v.shape[-1])


def build_packed_table(table: jnp.ndarray, spec: HashGridSpec,
                       n_packed: int, dtype=jnp.bfloat16) -> PackedTable:
    """Relayout levels [0, n_packed) of the trained table into cell rows."""
    blocks = [
        _cell_pack(_vertex_grid(table, spec, lvl, dtype),
                   spec.resolutions[lvl])
        for lvl in range(n_packed)
    ]
    if not blocks:
        data = jnp.zeros((0, 8 * spec.n_features), dtype)
    else:
        data = jnp.concatenate(blocks, axis=0)
    return PackedTable(data, n_packed)


def hash_encode_packed(table: jnp.ndarray, packed: PackedTable,
                       x01: jnp.ndarray, spec: HashGridSpec,
                       compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Exact hash-grid encoding using one packed row per (point, level) for
    the leading packed levels and the classic 8-corner gather for the rest.
    Bit-identical to hash_encode's forward (same trilinear math in the same
    dtype); gather rows per point drop from 8*L to n_packed + 8*(L-n)."""
    n = x01.shape[0]
    k = packed.n_packed
    f = spec.n_features
    offs, _ = packed_offsets(spec, k)
    pos_f32 = x01.astype(jnp.float32)

    # One gather op per level throughout (huge monolithic gathers degrade
    # per-row on TPU — see hash_encoding._hash_encode_raw). The gather runs
    # on the STORED dtype and rows are cast after: with fp8 rows the row
    # bytes (the latency lever — 16 B vs 32 B, ~1.4x on the measured gather
    # curve) stay narrow through the gather; a pre-cast would materialize a
    # wide copy and gather from that.
    feats = []
    pdata = packed.data
    tb = table.astype(compute_dtype) if k < spec.n_levels else None
    for i in range(k):
        res = spec.resolutions[i]
        pos = pos_f32 * res
        cell = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, res - 1)
        # frac relative to the (clipped) cell: at the x01 == 1.0 edge the
        # cell clamps to res-1 and frac becomes 1.0, selecting the far
        # corners — the same vertices the unpacked path's index clamp
        # (min(cidx, res)) lands on.
        frac = pos - cell.astype(jnp.float32)
        idx = ((cell[:, 2] * res + cell[:, 1]) * res + cell[:, 0]
               + offs[i])
        w = jnp.ones((n, 8), jnp.float32)
        for a in range(3):
            fa = frac[:, a][:, None]
            w = w * jnp.where(_CORNERS[None, :, a] == 1, fa, 1.0 - fa)
        rows = jnp.take(pdata, idx, axis=0).reshape(n, 8, f).astype(
            compute_dtype)
        feats.append(jnp.sum(rows * w[..., None].astype(compute_dtype),
                             axis=1))

    for lvl in range(k, spec.n_levels):
        idx, w = _level_indices(pos_f32, spec.resolutions[lvl],
                                spec.sizes[lvl], spec.hashed[lvl])
        rows = jnp.take(tb, (idx + spec.offsets[lvl]).reshape(-1),
                        axis=0).reshape(n, 8, f)
        feats.append(jnp.sum(rows * w[..., None].astype(compute_dtype),
                             axis=1))

    return jnp.concatenate(feats, axis=1)


def _packed_coarse(packed: PackedTable, x01: jnp.ndarray,
                   spec: HashGridSpec, k: int, compute_dtype):
    """Exact one-row cell lookups for the k packed (coarse) levels, as ONE
    fused gather over all k levels (the per-POINT row count here is k —
    fine at train-step scale; the render path hash_encode_packed instead
    gathers per level, the measured layout for multi-M-row frames).
    Same trilinear math as hash_encode_packed. Returns [n, k, F]."""
    n = x01.shape[0]
    offs, _ = packed_offsets(spec, k)
    pos_f32 = x01.astype(jnp.float32)
    idx_all, w_all = [], []
    for i in range(k):
        res = spec.resolutions[i]
        pos = pos_f32 * res
        cell = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, res - 1)
        # frac relative to the (clipped) cell: at the x01 == 1.0 edge the
        # cell clamps to res-1 and frac becomes 1.0, selecting the far
        # corners — the same vertices the unpacked path's index clamp
        # (min(cidx, res)) lands on.
        frac = pos - cell.astype(jnp.float32)
        idx_all.append(((cell[:, 2] * res + cell[:, 1]) * res + cell[:, 0])
                       + offs[i])
        w = jnp.ones((n, 8), jnp.float32)
        for a in range(3):
            fa = frac[:, a][:, None]
            w = w * jnp.where(_CORNERS[None, :, a] == 1, fa, 1.0 - fa)
        w_all.append(w)
    rows = jnp.take(packed.data, jnp.stack(idx_all, 1).reshape(-1), axis=0)
    rows = rows.reshape(n, k, 8, spec.n_features).astype(compute_dtype)
    w = jnp.stack(w_all, 1)
    return jnp.sum(rows * w[..., None].astype(compute_dtype), axis=2)


def hash_encode_packed_probe(table: jnp.ndarray, packed: PackedTable,
                             x01: jnp.ndarray, spec: HashGridSpec,
                             compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Cheap density-probe encoding for sample PLACEMENT: packed levels use
    the exact one-row cell lookup; unpacked (fine) levels sample a single
    corner drawn w.p. its trilinear weight (unbiased, like
    hash_encode_sampled). n_packed + (L - n_packed) rows per point — e.g. 16
    instead of 128 at pk-through-res-194 — with exact coarse structure and
    only high-frequency feature noise, which placement (an inverse-CDF draw)
    tolerates by construction."""
    n = x01.shape[0]
    k = packed.n_packed
    if k == 0:
        from .hash_encoding import hash_encode_sampled
        return hash_encode_sampled(table, x01, spec, compute_dtype)
    if k == spec.n_levels:
        return hash_encode_packed(table, packed, x01, spec, compute_dtype)

    coarse = _packed_coarse(packed, x01, spec, k, compute_dtype)

    # fine suffix: single sampled corner per (point, level), chosen
    # arithmetically (no take_along_axis — that is itself a gather)
    from .hash_encoding import sampled_corner_indices
    chosen = sampled_corner_indices(x01, spec, range(k, spec.n_levels))
    fine = jnp.take(table.astype(compute_dtype), chosen.reshape(-1),
                    axis=0).reshape(n, spec.n_levels - k, spec.n_features)

    return jnp.concatenate([coarse, fine], axis=1).reshape(n, spec.out_dim)


def hash_encode_packed_face(table: jnp.ndarray, packed: PackedTable,
                            x01: jnp.ndarray, spec: HashGridSpec,
                            compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Face-hybrid training forward: packed (coarse) levels use the exact
    one-row cell lookup; unpacked (fine) levels sample ONE axis bit and
    blend the resulting cell face exactly (4 rows/level — see
    hash_encoding.hash_encode_face_sampled). The stratified middle rung
    between hash_encode_packed (8 fine rows, exact) and
    hash_encode_packed_probe (1 fine row, single-corner): exact coarse
    structure, half the fine reads, strictly less fine-feature noise than
    the single-corner ladder."""
    n = x01.shape[0]
    k = packed.n_packed
    if k == 0:
        from .hash_encoding import hash_encode_face_sampled
        return hash_encode_face_sampled(table, x01, spec, compute_dtype)
    if k == spec.n_levels:
        return hash_encode_packed(table, packed, x01, spec, compute_dtype)

    coarse = _packed_coarse(packed, x01, spec, k, compute_dtype)

    # fine suffix: face-sampled — one gather op per level (the monolithic-
    # gather degradation note in hash_encode_packed applies here too)
    from .hash_encoding import _corner_uniform, _level_face_rows
    u = _corner_uniform(x01, spec.n_levels)
    tb = table.astype(compute_dtype)
    fine = []
    for lvl in range(k, spec.n_levels):
        idx, fw = _level_face_rows(x01, spec.resolutions[lvl],
                                   spec.sizes[lvl], spec.hashed[lvl],
                                   u[:, lvl])
        frows = jnp.take(tb, (idx + spec.offsets[lvl]).reshape(-1),
                         axis=0).reshape(n, 4, spec.n_features)
        fine.append(jnp.sum(
            frows * fw[..., None].astype(compute_dtype), axis=1))

    return jnp.concatenate([coarse] + [f[:, None, :] for f in fine],
                           axis=1).reshape(n, spec.out_dim)


class PackedTableCache:
    """Identity-keyed cache of render-time packed tables for one model.

    One repack per params update, amortized over that update's full-frame
    renders. The cache holds a reference to the source table array, so an
    identity match can only mean the same immutable buffer — donated or
    updated params produce a new array and a repack. The key also carries
    (max_entries, dtype): swapping the render config after the first pack
    repacks under the new budget/dtype instead of silently serving the old
    one. TPU-gated — packing only pays where gathers are the wall; on CPU
    (tests, virtual meshes) it just adds compile time and, under load,
    lengthens per-device programs between collectives.
    """

    def __init__(self, model):
        # max_entries/dtype are static jit args, so each (budget, dtype)
        # compiles its own pack program
        self._pack = jax.jit(model.pack_table, static_argnums=(1, 2))
        self._entry = None  # (table array ref, max_entries, dtype, packed)

    def __call__(self, params, cfg):
        """PackedTable for (params, cfg.packed_max_entries/packed_dtype),
        or None when packing is disabled, off-TPU, or empty."""
        if cfg.packed_max_entries <= 0 or jax.default_backend() != "tpu":
            return None
        table = params["encoder"]["table"]
        e = self._entry
        if (e is not None and e[0] is table
                and e[1] == cfg.packed_max_entries
                and e[2] == cfg.packed_dtype):
            return e[3]
        packed = self._pack(params, cfg.packed_max_entries, cfg.packed_dtype)
        if packed.n_packed == 0:
            packed = None
        self._entry = (table, cfg.packed_max_entries, cfg.packed_dtype,
                       packed)
        return packed
