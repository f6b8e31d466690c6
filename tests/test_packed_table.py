"""Cell-packed render tables (models/packed_table.py): exactness vs the
unpacked hash encoding, and end-to-end render parity.

The packed layout is a pure relayout of the trained table — every test here
asserts bit-level equality (same trilinear math in the same compute dtype),
not tolerance closeness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ucsa_neural_rendering_tpu.models.hash_encoding import (hash_encode,
                                                            make_spec)
from ucsa_neural_rendering_tpu.models.packed_table import (
    PackedTable, build_packed_table, choose_n_packed, hash_encode_packed,
    packed_offsets)
from ucsa_neural_rendering_tpu.models.semantic_nerf import SemanticNeRF
from ucsa_neural_rendering_tpu.ops.renderer import RenderConfig, render_rays


@pytest.fixture(scope="module")
def small_spec():
    # levels 4..~26: a mix of dense and hashed levels at test scale
    return make_spec(n_levels=6, n_features=2, log2_hashmap_size=10,
                     base_resolution=4, per_level_scale=1.5)


@pytest.fixture(scope="module")
def table(small_spec):
    return jax.random.normal(jax.random.key(0),
                             (small_spec.table_size, small_spec.n_features),
                             jnp.float32)


def _points(n=2048):
    x = jax.random.uniform(jax.random.key(1), (n, 3))
    # exact cell-boundary and domain-edge coordinates
    x = x.at[0].set(jnp.array([1.0, 1.0, 1.0]))
    x = x.at[1].set(jnp.zeros(3))
    x = x.at[2].set(jnp.array([1.0, 0.25, 0.5]))
    return x


def test_choose_n_packed_prefix(small_spec):
    assert choose_n_packed(small_spec, 0) == 0
    assert choose_n_packed(small_spec, 10 ** 9) == small_spec.n_levels
    k = choose_n_packed(small_spec, small_spec.resolutions[2] ** 3)
    assert k == 3  # levels 0..2 fit exactly


def test_packed_offsets_total(small_spec):
    offs, total = packed_offsets(small_spec, 3)
    assert offs == (0, small_spec.resolutions[0] ** 3,
                    small_spec.resolutions[0] ** 3
                    + small_spec.resolutions[1] ** 3)
    assert total == sum(r ** 3 for r in small_spec.resolutions[:3])


@pytest.mark.parametrize("n_packed", [0, 1, 3, 6])
def test_packed_encode_bit_exact(small_spec, table, n_packed):
    """Packed lookup == unpacked lookup, bitwise, for every packed prefix
    (covers dense levels, hashed levels, and the empty/full extremes)."""
    x = _points()
    ref = hash_encode(table, x, small_spec)
    pt = build_packed_table(table, small_spec, n_packed)
    out = hash_encode_packed(table, pt, x, small_spec)
    assert out.dtype == ref.dtype
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_packed_encode_fp8_bounded_error(small_spec, table):
    """fp8 cell rows (RenderConfig.packed_dtype="fp8"): the encode gathers
    the narrow stored rows and casts after, so the result differs from bf16
    only by e4m3 quantization of the corner features (~2^-3 relative)."""
    x = _points()
    ref = np.asarray(hash_encode(table, x, small_spec), np.float32)
    pt = build_packed_table(table, small_spec, 3, jnp.float8_e4m3fn)
    assert pt.data.dtype == jnp.float8_e4m3fn
    out = np.asarray(hash_encode_packed(table, pt, x, small_spec), np.float32)
    # unpacked (fine) levels stay bit-identical
    np.testing.assert_array_equal(out[:, 6:], ref[:, 6:])
    # e4m3 max relative quantization is 2^-4 per corner; the trilinear blend
    # bounds the error by that fraction of the largest corner magnitude
    diff = np.abs(out[:, :6] - ref[:, :6])
    assert np.max(diff) < 0.07 * float(np.abs(np.asarray(table)).max())
    rel = diff / np.maximum(np.abs(ref[:, :6]), 0.25)
    assert np.mean(rel) < 0.04  # e4m3 mean quantization ≈ 2.5% here


def test_packed_rows_layout(small_spec, table):
    """Row of cell (x,y,z) holds the 8 corner features in corner-major
    order with corner c offsetting axis a by (c >> a) & 1."""
    lvl = small_spec.n_levels - 1  # a hashed level
    res = small_spec.resolutions[lvl]
    assert small_spec.hashed[lvl]
    pt = build_packed_table(table, small_spec, small_spec.n_levels)
    offs, _ = packed_offsets(small_spec, small_spec.n_levels)
    cell = (2, 3, 1)
    row = pt.data[offs[lvl] + (cell[2] * res + cell[1]) * res + cell[0]]
    primes = (1, 2654435761, 805459861)
    mask = (1 << 32) - 1
    for c in range(8):
        cx, cy, cz = c & 1, (c >> 1) & 1, (c >> 2) & 1
        h = (((cell[0] + cx) * primes[0]) & mask) \
            ^ (((cell[1] + cy) * primes[1]) & mask) \
            ^ (((cell[2] + cz) * primes[2]) & mask)
        idx = int(h % small_spec.sizes[lvl])
        expect = table[small_spec.offsets[lvl] + idx].astype(jnp.bfloat16)
        np.testing.assert_array_equal(
            np.asarray(row[2 * c:2 * c + 2]), np.asarray(expect))


def test_render_rays_packed_parity():
    """Full render path with a PackedTable == without, bitwise."""
    model = SemanticNeRF(bound=1.0, num_semantic_classes=5, n_levels=4,
                         log2_hashmap_size=8, base_resolution=4)
    variables = model.init(jax.random.key(0), jnp.zeros((8, 3)),
                           jnp.zeros((8, 3)).at[:, 2].set(1.0))
    n = 32
    key = jax.random.key(2)
    rays_o = jax.random.uniform(key, (n, 3), minval=-0.5, maxval=0.5)
    rays_d = jax.random.normal(jax.random.key(3), (n, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    dn = jnp.ones((n,))
    cfg = RenderConfig(num_steps=8, upsample_steps=8)

    ref = render_rays(model, variables, rays_o, rays_d, dn, None, cfg)
    # resolutions are 4, 32, 256, 2048 (scale 8): 2048^3 exceeds the budget,
    # so the finest level stays unpacked — the mixed path gets exercised
    packed = model.pack_table(variables["params"], max_entries=10 ** 9)
    assert packed.n_packed == 3
    out = render_rays(model, variables, rays_o, rays_d, dn, None, cfg,
                      packed=packed)
    for k in ref:
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(ref[k]))


def test_probe_placement_render():
    """Probe-placement mode (cheap probe density → importance-placed exact
    samples) renders finite, deterministic outputs with and without a
    PackedTable, and tracks the exact render closely on a smooth field."""
    model = SemanticNeRF(bound=1.0, num_semantic_classes=5, n_levels=4,
                         log2_hashmap_size=8, base_resolution=4)
    variables = model.init(jax.random.key(0), jnp.zeros((8, 3)),
                           jnp.zeros((8, 3)).at[:, 2].set(1.0))
    n = 32
    rays_o = jax.random.uniform(jax.random.key(2), (n, 3), minval=-0.5,
                                maxval=0.5)
    rays_d = jax.random.normal(jax.random.key(3), (n, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    dn = jnp.ones((n,))
    packed = model.pack_table(variables["params"], max_entries=10 ** 5)
    cfg = RenderConfig(num_steps=16, upsample_steps=0, probe_placement=True,
                       num_probe=16)
    out = render_rays(model, variables, rays_o, rays_d, dn, None, cfg,
                      packed=packed)
    for v in out.values():
        assert bool(jnp.all(jnp.isfinite(v)))
    out2 = render_rays(model, variables, rays_o, rays_d, dn, None, cfg,
                       packed=packed)
    for k in out:
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(out2[k]))
    # no-packed fallback (fully sampled probe encoding) also works
    out3 = render_rays(model, variables, rays_o, rays_d, dn, None, cfg)
    for v in out3.values():
        assert bool(jnp.all(jnp.isfinite(v)))


def test_packed_train_grad_parity(small_spec, table):
    """hash_encode_packed_train: forward == hash_encode bitwise; table
    gradient == the corresponding unpacked custom VJP (exact and stochastic
    modes), with zero gradient leaking to the packed relayout."""
    from ucsa_neural_rendering_tpu.models.hash_encoding import (
        hash_encode_packed_train, hash_encode_stochastic_grad)

    x = _points(512)
    pt = build_packed_table(table, small_spec, 3)
    g_out = jax.random.normal(jax.random.key(7),
                              (512, small_spec.out_dim), jnp.float32)

    def loss_packed(t, stoch):
        out = hash_encode_packed_train(t, pt, x, small_spec, stoch)
        return jnp.sum(out.astype(jnp.float32) * g_out)

    def loss_exact(t):
        return jnp.sum(hash_encode(t, x, small_spec).astype(jnp.float32)
                       * g_out)

    def loss_stoch(t):
        return jnp.sum(hash_encode_stochastic_grad(
            t, x, small_spec).astype(jnp.float32) * g_out)

    np.testing.assert_array_equal(
        np.asarray(jax.grad(lambda t: loss_packed(t, False))(table)),
        np.asarray(jax.grad(loss_exact)(table)))
    np.testing.assert_array_equal(
        np.asarray(jax.grad(lambda t: loss_packed(t, True))(table)),
        np.asarray(jax.grad(loss_stoch)(table)))


def test_train_step_packed_matches_unpacked(monkeypatch):
    """A full NeRFTrainer step with train_packed_max_entries produces the
    same params as the unpacked step (packing is a pure forward relayout;
    the VJP is shared). Train packing is TPU-gated since round 3, so force
    it on for this CPU equality check."""
    from dataclasses import replace

    from ucsa_neural_rendering_tpu.train import NeRFTrainer
    monkeypatch.setenv("UCSA_TRAIN_PACKED_ON_CPU", "1")

    H, W = 24, 32
    model = SemanticNeRF(bound=1.0, num_semantic_classes=5, n_levels=4,
                         log2_hashmap_size=8, base_resolution=4)
    cfg = RenderConfig(num_steps=8, upsample_steps=8, max_ray_batch=64)
    batch = {
        "pose": jnp.eye(4),
        "intrinsics": jnp.array([27.0, 27.0, W / 2, H / 2]),
        "image": jax.random.uniform(jax.random.key(2), (H, W, 3)),
        "label": jnp.zeros((H, W), jnp.int32),
        "depth": jnp.ones((H, W)),
        "one_m_to_scene_uom": jnp.float32(1.0),
    }

    outs = []
    for me in (0, 10 ** 5):
        tr = NeRFTrainer(model, replace(cfg, train_packed_max_entries=me),
                         n_rays=128, image_hw=(H, W))
        params, opt_state = tr.init(jax.random.key(0))
        params, _, parts = tr.train_step(params, opt_state, batch,
                                         jax.random.key(1))
        outs.append((params, parts))
    p0, p1 = outs[0][0], outs[1][0]
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_packed_table_is_pytree():
    pt = PackedTable(jnp.zeros((4, 16)), 2)
    leaves, treedef = jax.tree_util.tree_flatten(pt)
    assert len(leaves) == 1
    pt2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert pt2.n_packed == 2

    @jax.jit
    def through_jit(p):
        return p.data * 2

    through_jit(pt)  # PackedTable passes through jit as an argument


def test_packed_cache_keys_on_cfg(monkeypatch):
    """PackedTableCache keys on (table identity, budget, dtype): swapping
    the render cfg after the first pack must repack, not silently serve the
    stale table (round-3 review finding)."""
    from dataclasses import replace
    from types import SimpleNamespace

    import ucsa_neural_rendering_tpu.models.packed_table as pt_mod
    from ucsa_neural_rendering_tpu.models.packed_table import PackedTableCache

    model = SemanticNeRF(bound=1.0, num_semantic_classes=4, n_levels=4,
                         log2_hashmap_size=10)
    x = jnp.zeros((4, 3))
    d = jnp.zeros((4, 3)).at[:, 2].set(1.0)
    params = model.init(jax.random.key(0), x, d)["params"]
    cache = PackedTableCache(model)
    cfg = RenderConfig(packed_max_entries=2 ** 12, packed_dtype="bf16")

    # off-TPU gate (this test runs on CPU)
    assert cache(params, cfg) is None

    monkeypatch.setattr(pt_mod, "jax",
                        SimpleNamespace(default_backend=lambda: "tpu"))
    p1 = cache(params, cfg)
    assert p1 is not None and p1.data.dtype == jnp.bfloat16
    assert cache(params, cfg) is p1  # same (table, cfg) → cached object

    p2 = cache(params, replace(cfg, packed_dtype="fp8"))
    assert p2 is not p1 and p2.data.dtype == jnp.float8_e4m3fn
    p3 = cache(params, replace(cfg, packed_max_entries=10 ** 9))
    assert p3.n_packed > p1.n_packed

    # a new table array (e.g. after an Adam step) repacks too
    params2 = jax.tree_util.tree_map(lambda a: a + 0, params)
    p4 = cache(params2, replace(cfg, packed_max_entries=10 ** 9))
    assert p4 is not p3
