"""Hash encoding / SH encoding / SemanticNeRF model tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ucsa_neural_rendering_tpu.models import (HashGridEncoding, SemanticNeRF,
                                              sh_encoding, trunc_exp)
from ucsa_neural_rendering_tpu.models.hash_encoding import (hash_encode,
                                                            make_spec,
                                                            ngp_per_level_scale)


def test_per_level_scale_matches_reference_formula():
    # ref: network_tcnn_semantics.py:34 with bound=4
    expected = np.exp2(np.log2(2048 * 4 / 16) / 15)
    assert abs(ngp_per_level_scale(4.0) - expected) < 1e-12


def test_hash_spec_levels():
    spec = make_spec(per_level_scale=ngp_per_level_scale(4.0))
    assert spec.n_levels == 16
    assert spec.resolutions[0] == 16
    assert spec.resolutions[-1] == 8192  # 2048 * bound
    assert all(s <= 2 ** 19 for s in spec.sizes)
    # coarse levels are dense (collision-free), fine levels hashed
    assert not spec.hashed[0] and spec.hashed[-1]
    assert spec.out_dim == 32


def test_hash_encoding_interpolation_exact_on_vertices(rng):
    """At grid vertices the encoding must equal the table entry exactly
    (trilinear weights collapse to one corner)."""
    spec = make_spec(n_levels=1, base_resolution=4, per_level_scale=1.0)
    table = jnp.asarray(rng.normal(size=(spec.table_size, 2)).astype(np.float32))
    # vertex (1,2,3) of a 4-cell grid (5 vertices/axis)
    x = jnp.array([[1 / 4, 2 / 4, 3 / 4]])
    out = hash_encode(table, x, spec, compute_dtype=jnp.float32)
    stride = 5
    idx = (3 * stride + 2) * stride + 1
    np.testing.assert_allclose(np.asarray(out)[0], np.asarray(table)[idx],
                               rtol=1e-5)


def test_hash_encoding_linear_along_axis(rng):
    """Between two vertices the encoding interpolates linearly."""
    spec = make_spec(n_levels=1, base_resolution=2, per_level_scale=1.0)
    table = jnp.asarray(rng.normal(size=(spec.table_size, 2)).astype(np.float32))
    f32 = dict(compute_dtype=jnp.float32)
    a = hash_encode(table, jnp.array([[0.0, 0.0, 0.0]]), spec, **f32)
    b = hash_encode(table, jnp.array([[0.5, 0.0, 0.0]]), spec, **f32)
    mid = hash_encode(table, jnp.array([[0.25, 0.0, 0.0]]), spec, **f32)
    np.testing.assert_allclose(np.asarray(mid), (np.asarray(a) + np.asarray(b)) / 2,
                               rtol=1e-5, atol=1e-6)


def test_hash_encoding_gradients_flow(rng):
    spec = make_spec(n_levels=4, base_resolution=4,
                     per_level_scale=1.5, log2_hashmap_size=8)
    enc = HashGridEncoding(spec)
    x = jnp.asarray(rng.uniform(0, 1, (32, 3)).astype(np.float32))
    params = enc.init(jax.random.key(0), x)

    def loss(p):
        return jnp.sum(enc.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    gsum = np.abs(np.asarray(g["params"]["table"])).sum()
    assert gsum > 0


def test_sh_encoding_against_closed_form():
    d = jnp.array([[0.0, 0.0, 1.0]])
    out = np.asarray(sh_encoding(d, 4))[0]
    assert out.shape == (16,)
    assert abs(out[0] - 0.28209479177387814) < 1e-6
    assert abs(out[2] - 0.48860251190291987) < 1e-6  # z term
    assert abs(out[1]) < 1e-7 and abs(out[3]) < 1e-7
    # rotation-invariant total power per degree: |Y_1|^2 sums to 3/(4pi)
    d2 = jnp.array([[0.6, 0.64, np.sqrt(1 - 0.6 ** 2 - 0.64 ** 2)]])
    o2 = np.asarray(sh_encoding(d2, 2))[0]
    np.testing.assert_allclose((o2[1:4] ** 2).sum(), 3 / (4 * np.pi), rtol=1e-5)


def test_trunc_exp_forward_backward():
    x = jnp.array([0.0, 1.0, 20.0, -20.0])
    y = trunc_exp(x)
    np.testing.assert_allclose(np.asarray(y), np.exp(np.asarray(x)), rtol=1e-5)
    g = jax.grad(lambda v: jnp.sum(trunc_exp(v)))(x)
    expect = np.exp(np.clip(np.asarray(x), -15, 15))
    np.testing.assert_allclose(np.asarray(g), expect, rtol=1e-5)


def test_semantic_nerf_shapes_and_ranges(rng):
    model = SemanticNeRF(bound=2.0, num_semantic_classes=7, n_levels=4,
                         log2_hashmap_size=10)
    x = jnp.asarray(rng.uniform(-2, 2, (64, 3)).astype(np.float32))
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    variables = model.init(jax.random.key(0), x, jnp.asarray(d))
    sigma, rgb, sem = model.apply(variables, x, jnp.asarray(d))
    assert sigma.shape == (64,)
    assert rgb.shape == (64, 3)
    assert sem.shape == (64, 7)
    assert (np.asarray(sigma) >= 0).all()
    assert (np.asarray(rgb) >= 0).all() and (np.asarray(rgb) <= 1).all()
    np.testing.assert_allclose(np.asarray(sem).sum(-1), 1.0, rtol=1e-3)

    # parameter inventory: 3 MLPs + table
    p = variables["params"]
    assert "encoder" in p and "sigma_net" in p and "color_net" in p
    assert "semantics_net" in p


def test_hash_grad_mass_and_stochastic_unbiasedness(rng):
    """The bf16 forward must still produce EXACT f32 gradient mass (custom
    VJP; autodiff-through-bf16 loses ~20%), and the stochastic single-corner
    backward must correlate strongly with it."""
    from ucsa_neural_rendering_tpu.models.hash_encoding import (
        hash_encode_stochastic_grad)

    spec = make_spec(n_levels=2, base_resolution=4, per_level_scale=2.0,
                     log2_hashmap_size=8)
    table = jnp.asarray(rng.normal(size=(spec.table_size, 2)).astype(
        np.float32)) * 0.01
    n = 20000
    x = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))

    g = jax.grad(lambda t: jnp.sum(hash_encode(t, x, spec).astype(
        jnp.float32)))(table)
    # sum of trilinear weights == 1 per (point, level) → total mass = N*L*F
    assert abs(float(jnp.sum(g)) - n * 2 * 2) < 1.0

    gs = jax.grad(lambda t: jnp.sum(hash_encode_stochastic_grad(
        t, x, spec).astype(jnp.float32)))(table)
    assert abs(float(jnp.sum(gs)) - n * 2 * 2) < 1.0
    gf = np.asarray(g).ravel()
    gsr = np.asarray(gs).ravel()
    mask = np.abs(gf) > 1e-8
    corr = np.corrcoef(gf[mask], gsr[mask])[0, 1]
    assert corr > 0.9, corr


def test_accumulate_rows_matches_scatter():
    """Scatter-free one-hot-MXU accumulation must equal scatter-add exactly
    (up to f32 summation order) on a workload large enough to take the
    sorted-tile path, including duplicate and boundary indices."""
    import jax
    import jax.numpy as jnp
    from ucsa_neural_rendering_tpu.models.hash_encoding import (
        _accumulate_rows, _scatter_free_range)

    import ucsa_neural_rendering_tpu.models.hash_encoding as he
    he._SF_BACKENDS = ("tpu", "cpu")  # exercise the MXU path on CPU
    t_size, m, f = 65536, 65536, 2
    assert _scatter_free_range(t_size, m) is not None  # takes the fast path
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, (m,), 0, t_size, dtype=jnp.int32)
    idx = idx.at[:100].set(0).at[100:200].set(t_size - 1)  # hot + boundary
    contrib = jax.random.normal(k2, (m, f), jnp.float32)

    ref = jnp.zeros((t_size, f)).at[idx].add(contrib)
    out = _accumulate_rows(jnp.zeros((t_size, f)), idx, contrib)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-5)
    # tiny workloads fall back to the exact scatter
    assert _scatter_free_range(t_size, 128) is None
    out_small = _accumulate_rows(jnp.zeros((t_size, f)), idx[:128],
                                 contrib[:128])
    ref_small = jnp.zeros((t_size, f)).at[idx[:128]].add(contrib[:128])
    np.testing.assert_allclose(np.asarray(out_small), np.asarray(ref_small),
                               atol=1e-6)
    he._SF_BACKENDS = ("tpu",)


def test_hash_encode_grad_scatter_free_path():
    """hash_encode's custom VJP through the scatter-free accumulator agrees
    with autodiff of the f32 forward at a size that triggers the fast path."""
    import jax
    import jax.numpy as jnp
    from ucsa_neural_rendering_tpu.models.hash_encoding import (
        hash_encode, make_spec, _scatter_free_range)

    import ucsa_neural_rendering_tpu.models.hash_encoding as he
    he._SF_BACKENDS = ("tpu", "cpu")
    spec = make_spec(n_levels=4, log2_hashmap_size=12, base_resolution=8,
                     per_level_scale=2.0)
    n = 4096  # rows = n * 4 levels * 8 corners = 131k >= 4*tile
    assert _scatter_free_range(spec.table_size, n * 4 * 8) is not None
    key = jax.random.key(1)
    table = jax.random.normal(key, (spec.table_size, 2), jnp.float32) * 0.01
    x = jax.random.uniform(jax.random.split(key)[0], (n, 3))

    def loss_bf16(t):
        return jnp.sum(hash_encode(t, x, spec) ** 2)

    def loss_f32(t):
        return jnp.sum(hash_encode(t, x, spec,
                                   compute_dtype=jnp.float32) ** 2)

    g_vjp = jax.grad(loss_bf16)(table)    # custom VJP, scatter-free f32 accum
    g_ref = jax.grad(loss_f32)(table)     # autodiff through f32 forward
    # bf16 forward quantizes activations; grads agree to bf16 resolution
    np.testing.assert_allclose(np.asarray(g_vjp), np.asarray(g_ref),
                               atol=2e-2, rtol=2e-2)
    # total gradient mass preserved (the round-1 bf16-scatter bug lost ~20%)
    assert abs(float(jnp.abs(g_vjp).sum() / jnp.abs(g_ref).sum()) - 1) < 0.02
    he._SF_BACKENDS = ("tpu",)
