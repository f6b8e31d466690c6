"""Semantic-NeRF network: hash encoding + sigma / color / semantics MLPs.

TPU-native equivalent of the reference's tcnn-based network
(ref: nr4seg/nerf/network_tcnn_semantics.py:10-207):
  * HashGrid 16 levels x 2 features, 2^19 table, base res 16,
    per_level_scale = exp2(log2(2048*bound/16)/15)     (:34-46)
  * sigma MLP: 32 → 64 → 16 (1 sigma via trunc_exp + 15 geo features) (:48-58)
  * SH-degree-4 direction encoding                      (:64-70)
  * color MLP: 31 (16 SH + 15 geo) → 64 → 64 → 3, sigmoid (:74-84,116-124)
  * semantics MLP: 15 (geo only, view-independent) → 64 → C, softmax by the
    caller (:90-100,125-127)
All MLPs are bias-free 64-wide ReLU stacks like tcnn FullyFusedMLPs; matmuls
run in bfloat16 with fp32 params and fp32 accumulation (the TPU analogue of
tcnn's fp16 fully-fused path). The reference's masked inference (skipping
samples with weight <= 1e-4, :147-207) is replaced by dense evaluation +
`where` in the renderer — static shapes keep the MXU busy; true skipping is
the later Pallas megakernel's job.
"""

import jax.numpy as jnp
from flax import linen as nn

from .activation import trunc_exp
from .hash_encoding import HashGridEncoding, make_spec, ngp_per_level_scale
from .sh_encoding import sh_encoding


class _FusedStyleMLP(nn.Module):
    """Bias-free ReLU MLP, tcnn-Network-like: n_hidden_layers hidden layers of
    `width`, linear output."""
    width: int
    n_hidden_layers: int
    out_dim: int
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.compute_dtype)
        for _ in range(self.n_hidden_layers):
            x = nn.Dense(self.width, use_bias=False,
                         dtype=self.compute_dtype,
                         param_dtype=jnp.float32)(x)
            x = nn.relu(x)
        x = nn.Dense(self.out_dim, use_bias=False, dtype=self.compute_dtype,
                     param_dtype=jnp.float32)(x)
        return x


class SemanticNeRF(nn.Module):
    bound: float = 4.0
    num_semantic_classes: int = 40
    n_levels: int = 16
    n_features: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    geo_feat_dim: int = 15
    hidden_dim: int = 64
    num_layers: int = 2            # sigma net depth (hidden = num_layers - 1)
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    num_layers_semantics: int = 2
    hidden_dim_semantics: int = 64
    sh_degree: int = 4
    compute_dtype: jnp.dtype = jnp.bfloat16
    # unbiased single-corner table gradients (8x fewer backward scatter
    # rows; see models/hash_encoding.py). Default ON: measured 4.9x step
    # speedup AND better 120-step convergence than exact trilinear grads
    # (34.2 vs 21.9 dB on the synthetic fixture). Set False for exact
    # reference-parity gradients.
    stochastic_table_grad: bool = True
    # ALSO sample the forward corner on TRAINING density calls (8x fewer
    # table reads — the step's remaining bottleneck). Unbiased, fresh noise
    # per step; eval/render paths always use the exact trilinear blend.
    # Opt-in (convergence measured in scripts/bench_stochfwd.py).
    # True samples every level's forward corner (8x fewer reads, heavy
    # feature noise: measured -12 dB on the fixture); "fine" keeps the
    # packed coarse levels exact and samples only the fine levels — the
    # geometry-carrying structure stays exact (requires
    # RenderConfig.train_packed_max_entries > 0 to supply the packed
    # table; falls back to exact otherwise); "face" samples ONE axis bit
    # (the most-certain axis) and blends the resulting cell face exactly
    # (4 rows — the stratified middle rung: 2x fewer reads at strictly
    # lower estimator variance than True).
    stochastic_fwd: bool | str = False

    def grid_spec(self):
        """The static hash-grid geometry (also used unbound, e.g. by
        pack_table — a plain recomputation, no module state)."""
        return make_spec(
            n_levels=self.n_levels,
            n_features=self.n_features,
            log2_hashmap_size=self.log2_hashmap_size,
            base_resolution=self.base_resolution,
            per_level_scale=ngp_per_level_scale(
                self.bound, self.n_levels,
                base_resolution=self.base_resolution),
        )

    def setup(self):
        spec = self.grid_spec()
        self.encoder = HashGridEncoding(
            spec, stochastic_grad=self.stochastic_table_grad,
            stochastic_fwd=self.stochastic_fwd)
        self.sigma_net = _FusedStyleMLP(self.hidden_dim, self.num_layers - 1,
                                        1 + self.geo_feat_dim,
                                        self.compute_dtype)
        self.color_net = _FusedStyleMLP(self.hidden_dim_color,
                                        self.num_layers_color - 1, 3,
                                        self.compute_dtype)
        self.semantics_net = _FusedStyleMLP(self.hidden_dim_semantics,
                                            self.num_layers_semantics - 1,
                                            self.num_semantic_classes,
                                            self.compute_dtype)

    def density(self, x, train: bool = False, packed=None):
        """x: [N, 3] in [-bound, bound] → (sigma [N] fp32, geo_feat [N, 15]).

        train=True marks a training-step call: with stochastic_fwd enabled
        the encoder then samples one corner per level instead of blending
        eight (eval/render calls always blend exactly).
        packed: optional models.packed_table.PackedTable — render paths pass
        the cell-packed relayout of the trained table (exact, 8x fewer
        gather rows on the packed levels)."""
        x01 = (x + self.bound) / (2.0 * self.bound)
        h = self.encoder(x01, train=train, packed=packed)
        h = self.sigma_net(h)
        sigma = trunc_exp(h[..., 0])
        geo_feat = h[..., 1:]
        return sigma, geo_feat

    def pack_table(self, params, max_entries: int, dtype="bf16"):
        """Build the cell-packed render table from this model's params tree
        (see models/packed_table.py). max_entries bounds the per-level cell
        count that gets packed; returns PackedTable (n_packed may be 0).
        dtype: "bf16" | "fp8" (or a jnp dtype) — the stored row dtype."""
        from .packed_table import build_packed_table, choose_n_packed
        dtype = {"bf16": jnp.bfloat16,
                 "fp8": jnp.float8_e4m3fn}.get(dtype, dtype)
        spec = self.grid_spec()
        n_packed = choose_n_packed(spec, max_entries)
        return build_packed_table(params["encoder"]["table"], spec, n_packed,
                                  dtype)

    def density_probe(self, x, packed=None):
        """Cheap density estimate for occupancy-grid refresh and render-time
        sample placement: single-corner sampled encoding (8x fewer table
        reads; unbiased features, noise tolerated because consumers
        threshold or CDF-sample sigma). With a PackedTable, the packed
        coarse levels read exactly (one row) and only the fine levels are
        sampled. Same sigma MLP."""
        x01 = (x + self.bound) / (2.0 * self.bound)
        h = self.encoder(x01, probe=True, packed=packed)
        h = self.sigma_net(h)
        return trunc_exp(h[..., 0])

    def color(self, d, geo_feat):
        """d: [N, 3] unit dirs; geo_feat: [N, 15] → rgb [N, 3] in (0, 1).

        Like the reference (network_tcnn_semantics.py:147-178), position is
        not an input to the color net — only the SH-encoded direction and the
        geometric features.
        """
        d_enc = sh_encoding(d, self.sh_degree).astype(self.compute_dtype)
        h = jnp.concatenate([d_enc, geo_feat.astype(self.compute_dtype)],
                            axis=-1)
        return nn.sigmoid(self.color_net(h).astype(jnp.float32))

    def semantics(self, geo_feat):
        """geo_feat: [N, 15] → per-sample class probabilities [N, C].

        View-independent head; softmax in fp32 (ref :125-127,180-207).
        """
        logits = self.semantics_net(geo_feat).astype(jnp.float32)
        return nn.softmax(logits, axis=-1)

    def __call__(self, x, d):
        """Convenience forward for tests: (sigma, rgb, semantic probs)."""
        sigma, geo_feat = self.density(x)
        rgb = self.color(d, geo_feat)
        sem = self.semantics(geo_feat)
        return sigma, rgb, sem
