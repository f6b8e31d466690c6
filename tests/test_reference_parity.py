"""Golden-parity tests: JAX ports vs the REFERENCE's own torch math.

The reference implementation at /root/reference runs its NeRF math in plain
torch (CUDA only for near_far + the dead marching path), so the exact
functions our kernels must reproduce are importable on CPU with the CUDA
extension stubbed. Each test loads the reference module by file path (its
package __init__s pull in unavailable deps like pytorch_lightning /
torchvision) and asserts the JAX port matches on random inputs:

  * nerf_matrix_to_ngp / get_rays   (ref nr4seg/dataset/ngp_utils.py:7-69)
  * sample_pdf (det)                (ref nr4seg/nerf/renderer_semantics.py:10-46)
  * near_far_from_aabb              (ref raymarching.cu:62-126, ported inline)
  * SemanticNeRFRenderer.run        (ref renderer_semantics.py:121-307):
    stratified + importance sampling + sort-merge + alpha compositing +
    depth normalization, end-to-end on an analytic toy field
  * the 3-part NeRF loss            (ref joint_train_lightning_net.py:201-222)
  * SemanticsMeter                  (ref nr4seg/utils/metrics.py:13-65)
"""

import importlib.util
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _load_ref(name, relpath, pre_stub=None):
    """Import one reference source file WITHOUT executing its package
    __init__s (those import pytorch_lightning / torchvision, absent here).
    pre_stub: dict of sys.modules entries to inject first (CUDA ext, trimesh).
    """
    if pre_stub:
        for k, v in pre_stub.items():
            sys.modules.setdefault(k, v)
    path = os.path.join(REF, relpath)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _near_far_torch(rays_o, rays_d, aabb, min_near=0.2):
    """Line-by-line port of kernel_near_far_from_aabb
    (ref raymarching.cu:62-126; min_near default 0.2 from the python wrapper
    raymarching.py). Used both as the golden for ops/aabb.py and as the stub
    behind the reference renderer's `raymarching.near_far_from_aabb` call."""
    inv = 1.0 / rays_d
    t0 = (aabb[:3] - rays_o) * inv
    t1 = (aabb[3:] - rays_o) * inv
    near = torch.minimum(t0, t1).amax(-1)
    far = torch.maximum(t0, t1).amin(-1)
    miss = near > far
    fmax = torch.finfo(rays_o.dtype).max
    near = torch.where(miss, torch.full_like(near, fmax), near)
    far = torch.where(miss, torch.full_like(far, fmax), far)
    near = torch.clamp(near, min=min_near)
    return near, far


@pytest.fixture(scope="module")
def ref_ngp_utils():
    return _load_ref("ref_ngp_utils", "nr4seg/dataset/ngp_utils.py")


@pytest.fixture(scope="module")
def ref_renderer():
    ray_mod = types.ModuleType("ref_raymarching_inner")
    ray_mod.near_far_from_aabb = _near_far_torch
    ray_pkg = types.ModuleType("ref_raymarching")
    ray_pkg.raymarching = ray_mod
    # renderer_semantics does `from .raymarching import raymarching`; loading
    # it by file under a fake package name lets us pre-seed that submodule
    pkg = types.ModuleType("refnerf")
    pkg.__path__ = [os.path.join(REF, "nr4seg/nerf")]
    sys.modules["refnerf"] = pkg
    sys.modules["refnerf.raymarching"] = ray_pkg
    sys.modules["refnerf.raymarching.raymarching"] = ray_mod
    sys.modules.setdefault("trimesh", types.ModuleType("trimesh"))
    path = os.path.join(REF, "nr4seg/nerf/renderer_semantics.py")
    spec = importlib.util.spec_from_file_location("refnerf.renderer_semantics",
                                                  path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refnerf.renderer_semantics"] = mod
    spec.loader.exec_module(mod)
    return mod


# --------------------------------------------------------------- ray geometry

def test_nerf_matrix_to_ngp_matches_reference(ref_ngp_utils):
    from ucsa_neural_rendering_tpu.data.rays import nerf_matrix_to_ngp
    rng = np.random.default_rng(0)
    for _ in range(5):
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :] = rng.normal(size=(3, 4)).astype(np.float32)
        np.testing.assert_array_equal(nerf_matrix_to_ngp(pose),
                                      ref_ngp_utils.nerf_matrix_to_ngp(pose))


def test_get_rays_matches_reference(ref_ngp_utils):
    from ucsa_neural_rendering_tpu.data.rays import get_rays
    H, W = 12, 17
    rng = np.random.default_rng(1)
    # a rotation-ish pose (orthonormalized) + translation
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = q.astype(np.float32)
    pose[:3, 3] = rng.normal(size=3).astype(np.float32)
    intr = np.array([23.0, 27.0, W / 2 - 0.3, H / 2 + 0.2], np.float32)

    ref = ref_ngp_utils.get_rays(torch.from_numpy(pose)[None],
                                 torch.from_numpy(intr), H, W)
    mine = get_rays(jnp.asarray(pose), jnp.asarray(intr), H, W)
    np.testing.assert_allclose(np.asarray(mine["rays_o"]),
                               ref["rays_o"][0].numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mine["rays_d"]),
                               ref["rays_d"][0].numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mine["direction_norms"]),
                               ref["direction_norms"][0, :, 0].numpy(),
                               atol=1e-6)


# ------------------------------------------------------------------ sampling

def test_sample_pdf_det_matches_reference(ref_renderer):
    from ucsa_neural_rendering_tpu.ops.sampling import sample_pdf
    rng = np.random.default_rng(2)
    N, T, S = 7, 31, 24
    bins = np.sort(rng.uniform(0.2, 4.0, size=(N, T)).astype(np.float32), -1)
    weights = rng.uniform(0.0, 1.0, size=(N, T - 1)).astype(np.float32)
    weights[0] = 0.0  # all-empty ray exercises the 1e-5 floor
    ref = ref_renderer.sample_pdf(torch.from_numpy(bins),
                                  torch.from_numpy(weights), S,
                                  det=True).numpy()
    mine = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(weights), S,
                                 key=None))
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_near_far_matches_cuda_port():
    from ucsa_neural_rendering_tpu.ops.aabb import near_far_from_aabb
    rng = np.random.default_rng(3)
    N = 256
    aabb_np = np.array([-1, -1, -1, 1, 1, 1], np.float32)
    # origins inside the box (the scene case: camera inside the volume)
    o = rng.uniform(-0.9, 0.9, size=(N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ref_n, ref_f = _near_far_torch(torch.from_numpy(o), torch.from_numpy(d),
                                   torch.from_numpy(aabb_np), 0.2)
    mine_n, mine_f = near_far_from_aabb(jnp.asarray(o), jnp.asarray(d),
                                        jnp.asarray(aabb_np), 0.2)
    ref_n, ref_f = ref_n.numpy(), ref_f.numpy()
    mine_n, mine_f = np.asarray(mine_n), np.asarray(mine_f)
    # rays exiting the box closer than min_near: the CUDA kernel leaves an
    # INVERTED interval (far < clamped near, descending z — degenerate); our
    # port clamps far to near, collapsing the interval (documented in
    # ops/aabb.py). Parity holds on all well-formed rays.
    ok = ref_f >= ref_n
    assert ok.sum() > 0.9 * N
    np.testing.assert_allclose(mine_n[ok], ref_n[ok], atol=1e-5)
    np.testing.assert_allclose(mine_f[ok], ref_f[ok], atol=1e-5)
    np.testing.assert_allclose(mine_f[~ok], mine_n[~ok], atol=1e-6)


def test_near_far_miss_matches_cuda_port():
    """Rays that MISS the box return near == far == a huge sentinel like
    the CUDA kernel's FLT_MAX (raymarching.cu:93-94,106-107) — ours is 1e10
    (FLT_MAX would overflow downstream f32 midpoint sums to inf/NaN).
    Origins outside the box, half the directions pointing away (round-3
    review finding: a collapsed near-plane interval instead composited
    weight at the camera)."""
    from ucsa_neural_rendering_tpu.ops.aabb import near_far_from_aabb
    rng = np.random.default_rng(7)
    N = 256
    aabb_np = np.array([-1, -1, -1, 1, 1, 1], np.float32)
    # origins on a shell outside the box
    o = rng.normal(size=(N, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 4.0
    d = rng.normal(size=(N, 3)).astype(np.float32)
    # half the rays aim at the box (with jitter) so both hit and miss
    # populations are well represented
    toward = -o + 0.3 * rng.normal(size=(N, 3)).astype(np.float32)
    d[::2] = toward[::2]
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ref_n, ref_f = _near_far_torch(torch.from_numpy(o), torch.from_numpy(d),
                                   torch.from_numpy(aabb_np), 0.2)
    mine_n, mine_f = near_far_from_aabb(jnp.asarray(o), jnp.asarray(d),
                                        jnp.asarray(aabb_np), 0.2)
    ref_n, ref_f = ref_n.numpy(), ref_f.numpy()
    mine_n, mine_f = np.asarray(mine_n), np.asarray(mine_f)
    from ucsa_neural_rendering_tpu.ops.aabb import MISS_SENTINEL
    fmax = np.finfo(np.float32).max
    miss = ref_n == fmax
    assert 0.1 * N < miss.sum() < 0.9 * N  # both populations exercised
    # identical MISS SET; ours carries the overflow-safe sentinel
    np.testing.assert_array_equal(mine_n[miss], MISS_SENTINEL)
    np.testing.assert_array_equal(mine_f[miss], MISS_SENTINEL)
    assert (mine_n[~miss] < MISS_SENTINEL).all()
    ok = ~miss & (ref_f >= ref_n)
    np.testing.assert_allclose(mine_n[ok], ref_n[ok], atol=1e-4)
    np.testing.assert_allclose(mine_f[ok], ref_f[ok], atol=1e-4)


# --------------------------------------------- full renderer pipeline golden

def _toy_sigma_np(x):
    # smooth positive density with spatial structure
    return 1.5 * (1.0 / (1.0 + np.exp(-3.0 * x[..., 0]))) + \
        0.8 * np.exp(-4.0 * (x[..., 1] ** 2)) + 0.05


def _toy_rgb_np(g, d):
    return 1.0 / (1.0 + np.exp(-(g + 0.5 * d)))


def _toy_sem_np(g, C):
    feats = [np.sin((i + 1) * g[..., i % 3]) + 1.01 for i in range(C)]
    return np.stack(feats, axis=-1)


NUM_SEM = 6


def test_renderer_run_matches_reference_end_to_end(ref_renderer):
    """Deterministic 16+16 render of an analytic field through BOTH
    pipelines: the reference's SemanticNeRFRenderer.run (stratified →
    importance resample → sort-merge → masked alpha compositing → z-depth)
    and our render_rays. Importance sampling is pinned to det mode on the
    reference side (it hardcodes det=False; randomness is the only
    divergence)."""

    class ToyRef(ref_renderer.SemanticNeRFRenderer):

        def __init__(self):
            super().__init__(bound=1, cuda_ray=False, density_scale=1,
                             num_semantic_classes=NUM_SEM)

        def density(self, x):
            return {"sigma": torch.from_numpy(
                _toy_sigma_np(x.numpy())).unsqueeze(-1).float(),
                "geo_feat": x}

        def color(self, x, d, mask=None, sigma=None, geo_feat=None):
            return torch.from_numpy(
                _toy_rgb_np(geo_feat.numpy(), d.numpy())).float()

        def semantics(self, x, d, mask=None, sigma=None, geo_feat=None):
            return torch.from_numpy(
                _toy_sem_np(geo_feat.numpy(), NUM_SEM)).float()

    class ToyJax:
        bound = 1.0

        def apply(self, variables, *args, method=None):
            if method == "density":
                x = args[0]
                return jnp.asarray(_toy_sigma_np(np.asarray(x))), x
            if method == "color":
                d, g = args
                return jnp.asarray(_toy_rgb_np(np.asarray(g), np.asarray(d)))
            if method == "semantics":
                return jnp.asarray(_toy_sem_np(np.asarray(args[0]), NUM_SEM))
            raise ValueError(method)

    # pin the reference's importance resampling to det (it hardcodes
    # det=False inside run(); det is the only way to compare numerics)
    orig_pdf = ref_renderer.sample_pdf
    ref_renderer.sample_pdf = lambda b, w, n, det=False: orig_pdf(
        b, w, n, det=True)
    try:
        rng = np.random.default_rng(4)
        N = 64
        o = rng.uniform(-0.5, 0.5, size=(N, 3)).astype(np.float32)
        d = rng.normal(size=(N, 3)).astype(np.float32)
        norms = np.linalg.norm(d, axis=-1)
        d /= norms[..., None]
        dnorms = (1.0 + rng.uniform(0, 0.4, size=N)).astype(np.float32)

        ref_model = ToyRef()
        with torch.no_grad():
            ref_out = ref_model.run(torch.from_numpy(o)[None],
                                    torch.from_numpy(d)[None],
                                    torch.from_numpy(dnorms)[None, :, None],
                                    num_steps=16, upsample_steps=16,
                                    perturb=False)

        from ucsa_neural_rendering_tpu.ops.renderer import (RenderConfig,
                                                            render_rays)
        cfg = RenderConfig(num_steps=16, upsample_steps=16, min_near=0.2,
                           remat=False)
        mine = render_rays(ToyJax(), {}, jnp.asarray(o), jnp.asarray(d),
                           jnp.asarray(dnorms), None, cfg, None)

        np.testing.assert_allclose(np.asarray(mine["image"]),
                                   ref_out["image"][0].numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(mine["semantics"]),
                                   ref_out["semantics"][0].numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(mine["depth"]),
                                   ref_out["depth"][0].numpy(), atol=2e-4)
    finally:
        ref_renderer.sample_pdf = orig_pdf


# ------------------------------------------------------------------- losses

def test_nerf_losses_match_reference_math():
    """Transcription golden of forward_nerf_train's loss block
    (ref joint_train_lightning_net.py:201-222; the module itself imports
    pytorch_lightning/torchvision, unavailable here): MSE(rgb) +
    0.04 * NLL(log renormalized semantics, ignore -1) +
    0.1 * L1(depth/uom on gt!=0), with zero-mass rays forced to ignore."""
    from ucsa_neural_rendering_tpu.train.nerf_trainer import nerf_losses

    rng = np.random.default_rng(5)
    N, C = 97, 8
    pred_rgb = rng.uniform(0, 1, size=(N, 3)).astype(np.float32)
    gt_rgb = rng.uniform(0, 1, size=(N, 3)).astype(np.float32)
    sem_mass = rng.uniform(0, 1, size=(N, C)).astype(np.float32)
    sem_mass[:5] = 0.0  # zero-mass rays
    labels = rng.integers(-1, C, size=N).astype(np.int32)
    pred_depth = rng.uniform(0.1, 5, size=N).astype(np.float32)
    gt_depth = rng.uniform(0, 5, size=N).astype(np.float32)
    gt_depth[::7] = 0.0
    uom = np.float32(1.7)

    # --- reference math in torch (cited lines) ---
    t_sem = torch.from_numpy(sem_mass.copy())[None]          # [B=1, N, C]
    t_lab = torch.from_numpy(labels.astype(np.int64))[None]
    invalid = torch.sum(t_sem, dim=-1) == 0
    t_sem[invalid] = 1
    t_sem = t_sem / torch.sum(t_sem, dim=-1, keepdim=True)
    t_lab[invalid] = -1
    loss_color = torch.nn.MSELoss(reduction="none")(
        torch.from_numpy(pred_rgb), torch.from_numpy(gt_rgb)).mean()
    logsem = torch.log(t_sem + 1e-15).permute(0, 2, 1)
    loss_sem = torch.nn.NLLLoss(ignore_index=-1, reduction="none")(
        logsem, t_lab).mean()
    t_pd = torch.from_numpy(pred_depth)
    t_gd = torch.from_numpy(gt_depth)
    loss_depth = torch.nn.L1Loss(reduction="none")(
        t_pd[t_gd != 0] / uom, t_gd[t_gd != 0]).mean(-1)
    ref_total = (loss_color + 0.04 * loss_sem + 0.1 * loss_depth).item()

    outputs = {"image": jnp.asarray(pred_rgb),
               "semantics": jnp.asarray(sem_mass),
               "depth": jnp.asarray(pred_depth)}
    total, parts = nerf_losses(outputs, jnp.asarray(gt_rgb),
                               jnp.asarray(labels), jnp.asarray(gt_depth),
                               jnp.float32(uom), C)
    assert abs(float(parts["loss_nerf_rgb"]) - loss_color.item()) < 1e-6
    assert abs(float(parts["loss_nerf_semantics"]) - loss_sem.item()) < 1e-5
    assert abs(float(parts["loss_depth"]) - loss_depth.item()) < 1e-6
    assert abs(float(total) - ref_total) < 1e-5


# ------------------------------------------- stage-level trajectory twin

def _twin_weights(C, rng):
    """Shared init for the tiny twin field: encoder Linear(3→32) (the
    'encoding' param group, no weight decay), sigma MLP 32→64→16 (1 σ + 15
    geo), color MLP 18→64→3, semantics MLP 15→64→C — the reference
    network's topology shrunk to CPU scale (ref network_tcnn_semantics.py:
    34-100), identical numpy weights on both sides."""
    def lin(n_in, n_out):
        s = 1.0 / np.sqrt(n_in)
        return (rng.uniform(-s, s, size=(n_out, n_in)).astype(np.float32),
                rng.uniform(-s, s, size=n_out).astype(np.float32))
    return {
        "encoder": lin(3, 32),
        "sigma1": lin(32, 64), "sigma2": lin(64, 16),
        "color1": lin(18, 64), "color2": lin(64, 3),
        "sem1": lin(15, 64), "sem2": lin(64, C),
    }


def test_fit_trajectory_matches_torch(ref_renderer):
    """Stage-level numerical twin of `training_step_nerf`'s update math
    (VERDICT r2 #3): the reference's renderer.run + forward_nerf_train loss
    block (ref joint_train_lightning_net.py:167-223,473-513) + its Adam
    config (encoding group w/o weight decay, net group wd 1e-6, betas
    (0.9, 0.99), eps 1e-15, ref :899-919) transcribed in torch-CPU, vs our
    render_rays + nerf_losses + make_nerf_optimizer — same tiny field, same
    init, same fixed ray batch, N_STEPS updates each. Determinism is pinned
    (perturb off, det importance sampling) since torch/JAX RNG streams
    cannot be aligned. Tolerances document fp32 drift: both sides run the
    same math with different op orderings (XLA fusion vs torch kernels),
    and Adam's eps=1e-15 makes updates sign-like, so divergence compounds
    geometrically — loss parity is tight early and loosens with depth."""
    import torch.nn.functional as F
    from torch import nn

    C, N_RAYS, N_STEPS, SEM_CKPT_STEP = 6, 96, 40, 10
    rng = np.random.default_rng(7)
    w0 = _twin_weights(C, rng)

    # fixed ray batch + targets (ray selection itself is golden-tested via
    # get_rays parity; the twin pins one batch to isolate the update math)
    o = rng.uniform(-0.5, 0.5, size=(N_RAYS, 3)).astype(np.float32)
    d = rng.normal(size=(N_RAYS, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dnorms = (1.0 + rng.uniform(0, 0.4, size=N_RAYS)).astype(np.float32)
    gt_rgb = rng.uniform(0, 1, size=(N_RAYS, 3)).astype(np.float32)
    labels = rng.integers(-1, C, size=N_RAYS).astype(np.int64)
    gt_depth = rng.uniform(0.3, 1.5, size=N_RAYS).astype(np.float32)
    gt_depth[::9] = 0.0
    uom = np.float32(1.3)

    # ---------------- torch side: the reference's math, transcribed -------
    class TwinTorch(ref_renderer.SemanticNeRFRenderer):

        def __init__(self):
            super().__init__(bound=1, cuda_ray=False, density_scale=1,
                             num_semantic_classes=C)

            def lin(w):
                m = nn.Linear(w[0].shape[1], w[0].shape[0])
                with torch.no_grad():
                    m.weight.copy_(torch.from_numpy(w[0]))
                    m.bias.copy_(torch.from_numpy(w[1]))
                return m
            self.encoder = lin(w0["encoder"])
            self.sigma1, self.sigma2 = lin(w0["sigma1"]), lin(w0["sigma2"])
            self.color1, self.color2 = lin(w0["color1"]), lin(w0["color2"])
            self.sem1, self.sem2 = lin(w0["sem1"]), lin(w0["sem2"])

        def _geo(self, x):
            x01 = (x + self.bound) / (2 * self.bound)
            h = self.sigma2(torch.relu(self.sigma1(
                torch.relu(self.encoder(x01)))))
            # trunc_exp (ref nr4seg/nerf/activation.py:7-22)
            sigma = _TruncExp.apply(h[..., 0])
            return sigma, h[..., 1:]

        def density(self, x):
            sigma, geo = self._geo(x)
            return {"sigma": sigma.unsqueeze(-1), "geo_feat": geo}

        # masked inference, transcribed from the reference network
        # (ref network_tcnn_semantics.py:147-207)
        def color(self, x, d, mask=None, sigma=None, geo_feat=None):
            rgbs = torch.zeros(mask.shape[0], 3)
            if not mask.any():
                return rgbs
            h = torch.sigmoid(self.color2(torch.relu(self.color1(
                torch.cat([d[mask], geo_feat[mask]], dim=-1)))))
            rgbs[mask] = h
            return rgbs

        def semantics(self, x, d, mask=None, sigma=None, geo_feat=None):
            sem = torch.zeros(mask.shape[0], C)
            if not mask.any():
                return sem
            h = self.sem2(torch.relu(self.sem1(geo_feat[mask])))
            sem[mask] = F.softmax(h, dim=-1)
            return sem

    class _TruncExp(torch.autograd.Function):

        @staticmethod
        def forward(ctx, x):
            ctx.save_for_backward(x)
            return torch.exp(x)

        @staticmethod
        def backward(ctx, g):
            return g * torch.exp(ctx.saved_tensors[0].clamp(-15, 15))

    ref_model = TwinTorch()
    # the reference's NeRF optimizer (ref :899-919): Adam, encoding group
    # without weight decay, net group with 1e-6 (torch-coupled decay)
    opt = torch.optim.Adam(
        [{"params": list(ref_model.encoder.parameters())},
         {"params": (list(ref_model.sigma1.parameters())
                     + list(ref_model.sigma2.parameters())
                     + list(ref_model.color1.parameters())
                     + list(ref_model.color2.parameters())
                     + list(ref_model.sem1.parameters())
                     + list(ref_model.sem2.parameters())),
          "weight_decay": 1e-6}],
        lr=1e-2, betas=(0.9, 0.99), eps=1e-15)

    t_o, t_d = torch.from_numpy(o)[None], torch.from_numpy(d)[None]
    t_dn = torch.from_numpy(dnorms)[None, :, None]
    t_rgb, t_lab = torch.from_numpy(gt_rgb)[None], torch.from_numpy(labels)[None]
    t_dep = torch.from_numpy(gt_depth)[None]

    orig_pdf = ref_renderer.sample_pdf
    ref_renderer.sample_pdf = lambda b, w, n, det=False: orig_pdf(
        b, w, n, det=True)
    torch_losses = []
    ref_sem_ckpt = None
    try:
        for step_i in range(N_STEPS):
            if step_i == SEM_CKPT_STEP:
                with torch.no_grad():
                    ref_sem_ckpt = ref_model.run(
                        t_o, t_d, t_dn, num_steps=16, upsample_steps=16,
                        perturb=False)["semantics"][0].numpy()
            out = ref_model.run(t_o, t_d, t_dn, num_steps=16,
                                upsample_steps=16, perturb=False)
            # forward_nerf_train loss block (ref :201-222)
            sem = out["semantics"]
            lab = t_lab.clone()
            invalid = torch.sum(sem, dim=-1) == 0
            sem = sem.clone()
            sem[invalid] = 1
            sem = sem / torch.sum(sem, dim=-1, keepdim=True)
            lab[invalid] = -1
            loss_color = nn.MSELoss(reduction="none")(
                out["image"], t_rgb).mean()
            loss_sem = nn.NLLLoss(ignore_index=-1, reduction="none")(
                torch.log(sem + 1e-15).permute(0, 2, 1), lab).mean()
            pd, gd = out["depth"], t_dep
            loss_depth = nn.L1Loss(reduction="none")(
                pd[gd != 0] / uom, gd[gd != 0]).mean(-1)
            # training_step_nerf total + manual step (ref :481-513;
            # GradScaler is a no-op at fp32)
            loss = loss_color + 0.04 * loss_sem + 0.1 * loss_depth
            opt.zero_grad()
            loss.backward()
            opt.step()
            torch_losses.append(float(loss))
    finally:
        ref_renderer.sample_pdf = orig_pdf

    # ---------------- JAX side: our update path ---------------------------
    from ucsa_neural_rendering_tpu.models.activation import trunc_exp
    from ucsa_neural_rendering_tpu.ops.renderer import (RenderConfig,
                                                        render_rays)
    from ucsa_neural_rendering_tpu.train.nerf_trainer import (
        make_nerf_optimizer, nerf_losses)
    import optax

    class TwinJax:
        bound = 1.0

        def apply(self, variables, *args, method=None):
            p = variables["params"]

            def lin(name, h):
                return h @ p[name][0].T + p[name][1]
            if method == "density":
                x01 = (args[0] + 1.0) / 2.0
                h = lin("sigma2", jax.nn.relu(lin(
                    "sigma1", jax.nn.relu(lin("encoder", x01)))))
                return trunc_exp(h[..., 0]), h[..., 1:]
            if method == "color":
                d_, g = args
                return jax.nn.sigmoid(lin("color2", jax.nn.relu(
                    lin("color1", jnp.concatenate([d_, g], -1)))))
            if method == "semantics":
                return jax.nn.softmax(lin("sem2", jax.nn.relu(
                    lin("sem1", args[0]))), axis=-1)
            raise ValueError(method)

    # param pytree: "encoder" at top level → excluded from weight decay by
    # make_nerf_optimizer's mask, mirroring the reference's param groups
    params = {k: (jnp.asarray(w[0]), jnp.asarray(w[1]))
              for k, w in w0.items()}
    model = TwinJax()
    tx = make_nerf_optimizer(1e-2)
    opt_state = tx.init(params)
    cfg = RenderConfig(num_steps=16, upsample_steps=16, remat=False)
    j_o, j_d, j_dn = jnp.asarray(o), jnp.asarray(d), jnp.asarray(dnorms)
    j_rgb, j_lab = jnp.asarray(gt_rgb), jnp.asarray(labels.astype(np.int32))
    j_dep = jnp.asarray(gt_depth)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = render_rays(model, {"params": p}, j_o, j_d, j_dn, None,
                              cfg, None)
            return nerf_losses(out, j_rgb, j_lab, j_dep, jnp.float32(uom), C)
        (total, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, total

    jax_losses = []
    my_sem_ckpt = None
    for step_i in range(N_STEPS):
        if step_i == SEM_CKPT_STEP:
            out = render_rays(model, {"params": params}, j_o, j_d, j_dn,
                              None, cfg, None)
            my_sem_ckpt = np.asarray(out["semantics"])
        params, opt_state, total = step(params, opt_state)
        jax_losses.append(float(total))

    torch_losses = np.array(torch_losses)
    jax_losses = np.array(jax_losses)
    # documented fp tolerance: <=0.1% relative for the first 10 steps,
    # <=2% anywhere along the 40-step trajectory (drift compounds through
    # Adam's eps=1e-15 normalization), and both sides must actually FIT
    # (final loss well below initial)
    np.testing.assert_allclose(jax_losses[:10], torch_losses[:10], rtol=1e-3)
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-2)
    # both sides actually descend (random fixed targets have an irreducible
    # floor; 40 steps shaves ~20% — parity of the curves is the real claim)
    assert jax_losses[-1] < 0.9 * jax_losses[0]
    assert torch_losses[-1] < 0.9 * torch_losses[0]

    # rendered semantics agree mid-trajectory (step 10). The ENDPOINT is not
    # comparable: the random fixed labels are spatially inconsistent, so the
    # semantics objective has a continuum of equal-loss minima; Adam's
    # eps=1e-15 makes updates sign-like and the two stacks drift to
    # different-but-equally-good parameters while their LOSS curves stay
    # within 2% (asserted above) — which is exactly why the trajectory, not
    # the endpoint, is the meaningful parity claim.
    np.testing.assert_allclose(my_sem_ckpt, ref_sem_ckpt, atol=3e-3)
    assert (my_sem_ckpt.argmax(-1) == ref_sem_ckpt.argmax(-1)).mean() >= 0.95


@pytest.mark.parametrize("opt_cfg", [
    {"name": "Adam", "lr": 1e-3},
    {"name": "SGD", "lr": 1e-2,
     "sgd_cfg": {"momentum": 0.9, "weight_decay": 1e-4}},
    {"name": "Adadelta", "lr": 0.5},
    {"name": "RMSprop", "lr": 1e-3},
])
def test_seg_fit_trajectory_matches_torch(opt_cfg):
    """Seg-side update-math twin (the counterpart of the NeRF trajectory
    test above): the reference's training step — F.cross_entropy applied to
    SOFTMAX outputs (the double-softmax quirk, ref semantics_lightning_net
    .py:74-80) with ignore_index=-1 and its optimizer zoo (ref :155-173,
    876-897: Adam / SGD(momentum, wd) / Adadelta / RMSprop(momentum 0.9)) —
    vs our cross_entropy_ignore(double_softmax=True) + make_seg_optimizer,
    30 steps on an identical tiny conv net from identical init."""
    from torch import nn
    import torch.nn.functional as F

    from ucsa_neural_rendering_tpu.train.seg_trainer import (
        cross_entropy_ignore, make_seg_optimizer)
    import optax

    C, H, W, B, N_STEPS = 5, 8, 10, 2, 30
    rng = np.random.default_rng(11)
    w1 = rng.uniform(-0.2, 0.2, (8, 3, 3, 3)).astype(np.float32)
    b1 = rng.uniform(-0.1, 0.1, 8).astype(np.float32)
    w2 = rng.uniform(-0.3, 0.3, (C, 8, 1, 1)).astype(np.float32)
    b2 = rng.uniform(-0.1, 0.1, C).astype(np.float32)
    imgs = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
    labels = rng.integers(-1, C, (B, H, W)).astype(np.int64)

    # torch side
    conv1 = nn.Conv2d(3, 8, 3, padding=1)
    conv2 = nn.Conv2d(8, C, 1)
    with torch.no_grad():
        conv1.weight.copy_(torch.from_numpy(w1))
        conv1.bias.copy_(torch.from_numpy(b1))
        conv2.weight.copy_(torch.from_numpy(w2))
        conv2.bias.copy_(torch.from_numpy(b2))
    t_params = list(conv1.parameters()) + list(conv2.parameters())
    lr = opt_cfg["lr"]
    if opt_cfg["name"] == "Adam":
        opt = torch.optim.Adam(t_params, lr=lr)
    elif opt_cfg["name"] == "SGD":
        sgd = opt_cfg["sgd_cfg"]
        opt = torch.optim.SGD(t_params, lr=lr, momentum=sgd["momentum"],
                              weight_decay=sgd["weight_decay"])
    elif opt_cfg["name"] == "Adadelta":
        opt = torch.optim.Adadelta(t_params, lr=lr)
    else:
        opt = torch.optim.RMSprop(t_params, lr=lr, momentum=0.9)
    t_img = torch.from_numpy(imgs.transpose(0, 3, 1, 2))
    t_lab = torch.from_numpy(labels)
    torch_losses = []
    for _ in range(N_STEPS):
        logits = conv2(torch.relu(conv1(t_img)))
        probs = F.softmax(logits, dim=1)  # the reference's quirk: CE on
        # softmax, reduction="none" then .mean() over ALL pixels (ref
        # semantics_lightning_net.py:79-89 — NOT the default sum/valid)
        loss = F.cross_entropy(probs, t_lab, ignore_index=-1,
                               reduction="none").mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
        torch_losses.append(float(loss))

    # jax side: same math in NHWC
    params = {"w1": jnp.asarray(w1.transpose(2, 3, 1, 0)),
              "b1": jnp.asarray(b1),
              "w2": jnp.asarray(w2.transpose(2, 3, 1, 0)),
              "b2": jnp.asarray(b2)}
    tx = make_seg_optimizer(opt_cfg)
    opt_state = tx.init(params)
    j_img, j_lab = jnp.asarray(imgs), jnp.asarray(labels.astype(np.int32))

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            h = jax.lax.conv_general_dilated(
                j_img, p["w1"], (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b1"]
            logits = jax.lax.conv_general_dilated(
                jax.nn.relu(h), p["w2"], (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b2"]
            return cross_entropy_ignore(logits, j_lab, double_softmax=True)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jax_losses = []
    for _ in range(N_STEPS):
        params, opt_state, loss = step(params, opt_state)
        jax_losses.append(float(loss))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=1e-4)
    assert jax_losses[-1] < jax_losses[0]


def test_seg_bn_trajectory_matches_torch():
    """Multi-step train-mode BatchNorm twin: conv → BN → relu → conv
    trained with Adam vs torch, comparing per-step losses, the BN running
    stats after N steps, and a final eval-mode forward. Exercises
    TorchBatchNorm's split semantics in situ (normalize with the biased
    batch variance, store the unbiased one — the part flax's nn.BatchNorm
    gets wrong; models/resnet.py)."""
    import optax
    import torch.nn.functional as F
    from torch import nn as tnn

    from ucsa_neural_rendering_tpu.models.resnet import TorchBatchNorm
    from ucsa_neural_rendering_tpu.train.seg_trainer import \
        cross_entropy_ignore

    C, H, W, B, N_STEPS = 4, 8, 10, 3, 10
    rng = np.random.default_rng(5)
    w1 = rng.uniform(-0.3, 0.3, (8, 3, 3, 3)).astype(np.float32)
    b1 = rng.uniform(-0.1, 0.1, 8).astype(np.float32)
    g1 = rng.uniform(0.5, 1.5, 8).astype(np.float32)
    beta1 = rng.uniform(-0.1, 0.1, 8).astype(np.float32)
    w2 = rng.uniform(-0.3, 0.3, (C, 8, 1, 1)).astype(np.float32)
    b2 = rng.uniform(-0.1, 0.1, C).astype(np.float32)
    imgs = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
    labels = rng.integers(-1, C, (B, H, W)).astype(np.int64)

    # torch side
    conv1 = tnn.Conv2d(3, 8, 3, padding=1)
    tbn = tnn.BatchNorm2d(8, eps=1e-5, momentum=0.1)
    conv2 = tnn.Conv2d(8, C, 1)
    with torch.no_grad():
        conv1.weight.copy_(torch.from_numpy(w1))
        conv1.bias.copy_(torch.from_numpy(b1))
        tbn.weight.copy_(torch.from_numpy(g1))
        tbn.bias.copy_(torch.from_numpy(beta1))
        conv2.weight.copy_(torch.from_numpy(w2))
        conv2.bias.copy_(torch.from_numpy(b2))
    t_params = (list(conv1.parameters()) + list(tbn.parameters())
                + list(conv2.parameters()))
    opt = torch.optim.Adam(t_params, lr=1e-3)
    t_img = torch.from_numpy(imgs.transpose(0, 3, 1, 2))
    t_lab = torch.from_numpy(labels)
    torch_losses = []
    tbn.train()
    for _ in range(N_STEPS):
        logits = conv2(torch.relu(tbn(conv1(t_img))))
        probs = F.softmax(logits, dim=1)
        loss = F.cross_entropy(probs, t_lab, ignore_index=-1,
                               reduction="none").mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
        torch_losses.append(float(loss))

    # jax side (NHWC)
    bn_train = TorchBatchNorm(use_running_average=False)
    bn_eval = TorchBatchNorm(use_running_average=True)
    params = {"w1": jnp.asarray(w1.transpose(2, 3, 1, 0)),
              "b1": jnp.asarray(b1),
              "scale": jnp.asarray(g1), "bias": jnp.asarray(beta1),
              "w2": jnp.asarray(w2.transpose(2, 3, 1, 0)),
              "b2": jnp.asarray(b2)}
    stats = {"mean": jnp.zeros(8), "var": jnp.ones(8)}
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    j_img, j_lab = jnp.asarray(imgs), jnp.asarray(labels.astype(np.int32))

    def forward(p, stats, train):
        h = jax.lax.conv_general_dilated(
            j_img, p["w1"], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b1"]
        bn_vars = {"params": {"scale": p["scale"], "bias": p["bias"]},
                   "batch_stats": stats}
        if train:
            h, mut = bn_train.apply(bn_vars, h, mutable=["batch_stats"])
            new_stats = mut["batch_stats"]
        else:
            h = bn_eval.apply(bn_vars, h)
            new_stats = stats
        logits = jax.lax.conv_general_dilated(
            jax.nn.relu(h), p["w2"], (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b2"]
        return logits, new_stats

    @jax.jit
    def step(params, stats, opt_state):
        def loss_fn(p):
            logits, new_stats = forward(p, stats, train=True)
            return cross_entropy_ignore(logits, j_lab,
                                        double_softmax=True), new_stats
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, \
            loss

    jax_losses = []
    for _ in range(N_STEPS):
        params, stats, opt_state, loss = step(params, stats, opt_state)
        jax_losses.append(float(loss))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-4)
    # stat tolerance absorbs compounded fp divergence of 10 Adam steps
    # (~6e-4 abs); the EXACT biased/unbiased discrimination is the
    # single-update test in test_deeplab.py (rtol 1e-5, drift-free)
    np.testing.assert_allclose(np.asarray(stats["mean"]),
                               tbn.running_mean.detach().numpy(),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(stats["var"]),
                               tbn.running_var.detach().numpy(),
                               rtol=5e-3, atol=2e-3)
    # eval-mode forward with the trained running stats
    tbn.eval()
    with torch.no_grad():
        t_eval = conv2(torch.relu(tbn(conv1(t_img))))
    j_eval, _ = forward(params, stats, train=False)
    np.testing.assert_allclose(
        np.asarray(j_eval),
        t_eval.numpy().transpose(0, 2, 3, 1), rtol=1e-2, atol=5e-3)


# -------------------------------------------------------------------- meter

def test_semantics_meter_matches_reference():
    sklearn = pytest.importorskip("sklearn")  # noqa: F841
    ref_metrics = _load_ref("ref_metrics", "nr4seg/utils/metrics.py")
    if not hasattr(np, "float"):  # removed alias used at metrics.py:52
        np.float = float  # noqa: NPY001

    from ucsa_neural_rendering_tpu.metrics import SemanticsMeter
    rng = np.random.default_rng(6)
    C = 9
    ref_meter = ref_metrics.SemanticsMeter(C)
    my_meter = SemanticsMeter(C)
    for _ in range(3):
        truths = rng.integers(-1, C - 2, size=(2, 40, 30))  # classes 7,8 absent
        preds = rng.integers(0, C, size=(2, 40, 30))
        ref_meter.update(torch.from_numpy(preds), torch.from_numpy(truths))
        my_meter.update(jnp.asarray(preds), jnp.asarray(truths))
    ref_res = ref_meter.measure()
    my_res = my_meter.measure()
    for a, b in zip(my_res, ref_res):
        assert abs(float(a) - float(b)) < 1e-9


# ------------------------------------------------------- joint_step composite

def test_joint_step_trajectory_matches_torch():
    """Joint-phase COMPOSITE twin (the one block the per-piece twins above
    don't cover end-to-end): 5 joint_step epochs vs a torch transcription
    of the reference's `training_step_joint`
    (ref joint_train_lightning_net.py:363-471) — the BN-trick pseudo-label
    forward (seg eval but BatchNorm modules in train mode when batch > 1,
    ref :373-379), the seg-batch assembly ORDER (augmented renders ⊕
    old-scene replay ⊕ flattened 25k replay, ref :419-454), and the seg
    Adam update with the reference's CE-on-softmax criterion (ref :37,
    456-461), with BN running stats threading across epochs.

    Both sides consume an identical scripted render stream and identity
    augmentation: the render math has its own end-to-end twin
    (test_renderer_run_matches_reference_end_to_end), the per-image NeRF
    Adam updates have theirs (test_fit_trajectory_matches_torch), and the
    augmentation RNG cannot be matched across frameworks — the composite
    glue is exactly what this test pins. NeRF updates are no-ops on both
    sides for the same reason (their only coupling into the seg trajectory
    at fixed renders is the BN-trick forward, which stays real). Drives the
    UNFUSED dispatch path; the fused default is bit-equal by
    test_dispatch_coalescing.py."""
    import torch.nn.functional as F
    from torch import nn as tnn
    from flax import linen as nn
    import optax  # noqa: F401

    from ucsa_neural_rendering_tpu.models import SemanticNeRF
    from ucsa_neural_rendering_tpu.models.resnet import TorchBatchNorm
    from ucsa_neural_rendering_tpu.ops.renderer import RenderConfig
    from ucsa_neural_rendering_tpu.train.joint_trainer import JointTrainer

    C, H, W = 5, 8, 10
    B_NEW, B_OLD, N_STEPS = 2, 1, 5

    class TinySegBN(nn.Module):
        """DeepLab stand-in with torch-exact BN semantics (conv-BN-relu-conv)
        and the seg-model interface joint_trainer drives."""
        num_classes: int = C

        @nn.compact
        def __call__(self, x, use_running_average=True, deterministic=True):
            h = nn.Conv(8, (3, 3), padding="SAME")(x)
            h = TorchBatchNorm(use_running_average=use_running_average)(h)
            h = nn.relu(h)
            return {"out": nn.Conv(self.num_classes, (1, 1))(h)}

    rng = np.random.default_rng(17)
    w1 = rng.uniform(-0.3, 0.3, (8, 3, 3, 3)).astype(np.float32)
    b1 = rng.uniform(-0.1, 0.1, 8).astype(np.float32)
    g1 = rng.uniform(0.5, 1.5, 8).astype(np.float32)
    beta1 = rng.uniform(-0.1, 0.1, 8).astype(np.float32)
    w2 = rng.uniform(-0.3, 0.3, (C, 8, 1, 1)).astype(np.float32)
    b2 = rng.uniform(-0.1, 0.1, C).astype(np.float32)

    # scripted per-epoch streams (the render stream evolves per step, as the
    # NeRF would): renders are argmax labels >= 0; old/CL labels include -1
    new_imgs = rng.uniform(0, 1, (N_STEPS, B_NEW, H, W, 3)).astype(np.float32)
    rend_rgb = rng.uniform(0, 1, (N_STEPS, B_NEW, H, W, 3)).astype(np.float32)
    rend_sem = rng.integers(0, C, (N_STEPS, B_NEW, H, W)).astype(np.int32)
    old_img = rng.uniform(0, 1, (B_OLD, H, W, 3)).astype(np.float32)
    old_label = rng.integers(-1, C, (B_OLD, H, W)).astype(np.int32)
    cl_img = rng.uniform(0, 1, (1, 2, H, W, 3)).astype(np.float32)
    cl_label = rng.integers(-1, C, (1, 2, H, W)).astype(np.int32)

    # ---- torch side: training_step_joint transcription -------------------
    conv1 = tnn.Conv2d(3, 8, 3, padding=1)
    tbn = tnn.BatchNorm2d(8, eps=1e-5, momentum=0.1)
    conv2 = tnn.Conv2d(8, C, 1)
    with torch.no_grad():
        conv1.weight.copy_(torch.from_numpy(w1))
        conv1.bias.copy_(torch.from_numpy(b1))
        tbn.weight.copy_(torch.from_numpy(g1))
        tbn.bias.copy_(torch.from_numpy(beta1))
        conv2.weight.copy_(torch.from_numpy(w2))
        conv2.bias.copy_(torch.from_numpy(b2))
    t_params = (list(conv1.parameters()) + list(tbn.parameters())
                + list(conv2.parameters()))
    t_opt = torch.optim.Adam(t_params, lr=1e-3)

    def t_forward(img_bhwc):
        x = torch.from_numpy(img_bhwc.transpose(0, 3, 1, 2))
        return conv2(torch.relu(tbn(conv1(x))))

    t_rgb_cat = lambda t: np.concatenate(
        [rend_rgb[t], old_img, cl_img.reshape(-1, H, W, 3)], 0)
    t_lab_cat = lambda t: np.concatenate(
        [rend_sem[t], old_label, cl_label.reshape(-1, H, W)], 0)

    torch_losses = []
    for t in range(N_STEPS):
        # BN trick (ref :373-379): eval-mode pseudo-label forward with the
        # BatchNorm modules switched to train (batch 2 > 1) — running stats
        # update, normalization uses batch stats
        tbn.train()
        with torch.no_grad():
            t_forward(new_imgs[t])
        # (per-image NeRF Adam steps here in the reference — no-op twin)
        # assembled seg batch, train-mode forward, CE on SOFTMAX (ref :37)
        logits = t_forward(t_rgb_cat(t))
        probs = F.softmax(logits, dim=1)
        loss = F.cross_entropy(
            probs, torch.from_numpy(t_lab_cat(t)).long(),
            ignore_index=-1, reduction="none").mean()
        t_opt.zero_grad()
        loss.backward()
        t_opt.step()
        torch_losses.append(float(loss.detach()))

    # ---- our side: the real JointTrainer, unfused path -------------------
    exp = {
        "optimizer": {"name": "Adam", "lr_seg": 1e-3, "lr_nerf": 1e-2},
        "nerf": {"fused_joint_step": False},
        "parity": {"double_softmax": True},
    }
    tr = JointTrainer(
        exp, image_hw=(H, W), num_classes=C, render_cfg=RenderConfig(),
        nerf_model=SemanticNeRF(bound=1.0, num_semantic_classes=C,
                                n_levels=2, log2_hashmap_size=10),
        seg_model=TinySegBN(), n_rays=16)
    nerf_state = tr.init_nerf(jax.random.key(0))
    _, _, seg_opt = tr.init_seg(jax.random.key(1))
    seg_params = {
        "Conv_0": {"kernel": jnp.asarray(w1.transpose(2, 3, 1, 0)),
                   "bias": jnp.asarray(b1)},
        "TorchBatchNorm_0": {"scale": jnp.asarray(g1),
                             "bias": jnp.asarray(beta1)},
        "Conv_1": {"kernel": jnp.asarray(w2.transpose(2, 3, 1, 0)),
                   "bias": jnp.asarray(b2)},
    }
    seg_stats = {"TorchBatchNorm_0": {"mean": jnp.zeros(8),
                                      "var": jnp.ones(8)}}
    seg_state = (seg_params, seg_stats, tr.seg_tx.init(seg_params))

    step_holder = {"t": 0}
    tr.render_frames = lambda *a, **kw: {
        "nerf_rgb": jnp.asarray(rend_rgb[step_holder["t"]]),
        "nerf_semantics": jnp.asarray(rend_sem[step_holder["t"]])}
    tr._augment_rendered = lambda k, rgbs, labels: (rgbs, labels)
    tr._nerf_update_all = lambda st, *a, **kw: (st, {})

    poses = np.tile(np.eye(4, dtype=np.float32), (B_NEW, 1, 1))
    intrs = np.tile(np.array([20.0, 20.0, W / 2, H / 2], np.float32),
                    (B_NEW, 1))
    jax_losses = []
    for t in range(N_STEPS):
        step_holder["t"] = t
        batch_new = {"img": new_imgs[t],
                     "depth": np.ones((B_NEW, H, W), np.float32),
                     "pose": poses, "intrinsics": intrs,
                     "one_m_to_scene_uom": np.ones(B_NEW, np.float32)}
        batch_old = {"img": old_img, "nerf_label": old_label}
        batch_cl = {"replay_img": cl_img, "replay_label": cl_label}
        nerf_state, seg_state, logs = tr.joint_step(
            nerf_state, seg_state, batch_old, batch_new, batch_cl,
            jax.random.key(100 + t))
        jax_losses.append(float(logs["loss_seg"]))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=3e-4)
    # BN running stats after 5 epochs of trick-forward + train-forward
    # (2 updates/epoch); tolerance absorbs compounded fp drift
    np.testing.assert_allclose(
        np.asarray(seg_state[1]["TorchBatchNorm_0"]["mean"]),
        tbn.running_mean.detach().numpy(), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(seg_state[1]["TorchBatchNorm_0"]["var"]),
        tbn.running_var.detach().numpy(), rtol=5e-3, atol=2e-3)
    # eval-mode agreement of the trained models on a fresh frame
    probe = rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32)
    tbn.eval()
    conv1.eval()
    conv2.eval()
    with torch.no_grad():
        t_eval = t_forward(probe)
    pred, _, _ = tr.seg_infer(seg_state, jnp.asarray(probe), update_bn=False)
    variables = {"params": seg_state[0], "batch_stats": seg_state[1]}
    j_eval = tr.seg_model.apply(variables, jnp.asarray(probe),
                                use_running_average=True,
                                deterministic=True)["out"]
    np.testing.assert_allclose(
        np.asarray(j_eval), t_eval.numpy().transpose(0, 2, 3, 1),
        rtol=1e-2, atol=5e-3)
    assert (np.asarray(pred)[0] == t_eval.numpy().argmax(1)[0]).mean() > 0.98
