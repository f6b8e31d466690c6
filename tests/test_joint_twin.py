"""Joint-phase composite twin (VERDICT r4 #7).

`JointTrainer.joint_step` vs a torch-CPU transcription of the reference's
`training_step_joint` (ref joint_train_lightning_net.py:363-471): the full
composite per epoch —

  no-grad NeRF render of the new frames (forward_nerf_test :225-257)
  → BN-trick pseudo-labels (eval forward, BN modules train, :373-379)
  → per-image NeRF Adam updates on the pseudo-labels (:381-417)
  → augmentation of the rendered frames (:419-431; pinned to identity)
  → 3-way replay assembly [rendered ⊕ old ⊕ cl] (:432-454)
  → train-mode seg CE update with the double-softmax quirk (:455-461)

— run 5 epochs from identical init on both sides, comparing the seg/NeRF
loss trajectories, the BN running stats, and the final pseudo-labels.

Determinism pinning (torch/JAX RNG streams cannot be aligned): ray
selection is the full pixel set (n_rays = H*W; the uniform-with-replacement
sampler itself is covered by tests/test_rays.py), sampling perturbation is
off on both sides (stratified/sample_pdf det — the det equality is pinned
by test_reference_parity), and augmentation is identity on both sides (the
JAX augmentation pipeline is intentionally NOT a torchvision transcription;
it has its own tests in test_augmentation.py). What this twin pins is the
COMPOSITE: operation order, the BN-stat feedback across epochs, pseudo-label
flow, assembly order, CE normalization, and both optimizer configs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import linen as nn  # noqa: E402

from test_reference_parity import (_twin_weights, ref_renderer)  # noqa: E402,F401

C, H, W = 6, 6, 8
B_NEW, B_OLD, B_CL_GROUPS, CL_PER_GROUP = 2, 1, 1, 2
N_EPOCHS = 5
NUM_STEPS = 12  # coarse == importance == test budget (use_occupancy off)
LR_NERF, LR_SEG = 1e-2, 1e-3


class TwinSeg(nn.Module):
    """conv3x3 → TorchBatchNorm → relu → conv1x1, with the DeepLabV3 call
    signature JointTrainer drives (use_running_average / deterministic /
    {"out": logits})."""
    num_classes: int = C

    @nn.compact
    def __call__(self, x, use_running_average=True, deterministic=True):
        from ucsa_neural_rendering_tpu.models.resnet import TorchBatchNorm
        h = nn.Conv(8, (3, 3), padding="SAME", name="conv1")(x)
        h = TorchBatchNorm(use_running_average=use_running_average,
                           name="bn")(h)
        h = nn.relu(h)
        h = nn.Conv(self.num_classes, (1, 1), name="conv2")(h)
        return {"out": h}


class TwinJaxNeRF:
    """Duck-typed stand-in for SemanticNeRF over the shared tiny field
    (same topology/weights as the torch twin; see _twin_weights)."""
    bound = 1.0

    def apply(self, variables, *args, method=None, **kw):
        from ucsa_neural_rendering_tpu.models.activation import trunc_exp
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

    def pack_table(self, params, max_entries, dtype="bf16"):
        raise AssertionError("packing is TPU-gated; must not run on CPU")


def _seg_weights(rng):
    w1 = rng.uniform(-0.3, 0.3, (8, 3, 3, 3)).astype(np.float32)
    b1 = rng.uniform(-0.1, 0.1, 8).astype(np.float32)
    g1 = rng.uniform(0.5, 1.5, 8).astype(np.float32)
    beta1 = rng.uniform(-0.1, 0.1, 8).astype(np.float32)
    w2 = rng.uniform(-0.3, 0.3, (C, 8, 1, 1)).astype(np.float32)
    b2 = rng.uniform(-0.1, 0.1, C).astype(np.float32)
    return w1, b1, g1, beta1, w2, b2


def _full_frame_rays(pose, intrinsics):
    """Shared full-pixel ray set (get_rays parity is its own golden test)."""
    from ucsa_neural_rendering_tpu.data.rays import get_rays
    r = get_rays(jnp.asarray(pose), jnp.asarray(intrinsics), H, W)
    return (np.asarray(r["rays_o"]).reshape(-1, 3),
            np.asarray(r["rays_d"]).reshape(-1, 3),
            np.asarray(r["direction_norms"]).reshape(-1))


def test_joint_step_trajectory_matches_torch(ref_renderer, monkeypatch):
    import torch.nn.functional as F
    from torch import nn as tnn

    import ucsa_neural_rendering_tpu.ops.renderer as renderer_mod
    import ucsa_neural_rendering_tpu.train.joint_trainer as jt_mod
    from ucsa_neural_rendering_tpu.ops.renderer import RenderConfig

    rng = np.random.default_rng(11)
    w0 = _twin_weights(C, rng)
    sw = _seg_weights(rng)

    # ---- shared data -----------------------------------------------------
    intrinsics = np.array([10.0, 10.0, W / 2, H / 2], np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (B_NEW, 1, 1))
    poses[1, :3, 3] = [0.1, -0.05, 0.08]
    imgs_new = rng.uniform(0, 1, (B_NEW, H, W, 3)).astype(np.float32)
    depth_new = rng.uniform(0.3, 1.2, (B_NEW, H, W)).astype(np.float32)
    depth_new[:, ::3, ::4] = 0.0  # invalid-depth masking stays exercised
    uoms = np.array([1.2, 0.9], np.float32)
    img_old = rng.uniform(0, 1, (B_OLD, H, W, 3)).astype(np.float32)
    lab_old = rng.integers(-1, C, (B_OLD, H, W)).astype(np.int32)
    img_cl = rng.uniform(0, 1, (B_CL_GROUPS, CL_PER_GROUP, H, W, 3)
                         ).astype(np.float32)
    lab_cl = rng.integers(-1, C, (B_CL_GROUPS, CL_PER_GROUP, H, W)
                          ).astype(np.int32)

    frame_rays = [_full_frame_rays(poses[b], intrinsics)
                  for b in range(B_NEW)]

    # ---- determinism pinning (both sides) ---------------------------------
    orig_strat = renderer_mod.stratified_samples
    orig_pdf = renderer_mod.sample_pdf
    monkeypatch.setattr(renderer_mod, "stratified_samples",
                        lambda nears, fars, n, key: orig_strat(
                            nears, fars, n, None))
    monkeypatch.setattr(renderer_mod, "sample_pdf",
                        lambda bins, w, n, key: orig_pdf(bins, w, n, None))

    def det_rays(pose, intr, h, w, key, n_rays):
        assert n_rays == h * w
        from ucsa_neural_rendering_tpu.data.rays import get_rays
        r = get_rays(pose, intr, h, w)
        return (r["rays_o"].reshape(-1, 3), r["rays_d"].reshape(-1, 3),
                r["direction_norms"].reshape(-1), jnp.arange(h * w))

    monkeypatch.setattr(jt_mod, "get_rays_sampled", det_rays)
    monkeypatch.setattr(jt_mod, "augment",
                        lambda k, img, labels, out_hw: (img, list(labels)))

    ref_pdf = ref_renderer.sample_pdf
    monkeypatch.setattr(ref_renderer, "sample_pdf",
                        lambda b, w, n, det=False: ref_pdf(b, w, n, det=True))

    # ---- torch side: training_step_joint transcribed ----------------------
    from test_reference_parity import test_fit_trajectory_matches_torch  # noqa: F401

    class _TruncExp(torch.autograd.Function):
        @staticmethod
        def forward(ctx, x):
            ctx.save_for_backward(x)
            return torch.exp(x)

        @staticmethod
        def backward(ctx, g):
            return g * torch.exp(ctx.saved_tensors[0].clamp(-15, 15))

    class TwinTorchNeRF(ref_renderer.SemanticNeRFRenderer):
        def __init__(self):
            super().__init__(bound=1, cuda_ray=False, density_scale=1,
                             num_semantic_classes=C)

            def lin(w):
                m = tnn.Linear(w[0].shape[1], w[0].shape[0])
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
            return _TruncExp.apply(h[..., 0]), h[..., 1:]

        def density(self, x):
            sigma, geo = self._geo(x)
            return {"sigma": sigma.unsqueeze(-1), "geo_feat": geo}

        def color(self, x, d, mask=None, sigma=None, geo_feat=None):
            rgbs = torch.zeros(mask.shape[0], 3)
            if not mask.any():
                return rgbs
            rgbs[mask] = torch.sigmoid(self.color2(torch.relu(self.color1(
                torch.cat([d[mask], geo_feat[mask]], dim=-1)))))
            return rgbs

        def semantics(self, x, d, mask=None, sigma=None, geo_feat=None):
            sem = torch.zeros(mask.shape[0], C)
            if not mask.any():
                return sem
            sem[mask] = F.softmax(self.sem2(torch.relu(
                self.sem1(geo_feat[mask]))), dim=-1)
            return sem

    t_nerf = TwinTorchNeRF()
    opt_nerf = torch.optim.Adam(
        [{"params": list(t_nerf.encoder.parameters())},
         {"params": (list(t_nerf.sigma1.parameters())
                     + list(t_nerf.sigma2.parameters())
                     + list(t_nerf.color1.parameters())
                     + list(t_nerf.color2.parameters())
                     + list(t_nerf.sem1.parameters())
                     + list(t_nerf.sem2.parameters())),
          "weight_decay": 1e-6}],
        lr=LR_NERF, betas=(0.9, 0.99), eps=1e-15)

    conv1 = tnn.Conv2d(3, 8, 3, padding=1)
    tbn = tnn.BatchNorm2d(8, eps=1e-5, momentum=0.1)
    conv2 = tnn.Conv2d(8, C, 1)
    with torch.no_grad():
        conv1.weight.copy_(torch.from_numpy(sw[0]))
        conv1.bias.copy_(torch.from_numpy(sw[1]))
        tbn.weight.copy_(torch.from_numpy(sw[2]))
        tbn.bias.copy_(torch.from_numpy(sw[3]))
        conv2.weight.copy_(torch.from_numpy(sw[4]))
        conv2.bias.copy_(torch.from_numpy(sw[5]))
    opt_seg = torch.optim.Adam(
        list(conv1.parameters()) + list(tbn.parameters())
        + list(conv2.parameters()), lr=LR_SEG)

    def t_seg_forward(images_nhwc, bn_train):
        x = torch.from_numpy(images_nhwc).permute(0, 3, 1, 2)
        tbn.train(bn_train)
        return conv2(torch.relu(tbn(conv1(x))))

    def t_run(rays, grad=False):
        o, d, dn = (torch.from_numpy(a.copy())[None] for a in rays)
        ctx = torch.enable_grad() if grad else torch.no_grad()
        with ctx:
            return t_nerf.run(o, d, dn[..., None], num_steps=NUM_STEPS,
                              upsample_steps=NUM_STEPS, perturb=False)

    t_seg_losses, t_nerf_losses = [], []
    for _ in range(N_EPOCHS):
        # forward_nerf_test (:225-257): no-grad renders, normalize, argmax
        rendered_rgb, rendered_lab = [], []
        for b in range(B_NEW):
            out = t_run(frame_rays[b])
            sem = out["semantics"][0]
            invalid = sem.sum(-1) == 0
            sem = sem.clone()
            sem[invalid] = 1
            sem = sem / sem.sum(-1, keepdim=True)
            rendered_rgb.append(out["image"][0].reshape(H, W, 3).numpy())
            rendered_lab.append(
                sem.argmax(-1).reshape(H, W).numpy().astype(np.int64))

        # BN trick (:373-379): eval forward with BN modules in train mode
        with torch.no_grad():
            logits = t_seg_forward(imgs_new, bn_train=B_NEW > 1)
            pseudo = F.softmax(logits, dim=1).argmax(1).numpy()

        # per-image NeRF updates (:381-417)
        ep_nerf = []
        for b in range(B_NEW):
            out = t_run(frame_rays[b], grad=True)
            sem = out["semantics"]
            lab = torch.from_numpy(pseudo[b].reshape(-1))[None].clone()
            invalid = sem.sum(-1) == 0
            sem = sem.clone()
            sem[invalid] = 1
            sem = sem / sem.sum(-1, keepdim=True)
            lab[invalid] = -1
            t_rgb = torch.from_numpy(imgs_new[b].reshape(-1, 3))[None]
            t_dep = torch.from_numpy(depth_new[b].reshape(-1))[None]
            loss_color = tnn.MSELoss(reduction="none")(
                out["image"], t_rgb).mean()
            loss_sem = tnn.NLLLoss(ignore_index=-1, reduction="none")(
                torch.log(sem + 1e-15).permute(0, 2, 1), lab).mean()
            pd, gd = out["depth"], t_dep
            loss_depth = tnn.L1Loss(reduction="none")(
                pd[gd != 0] / uoms[b], gd[gd != 0]).mean(-1)
            loss = loss_color + 0.04 * loss_sem + 0.1 * loss_depth
            opt_nerf.zero_grad()
            loss.backward()
            opt_nerf.step()
            ep_nerf.append(float(loss.detach()))
        t_nerf_losses.append(float(np.mean(ep_nerf)))

        # assembly (:419-454; identity augmentation) + seg update (:455-461)
        rgb_seg = np.concatenate(
            [np.stack(rendered_rgb), img_old,
             img_cl.reshape(-1, H, W, 3)], 0)
        label_seg = np.concatenate(
            [np.stack(rendered_lab),
             lab_old.astype(np.int64), lab_cl.reshape(-1, H, W)], 0)
        logits = t_seg_forward(rgb_seg, bn_train=True)
        # the reference feeds SOFTMAXED probs into CrossEntropyLoss
        # (forward_seg's seg_semantics_raw, :159-165 + criterion_seg :37)
        probs = F.softmax(logits, dim=1)
        loss = F.cross_entropy(probs, torch.from_numpy(label_seg),
                               ignore_index=-1, reduction="none").mean()
        opt_seg.zero_grad()
        loss.backward()
        opt_seg.step()
        t_seg_losses.append(float(loss))

    t_bn_mean = tbn.running_mean.detach().numpy().copy()
    t_bn_var = tbn.running_var.detach().numpy().copy()
    with torch.no_grad():
        t_final_logits = t_seg_forward(imgs_new, bn_train=False)
        tbn.eval()
        t_final_logits = conv2(torch.relu(tbn(conv1(
            torch.from_numpy(imgs_new).permute(0, 3, 1, 2)))))
        t_final_pseudo = t_final_logits.argmax(1).numpy()

    # ---- JAX side: the real JointTrainer.joint_step ------------------------
    from ucsa_neural_rendering_tpu.train import JointTrainer

    exp = {"optimizer": {"lr_nerf": LR_NERF, "lr_seg": LR_SEG,
                         "name": "Adam"},
           "nerf": {"use_occupancy": False},
           "parity": {"double_softmax": True}}
    cfg = RenderConfig(num_steps=NUM_STEPS, upsample_steps=NUM_STEPS,
                       remat=False, max_ray_batch=H * W,
                       train_packed_max_entries=0, packed_max_entries=0)
    trainer = JointTrainer(exp, image_hw=(H, W), num_classes=C,
                           render_cfg=cfg, n_rays=H * W,
                           nerf_model=TwinJaxNeRF(), seg_model=TwinSeg(C))
    assert trainer.test_cfg == cfg  # dense mode: test budget == train budget

    nerf_params = {k: (jnp.asarray(v[0]), jnp.asarray(v[1]))
                   for k, v in w0.items()}
    nerf_state = (nerf_params, trainer.nerf_tx.init(nerf_params))
    seg_params = {
        "conv1": {"kernel": jnp.asarray(sw[0].transpose(2, 3, 1, 0)),
                  "bias": jnp.asarray(sw[1])},
        "bn": {"scale": jnp.asarray(sw[2]), "bias": jnp.asarray(sw[3])},
        "conv2": {"kernel": jnp.asarray(sw[4].transpose(2, 3, 1, 0)),
                  "bias": jnp.asarray(sw[5])},
    }
    seg_stats = {"bn": {"mean": jnp.zeros(8), "var": jnp.ones(8)}}
    seg_state = (seg_params, seg_stats, trainer.seg_tx.init(seg_params))

    batch_new = {"img": imgs_new, "depth": depth_new, "pose": poses,
                 "intrinsics": np.tile(intrinsics, (B_NEW, 1)),
                 "one_m_to_scene_uom": uoms}
    batch_old = {"img": img_old, "nerf_label": lab_old}
    batch_cl = {"replay_img": img_cl, "replay_label": lab_cl}

    j_seg_losses, j_nerf_losses = [], []
    key = jax.random.key(0)
    for _ in range(N_EPOCHS):
        key, k = jax.random.split(key)
        nerf_state, seg_state, logs = trainer.joint_step(
            nerf_state, seg_state, batch_old, batch_new, batch_cl, k)
        j_seg_losses.append(float(logs["loss_seg"]))
        j_nerf_losses.append(float(logs["loss_nerf_total"]))

    j_bn_mean = np.asarray(seg_state[1]["bn"]["mean"])
    j_bn_var = np.asarray(seg_state[1]["bn"]["var"])
    j_final_pseudo, _, _ = trainer.seg_infer(seg_state, jnp.asarray(imgs_new),
                                             update_bn=False)
    j_final_pseudo = np.asarray(j_final_pseudo)

    # ---- parity ------------------------------------------------------------
    # same fp-drift discipline as the fit twin: tight on epoch 1, loose tail
    np.testing.assert_allclose(j_seg_losses[0], t_seg_losses[0], rtol=1e-3)
    np.testing.assert_allclose(j_nerf_losses[0], t_nerf_losses[0], rtol=1e-3)
    np.testing.assert_allclose(j_seg_losses, t_seg_losses, rtol=2e-2)
    np.testing.assert_allclose(j_nerf_losses, t_nerf_losses, rtol=2e-2)
    # BN running stats see every forward of the trajectory — if any branch
    # ran in the wrong BN mode or on a differently-assembled batch, these
    # land an order of magnitude off. The tolerance matches the loss
    # tolerance above: params drift within 2%, so activation stats do too
    # (measured max drift over 5 epochs: 1.5% relative / 1.1e-3 absolute).
    np.testing.assert_allclose(j_bn_mean, t_bn_mean, rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(j_bn_var, t_bn_var, rtol=2e-2, atol=2e-3)
    assert (j_final_pseudo == t_final_pseudo).mean() >= 0.95
