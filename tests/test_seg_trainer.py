"""SegTrainer: loss math, POLY schedule, and a data-parallel train step on
the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ucsa_neural_rendering_tpu.metrics import SemanticsMeter
from ucsa_neural_rendering_tpu.models import DeepLabV3
from ucsa_neural_rendering_tpu.parallel import get_mesh, shard_batch
from ucsa_neural_rendering_tpu.train import (SegTrainer, cross_entropy_ignore,
                                             poly_lr_factor)


def test_cross_entropy_ignore_matches_torch(rng):
    """The reference's exact form: reduction="none" then .mean() over ALL
    pixels (ref semantics_lightning_net.py:79-89) — torch zeroes ignored
    entries but the denominator is the total count, NOT torch's default
    reduction="mean" (sum/valid)."""
    import torch
    import torch.nn.functional as F

    logits = rng.normal(size=(2, 5, 7, 4)).astype(np.float32)
    labels = rng.integers(-1, 4, size=(2, 5, 7))
    assert (labels == -1).sum() > 0  # the two normalizations must differ
    ours = float(cross_entropy_ignore(jnp.asarray(logits),
                                      jnp.asarray(labels)))
    ref = F.cross_entropy(torch.from_numpy(logits.transpose(0, 3, 1, 2)),
                          torch.from_numpy(labels), ignore_index=-1,
                          reduction="none").mean().item()
    assert abs(ours - ref) < 1e-4
    ref_by_valid = F.cross_entropy(
        torch.from_numpy(logits.transpose(0, 3, 1, 2)),
        torch.from_numpy(labels), ignore_index=-1).item()
    assert abs(ours - ref_by_valid) > 1e-3  # and we match the right one


def test_cross_entropy_double_softmax_matches_reference_quirk(rng):
    """The reference applies CE to softmax probabilities
    (semantics_lightning_net.py:74-80)."""
    import torch
    import torch.nn.functional as F

    logits = rng.normal(size=(2, 3, 3, 4)).astype(np.float32)
    labels = rng.integers(0, 4, size=(2, 3, 3))
    ours = float(cross_entropy_ignore(jnp.asarray(logits), jnp.asarray(labels),
                                      double_softmax=True))
    probs = F.softmax(torch.from_numpy(logits.transpose(0, 3, 1, 2)), dim=1)
    ref = F.cross_entropy(probs, torch.from_numpy(labels),
                          ignore_index=-1).item()
    assert abs(ours - ref) < 1e-4


def test_cross_entropy_all_ignored_is_finite(rng):
    """A batch whose every pixel is −1 (possible for pure novel-viewpoint
    replay assemblies) must yield loss 0 with finite (zero) gradients —
    which is also exactly what the reference's reduction="none".mean()
    produces (torch's default reduction="mean" would give 0/0 NaN)."""
    logits = rng.normal(size=(2, 3, 3, 4)).astype(np.float32)
    labels = np.full((2, 3, 3), -1, np.int32)
    loss, grads = jax.value_and_grad(
        lambda lg: cross_entropy_ignore(lg, jnp.asarray(labels)))(
            jnp.asarray(logits))
    assert float(loss) == 0.0
    assert np.isfinite(np.asarray(grads)).all()


def test_poly_lr_factor():
    # epoch 0 → init lr; epoch max → target lr
    assert abs(poly_lr_factor(0, 150, 0.9, 1e-4, 1e-6) - 1e-4) < 1e-12
    assert abs(poly_lr_factor(150, 150, 0.9, 1e-4, 1e-6) - 1e-6) < 1e-12
    assert abs(poly_lr_factor(200, 150, 0.9, 1e-4, 1e-6) - 1e-6) < 1e-12
    mid = poly_lr_factor(75, 150, 0.9, 1e-4, 1e-6)
    assert 1e-6 < mid < 1e-4


@pytest.mark.slow
def test_seg_train_step_dp_mesh(rng):
    """One DP train step of the full DeepLabV3 across the 8-device mesh."""
    mesh = get_mesh()
    assert mesh.devices.size == 8
    model = DeepLabV3(num_classes=8)
    trainer = SegTrainer(model, {"name": "Adam", "lr": 1e-4}, mesh=mesh)
    state = trainer.init(jax.random.key(0), image_hw=(32, 32))

    images = rng.uniform(0, 1, (8, 32, 32, 3)).astype(np.float32)
    labels = rng.integers(-1, 8, (8, 32, 32)).astype(np.int32)
    images, labels = shard_batch((images, labels), mesh)

    state, loss, conf = trainer.train_step(state, images, labels, 1e-4)
    assert np.isfinite(float(loss))
    meter = SemanticsMeter(8)
    meter.update_confmat(conf)
    miou, tacc, macc = meter.measure()
    assert 0.0 <= tacc <= 1.0

    # second step with new lr runs and changes params
    before = np.asarray(
        jax.tree.leaves(state[0])[0]).copy()
    state, loss2, _ = trainer.train_step(state, images, labels, 5e-5)
    after = np.asarray(jax.tree.leaves(state[0])[0])
    assert not np.array_equal(before, after)

    # eval step: argmax predictions in range
    preds, logits = trainer.eval_step(state[0], state[1], images)
    assert preds.shape == (8, 32, 32)
    assert int(np.asarray(preds).max()) < 8


def test_train_step_loss_unaffected_by_padding(rng):
    """Mesh-divisibility padding (repeated images, −1 labels) must not
    change the CE loss: the denominator is the REAL batch's pixel count
    via n_real, like the reference's unpadded .mean() (round-3 review
    finding — dividing by the padded size scaled gradients by real/padded,
    e.g. halving them at the shipped batch_size=4 on an 8-device mesh)."""
    import jax

    from ucsa_neural_rendering_tpu.models.deeplabv3 import DeepLabV3
    from ucsa_neural_rendering_tpu.models.resnet import TINY_LAYOUT
    from ucsa_neural_rendering_tpu.train import SegTrainer

    H = W = 16
    model = DeepLabV3(num_classes=4, backbone_layout=TINY_LAYOUT,
                      aspp_channels=8, head_channels=8)
    tr = SegTrainer(model, {"name": "Adam", "lr": 1e-4})
    state = tr.init(jax.random.key(0), image_hw=(H, W))
    img = rng.uniform(0, 1, (2, H, W, 3)).astype(np.float32)
    lab = rng.integers(-1, 4, (2, H, W)).astype(np.int32)

    _, loss_real, _ = tr.train_step(state, img, lab, 1e-4,
                                    dropout_key=jax.random.key(1))
    # pad 2 → 4 the way pretrain_loop._pad_to does
    img_p = np.concatenate([img, img], 0)
    lab_p = np.concatenate([lab, np.full_like(lab, -1)], 0)
    state2 = tr.init(jax.random.key(0), image_hw=(H, W))
    _, loss_pad, _ = tr.train_step(state2, img_p, lab_p, 1e-4,
                                   dropout_key=jax.random.key(1), n_real=2)
    # BN batch stats differ (pads repeat real images by design), so allow
    # a small tolerance; without n_real the ratio would be exactly 0.5
    assert abs(float(loss_pad) / float(loss_real) - 1.0) < 0.05
