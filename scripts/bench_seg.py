#!/usr/bin/env python
"""A/B the DeepLabV3-R101 train/eval step: f32 vs bf16 compute (TPU).

Measures the seg side of the joint pipeline (ref: the torchvision
deeplabv3_resnet101 forward/backward inside SemanticsLightningNet /
JointTrainLightningNet — nr4seg/network/deeplabv3.py), which runs f32 in
the reference. The TPU recipe keeps params / BN statistics / logits /
loss in f32 and casts conv compute to bf16 (`models/deeplabv3.py
seg_compute_dtype`); this script grounds the default with a measured
delta plus a logits/label agreement check on the same weights.

Usage:  python scripts/bench_seg.py [--steps 20] [--batch 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(dtype_name, args, weights=None):
    import jax
    import jax.numpy as jnp

    from ucsa_neural_rendering_tpu.models import DeepLabV3
    from ucsa_neural_rendering_tpu.train.seg_trainer import SegTrainer

    H, W = 240, 320
    model = DeepLabV3(num_classes=40, dtype=jnp.dtype(dtype_name))
    tr = SegTrainer(model, {"name": "Adam", "lr": 1e-4})
    state = tr.init(jax.random.key(0), image_hw=(H, W))
    if weights is not None:
        state = (weights[0], weights[1], state[2])
    # host snapshot: train_step donates its state, which would delete these
    init_weights = jax.device_get((state[0], state[1]))

    key = jax.random.key(1)
    img = jax.random.uniform(key, (args.batch, H, W, 3))
    lab = jax.random.randint(jax.random.key(2), (args.batch, H, W), -1, 40)

    # numerics check BEFORE any training so both precisions see the exact
    # same weights (training trajectories legitimately diverge)
    preds0, logits0 = tr.eval_step(state[0], state[1], img)
    logits0 = jax.device_get(logits0)
    preds0 = jax.device_get(preds0)

    # warm up / compile (axon: force host readback; block_until_ready is
    # unreliable through the tunnel)
    state, loss, conf = tr.train_step(state, img, lab, 1e-4)
    _ = float(loss)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, loss, conf = tr.train_step(state, img, lab, 1e-4)
        _ = float(loss)
    train_ms = (time.perf_counter() - t0) / args.steps * 1000

    preds, logits = tr.eval_step(state[0], state[1], img)
    _ = float(jnp.sum(logits))
    t0 = time.perf_counter()
    for _ in range(args.steps):
        preds, logits = tr.eval_step(state[0], state[1], img)
        _ = float(jnp.sum(logits))
    eval_ms = (time.perf_counter() - t0) / args.steps * 1000

    return {"train_ms": train_ms, "eval_ms": eval_ms,
            "img_per_s": args.batch / (train_ms / 1000),
            "logits": logits0, "preds": preds0,
            "weights": weights or (None, None), "init": init_weights}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    print(f"backend: {jax.default_backend()}", flush=True)

    r32 = measure("float32", args)
    print(f"f32  : train {r32['train_ms']:7.1f} ms/step "
          f"({r32['img_per_s']:.1f} img/s), eval {r32['eval_ms']:7.1f} ms",
          flush=True)
    # same weights into the bf16 model for an apples-to-apples numerics check
    r16 = measure("bfloat16", args, weights=r32["init"])
    print(f"bf16 : train {r16['train_ms']:7.1f} ms/step "
          f"({r16['img_per_s']:.1f} img/s), eval {r16['eval_ms']:7.1f} ms",
          flush=True)

    agree = float(jnp.mean(r16["preds"] == r32["preds"]))
    dl = float(jnp.max(jnp.abs(r16["logits"] - r32["logits"])))
    sc = float(jnp.max(jnp.abs(r32["logits"])))
    print(f"speedup: train {r32['train_ms']/r16['train_ms']:.2f}x, "
          f"eval {r32['eval_ms']/r16['eval_ms']:.2f}x | "
          f"label agree {agree*100:.2f}% | max |dlogit| {dl:.4f} "
          f"(scale {sc:.2f})", flush=True)


if __name__ == "__main__":
    main()
