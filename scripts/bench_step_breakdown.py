#!/usr/bin/env python
"""Decompose the NeRF train step's cost on real hardware.

Times, at the production occupancy workload (4096 rays x 32+32 samples,
full-size model):
  1. forward only (render + losses)
  2. full step (fwd + bwd + Adam)
  3. full step with the hash-table VJP's accumulation replaced by zeros
     (isolates the table-grad accumulation cost)
  4. the table-grad accumulation alone, scatter vs one-hot, at the step's
     exact row count
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ucsa_neural_rendering_tpu.models import SemanticNeRF
    from ucsa_neural_rendering_tpu.models import hash_encoding as he
    from ucsa_neural_rendering_tpu.ops.renderer import RenderConfig
    from ucsa_neural_rendering_tpu.train import NeRFTrainer

    H, W = 240, 320
    model = SemanticNeRF(bound=4.0, num_semantic_classes=40)
    cfg = RenderConfig(num_steps=32, upsample_steps=32, occ_candidates=128)
    tr = NeRFTrainer(model, cfg, lr=1e-2, n_rays=4096, image_hw=(H, W))
    params, opt_state = tr.init(jax.random.key(0))
    grid = tr.init_occupancy()
    batch = {
        "pose": jnp.eye(4),
        "intrinsics": jnp.array([277.0, 277.0, W / 2, H / 2]),
        "image": jax.random.uniform(jax.random.key(2), (H, W, 3)),
        "label": jnp.zeros((H, W), jnp.int32),
        "depth": jnp.ones((H, W)) * 2.0,
        "one_m_to_scene_uom": jnp.float32(1.0),
    }

    def timeit(fn, *a, reps=5):
        out = fn(*a)
        _ = float(jnp.sum(jax.tree.leaves(out)[0]))
        ts = []
        for _i in range(reps):
            t0 = time.perf_counter()
            out = fn(*a)
            _ = float(jnp.sum(jax.tree.leaves(out)[0]))
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1000

    # 1. forward only
    from ucsa_neural_rendering_tpu.data.rays import get_rays_sampled
    from ucsa_neural_rendering_tpu.ops.renderer import render_rays
    from ucsa_neural_rendering_tpu.train.nerf_trainer import nerf_losses

    def fwd(p, key):
        k_rays, k_render = jax.random.split(key)
        ro, rd, dn, inds = get_rays_sampled(batch["pose"],
                                            batch["intrinsics"], H, W,
                                            k_rays, 4096)
        out = render_rays(model, {"params": p}, ro, rd, dn, k_render, cfg,
                          grid)
        total, _ = nerf_losses(out, batch["image"].reshape(-1, 3)[inds],
                               batch["label"].reshape(-1)[inds],
                               batch["depth"].reshape(-1)[inds],
                               batch["one_m_to_scene_uom"], 40)
        return total

    ms_fwd = timeit(jax.jit(fwd), params, jax.random.key(1))
    print(f"forward only                  {ms_fwd:8.1f} ms", flush=True)

    # 2. full step
    def step(p, o, key):
        return tr.train_step(p, o, batch, key, occ_grid=grid)
    # train_step donates params/opt_state; keep fresh copies per call
    p0 = jax.tree.map(lambda x: x.copy(), params)
    o0 = jax.tree.map(lambda x: x.copy(), opt_state)
    tr.train_step(p0, o0, batch, jax.random.key(1), occ_grid=grid)
    ts = []
    for i in range(5):
        p1 = jax.tree.map(lambda x: x.copy(), params)
        o1 = jax.tree.map(lambda x: x.copy(), opt_state)
        _ = float(jnp.sum(jax.tree.leaves(p1)[0]))
        t0 = time.perf_counter()
        p1, o1, parts = tr.train_step(p1, o1, batch, jax.random.key(i),
                                      occ_grid=grid)
        _ = float(parts["loss_nerf_total"])
        ts.append(time.perf_counter() - t0)
    ms_step = min(ts) * 1000
    print(f"full step                     {ms_step:8.1f} ms", flush=True)

    # 3. full step, table accumulation stubbed to zeros
    orig = he._accumulate_rows
    he._accumulate_rows = lambda acc, idx, contrib, tile=he._SF_TILE: acc
    tr3 = NeRFTrainer(model, cfg, lr=1e-2, n_rays=4096, image_hw=(H, W))
    ts = []
    tr3.train_step(jax.tree.map(lambda x: x.copy(), params),
                   jax.tree.map(lambda x: x.copy(), opt_state), batch,
                   jax.random.key(1), occ_grid=grid)
    for i in range(5):
        p1 = jax.tree.map(lambda x: x.copy(), params)
        o1 = jax.tree.map(lambda x: x.copy(), opt_state)
        _ = float(jnp.sum(jax.tree.leaves(p1)[0]))
        t0 = time.perf_counter()
        p1, o1, parts = tr3.train_step(p1, o1, batch, jax.random.key(i),
                                       occ_grid=grid)
        _ = float(parts["loss_nerf_total"])
        ts.append(time.perf_counter() - t0)
    he._accumulate_rows = orig
    ms_noacc = min(ts) * 1000
    print(f"full step, no table accum     {ms_noacc:8.1f} ms  "
          f"(accumulation = {ms_step - ms_noacc:.1f} ms)", flush=True)

    # 4. accumulation alone at the step's row count (stochastic: N*L rows)
    n_pts = 4096 * (cfg.num_steps + cfg.upsample_steps)
    spec = model.hash_spec if hasattr(model, "hash_spec") else None
    from ucsa_neural_rendering_tpu.models.hash_encoding import make_spec, \
        ngp_per_level_scale
    spec = make_spec(per_level_scale=ngp_per_level_scale(4.0))
    m = n_pts * spec.n_levels
    idx = jax.random.randint(jax.random.key(3), (m,), 0, spec.table_size,
                             dtype=jnp.int32)
    c = jax.random.normal(jax.random.key(4), (m, 2), jnp.float32)
    t_sz = spec.table_size
    ms_sc = timeit(jax.jit(lambda i, cc: jnp.zeros((t_sz, 2)).at[i].add(cc)),
                   idx, c)
    ms_oh = timeit(jax.jit(partial(he._accumulate_rows)),
                   jnp.zeros((t_sz, 2)), idx, c)
    print(f"isolated: scatter {ms_sc:.1f} ms | one-hot {ms_oh:.1f} ms "
          f"at M={m}", flush=True)


if __name__ == "__main__":
    main()
