#!/usr/bin/env python
"""Decompose one full-frame render's cost on real hardware.

All renderer shapes are static, so component timing needs no fitted scene —
an initialized model gives the same gather/MLP/placement costs. Measures,
at the 240x320 / 16+16 / pk23 test configuration (per frame = 76,800 rays):
  1. full render (render_rays_staged), packed and unpacked
  2. occupancy placement (128 candidates: grid probe + sample_pdf)
  3. exact density (hash encode + sigma MLP), packed vs unpacked
  4. importance stage (composite_weights + sample_pdf + merge sort)
  5. color + semantics MLPs
  6. compositing
  7. raw gather microbench: 4 B rows vs 32 B rows (does row width cost?)
This identifies how much of the frame is table gathers vs "fixed" work —
the packed tables only bought 1.23x where rows predicted 1.8x (render_bench
r2), so something else is a third of the frame.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ucsa_neural_rendering_tpu.data import get_rays
    from ucsa_neural_rendering_tpu.models import SemanticNeRF
    from ucsa_neural_rendering_tpu.ops.compositing import (composite,
                                                           composite_weights)
    from ucsa_neural_rendering_tpu.ops.occupancy import (OccupancyConfig,
                                                         init_grid,
                                                         occupancy_at)
    from ucsa_neural_rendering_tpu.ops.renderer import (RenderConfig,
                                                        render_rays_staged)
    from ucsa_neural_rendering_tpu.ops.sampling import (sample_pdf,
                                                        stratified_samples)

    H, W = 240, 320
    n = H * W
    chunk = 4096
    steps = 16
    model = SemanticNeRF(bound=1.0, num_semantic_classes=40)
    params = model.init(jax.random.key(0), jnp.zeros((8, 3)),
                        jnp.zeros((8, 3)).at[:, 2].set(1.0))["params"]
    grid = init_grid(OccupancyConfig()) + 0.5  # non-trivial occupancy
    pose = jnp.eye(4)
    intr = jnp.array([277.0, 277.0, W / 2, H / 2])
    rays = get_rays(pose, intr, H, W)
    packed = jax.jit(lambda p: model.pack_table(p, 2 ** 23))(params)

    def timeit(f, *a, reps=3):
        out = f(*a)
        _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        ts = []
        for _i in range(reps):
            t0 = time.perf_counter()
            out = f(*a)
            _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1000

    # 1. full staged renders
    for name, me in (("16+16 unpacked", 0), ("16+16 pk23", 2 ** 23)):
        cfg = RenderConfig(num_steps=steps, upsample_steps=steps,
                           packed_max_entries=me)
        pt = packed if me else None
        ms = timeit(jax.jit(lambda p, g, t, c=cfg: render_rays_staged(
            model, {"params": p}, rays["rays_o"], rays["rays_d"],
            rays["direction_norms"], c, g, packed=t)), params, grid, pt)
        print(f"full frame {name:16s} {ms:8.1f} ms", flush=True)

    # fixed per-chunk ray geometry (shared by the sub-benches)
    ro = rays["rays_o"][:chunk]
    rd = rays["rays_d"][:chunk]
    n_chunks = n // chunk

    # 2. occupancy placement per frame
    def occ_place(g):
        nears = jnp.full((chunk,), 0.2)
        fars = jnp.full((chunk,), 2.0)
        cand = stratified_samples(nears, fars, 128, None)
        xyz = ro[:, None, :] + rd[:, None, :] * cand[..., None]
        w = occupancy_at(g, xyz, 1.0, 0.01, 0.01)
        zm = 0.5 * (cand[..., 1:] + cand[..., :-1])
        z = sample_pdf(zm, w[..., 1:-1], steps, None)
        return jnp.sort(z, axis=-1)

    ms = timeit(jax.jit(occ_place), grid)
    print(f"occ placement (128 cand -> {steps}) {ms * n_chunks:8.1f} ms/frame"
          f" ({ms:.1f} x {n_chunks} chunks)", flush=True)

    # 3. exact density on the full frame's sample count
    pts = jax.random.uniform(jax.random.key(1), (chunk * 2 * steps, 3),
                             minval=-1.0, maxval=1.0)

    def dens(p, t):
        if t is None:
            return model.apply({"params": p}, pts, method="density")
        return model.apply({"params": p}, pts, False, t, method="density")

    for name, t in (("unpacked", None), ("pk23", packed)):
        ms = timeit(jax.jit(lambda p, tt=t: dens(p, tt)), params)
        print(f"density 2x{steps} samples {name:9s} {ms * n_chunks:8.1f} "
              f"ms/frame", flush=True)

    # 4. importance stage minus the density call
    z_vals = jnp.sort(jax.random.uniform(jax.random.key(2),
                                         (chunk, steps), minval=0.2,
                                         maxval=2.0), axis=-1)
    sigma = jax.random.uniform(jax.random.key(3), (chunk, steps)) * 10

    def importance(z, s):
        w = jax.lax.stop_gradient(composite_weights(z, s, 1.0))
        zm = 0.5 * (z[..., 1:] + z[..., :-1])
        nz = sample_pdf(zm, w[:, 1:-1], steps, None)
        z_all = jnp.concatenate([z, nz], -1)
        order = jnp.argsort(z_all, -1)
        return jnp.take_along_axis(z_all, order, -1)

    ms = timeit(jax.jit(importance), z_vals, sigma)
    print(f"importance resample+sort       {ms * n_chunks:8.1f} ms/frame",
          flush=True)

    # 5. color + semantics MLPs on all samples
    geo = jax.random.normal(jax.random.key(4), (chunk * 2 * steps, 15),
                            jnp.bfloat16)
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (chunk * 2 * steps, 1))

    def shade(p):
        rgb = model.apply({"params": p}, dirs, geo, method="color")
        sem = model.apply({"params": p}, geo, method="semantics")
        return rgb, sem

    ms = timeit(jax.jit(shade), params)
    print(f"color+semantics MLPs           {ms * n_chunks:8.1f} ms/frame",
          flush=True)

    # 6. compositing
    z2 = jnp.sort(jax.random.uniform(jax.random.key(5), (chunk, 2 * steps)),
                  -1)
    s2 = jax.random.uniform(jax.random.key(6), (chunk, 2 * steps)) * 10
    rgbs = jax.random.uniform(jax.random.key(7), (chunk, 2 * steps, 3))
    sems = jax.random.uniform(jax.random.key(8), (chunk, 2 * steps, 40))
    dn = jnp.ones((chunk,))

    def comp(z, s, r, se):
        w = composite_weights(z, s, 1.0)
        return composite(w, z, r, se, dn, 1e-4)

    ms = timeit(jax.jit(comp), z2, s2, rgbs, sems)
    print(f"compositing                    {ms * n_chunks:8.1f} ms/frame",
          flush=True)

    # 7. raw gather microbench at frame scale
    m = 100_000_000
    tbl_small = jax.random.normal(jax.random.key(9), (6_500_000, 2),
                                  jnp.bfloat16)
    tbl_wide = jax.random.normal(jax.random.key(10), (5_800_000, 16),
                                 jnp.bfloat16)
    for name, tbl, rows in (("4B rows", tbl_small, m),
                            ("32B rows", tbl_wide, m // 8)):
        idx = jax.random.randint(jax.random.key(11), (rows,), 0,
                                 tbl.shape[0], jnp.int32)
        ms = timeit(jax.jit(lambda t, i: jnp.sum(
            jnp.take(t, i, axis=0).astype(jnp.float32))), tbl, idx)
        print(f"raw gather {name}: {rows:,} rows  {ms:8.1f} ms "
              f"({ms * 1e6 / rows:.2f} ns/row)", flush=True)


if __name__ == "__main__":
    main()
