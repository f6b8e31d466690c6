#!/usr/bin/env python
"""Scatter-free hash-table gradient prototype (PERFORMANCE.md roadmap #1).

The hash-grid backward is the train-step bottleneck: a [M]-row scatter-add
into the [T, F] table at ~85 ns/row (XLA TPU scatter processes rows
serially). This measures alternatives at occupancy scale
(M = 4096 rays x 64 samples x 16 levels = 4.2M rows, T = 4.6M entries):

  A. baseline         acc.at[idx].add(c)                      (current VJP)
  B. sorted scatter   same, indices_are_sorted=True           (sort amortized)
  C. sort + tile-local one-hot MXU matmul + dynamic-slice block RMW:
     sort contributions by index; each tile of `tile` rows spans a narrow
     index range (mean gap = T/M ~ 2 entries, so a 1024-row tile spans
     ~2k << R = 16384); build the [tile, R] one-hot INSIDE the tile, matmul
     against [tile, F] on the MXU -> dense [R, F] block, accumulate with
     dynamic_update_slice (contiguous block write, NOT a scatter). Rows
     whose span exceeds R clamp to the block edge (statistically never for
     hashed levels; counted + reported).
  D. variant of C with bf16 one-hot/contributions (f32 accumulation via
     preferred_element_type).

All variants are checked for exact (or near-exact, D) agreement with A.
Prints ms per variant; exits with a JSON line for the records.
"""

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def realistic_workload(key, n_points, spec):
    """Contribution indices/values as the stochastic-corner backward makes
    them: one corner per (point, level), points clustered like occupancy
    sampling (half the points concentrated near a wall plane)."""
    import jax
    import jax.numpy as jnp
    from ucsa_neural_rendering_tpu.models.hash_encoding import (
        packed_indices_weights)

    k1, k2, k3 = jax.random.split(key, 3)
    # 50% uniform + 50% concentrated in a thin slab (surface samples)
    u = jax.random.uniform(k1, (n_points, 3))
    slab = u.at[:, 2].set(0.31 + 0.02 * u[:, 2])
    pick = jax.random.bernoulli(k2, 0.5, (n_points,))
    x01 = jnp.where(pick[:, None], slab, u)
    idx, w = packed_indices_weights(x01, spec)     # [N, L, 8]
    corner = jax.random.randint(k3, idx.shape[:2], 0, 8)
    chosen = jnp.take_along_axis(idx, corner[..., None], axis=-1)[..., 0]
    g = jax.random.normal(k3, (n_points, spec.n_levels, spec.n_features),
                          jnp.float32)
    return chosen.reshape(-1), g.reshape(-1, spec.n_features)


def scatter_free_grad(idx, contrib, table_size, n_feat, tile=1024, r=16384,
                      compute_dtype="float32"):
    """Variant C/D: sort + tile-local one-hot MXU + block RMW."""
    import jax
    import jax.numpy as jnp

    m = idx.shape[0]
    pad = (-m) % tile
    if pad:
        idx = jnp.concatenate(
            [idx, jnp.full((pad,), table_size - 1, idx.dtype)])
        contrib = jnp.concatenate(
            [contrib, jnp.zeros((pad, n_feat), contrib.dtype)])
    ops = (idx,) + tuple(contrib[:, j] for j in range(n_feat))
    out = jax.lax.sort(ops, dimension=0, num_keys=1)
    si, sc = out[0], jnp.stack(out[1:], axis=-1)
    n_tiles = si.shape[0] // tile
    si_t = si.reshape(n_tiles, tile)
    sc_t = sc.reshape(n_tiles, tile, n_feat)
    base = jnp.minimum(si_t[:, 0], table_size - r)
    rel = si_t - base[:, None]
    overflow = jnp.sum(rel >= r)
    rel = jnp.minimum(rel, r - 1)

    dt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    iota = jnp.arange(r, dtype=jnp.int32)

    def body(acc, xs):
        relt, ct, bt = xs
        oh = (relt[:, None] == iota[None, :]).astype(dt)       # [tile, R]
        block = jax.lax.dot_general(
            oh, ct.astype(dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                 # [R, F]
        cur = jax.lax.dynamic_slice(acc, (bt, 0), (r, n_feat))
        return jax.lax.dynamic_update_slice(acc, cur + block, (bt, 0)), None

    acc = jnp.zeros((table_size, n_feat), jnp.float32)
    acc, _ = jax.lax.scan(body, acc, (rel, sc_t, base))
    return acc, overflow


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-points", type=int, default=262144)  # 4096 x 64
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--tile", type=int, default=1024)
    ap.add_argument("--range", type=int, default=16384)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from ucsa_neural_rendering_tpu.models.hash_encoding import make_spec, \
        ngp_per_level_scale

    spec = make_spec(per_level_scale=ngp_per_level_scale(4.0))
    t_size, f = spec.table_size, spec.n_features
    idx, contrib = jax.jit(partial(realistic_workload, n_points=args.n_points,
                                   spec=spec))(jax.random.key(0))
    idx, contrib = jax.device_get((idx, contrib))
    idx, contrib = jnp.asarray(idx), jnp.asarray(contrib)
    m = idx.shape[0]
    print(f"workload: M={m} rows into T={t_size} x {f} table", flush=True)

    def timeit(fn, *a):
        out = fn(*a)
        _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        times = []
        for _i in range(args.reps):
            t0 = time.perf_counter()
            out = fn(*a)
            _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
            times.append(time.perf_counter() - t0)
        return out, min(times) * 1000

    # A: baseline scatter
    base_fn = jax.jit(lambda i, c: jnp.zeros((t_size, f)).at[i].add(c))
    ref, ms_a = timeit(base_fn, idx, contrib)
    print(f"A baseline scatter           {ms_a:8.1f} ms "
          f"({ms_a * 1e6 / m:.0f} ns/row)", flush=True)

    # B: pre-sorted scatter
    def sorted_scatter(i, c):
        out = jax.lax.sort((i,) + tuple(c[:, j] for j in range(f)),
                           dimension=0, num_keys=1)
        si, sc = out[0], jnp.stack(out[1:], axis=-1)
        return jnp.zeros((t_size, f)).at[si].add(
            sc, indices_are_sorted=True)
    b_fn = jax.jit(sorted_scatter)
    out_b, ms_b = timeit(b_fn, idx, contrib)
    err_b = float(jnp.abs(out_b - ref).max())
    print(f"B sorted scatter             {ms_b:8.1f} ms   max|err|={err_b:.2e}",
          flush=True)

    # C: sort + one-hot MXU, f32
    c_fn = jax.jit(partial(scatter_free_grad, table_size=t_size, n_feat=f,
                           tile=args.tile, r=args.range,
                           compute_dtype="float32"))
    (out_c, ovf_c), ms_c = timeit(c_fn, idx, contrib)
    err_c = float(jnp.abs(out_c - ref).max())
    print(f"C onehot-MXU f32             {ms_c:8.1f} ms   "
          f"max|err|={err_c:.2e} overflow={int(ovf_c)}", flush=True)

    # D: bf16 inputs, f32 accumulation
    d_fn = jax.jit(partial(scatter_free_grad, table_size=t_size, n_feat=f,
                           tile=args.tile, r=args.range,
                           compute_dtype="bfloat16"))
    (out_d, ovf_d), ms_d = timeit(d_fn, idx, contrib)
    err_d = float(jnp.abs(out_d - ref).max())
    rel_d = err_d / (float(jnp.abs(ref).max()) + 1e-9)
    print(f"D onehot-MXU bf16            {ms_d:8.1f} ms   "
          f"max|err|={err_d:.2e} (rel {rel_d:.2e}) overflow={int(ovf_d)}",
          flush=True)

    print(json.dumps({
        "m_rows": int(m), "table": int(t_size),
        "ms": {"baseline": round(ms_a, 1), "sorted_scatter": round(ms_b, 1),
               "onehot_f32": round(ms_c, 1), "onehot_bf16": round(ms_d, 1)},
        "tile": args.tile, "range": args.range,
    }))


if __name__ == "__main__":
    main()
