#!/usr/bin/env python
"""Gather cost vs row width, table size, and index locality on real TPU.

The whole render/train cost model hangs on these numbers: XLA's TPU gather
is latency-bound per ROW, and the packed-table design (models/
packed_table.py) trades 8 narrow rows for 1 wide row. This measures where
the per-row cost actually bends — row widths 4..256 B, table sizes from
VMEM-resident to HBM-resident, random vs ray-coherent (sorted-ish) indices.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    def timeit(f, *a, reps=3):
        out = f(*a)
        _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(*a)
            _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1000

    gb = lambda t: t.size * t.dtype.itemsize / 1e9

    m = 50_000_000  # rows per gather (batched into one op)
    print("rows per op:", m, flush=True)
    print(f"{'table':>22s} {'width':>6s} {'ms':>9s} {'ns/row':>7s}",
          flush=True)
    for t_rows, tag in ((65_536, "1MB-class"), (1_048_576, "dozens-MB"),
                        (8_388_608, "HBM-class")):
        for f in (2, 4, 8, 16, 32, 64):
            tbl = jax.random.normal(jax.random.key(0), (t_rows, f),
                                    jnp.bfloat16)
            rows = m // max(1, f // 4)  # keep total bytes-ish comparable
            idx = jax.random.randint(jax.random.key(1), (rows,), 0, t_rows,
                                     jnp.int32)
            ms = timeit(jax.jit(lambda t, i: jnp.sum(
                jnp.take(t, i, axis=0).astype(jnp.float32))), tbl, idx)
            print(f"{tag:>14s}({gb(tbl) * 1000:6.0f}MB) {2 * f:4d}B "
                  f"{ms:9.1f} {ms * 1e6 / rows:7.2f}", flush=True)

    # locality: random vs sorted vs near-sorted (ray-coherent-ish) indices
    print("\nlocality (8.4M x 2 bf16 table, 4B rows, 50M rows):", flush=True)
    t_rows = 8_388_608
    tbl = jax.random.normal(jax.random.key(0), (t_rows, 2), jnp.bfloat16)
    idx_r = jax.random.randint(jax.random.key(1), (m,), 0, t_rows, jnp.int32)
    idx_s = jnp.sort(idx_r)
    # coherent: blocks of 64 consecutive-ish rows at random bases
    base = jax.random.randint(jax.random.key(2), (m // 64, 1), 0,
                              t_rows - 64, jnp.int32)
    idx_c = (base + jnp.arange(64, dtype=jnp.int32)[None, :]).reshape(-1)
    for name, idx in (("random", idx_r), ("sorted", idx_s),
                      ("64-blocked", idx_c)):
        ms = timeit(jax.jit(lambda t, i: jnp.sum(
            jnp.take(t, i, axis=0).astype(jnp.float32))), tbl, idx)
        print(f"  {name:12s} {ms:9.1f} ms  {ms * 1e6 / m:6.2f} ns/row",
              flush=True)


if __name__ == "__main__":
    main()
