#!/usr/bin/env python
"""DMA-pipelined Pallas gather prototype vs XLA's gather (VERDICT r2 #2).

The round-2 Mosaic findings (PERFORMANCE.md roadmap #1) ruled out a
VMEM-resident vectorized gather ("Multiple source vregs along gather
dimension"). This prototypes the formulation that memo did NOT try: keep the
table in HBM and stream ROWS to VMEM with double-buffered `make_async_copy`
DMAs at dynamic row offsets (dynamic-slice DMA descriptors are legal where
vector gathers are not), overlapping DMA issue/wait with the output writes —
the structure of a software TPU embedding lookup.

Variants:
  * xla     — jnp.take baseline (the measured 5.6-7 ns/row cost model)
  * dma     — per-row DMA ring, depth D outstanding copies, scratch slots in
              VMEM, sequential dynamic-sublane writes to the output block
  * dma_direct — per-row DMA straight into the output block row (no scratch
              bounce), one semaphore ring for completion

Run on the TPU (PYTHONPATH=. python scripts/bench_dma_gather.py). Prints
ns/row per variant across row widths / index counts, and appends nothing —
copy results into PERFORMANCE.md.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sync(x):
    # axon backend: block_until_ready is unreliable; force a readback
    return float(jnp.sum(x[..., 0][:512]))


_DISPATCH_FLOOR = None


def dispatch_floor():
    """Measured per-call wall overhead of a trivial jit through the axon
    tunnel (~35 ms on this host) — subtracted so ns/row reflects device
    time, matching the methodology of scripts/bench_gather_curve.py."""
    global _DISPATCH_FLOOR
    if _DISPATCH_FLOOR is None:
        f = jax.jit(lambda x: x + 1.0)
        x = jnp.zeros((8, 128))
        _ = float(jnp.sum(f(x)))
        t0 = time.perf_counter()
        for _ in range(10):
            _ = float(jnp.sum(f(x)))
        _DISPATCH_FLOOR = (time.perf_counter() - t0) / 10
    return _DISPATCH_FLOOR


def time_op(fn, *args, iters=5):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _sync(out)
    return max((time.perf_counter() - t0) / iters - dispatch_floor(), 1e-9)


# ----------------------------------------------------------------- variants

@functools.partial(jax.jit, static_argnums=())
def xla_gather(table, idx):
    return jnp.take(table, idx, axis=0)


def make_dma_gather(T, F, M, dtype, groups_in_flight=2, blk=512):
    """Per-row DMA gather: out[i] = table[idx[i]].

    Grid over M//blk blocks; idx is scalar-prefetched to SMEM so row
    addresses are known ahead of issue. Mosaic rejects BOTH single-row
    vector stores at unaligned dynamic offsets AND single-row DMA
    destinations inside a tiled dim ("slice must be aligned to tiling"), so
    each row DMA lands in its own (1, F) slot page and GROUP rows at a time
    assemble via concat into one aligned vector store. groups_in_flight
    GROUP-row waves of row DMAs stay outstanding.
    """
    # Single-row DMAs are illegal at every layout Mosaic accepts (row dim
    # tiled: "slice must be aligned to tiling (8)"; (T,1,F) bf16: packed
    # sublane pairs, "tiling (2)"). The legal unit is the full sublane TILE,
    # so each fetch moves the aligned TILE-row window containing the index
    # (64 B for 4 B rows — one HBM burst either way) and the row is selected
    # in-VMEM with a one-hot multiply-reduce over the tile (vectorized, no
    # Mosaic gather needed).
    TILE = 16 if jnp.dtype(dtype).itemsize < 4 else 8
    GROUP = TILE  # rows assembled per aligned output store
    depth = groups_in_flight * GROUP
    assert blk % GROUP == 0

    def kernel(idx_ref, table_ref, out_ref, scratch, sems):
        base = pl.program_id(0) * blk
        n_groups = blk // GROUP

        def tile_dma(i, slot):
            start = pl.multiple_of(
                (idx_ref[base + i] // TILE) * TILE, TILE)
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(start, TILE), :],
                scratch.at[slot], sems.at[slot])

        for i in range(depth):  # warm-up: fill the in-flight waves
            tile_dma(i, i).start()

        def body(g, _):
            goff = g * GROUP
            slot0 = jax.lax.rem(g, groups_in_flight) * GROUP
            for r in range(GROUP):
                tile_dma(goff + r, slot0 + r).wait()
            # select each row via a masked reduce over its fetched tile: the
            # comparand stays a plain traced SCALAR (scalar-vector compare),
            # sidestepping both the dynamic-sublane alignment rule and the
            # unimplemented 2-dim vector broadcast
            iota_t = jax.lax.broadcasted_iota(jnp.int32, (TILE, F), 0)
            rows = []
            for r in range(GROUP):
                sub = idx_ref[base + goff + r] % TILE
                tile = scratch[slot0 + r]  # (TILE, F)
                rows.append(jnp.sum(
                    jnp.where(iota_t == sub, tile, jnp.zeros_like(tile)),
                    axis=0, keepdims=True))
            out_ref[pl.ds(pl.multiple_of(goff, GROUP), GROUP), :] = (
                jnp.concatenate(rows, axis=0))

            @pl.when(g + groups_in_flight < n_groups)
            def _():
                for r in range(GROUP):
                    tile_dma((g + groups_in_flight) * GROUP + r,
                             slot0 + r).start()
            return 0

        jax.lax.fori_loop(0, n_groups, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M // blk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],  # table in HBM
        out_specs=pl.BlockSpec((blk, F), lambda b, idx: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((depth, TILE, F), dtype),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
    )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, F), dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    return jax.jit(lambda idx, table: call(idx, table))


def main():
    assert jax.devices()[0].platform == "tpu", "run on the TPU chip"
    rng = np.random.default_rng(0)
    M = int(os.environ.get("DMA_M", 8_388_608))
    T = int(os.environ.get("DMA_T", 1 << 19))

    print(f"M={M} rows, table {T} entries")
    for F, dtype in ((2, jnp.bfloat16), (8, jnp.bfloat16),
                     (16, jnp.float32), (128, jnp.bfloat16)):
        row_b = F * jnp.dtype(dtype).itemsize
        table = jnp.asarray(rng.normal(size=(T, F)), dtype)
        idx_np = np.sort(rng.integers(0, T, size=M).astype(np.int32))
        idx = jnp.asarray(idx_np)

        t_xla = time_op(xla_gather, table, idx)
        line = [f"row {row_b:4d}B: xla {t_xla / M * 1e9:6.2f} ns/row"]
        for name, gif in (("dma_w2", 2), ("dma_w4", 4), ("dma_w8", 8)):
            try:
                fn = make_dma_gather(T, F, M, dtype, groups_in_flight=gif,
                                     blk=int(os.environ.get("DMA_BLK", 512)))
                t = time_op(fn, idx, table)
                out = fn(idx, table)
                ok = np.array_equal(
                    np.asarray(out[:4096], np.float32),
                    np.asarray(table[idx[:4096]], np.float32))
                line.append(f"{name} {t / M * 1e9:6.2f}{'' if ok else '!WRONG'}")
            except Exception as e:
                line.append(f"{name} FAIL({type(e).__name__}: "
                            f"{str(e).splitlines()[0][:60]})")
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
