#!/usr/bin/env python
"""Second-round gather microbench (round 3). Round-1 findings
(scripts/expand_microbench.py on v5e-behind-tunnel):

  - 8B-record random gather: 73 M rec/s (13.8 ns/rec, 0.58 GB/s)
  - sorted == runs == random (locality does NOT help)
  - 16/32/64B records: 39/63/110 ns/rec -- cost ~ 1.5-3 ns/BYTE, i.e.
    the gather is a ~0.5 GB/s byte-pump, NOT per-index bound.

So the lever is gathered BYTES and/or escaping the gather lowering
entirely. This script measures:

  a. 4B single-plane gather (if ~8 ns/rec, two 4B gathers lose to one
     8B gather only mildly; informs count-only phases)
  b. slice-gather: lax.gather with slice_sizes=(L,) -- do contiguous
     slices move at DMA speed or at the same byte-pump rate?
  c. table-size sweep (64KB vs 16MB table; same N) -- cache effects?
  d. output-shape effects: (G, W) tiled vs flat (N,)
  e. Pallas sublane dynamic-gather probe: jnp.take_along_axis(table,
     idx, axis=0) with table (S, 128) VMEM-resident, per-lane sublane
     indices -- the candidate primitive for a lane-partitioned fast
     gather
  f. Pallas per-run DMA copy probe (fixed round-1 SMEM blockspec bug)
"""

import sys
import time

import numpy as np


def fetch(x):
    import jax.numpy as jnp

    return float(jnp.sum(x.astype(jnp.float32).ravel()[:512][::7]))


def timeit(name, fn, iters=3):
    try:
        fn()
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{name}: best {best*1e3:.2f} ms", flush=True)
    return best


def main():
    import jax
    import jax.numpy as jnp

    N = 1 << 22                  # 4.19M outputs (one bench chunk)
    NB = 1 << 21                 # 2M-entry table
    rs = np.random.RandomState(0)
    idx = jnp.asarray(rs.randint(0, NB - 256, N).astype(np.int32))
    tab1 = jnp.asarray(rs.standard_normal(NB).astype(np.float32))
    tab2 = jnp.asarray(rs.randint(0, 1 << 30, (NB, 2)).astype(np.int32))
    fetch(tab1[:8])

    # ---- a. 4B vs 8B ----
    @jax.jit
    def g4(idx):
        return tab1[idx]

    @jax.jit
    def g8(idx):
        return tab2[idx]

    t = timeit("a_4B_random", lambda: fetch(g4(idx)))
    if t:
        print(f"  -> {N/t/1e6:.0f} M/s, {N*4/t/2**30:.2f} GiB/s", flush=True)
    t = timeit("a_8B_random(ref)", lambda: fetch(g8(idx)))
    if t:
        print(f"  -> {N/t/1e6:.0f} M/s, {N*8/t/2**30:.2f} GiB/s", flush=True)

    # ---- b. slice gathers: same total elements, N/L slices of L ----
    for L in (16, 128, 512):
        nidx = N // L
        sidx = jnp.asarray(
            rs.randint(0, NB - L - 1, (nidx, 1)).astype(np.int32))

        def gsl(sidx=sidx, L=L):
            return jax.lax.gather(
                tab1, sidx,
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1,), collapsed_slice_dims=(),
                    start_index_map=(0,)),
                slice_sizes=(L,))

        gslj = jax.jit(gsl)
        t = timeit(f"b_slice{L}_x{nidx}", lambda: fetch(gslj()))
        if t:
            print(f"  -> {N/t/1e6:.0f} M elem/s, {N*4/t/2**30:.2f} GiB/s,"
                  f" {t/nidx*1e9:.0f} ns/slice", flush=True)

    # ---- c. table-size sweep ----
    for tb in (1 << 14, 1 << 18):
        tabs = tab1[:tb]
        idxs = jnp.asarray(rs.randint(0, tb, N).astype(np.int32))

        @jax.jit
        def gs(idxs, tabs=tabs):
            return tabs[idxs]

        t = timeit(f"c_4B_table{tb*4//1024}KB", lambda: fetch(gs(idxs)))
        if t:
            print(f"  -> {N/t/1e6:.0f} M/s", flush=True)

    # ---- d. output shape (G, W) vs flat ----
    idx2 = idx.reshape(512, -1)

    @jax.jit
    def g2d(idx2):
        return tab1[idx2]

    t = timeit("d_4B_out2D_512xW", lambda: fetch(g2d(idx2)))
    if t:
        print(f"  -> {N/t/1e6:.0f} M/s", flush=True)

    # ---- e. Pallas sublane dynamic-gather probe ----
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        S = 2048                       # table sublanes (1MB f32 x 128 lanes)
        tabv = jnp.asarray(
            rs.standard_normal((S, 128)).astype(np.float32))
        gidx = jnp.asarray(
            rs.randint(0, S, (N // 128, 128)).astype(np.int32))
        BLK = 512                      # index rows per grid step

        def kernel(idx_ref, tab_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

        @jax.jit
        def run(gidx):
            return pl.pallas_call(
                kernel,
                grid=(gidx.shape[0] // BLK,),
                in_specs=[
                    pl.BlockSpec((BLK, 128), lambda g: (g, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((S, 128), lambda g: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BLK, 128), lambda g: (g, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N // 128, 128),
                                               jnp.float32),
            )(gidx, tabv)

        t = timeit("e_pallas_sublane_gather", lambda: fetch(run(gidx)))
        if t:
            print(f"  -> {N/t/1e6:.0f} M elem/s (table {S}x128 VMEM)",
                  flush=True)
        # XLA take_along_axis on the same shapes for reference
        @jax.jit
        def runx(gidx):
            return jnp.take_along_axis(tabv, gidx, axis=0)

        t = timeit("e_xla_take_along_axis", lambda: fetch(runx(gidx)))
        if t:
            print(f"  -> {N/t/1e6:.0f} M elem/s", flush=True)
    except Exception as e:
        print(f"e_pallas probe setup failed: {type(e).__name__}: {e}",
              flush=True)

    # ---- f. Pallas per-run DMA copy (fixed blockspec) ----
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        G, K, L = 512, 64, 128         # G*K*L = 4M elems
        offs = jnp.asarray(
            rs.randint(0, NB - L, (G, K)).astype(np.int32))

        def kernel2(offs_ref, src_ref, out_ref):
            g = pl.program_id(0)

            def body(k, _):
                o = offs_ref[g, k]
                out_ref[pl.ds(k * L, L)] = src_ref[pl.ds(o, L)]
                return 0

            jax.lax.fori_loop(0, K, body, 0)

        @jax.jit
        def runf(offs):
            return pl.pallas_call(
                kernel2,
                grid=(G,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((K * L,), lambda g: (g,)),
                out_shape=jax.ShapeDtypeStruct((G * K * L,), jnp.float32),
            )(offs, tab1)

        t = timeit("f_pallas_runcopy128", lambda: fetch(runf(offs)))
        if t:
            print(f"  -> {G*K*L/t/1e6:.0f} M elem/s,"
                  f" {t/(G*K)*1e9:.0f} ns/run", flush=True)
    except Exception as e:
        print(f"f_pallas probe failed: {type(e).__name__}: {e}",
              flush=True)


if __name__ == "__main__":
    main()
