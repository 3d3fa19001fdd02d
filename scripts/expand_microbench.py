#!/usr/bin/env python
"""Micro-benchmark of expand-stage data-movement alternatives on the
real chip. The stream expand (ops/stream.py:_expand_chunk) pays TWO
random 8-byte-record gathers per product — measured 100-260M elem/s on
v5e-behind-tunnel, ~1000x off HBM speed-of-light — and dominates the
power-law configs. Before investing in a Pallas expand kernel, measure
what actually limits gathers here:

  a. baseline: per-slot 8-byte packed-record gather (the current form)
  b. record-width scaling: 16/32/64-byte records, one gather per 2/4/8
     slots (does throughput scale with record width => per-row overhead
     dominates, or stay flat => HBM transactions dominate?)
  c. sorted vs random indices (does locality help the TPU gather at all?)
  d. run-structured indices (piecewise-consecutive like real expand)
  e. pallas run-copy: dynamic-slice copies of contiguous 128-lane blocks
     (the candidate kernel's inner primitive), vs the same work as XLA
     dynamic slices in a fori_loop.

Usage: python scripts/expand_microbench.py [n_slots_log2=22]
Writes one line per measurement; run under `python -u ... > log 2>&1`.
"""

import sys
import time

import numpy as np


def fetch(x):
    """Force a real D2H fetch (block_until_ready lies through the tunnel)."""
    import jax.numpy as jnp

    return float(jnp.sum(x.astype(jnp.float32).ravel()[:1024][::7]))


def timeit(name, fn, iters=3):
    fn()  # compile + warm
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{name}: best {best*1e3:.2f} ms over {iters}", flush=True)
    return best


def main():
    import jax
    import jax.numpy as jnp

    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    N = 1 << log2n          # gather slots
    NB = 1 << 21            # source table entries (16 MB of 8B records)
    print(f"slots N={N}, table NB={NB}, device={jax.devices()[0]}",
          flush=True)

    rs = np.random.RandomState(0)
    idx_rand = rs.randint(0, NB - 64, N).astype(np.int32)
    idx_sorted = np.sort(idx_rand)
    # run-structured: consecutive runs of ~10 from random starts
    starts = rs.randint(0, NB - 64, N // 10 + 1).astype(np.int32)
    run = np.repeat(starts, 10)[:N] + np.tile(np.arange(10, dtype=np.int32),
                                              N // 10 + 1)[:N]

    tab2 = jnp.asarray(rs.randint(0, 1 << 30, (NB, 2)).astype(np.int32))
    d_rand = jnp.asarray(idx_rand)
    d_sorted = jnp.asarray(idx_sorted)
    d_run = jnp.asarray(run)

    @jax.jit
    def g8(idx):
        return tab2[idx]                     # (N, 2) i32 = 8B/record

    # one warmup fetch to open the tunnel
    fetch(tab2[:8, :])

    for name, idx in (("a_8B_random", d_rand), ("c_8B_sorted", d_sorted),
                      ("d_8B_runs", d_run)):
        t = timeit(name, lambda idx=idx: fetch(g8(idx)))
        print(f"  -> {N / t / 1e6:.0f} M records/s,"
              f" {N * 8 / t / 2**30:.2f} GiB/s useful", flush=True)

    # b. record-width scaling: same total bytes, fewer gather rows
    for w in (4, 8, 16):                    # i32 lanes per record
        tabw = jnp.asarray(
            rs.randint(0, 1 << 30, (NB // w * 2, w)).astype(np.int32))
        idxw = jnp.asarray(
            rs.randint(0, NB // w * 2 - 1, N // w).astype(np.int32))

        @jax.jit
        def gw(idx, tabw=tabw):
            return tabw[idx]

        t = timeit(f"b_{w*4}B_random_samebytes", lambda: fetch(gw(idxw)))
        print(f"  -> {N // w / t / 1e6:.0f} M records/s,"
              f" {N * 4 / t / 2**30:.2f} GiB/s useful", flush=True)

    # e. pallas run-copy probe: G rows, each copying K contiguous
    # 128-lane blocks from dynamic offsets (the expand kernel's inner
    # primitive), vs the identical access pattern as one XLA gather.
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        G, K, L = 512, 64, 128               # G*K*L = 4M lanes read
        src = jnp.asarray(rs.standard_normal((NB,)).astype(np.float32))
        offs = rs.randint(0, NB - L, (G, K)).astype(np.int32)
        d_offs = jnp.asarray(offs)

        def kernel(offs_ref, src_ref, out_ref):
            def body(k, _):
                o = offs_ref[0, k]
                out_ref[pl.ds(k * L, L)] = src_ref[pl.ds(o, L)]
                return 0
            jax.lax.fori_loop(0, K, body, 0)

        interp = jax.devices()[0].platform == "cpu"

        @jax.jit
        def run_pallas(d_offs):
            return pl.pallas_call(
                kernel,
                interpret=interp,
                grid=(G,),
                in_specs=[
                    pl.BlockSpec((1, K), lambda g: (g, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_specs=pl.BlockSpec((K * L,), lambda g: (g,)),
                out_shape=jax.ShapeDtypeStruct((G * K * L,), jnp.float32),
            )(d_offs, src)

        t = timeit("e_pallas_runcopy_128", lambda: fetch(run_pallas(d_offs)))
        print(f"  -> {G*K*L/t/1e6:.0f} M lanes/s,"
              f" {G*K*L*4/t/2**30:.2f} GiB/s", flush=True)

        # identical pattern via XLA gather-of-blocks
        blk = jnp.arange(L, dtype=jnp.int32)

        @jax.jit
        def run_xla(d_offs):
            ix = (d_offs.reshape(-1, 1) + blk.reshape(1, -1)).reshape(-1)
            return src[ix]

        t = timeit("e_xla_same_pattern", lambda: fetch(run_xla(d_offs)))
        print(f"  -> {G*K*L/t/1e6:.0f} M lanes/s,"
              f" {G*K*L*4/t/2**30:.2f} GiB/s", flush=True)
    except Exception as e:  # pragma: no cover - probe only
        print(f"pallas probe failed: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
