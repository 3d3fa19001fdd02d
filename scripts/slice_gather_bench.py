#!/usr/bin/env python
"""Is a slice-gather (N run starts x RW contiguous elements) cheaper than
an element gather of the same volume? Round-5 probe for the vector-run
expand lead (PARITY r4 #1): if gather cost is per START index (as the
14 ns/index model suggests), reading B segments as padded runs cuts the
expand's random-read count ~avg_run_len times.

Measures, on the live backend:
  A. element gather: out[i] = tab[idx[i]],  M random indices
  B. slice gather:   out[n, j] = tab[st[n] + j],  N=M/RW starts, RW wide
  C. packed-record element gather ((nnz, 2) table) — the current expand
  D. packed slice gather ((N, RW, 2))
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(f, *args, iters=5):
    # block_until_ready LIES through the axon tunnel (BASELINE.md);
    # only a real D2H fetch is a true sync point
    def fetch(x):
        return float(jnp.ravel(x)[0])

    r = f(*args)
    fetch(r)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = f(*args)
        fetch(r)
        ts.append(time.perf_counter() - t0)
    return min(ts), r


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 22   # products
    RW = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    NN = 1 << 21                                             # table nnz
    rs = np.random.RandomState(0)
    tab = jnp.asarray(rs.randint(0, 1 << 30, NN, dtype=np.int32))
    tab2 = jnp.asarray(
        rs.randint(0, 1 << 30, (NN, 2), dtype=np.int32))
    idx = jnp.asarray(rs.randint(0, NN, M, dtype=np.int32))
    N = M // RW
    st = jnp.asarray(rs.randint(0, NN - RW, N, dtype=np.int32))

    t, _ = timeit(jax.jit(lambda t_, i_: t_[i_]), tab, idx)
    print(f"A element gather      M={M}: {t*1e3:8.2f} ms "
          f"({t/M*1e9:.2f} ns/elem)")

    def slice_g(t_, s_):
        return jax.vmap(
            lambda s: jax.lax.dynamic_slice(t_, (s,), (RW,)))(s_)

    t, _ = timeit(jax.jit(slice_g), tab, st)
    print(f"B slice gather  N={N} x RW={RW}: {t*1e3:8.2f} ms "
          f"({t/M*1e9:.2f} ns/elem, {t/N*1e9:.2f} ns/start)")

    t, _ = timeit(jax.jit(lambda t_, i_: t_[i_]), tab2, idx)
    print(f"C packed element gather: {t*1e3:8.2f} ms "
          f"({t/M*1e9:.2f} ns/rec)")

    def slice_g2(t_, s_):
        return jax.vmap(
            lambda s: jax.lax.dynamic_slice(t_, (s, 0), (RW, 2)))(s_)

    t, _ = timeit(jax.jit(slice_g2), tab2, st)
    print(f"D packed slice gather: {t*1e3:8.2f} ms "
          f"({t/M*1e9:.2f} ns/rec, {t/N*1e9:.2f} ns/start)")

    # E: gather expressed as lax.gather with slice_sizes=(RW,) directly
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(),
        start_index_map=(0,))
    def lg(t_, s_):
        return jax.lax.gather(
            t_, s_[:, None], dn, slice_sizes=(RW,),
            mode=jax.lax.GatherScatterMode.CLIP)
    t, _ = timeit(jax.jit(lg), tab, st)
    print(f"E lax.gather slices : {t*1e3:8.2f} ms "
          f"({t/M*1e9:.2f} ns/elem, {t/N*1e9:.2f} ns/start)")


if __name__ == "__main__":
    main()
