#!/usr/bin/env python
"""On-chip A/B of stream knobs (sort impl, compact impl) for config 2,
plus standalone timings of the chunk sub-stages."""

import sys
import time

import numpy as np


def _fetch(out):
    """Force a real D2H fetch — block_until_ready lies through the
    tunnel; only a host copy proves the computation ran."""
    import jax
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "dtype")]
    np.asarray(leaves[-1].reshape(-1)[-1:])


def timeit(fn, *args, n=3, **kw):
    out = fn(*args, **kw)
    _fetch(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        _fetch(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp
    from bench import make_powerlaw
    from speck_tpu import device_put_csr, spgemm
    from speck_tpu.utils.config import SpgemmConfig

    a = make_powerlaw(131072)
    A = device_put_csr(a, np.float32)

    variants = [
        ("xla/sort", SpgemmConfig()),
        ("bitonic/sort", SpgemmConfig(stream_sort_impl="bitonic")),
        ("bitonic_pallas/sort",
         SpgemmConfig(stream_sort_impl="bitonic_pallas")),
    ]
    for name, cfg in variants:
        try:
            def run():
                C = spgemm(A, A, cfg)
                float(C.data[-1])
                return C
            run()
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                run()
                ts.append(time.perf_counter() - t0)
            print(f"# config2 {name}: {min(ts)*1e3:.0f} ms", flush=True)
        except Exception as e:
            print(f"# config2 {name}: FAILED {type(e).__name__}: {e}",
                  flush=True)

    # ---- sub-stage timings on the actual plan ----
    from speck_tpu.ops.spgemm import plan_spgemm
    from speck_tpu.ops import stream as st
    from speck_tpu.ops.esc import pack_csr_arrays

    plan = plan_spgemm(A, A)
    ss = plan.stream
    lo = ss.layout
    G, W = lo.G, lo.W
    print(f"# layout: W={W} G={G} n_chunks={lo.n_chunks} "
          f"total_q={lo.total_q} n_wide={lo.n_wide} r_wide={lo.r_wide} "
          f"fused={ss.fused} pack_bits={ss.pack_bits}", flush=True)

    b_packed = pack_csr_arrays(A.indices, A.data.astype(jnp.float32))
    n = A.shape[1]
    c = min(1, lo.n_chunks - 1)  # a contained chunk if possible

    expand_j = jax.jit(st._expand_chunk, static_argnames=(
        "G", "W", "n_cols", "f64"))
    t_ex, _ = timeit(
        expand_j, ss.e, ss.rowend, ss.p0, ss.su, ss.sa, ss.pend, b_packed,
        A.indices,
        A.data, A.data, ss.src, jnp.int32(c * G * W), ss.rid_bases[c],
        ss.sid_bases[c], G=G, W=W, n_cols=n, f64=False)
    print(f"# expand only: {t_ex*1e3:.1f} ms", flush=True)

    def exp_sort(*args, **kw):
        rid, col, val, _ = st._expand_chunk(*args, **kw)
        return st._sort_rect(rid, col, val, n, ss.pack_bits)

    es_j = jax.jit(exp_sort, static_argnames=("G", "W", "n_cols", "f64"))
    t_es, _ = timeit(
        es_j, ss.e, ss.rowend, ss.p0, ss.su, ss.sa, ss.pend, b_packed,
        A.indices,
        A.data, A.data, ss.src, jnp.int32(c * G * W), ss.rid_bases[c],
        ss.sid_bases[c], G=G, W=W, n_cols=n, f64=False)
    print(f"# expand+sort: {t_es*1e3:.1f} ms", flush=True)

    def full_chunk(nnz_row):
        return st.stream_chunk(
            ss.rows_sorted, ss.e, ss.rowend, ss.q_sorted, ss.el,
            ss.ops_sorted, ss.p0, ss.su, ss.sa, ss.pend, b_packed, A.indices,
            A.data,
            A.data, ss.src, nnz_row, jnp.int32(c * G * W),
            ss.rid_bases[c], ss.sid_bases[c], G=G, W=W, n_cols=n,
            pack_bits=ss.pack_bits, stage=True, f64=False,
            stage_raw=True)

    m = A.shape[0]
    t_fc, _ = timeit(lambda: full_chunk(jnp.zeros((m,), jnp.int32)))
    print(f"# full chunk (stage_raw): {t_fc*1e3:.1f} ms", flush=True)

    # emission standalone
    if ss.staged_flat is None:
        ss.staged_flat = (
            jnp.concatenate([s[1].reshape(-1) for s in ss.staged]),
            jnp.concatenate([s[2].reshape(-1) for s in ss.staged]))
    cols_flat, vals_flat = ss.staged_flat
    t_em, _ = timeit(
        st.stream_gather_emit, ss.rows_sorted, ss.e, plan.row_offsets,
        cols_flat, vals_flat, W=W, nnz=plan.nnz)
    print(f"# gather emit: {t_em*1e3:.1f} ms  (nnz={plan.nnz})",
          flush=True)

    # numeric phase total (execute on fused plan)
    t_nx, _ = timeit(lambda: plan.execute().data)
    print(f"# execute() fused: {t_nx*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
