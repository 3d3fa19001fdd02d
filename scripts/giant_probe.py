#!/usr/bin/env python
"""Per-sub-stage probe of one giant-row W=65536 chunk (round-4 VERDICT
item 1): expand / sort (xla vs blocked) / contract / compact, plus the
wide-finish, on the actual giant bench plan."""

import sys
import time

import numpy as np


def _fetch(out):
    import jax
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "dtype")]
    np.asarray(leaves[-1].reshape(-1)[-1:])


def timeit(fn, *args, n=2, **kw):
    out = fn(*args, **kw)
    _fetch(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        _fetch(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def giant_host():
    import scipy.sparse as sp
    from speck_tpu.formats.csr import HostCSR

    mg = 40000
    rsg = np.random.RandomState(17)
    NH, HN = 5000, 10000
    hrow = np.repeat(np.arange(10000, 10000 + NH), HN)
    hcol = ((np.tile(np.arange(HN), NH)
             + np.repeat(np.arange(NH) * 37, HN)) % 10000) + 25000
    lr = np.repeat(np.arange(1, 5000), 16)
    lc = rsg.randint(1, 5000, lr.shape[0])
    gm = sp.csr_matrix(
        (rsg.standard_normal(NH + hrow.shape[0] + lr.shape[0]),
         (np.concatenate([np.zeros(NH, int), hrow, lr]),
          np.concatenate([np.arange(10000, 10000 + NH), hcol, lc]))),
        shape=(mg, mg))
    gm.sum_duplicates()
    return HostCSR.from_scipy(gm)


def main():
    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp
    from speck_tpu import device_put_csr
    from speck_tpu.ops.spgemm import plan_spgemm
    from speck_tpu.ops import stream as st
    from speck_tpu.ops.esc import pack_csr_arrays
    from speck_tpu.utils.config import SpgemmConfig

    int(jnp.sum(jnp.arange(8)))
    gh = giant_host()
    A = device_put_csr(gh, np.float32)
    n = A.shape[1]
    m = A.shape[0]

    # plan WITHOUT counting dispatches: replicate the planning half only
    cfg = SpgemmConfig()
    t0 = time.perf_counter()
    plan = plan_spgemm(A, A, cfg)
    print(f"# full plan_spgemm: {time.perf_counter()-t0:.1f} s "
          f"nnz={plan.nnz}", flush=True)
    ss = plan.stream
    lo = ss.layout
    G, W = lo.G, lo.W
    print(f"# layout: W={W} G={G} n_chunks={lo.n_chunks} "
          f"total_q={lo.total_q} n_wide={lo.n_wide} r_wide={lo.r_wide} "
          f"fused={ss.fused} pack_bits={ss.pack_bits} "
          f"finish={ss.finish}", flush=True)

    b_packed = pack_csr_arrays(A.indices, A.data.astype(jnp.float32))
    c = 0  # first chunk: all wide-row segments

    expand_j = jax.jit(st._expand_chunk, static_argnames=(
        "G", "W", "n_cols", "f64"))
    t_ex, _ = timeit(
        expand_j, ss.e, ss.rowend, ss.p0, ss.su, ss.sa, ss.pend, b_packed,
        A.indices, A.data, A.data, ss.src, jnp.int32(c * G * W),
        ss.rid_bases[c], ss.sid_bases[c], G=G, W=W, n_cols=n, f64=False)
    print(f"# expand only: {t_ex*1e3:.1f} ms", flush=True)

    for impl in ("xla", "blocked", "auto"):
        def exp_sort(*args, **kw):
            rid, col, val, _ = st._expand_chunk(*args, **kw)
            return st._sort_rect(rid, col, val, n, ss.pack_bits,
                                 sort_impl=impl)

        es_j = jax.jit(exp_sort,
                       static_argnames=("G", "W", "n_cols", "f64"))
        t_es, _ = timeit(
            es_j, ss.e, ss.rowend, ss.p0, ss.su, ss.sa, ss.pend, b_packed,
            A.indices, A.data, A.data, ss.src, jnp.int32(c * G * W),
            ss.rid_bases[c], ss.sid_bases[c], G=G, W=W, n_cols=n,
            f64=False)
        print(f"# expand+sort[{impl}]: {t_es*1e3:.1f} ms", flush=True)

    def full_chunk(impl):
        return st.stream_chunk(
            ss.rows_sorted, ss.e, ss.rowend, ss.q_sorted, ss.el,
            ss.ops_sorted, ss.p0, ss.su, ss.sa, ss.pend, b_packed,
            A.indices, A.data, A.data, ss.src,
            jnp.zeros((m,), jnp.int32), jnp.int32(c * G * W),
            ss.rid_bases[c], ss.sid_bases[c], G=G, W=W, n_cols=n,
            pack_bits=ss.pack_bits, stage=True, f64=False,
            sort_impl=impl)

    for impl in ("xla", "auto"):
        t_fc, _ = timeit(lambda: full_chunk(impl))
        print(f"# full chunk (stage, compact)[{impl}]: {t_fc*1e3:.1f} ms",
              flush=True)

    # wide finish standalone (replays the recorded finish classes)
    print(f"# n lplans={len(ss.lplans)}, "
          f"finish classes={[(f['R2'], f['W2']) for f in (ss.finish or {}).get('classes') or []]}",
          flush=True)


if __name__ == "__main__":
    main()
