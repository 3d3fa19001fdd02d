#!/usr/bin/env python
"""Config-4 (rect A·P) stage microprobe: where do ~600 ms go for a
2.2M-product multiply? Times the planning dispatch, srec build, the one
counting chunk, and the numeric emit separately, fetch-forced."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def t(f, *a, iters=3, **kw):
    def fetch(x):
        leaves = jax.tree_util.tree_leaves(x)
        return float(jnp.ravel(leaves[0])[0])

    r = f(*a, **kw)
    fetch(r)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = f(*a, **kw)
        fetch(r)
        ts.append(time.perf_counter() - t0)
    return min(ts), r


def main():
    sys.path.insert(0, ".")
    from bench import make_banded, make_prolongation
    from speck_tpu import device_put_csr, spgemm
    from speck_tpu.ops.spgemm import plan_spgemm
    from speck_tpu.ops.stream import stream_chunk
    from speck_tpu.ops.esc import pack_csr_arrays
    from speck_tpu.utils.config import SpgemmConfig

    a = make_banded()
    p = make_prolongation(65536, 16384)
    A = device_put_csr(a, np.float32)
    B = device_put_csr(p, np.float32)
    cfg = SpgemmConfig()

    # end-to-end reference
    ms, _ = t(lambda: spgemm(A, B, cfg))
    print(f"spgemm complete: {ms*1e3:.1f} ms")

    plan = plan_spgemm(A, B, cfg)
    ss = plan.stream
    lo = ss.layout
    print(f"layout: W={lo.W} G={lo.G} n_chunks={lo.n_chunks} "
          f"total_q={lo.total_q} n_wide={lo.n_wide} "
          f"stream_rows={lo.n_stream_rows} direct={lo.n_direct_rows} "
          f"dense={plan.dense is not None} "
          f"diarows={plan.dia_rows is not None} fused={ss.fused} "
          f"pack_bits={ss.pack_bits}")

    m, n = plan.shape
    bp = pack_csr_arrays(B.indices, B.data.astype(jnp.float32))
    ms, _ = t(lambda: pack_csr_arrays(B.indices,
                                      B.data.astype(jnp.float32)))
    print(f"pack B: {ms*1e3:.1f} ms")

    def chunks():
        nnz_row = jnp.zeros((m,), jnp.int32)
        out = None
        for c in range(lo.n_chunks):
            Gc = lo.g_last if c == lo.n_chunks - 1 else lo.G
            nnz_row, out = stream_chunk(
                ss.rows_sorted, ss.e, ss.rowend, ss.q_sorted, ss.el,
                ss.ops_sorted, ss.p0, ss.su, ss.sa, ss.pend, bp,
                B.indices, B.data, A.data, ss.src, nnz_row,
                jnp.int32(c * lo.G * lo.W), ss.rid_bases[c],
                ss.sid_bases[c], G=Gc, W=lo.W, n_cols=n,
                pack_bits=ss.pack_bits, stage=True, f64=False,
                stage_raw=True, expand_impl=cfg.stream_expand_impl)
        return nnz_row, out

    ms, _ = t(chunks)
    print(f"counting chunks ({lo.n_chunks}x{lo.G}x{lo.W}): {ms*1e3:.1f} ms")

    from speck_tpu.ops.stream import build_srec
    a32 = jax.lax.bitcast_convert_type(A.data.astype(jnp.float32),
                                       jnp.int32)
    for comp, pg in ((True, False), (False, True)):
        ms, _ = t(lambda: build_srec(
            A.indptr, A.indices, a32, B.indptr[:-1],
            B.indptr[1:] - B.indptr[:-1], ss.rows_sorted, ss.e,
            ss.q_sorted, m=m, nl=ss.p0.shape[0], compact=comp,
            pack_gathers=pg))
        print(f"build_srec (nl={ss.p0.shape[0]}, compact={comp}, "
              f"pack={pg}): {ms*1e3:.1f} ms")

    C = plan.execute()
    ms, _ = t(lambda: plan.execute())
    print(f"execute (staged gather emit): {ms*1e3:.1f} ms; "
          f"nnz={plan.nnz}")


if __name__ == "__main__":
    main()
