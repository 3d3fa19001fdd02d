#!/usr/bin/env python
"""Config-1b (mixed banded+outliers) planning decomposition: the
round-4 profile pinned 240 ms in loadBalanceCounting — split it."""

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
    from bench import make_mixed
    from speck_tpu import device_put_csr, spgemm
    from speck_tpu.ops.analysis import host_analyze
    from speck_tpu.ops.spgemm import plan_spgemm
    from speck_tpu.ops.stream import plan_device_stream
    from speck_tpu.utils.config import SpgemmConfig
    import dataclasses

    a = make_mixed()
    A = device_put_csr(a, np.float32)
    cfg = SpgemmConfig()
    m, n = A.shape

    ms, _ = t(lambda: spgemm(A, A, cfg))
    print(f"complete: {ms*1e3:.1f} ms")

    t0 = time.perf_counter()
    hg = host_analyze(a, a)
    print(f"host_analyze: {(time.perf_counter()-t0)*1e3:.1f} ms")
    stats = hg.to_device()
    a32 = jax.lax.bitcast_convert_type(A.data.astype(jnp.float32),
                                       jnp.int32)

    for dia_rows, dense in ((True, True), (False, True), (False, False)):
        ms, out = t(lambda: plan_device_stream(
            A.indptr, A.indices, a32, A.indptr, A.indices,
            stats.row_ops, stats.row_ops_f, stats.a_len,
            min_q=cfg.stream_min_q, direct_ok=True, use_dense=dense,
            tile_rows=cfg.dense_tile_rows, kw_max=cfg.dense_kw,
            cw_max=cfg.dense_cw, la_max=cfg.dense_la,
            lb_max=cfg.dense_lb, max_tiles=1 << 20, m=m,
            w0=cfg.stream_width, w_cap=cfg.stream_width_cap,
            use_dia_rows=dia_rows, dia_span_cap=cfg.dia_span_cap,
            dia_waste_cap=cfg.dia_waste_cap,
            dia_mem_budget=cfg.dia_mem_budget, dia_itemsize=4))
        print(f"plan_device_stream dia_rows={dia_rows} dense={dense}: "
              f"{ms*1e3:.1f} ms")

    plan = plan_spgemm(A, A, cfg)
    print("routes: dia_rows=", plan.dia_rows is not None,
          "dense=", plan.dense is not None,
          "stream rows=", plan.stream.layout.n_stream_rows
          if plan.stream else 0,
          "n_chunks=", plan.stream.layout.n_chunks if plan.stream else 0,
          "G=", plan.stream.layout.G if plan.stream else 0,
          "total_q=", plan.stream.layout.total_q if plan.stream else 0)
    ms, _ = t(lambda: plan.execute())
    print(f"execute (staged): {ms*1e3:.1f} ms; nnz={plan.nnz}")


if __name__ == "__main__":
    main()
