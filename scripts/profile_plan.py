#!/usr/bin/env python
"""Standalone on-chip timing of the planning pass pieces for config 1
(banded; DIA-routed) — loadBalanceCounting measured 197 ms, find out why."""

import sys
import time

import numpy as np


def timeit(fn, n=3):
    import jax
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp
    from bench import make_banded
    from speck_tpu import device_put_csr
    from speck_tpu.ops.analysis import analyze
    from speck_tpu.ops.stream import plan_device_stream, _plan_rows_impl
    from speck_tpu.ops.dense import tile_stats
    from speck_tpu.utils.config import SpgemmConfig

    a = make_banded()
    A = device_put_csr(a, np.float32)
    cfg = SpgemmConfig()
    m = A.shape[0]
    stats = analyze(A, A)
    jax.block_until_ready(stats.row_ops)

    t = timeit(lambda: analyze(A, A).row_ops)
    print(f"# analyze: {t*1e3:.1f} ms", flush=True)

    tr = cfg.dense_tile_rows
    max_tiles = max(0, cfg.fused_staging_budget // (tr * cfg.dense_cw))
    a32 = jax.lax.bitcast_convert_type(A.data, jnp.int32)

    def plan():
        return plan_device_stream(
            A.indptr, A.indices, a32, A.indptr, A.indices,
            stats.row_ops, stats.row_ops_f, stats.a_len,
            min_q=cfg.stream_min_q, direct_ok=True, use_dense=True,
            tile_rows=tr, kw_max=cfg.dense_kw, cw_max=cfg.dense_cw,
            la_max=cfg.dense_la, lb_max=cfg.dense_lb,
            max_tiles=max_tiles, m=m, use_accum=False,
            w0=cfg.stream_width, w_cap=cfg.stream_width_cap)

    t = timeit(plan)
    print(f"# plan_device_stream (device): {t*1e3:.1f} ms", flush=True)

    t = timeit(lambda: tile_stats(
        A.indptr, A.indices, A.indptr, A.indices, stats.row_ops,
        stats.a_len, tile_rows=tr, m=m))
    print(f"# tile_stats alone: {t*1e3:.1f} ms", flush=True)

    sm = stats.row_ops > 0
    dm = jnp.zeros((m,), bool)
    t = timeit(lambda: _plan_rows_impl(
        stats.row_ops, sm, dm, min_q=cfg.stream_min_q, m=m, tight=True,
        w0=cfg.stream_width, w_cap=cfg.stream_width_cap))
    print(f"# _plan_rows_impl(tight) alone: {t*1e3:.1f} ms", flush=True)

    # fetch cost of the pack
    out = plan()
    t0 = time.perf_counter()
    np.asarray(out[-1])
    print(f"# pack fetch: {(time.perf_counter()-t0)*1e3:.1f} ms",
          flush=True)

    # DIA stage timings
    from speck_tpu.ops.dia import (dia_slots, dia_planes, dia_conv,
                                   dia_count_stage, dia_numeric_stage)
    from speck_tpu.ops.dense import dense_gather_emit
    from speck_tpu.ops.spgemm import plan_spgemm

    sa = sb = 33
    sc = sa + sb - 1
    slot_a = dia_slots(A.indptr, A.indices, dmin=-16, span=sa, rows=m)
    jax.block_until_ready(slot_a)
    t = timeit(lambda: dia_slots(A.indptr, A.indices, dmin=-16, span=sa,
                                 rows=m))
    print(f"# dia_slots: {t*1e3:.1f} ms", flush=True)
    av, ah = dia_planes(slot_a, A.data, span=sa, rows=m)
    t = timeit(lambda: dia_planes(slot_a, A.data, span=sa, rows=m))
    print(f"# dia_planes: {t*1e3:.1f} ms", flush=True)
    cv, cc = dia_conv(av, ah, av, ah, sa=sa, sb=sb, m=m, k=m,
                      dmin_a=-16, with_hit=True)
    t = timeit(lambda: dia_conv(av, ah, av, ah, sa=sa, sb=sb, m=m, k=m,
                                dmin_a=-16, with_hit=True))
    print(f"# dia_conv: {t*1e3:.1f} ms", flush=True)
    t = timeit(lambda: dia_count_stage(cv, cc, sc=sc, m=m, n_cols=m,
                                       base_c=-32))
    print(f"# dia_count_stage: {t*1e3:.1f} ms", flush=True)

    plan2 = plan_spgemm(A, A)
    d = plan2.dia
    cols_s, vals_s = d.staged
    t = timeit(lambda: dense_gather_emit(
        cols_s, vals_s, plan2.row_offsets, tile_rows=1, cw=d.span_c,
        m=m, nnz=plan2.nnz))
    print(f"# dia dense_gather_emit: {t*1e3:.1f} ms (nnz={plan2.nnz})",
          flush=True)
    t = timeit(lambda: plan2.execute().data)
    print(f"# dia execute(): {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
