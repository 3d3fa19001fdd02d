#!/usr/bin/env python
"""Forced-fetch micro timings (block_until_ready lies through the axon
tunnel; every measurement ends with a real 1-element D2H fetch, ~27 ms,
reported raw — compare variants, not absolutes)."""

import sys
import time

import numpy as np


def force(out):
    import jax
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "dtype")]
    x = leaves[-1]
    np.asarray(x.reshape(-1)[-1:])


def timeit(fn, n=3):
    out = fn()
    force(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        force(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    sys.path.insert(0, ".")
    import jax
    import jax.numpy as jnp
    from bench import make_banded
    from speck_tpu import device_put_csr
    from speck_tpu.ops.analysis import analyze
    from speck_tpu.ops.dense import tile_stats
    from speck_tpu.ops.stream import plan_device_stream, _plan_rows_impl
    from speck_tpu.utils.config import SpgemmConfig

    # ---- gather variants (16M table, 14M outputs) ----
    T = 16 << 20
    N = 14 << 20
    rs = np.random.RandomState(0)
    cols = jnp.asarray(rs.randint(0, 1 << 20, T), jnp.int32)
    vals = jnp.asarray(rs.standard_normal(T), jnp.float32)
    src = jnp.asarray(rs.randint(0, T, N), jnp.int32)
    vbits = jax.lax.bitcast_convert_type(vals, jnp.int32)
    packed2 = jnp.stack([cols, vbits], axis=-1)
    packedc = None
    force((packed2, src))

    @jax.jit
    def g_rows(src):
        r = packed2[src]
        return r[:, 0], jax.lax.bitcast_convert_type(r[:, 1], jnp.float32)

    @jax.jit
    def g_two(src):
        return cols[src], vals[src]

    @jax.jit
    def g_c64(src):
        r = packedc[src]
        ri = r.view(jnp.int32).reshape(-1, 2)
        return ri[..., 0], jax.lax.bitcast_convert_type(
            ri[..., 1], jnp.float32)

    variants = [("rows(T,2)", g_rows), ("two-planes", g_two)]
    if packedc is not None:
        variants.append(("complex64", g_c64))
    for name, fn in variants:
        try:
            t = timeit(lambda fn=fn: fn(src))
            print(f"# gather {name}: {t*1e3:.1f} ms ({N/t/1e6:.0f}M rec/s)",
                  flush=True)
        except Exception as e:
            print(f"# gather {name}: FAILED {e}", flush=True)
    if packedc is not None:
        try:
            a = g_rows(src)
            c = g_c64(src)
            assert bool(jnp.all(a[0] == c[0]))
            assert bool(jnp.all(a[1] == c[1]))
            print("# gather outputs identical", flush=True)
        except Exception as e:
            print(f"# c64 check failed: {e}", flush=True)

    # ---- config1 planning breakdown ----
    a1 = make_banded()
    A = device_put_csr(a1, np.float32)
    cfg = SpgemmConfig()
    m = A.shape[0]
    stats = analyze(A, A)
    force(stats.row_ops)
    t = timeit(lambda: analyze(A, A).row_ops)
    print(f"# analyze: {t*1e3:.1f} ms", flush=True)

    tr = cfg.dense_tile_rows
    max_tiles = max(0, cfg.fused_staging_budget // (tr * cfg.dense_cw))
    a32 = jax.lax.bitcast_convert_type(A.data, jnp.int32)

    t = timeit(lambda: tile_stats(
        A.indptr, A.indices, A.indptr, A.indices, stats.row_ops,
        stats.a_len, tile_rows=tr, m=m))
    print(f"# tile_stats: {t*1e3:.1f} ms (tile_rows={tr})", flush=True)

    sm = stats.row_ops > 0
    dm = jnp.zeros((m,), bool)
    t = timeit(lambda: _plan_rows_impl(
        stats.row_ops, sm, dm, min_q=cfg.stream_min_q, m=m, tight=True,
        w0=cfg.stream_width, w_cap=cfg.stream_width_cap))
    print(f"# _plan_rows_impl(tight): {t*1e3:.1f} ms", flush=True)

    def plan():
        return plan_device_stream(
            A.indptr, A.indices, a32, A.indptr, A.indices,
            stats.row_ops, stats.row_ops_f, stats.a_len,
            min_q=cfg.stream_min_q, direct_ok=True, use_dense=True,
            tile_rows=tr, kw_max=cfg.dense_kw, cw_max=cfg.dense_cw,
            la_max=cfg.dense_la, lb_max=cfg.dense_lb,
            max_tiles=max_tiles, m=m, use_accum=False,
            w0=cfg.stream_width, w_cap=cfg.stream_width_cap)

    t = timeit(lambda: plan()[-1])
    print(f"# plan_device_stream full: {t*1e3:.1f} ms", flush=True)

    t = timeit(lambda: plan_device_stream(
        A.indptr, A.indices, a32, A.indptr, A.indices,
        stats.row_ops, stats.row_ops_f, stats.a_len,
        min_q=cfg.stream_min_q, direct_ok=True, use_dense=False,
        tile_rows=tr, kw_max=cfg.dense_kw, cw_max=cfg.dense_cw,
        la_max=cfg.dense_la, lb_max=cfg.dense_lb,
        max_tiles=max_tiles, m=m, use_accum=False,
        w0=cfg.stream_width, w_cap=cfg.stream_width_cap)[-1])
    print(f"# plan_device_stream use_dense=False: {t*1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
