#!/usr/bin/env python
"""Stage-split of the dense MXU counting path at config-4 shapes
(round-5: where do 328 ms go?). Times each sub-stage of dense_tiles
fetch-forced on the live backend."""

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
    from speck_tpu import device_put_csr
    from speck_tpu.ops.spgemm import plan_spgemm
    from speck_tpu.ops import dense as dn
    from speck_tpu.ops.esc import pack_csr_arrays
    from speck_tpu.utils.config import SpgemmConfig

    a = make_banded()
    p = make_prolongation(65536, 16384)
    A = device_put_csr(a, np.float32)
    B = device_put_csr(p, np.float32)
    cfg = SpgemmConfig()
    plan = plan_spgemm(A, B, cfg)
    d = plan.dense
    print("dense grp:", d is not None and dict(
        kw=d.kw, cw=d.cw, la=d.la, lb=d.lb, tiles=len(d.r0s),
        batches=len(d.boffs) - 1, full=d.full_cover), flush=True)
    if d is None:
        print("no dense group; counting is elsewhere")
        return
    m, k_dim, n = A.shape[0], A.shape[1], B.shape[1]
    r0s, kbs, cbs, valids = next(iter(d.batches()))
    apk = pack_csr_arrays(A.indices, A.data)
    bpk = pack_csr_arrays(B.indices, B.data)

    ms, _ = t(dn.dense_tiles, r0s, kbs, cbs, A.indptr, A.indices,
              A.data, B.indptr, B.indices, B.data,
              jnp.zeros((m,), jnp.int32), apk, bpk,
              tile_rows=d.tile_rows, kw=d.kw, cw=d.cw, la=d.la,
              lb=d.lb, m=m, k_dim=k_dim, n_cols=n,
              densify=cfg.dense_densify)
    print(f"dense_tiles whole: {ms*1e3:.1f} ms")

    TR, kw, cw, la, lb = d.tile_rows, d.kw, d.cw, d.la, d.lb
    K = r0s.shape[0]
    rows = (np.asarray(r0s)[:, None]
            + np.arange(TR, dtype=np.int32)[None, :]).reshape(-1)
    rows_j = jnp.asarray(np.minimum(rows, m - 1))
    vrow = jnp.asarray(rows < m)

    ga = jax.jit(lambda: dn._gather_rect(
        A.indptr, A.indices, A.data, rows_j, vrow, la, packed=apk))
    ms, (acol, aval, alive) = t(ga)
    print(f"A gather_rect ({K*TR}x{la}): {ms*1e3:.1f} ms")

    kb_row = jnp.asarray(np.repeat(np.asarray(kbs), TR))
    kloc = jnp.where(alive, acol - kb_row[:, None], kw)
    ms, (A_dense, A_hit) = t(jax.jit(
        lambda kl, av: dn._densify_sorted(kl, av, kw)), kloc, aval)
    print(f"A densify_sorted ({K*TR}x{la+kw}): {ms*1e3:.1f} ms")

    ks = (np.asarray(kbs)[:, None]
          + np.arange(kw, dtype=np.int32)[None, :]).reshape(-1)
    ks_j = jnp.asarray(np.minimum(ks, k_dim - 1))
    vk = jnp.asarray(ks < k_dim)
    gb = jax.jit(lambda: dn._gather_rect(
        B.indptr, B.indices, B.data, ks_j, vk, lb, packed=bpk))
    ms, (bcol, bval, blive) = t(gb)
    print(f"B gather_rect ({K*kw}x{lb}): {ms*1e3:.1f} ms")

    cb_k = jnp.asarray(np.repeat(np.asarray(cbs), kw))
    cloc = jnp.where(blive, bcol - cb_k[:, None], cw)
    ms, (B_dense, B_hit) = t(jax.jit(
        lambda cl, bv: dn._densify_sorted(cl, bv, cw)), cloc, bval)
    print(f"B densify_sorted ({K*kw}x{lb+cw}): {ms*1e3:.1f} ms")

    def mm(Ad, Bd, Ah, Bh):
        A3 = Ad.reshape(K, TR, kw)
        B3 = Bd.reshape(K, kw, cw)
        Cv = jnp.einsum("abk,akc->abc", A3, B3,
                        precision=jax.lax.Precision.HIGHEST)
        Cc = jnp.einsum("abk,akc->abc",
                        Ah.reshape(K, TR, kw).astype(jnp.bfloat16),
                        Bh.reshape(K, kw, cw).astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        return Cv, Cc

    ms, (Cv, Cc) = t(jax.jit(mm), A_dense, B_dense, A_hit, B_hit)
    print(f"einsum pair (K={K},TR={TR},kw={kw},cw={cw}): {ms*1e3:.1f} ms")

    cb_row = jnp.asarray(np.repeat(np.asarray(cbs), TR))
    t_cw = jnp.arange(cw, dtype=jnp.int32)[None, :]

    def compact(Cv, Cc):
        Cv2 = Cv.reshape(K * TR, cw)
        present = (Cc.reshape(K * TR, cw) > 0.5) & vrow[:, None] \
            & ((cb_row[:, None] + t_cw) < n)
        counts = jnp.sum(present, axis=1, dtype=jnp.int32)
        rank = jnp.cumsum(present.astype(jnp.int32), axis=1) - 1
        key = jnp.where(present, rank, cw + t_cw)
        cols_g = jnp.where(present, cb_row[:, None] + t_cw, n)
        return counts, jax.lax.sort((key, cols_g, Cv2), dimension=1,
                                    num_keys=1)

    ms, _ = t(jax.jit(compact), Cv, Cc)
    print(f"compaction sort ({K*TR}x{cw}): {ms*1e3:.1f} ms")


if __name__ == "__main__":
    main()
