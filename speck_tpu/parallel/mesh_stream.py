"""SPMD mesh SpGEMM on the flat product stream.

Replaces the fixed-cap shard_map path's global per-row capacity (which
paid the widest row's rectangle on every row of every shard) with the
stream formulation: each shard runs the full stream pipeline on its local
A rows -- planning sort, tight packing, (G, W) chunks, sort/contract,
device-side offsets, emission into a padded output -- entirely inside ONE
jitted ``shard_map``. Per-shard working memory is bounded by the chunk
budget (G*W slots), NOT by max-row-work times rows, so skewed matrices
shard cleanly.

The rectangle width W stays at the configured chunk width regardless of
skew: rows wider than W own whole rectangle rows and are finished by a
merge-level ladder INSIDE the SPMD body (static depth, host-planned
in_maps shipped as sharded arrays — _mesh_wide_plans), exactly like the
single-chip ladder (ops/spgemm._run_wide). One 10^6-op row on one shard
no longer inflates every shard's chunk-sort width.

B exchange over the mesh axis (ICI on a real slice):

- ``exchange="allgather"``: every shard gathers all B row shards
  (jax.lax.all_gather), then indexes rows directly -- the correctness
  baseline.
- ``exchange="needset"``: the host computes, per (dst, src) shard pair,
  exactly which B rows dst needs (the per-partition generalization of the
  reference's per-row column-range analysis, toRowColMinMax,
  /root/reference/include/common.cuh:303-319); the rows' (col, val)
  records move in D-1 round-robin ``jax.lax.ppermute`` rounds (round r:
  src s -> dst (s+r)%D), each round padded only to ITS OWN largest pair —
  self-need is a local gather (zero communication) and all-empty rounds
  are skipped outright. A's column ids are pre-remapped to
  received-buffer slots on the host. meta["stats"] reports the
  exchanged-bytes reduction vs all_gather.

The reference is single-GPU (SURVEY.md §2.2); this layer is new design
per the BASELINE.json north star.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..formats.csr import HostCSR
from ..ops.analysis import cumsum1d
from ..ops.esc import pack_csr_arrays
from ..ops.stream import (_compact_rect, _contract_rect, _plan_stream_impl,
                          _pow2ceil, _sort_cols, stream_chunk,
                          stream_emit, stream_level, tight_total_host)
from ..utils.config import SpgemmConfig
from .dist import ROW_AXIS, _slice_rows, stack_row_shards


def _mesh_wide_plans(shard_ops: List[np.ndarray], W: int, F: int,
                     max_width: int):
    """Host ladder plans for the in-SPMD wide-row merge levels.

    Per shard: wide rows (ops > W, device sort order = ops descending;
    ties have equal segment counts, so host order is interchangeable)
    own ceil(ops/W) level-0 rectangle rows; each level merges up to
    f_eff consecutive segments of one row into one output row of width
    f_eff * W_in. Unlike the single-chip ladder (ops/spgemm._run_wide),
    in_maps are ABSOLUTE into the full previous buffer (no host
    compaction between levels — shard_map shapes are static), and all
    shards are padded to one common (R_out, depth) schedule; pad rows
    carry in_map = -1 and final = False and produce nothing.

    Returns (r_wide_max, wide_rid (D, r_wide_max), specs) where specs is
    a list of dicts {F, W_in, R_out, in_map (D, R_out, F), final
    (D, R_out)}."""
    D = len(shard_ops)
    wide_segs = []
    for ops in shard_ops:
        w = np.sort(ops[ops > W])[::-1]
        wide_segs.append(-(-w // W))
    r_wides = [int(s.sum()) for s in wide_segs]
    r_wide_max = max(r_wides + [0])
    if r_wide_max == 0:
        return 0, np.zeros((D, 1), np.int32), []
    wide_rid = np.full((D, r_wide_max), -1, np.int32)
    for d, segs in enumerate(wide_segs):
        if len(segs):
            wide_rid[d, : int(segs.sum())] = np.repeat(
                np.arange(len(segs)), segs)

    # per-shard absolute level schedules
    per_shard: List[List[dict]] = []
    depth = 0
    for segs in wide_segs:
        rows = []
        base = 0
        for rid, s in enumerate(segs):
            rows.append((rid, list(range(base, base + int(s)))))
            base += int(s)
        levels = []
        W_in = W
        while rows:
            f_eff = min(F, max(max_width // W_in, 2))
            in_map, final, nxt = [], [], []
            out_base = 0
            for rid, segids in rows:
                n_out = -(-len(segids) // f_eff)
                outs = []
                for o in range(n_out):
                    grp = segids[o * f_eff: (o + 1) * f_eff]
                    in_map.append(grp + [-1] * (f_eff - len(grp)))
                    final.append(n_out == 1)
                    outs.append(out_base)
                    out_base += 1
                if n_out > 1:
                    nxt.append((rid, outs))
            levels.append(dict(F=f_eff, W_in=W_in,
                               in_map=np.asarray(in_map, np.int32),
                               final=np.asarray(final, bool)))
            rows = nxt
            W_in *= f_eff
        per_shard.append(levels)
        depth = max(depth, len(levels))

    # pad across shards to one common schedule (F/W_in agree by
    # construction: both derive only from W and the level index)
    specs = []
    W_in = W
    for li in range(depth):
        f_eff = min(F, max(max_width // W_in, 2))
        R_out = max((lv[li]["in_map"].shape[0]
                     for lv in per_shard if li < len(lv)), default=1)
        R_out = max(R_out, 1)
        im = np.full((D, R_out, f_eff), -1, np.int32)
        fm = np.zeros((D, R_out), bool)
        for d, lv in enumerate(per_shard):
            if li < len(lv):
                k = lv[li]["in_map"].shape[0]
                im[d, :k] = lv[li]["in_map"]
                fm[d, :k] = lv[li]["final"]
        specs.append(dict(F=f_eff, W_in=W_in, R_out=R_out,
                          in_map=im, final=fm))
        W_in *= f_eff
    return r_wide_max, wide_rid, specs


def _host_row_ops(a: HostCSR, b_len: np.ndarray) -> np.ndarray:
    alen = np.diff(a.row_offsets)
    ops = np.zeros(a.rows, np.int64)
    np.add.at(ops, np.repeat(np.arange(a.rows), alen),
              b_len[np.asarray(a.col_ids, np.int64)])
    return ops


@dataclasses.dataclass
class NeedsetStats:
    """Communication-volume accounting for the need-set exchange."""

    allgather_bytes: int   # (col, val) bytes every shard receives via all_gather
    needset_bytes: int     # padded (col, val) bytes exchanged per shard
    pairs_nnz: np.ndarray  # (D, D) true nnz needed dst<-src

    @property
    def reduction(self) -> float:
        return self.allgather_bytes / max(self.needset_bytes, 1)


def _plan_ksplit(a: HostCSR, b_len_h: np.ndarray, ops_g: np.ndarray,
                 D: int, k_locB: int, split_min: int):
    """Host plan for k-split rows (single-row sharding): rows with more
    products than ``split_min`` (and ALWAYS rows past the 2^30 per-row
    int32 ceiling) are removed from their owner shard's local A and
    their nonzeros re-dealt BY B-ROW-OWNER: shard s gets the slots whose
    a_col lies in its B shard, so the partial products need no remote B
    rows at all (needset: pure self-need). Partials merge via one
    all_gather + sort (see _make_shard_body). Returns None or a dict:
    a2 (split rows emptied), split_ids, per-shard sub-CSR (padded) and
    per-(shard,row) sub-op counts.

    The reference's analogue is the global-map flush/restart that lets
    ONE row's products span many passes of one GPU
    (spECK_HashSpGEMM.cuh:106-126); here the passes are mesh shards."""
    split_min = min(split_min, 1 << 30)
    split_ids = np.flatnonzero(ops_g > split_min)
    if split_ids.size == 0:
        return None
    if split_ids.size > 64:
        raise ValueError(
            f"{split_ids.size} rows exceed the k-split threshold "
            f"({split_min}); raise MeshSplitMinOps or use more shards")
    ip = np.asarray(a.row_offsets, np.int64)
    drop = np.zeros(a.nnz, bool)
    for r in split_ids:
        drop[ip[r]: ip[r + 1]] = True
    keep = ~drop
    lens = ip[1:] - ip[:-1]
    lens2 = lens.copy()
    lens2[split_ids] = 0
    ip2 = np.zeros(a.rows + 1, np.int64)
    np.cumsum(lens2, out=ip2[1:])
    a2 = HostCSR(rows=a.rows, cols=a.cols, row_offsets=ip2,
                 col_ids=np.asarray(a.col_ids)[keep],
                 data=np.asarray(a.data)[keep])
    n_split = int(split_ids.size)
    # per-shard sub-CSR: row j of shard s = split row j's slots whose
    # col is owned by B shard s
    sub_cols = [[None] * n_split for _ in range(D)]
    sub_vals = [[None] * n_split for _ in range(D)]
    sub_ops = np.zeros((D, n_split), np.int64)
    for j, r in enumerate(split_ids):
        cj = np.asarray(a.col_ids[ip[r]: ip[r + 1]], np.int64)
        vj = np.asarray(a.data[ip[r]: ip[r + 1]])
        own = cj // k_locB
        for s in range(D):
            sel = own == s
            sub_cols[s][j] = cj[sel]
            sub_vals[s][j] = vj[sel]
            sub_ops[s, j] = int(b_len_h[cj[sel]].sum())
    if sub_ops.max(initial=0) > 2 ** 30:
        raise ValueError(
            f"a k-split sub-row still has {int(sub_ops.max())} products "
            "on one shard, past the 2^30 per-shard ceiling; use more "
            "shards")
    spl_cap = max(1, max(
        sum(len(c) for c in sub_cols[s]) for s in range(D)))
    spl_indptr = np.zeros((D, n_split + 1), np.int64)
    spl_cols = np.zeros((D, spl_cap), np.int64)
    spl_vals = np.zeros((D, spl_cap), np.float32)
    for s in range(D):
        off = 0
        for j in range(n_split):
            c = sub_cols[s][j]
            spl_cols[s, off: off + len(c)] = c
            spl_vals[s, off: off + len(c)] = sub_vals[s][j]
            off += len(c)
            spl_indptr[s, j + 1] = off
    return dict(a2=a2, split_ids=split_ids, n_split=n_split,
                spl_indptr=spl_indptr, spl_cols=spl_cols,
                spl_vals=spl_vals, sub_ops=sub_ops, spl_cap=spl_cap)


def _make_shard_body(cfg: SpgemmConfig, m_loc: int, W: int, G: int,
                     n_chunks: int, out_cap: int, n_cols: int,
                     r_wide_max: int = 0, level_specs=(), ks=None):
    """The per-shard stream pipeline (traced inside shard_map): analysis,
    planning, chunked count+stage, the wide-row merge-level ladder
    (static depth, host-planned in_maps arrive as sharded args),
    device-side offsets, emission. W stays at the configured chunk
    width regardless of skew — a wide row owns whole rectangle rows and
    the ladder finishes it, exactly like the single-chip path
    (ops/spgemm._run_wide) but with the level schedule shipped as data."""
    CP = G * W

    def _pipeline(ai, ax, ad, b_start, b_len, b_packed, wide_rid,
                  level_args, specs, m: int, n_ch: int, rw_max: int):
        """One stream pipeline over a local CSR: plan, chunks, ladder.
        Returns (nnz_row, rows_sorted, q_sorted, staged, level_out)."""
        blen_a = b_len[ax]
        cse = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), cumsum1d(blen_a)])
        row_ops = cse[ai[1:]] - cse[ai[:-1]]
        stream_mask = row_ops > 0
        no_direct = jnp.zeros((m,), bool)
        a32 = jax.lax.bitcast_convert_type(ad, jnp.int32)
        (rows_sorted, e, q_sorted, el, ops_sorted, p0, su, sa, src, pend,
         _) = _plan_stream_impl(
            row_ops, stream_mask, no_direct, ai, ax, a32, b_start, b_len,
            min_q=cfg.stream_min_q, m=m, tight=True, w_fixed=W)
        nnz_row = jnp.zeros((m,), jnp.int32)
        rowend = jnp.where(q_sorted > 0, e + ops_sorted, -1)
        staged = []
        for c in range(n_ch):
            cs = jnp.int32(c * CP)
            nnz_row, stg = stream_chunk(
                rows_sorted, e, rowend, q_sorted, el, ops_sorted, p0,
                su, sa, pend, b_packed, b_packed[:, 0], ad, ad, src,
                nnz_row, cs,
                jnp.searchsorted(e, cs).astype(jnp.int32),
                jnp.searchsorted(p0, cs).astype(jnp.int32),
                G=G, W=W, n_cols=n_cols, pack_bits=0, stage=True,
                f64=False)
            staged.append(stg)
        level_out = []
        if rw_max > 0 and specs:
            rid_in = wide_rid
            wcol = jnp.concatenate([s[1] for s in staged])[:rw_max]
            wval = jnp.concatenate([s[2] for s in staged])[:rw_max]
            wcnt = jnp.concatenate([s[3] for s in staged])[:rw_max]
            wcnt = jnp.where(rid_in >= 0, wcnt, 0)
            for li, spec in enumerate(specs):
                in_map = level_args[2 * li]
                final = level_args[2 * li + 1]
                nnz_row, (rid_out, col_c, val_c, counts) = stream_level(
                    rows_sorted, rid_in, wcol, wval, wcnt,
                    in_map, final, nnz_row,
                    F=spec["F"], W_in=spec["W_in"], n_cols=n_cols,
                    count=True, sort_impl=cfg.stream_sort_impl,
                    compact_impl=cfg.stream_compact_impl)
                level_out.append(
                    (rid_out, col_c, val_c, jnp.where(final, counts, 0)))
                rid_in, wcol, wval, wcnt = rid_out, col_c, val_c, counts
        return nnz_row, rows_sorted, q_sorted, staged, level_out

    def shard_body(ai, ax, ad, b_start, b_len, b_packed, wide_rid,
                   *level_args):
        zero = jnp.int32(0)
        n_main = 2 * len(level_specs)
        main_lv = [x[0] for x in level_args[:n_main]]
        nnz_row, rows_sorted, q_sorted, staged, level_out = _pipeline(
            ai, ax, ad, b_start, b_len, b_packed, wide_rid[0],
            main_lv, level_specs, m_loc, n_chunks, r_wide_max)

        # ---- k-split rows: local partials over the shard's OWN B rows,
        # all_gather + one merge sort, owner counts/emits (the mesh form
        # of the reference's global-map multi-pass for one row,
        # spECK_HashSpGEMM.cuh:106-126) ----
        merged = None
        if ks is not None:
            n_split, P, Wm = ks["n_split"], ks["P"], ks["Wm"]
            rest = level_args[n_main:]
            si, sx, sv = rest[0][0], rest[1][0], rest[2][0]
            spl_tgt, spl_emit = rest[3][0], rest[4][0]
            spl_wrid = rest[5]
            spl_lv = [x[0] for x in rest[6:]]
            _, rows_s, q_s, staged_s, lout_s = _pipeline(
                si, sx, sv, b_start, b_len, b_packed, spl_wrid[0],
                spl_lv, ks["specs"], n_split, ks["n_chunks"],
                ks["rw_max"])
            # partial buffers: row j's compacted entries at [j*P, +count)
            offs_p = jnp.arange(n_split + 1, dtype=jnp.int32) * P
            p_cols = jnp.full((n_split * P,), n_cols, jnp.int32)
            p_vals = jnp.zeros((n_split * P,), jnp.float32)
            ident_s = jnp.arange(n_split, dtype=jnp.int32)
            nw_s = jnp.sum((q_s > W).astype(jnp.int32))
            for stg in staged_s:
                p_cols, p_vals = stream_emit(
                    rows_s, stg[0], stg[1], stg[2], stg[3], nw_s,
                    offs_p, p_cols, p_vals, contained_only=True)
            for rid_out, col_c, val_c, fcnt in lout_s:
                rid_b = jnp.broadcast_to(rid_out[:, None], col_c.shape)
                p_cols, p_vals = stream_emit(
                    rows_s, rid_b, col_c, val_c, fcnt, zero,
                    offs_p, p_cols, p_vals, wide_only=True)
            # exchange partials; merge with ONE sort+contract per row
            g_c = jax.lax.all_gather(
                p_cols.reshape(n_split, P), ROW_AXIS)   # (D, n_split, P)
            g_v = jax.lax.all_gather(p_vals.reshape(n_split, P), ROW_AXIS)
            D_ax = g_c.shape[0]
            mc = jnp.transpose(g_c, (1, 0, 2)).reshape(n_split, D_ax * P)
            mv = jnp.transpose(g_v, (1, 0, 2)).reshape(n_split, D_ax * P)
            if Wm > D_ax * P:
                mc = jnp.pad(mc, ((0, 0), (0, Wm - D_ax * P)),
                             constant_values=n_cols)
                mv = jnp.pad(mv, ((0, 0), (0, Wm - D_ax * P)))
            col_s, val_s = _sort_cols(mc, mv, cfg.stream_sort_impl)
            rid_bm = jax.lax.broadcasted_iota(jnp.int32, (n_split, Wm), 0)
            last, run_sum = _contract_rect(rid_bm, col_s, val_s, n_cols)
            _, col_m, val_m, cnt_m = _compact_rect(
                last, rid_bm, col_s, run_sum,
                compact_impl=cfg.stream_compact_impl)
            nnz_row = nnz_row.at[spl_tgt].set(cnt_m, mode="drop",
                                              unique_indices=True)
            merged = (spl_emit, col_m, val_m, cnt_m)

        offs = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), cumsum1d(nnz_row)])
        c_cols = jnp.zeros((out_cap,), jnp.int32)
        c_vals = jnp.zeros((out_cap,), jnp.float32)
        # wide rows sort first: sorted ids below n_wide are the ladder's,
        # everything else is contained (per-shard device scalar)
        n_wide_dev = jnp.sum((q_sorted > W).astype(jnp.int32))
        for stg in staged:
            c_cols, c_vals = stream_emit(
                rows_sorted, stg[0], stg[1], stg[2], stg[3], n_wide_dev,
                offs, c_cols, c_vals, contained_only=True)
        for rid_out, col_c, val_c, fcnt in level_out:
            rid_b = jnp.broadcast_to(rid_out[:, None], col_c.shape)
            c_cols, c_vals = stream_emit(
                rows_sorted, rid_b, col_c, val_c, fcnt, zero,
                offs, c_cols, c_vals, wide_only=True)
        if merged is not None:
            spl_emit, col_m, val_m, cnt_m = merged
            rid_e = jnp.broadcast_to(spl_emit[:, None], col_m.shape)
            ident = jnp.arange(m_loc, dtype=jnp.int32)
            c_cols, c_vals = stream_emit(
                ident, rid_e, col_m, val_m, cnt_m, zero,
                offs, c_cols, c_vals, wide_only=True)
        return nnz_row[None], c_cols[None], c_vals[None]

    return shard_body


def mesh_stream_spgemm(
    a: HostCSR,
    b: HostCSR,
    mesh: Mesh,
    cfg: Optional[SpgemmConfig] = None,
    exchange: str = "allgather",
):
    """C = A @ B as ONE jitted SPMD step over ``mesh`` (see module
    docstring). Returns (nnz_row, cols, vals, meta): padded row-major
    per-shard outputs; assemble with ``mesh_stream_to_host_csr``."""
    if a.cols != b.rows:
        raise ValueError(f"dimension mismatch: A is {a.shape}, B is {b.shape}")
    if exchange not in ("allgather", "needset"):
        raise ValueError(f"unknown exchange mode {exchange!r}")
    cfg = cfg or SpgemmConfig()
    D = mesh.devices.size
    n_cols = b.cols

    b_len_h = np.diff(np.asarray(b.row_offsets, np.int64))
    # k-split rows (single-row sharding): removed from their owner's
    # local A, their slots re-dealt by B-row owner (see _plan_ksplit)
    k_locB = max(1, -(-b.rows // D))
    ops_g = _host_row_ops(a, b_len_h)
    ksp = _plan_ksplit(a, b_len_h, ops_g, D, k_locB,
                       cfg.mesh_split_min_ops)
    a_eff = ksp["a2"] if ksp is not None else a

    ai_h, ax_h, ad_h, a_ranges = stack_row_shards(a_eff, D, jnp.float32)
    m_loc = ai_h.shape[1] - 1

    # per-shard stream shape parameters (host analysis; SPMD needs one
    # static shape across shards). W stays at the configured chunk width
    # regardless of skew: rows wider than W own whole rectangle rows and
    # the in-SPMD merge ladder finishes them (_mesh_wide_plans) — one
    # 10^6-op row no longer inflates every shard's sort width. Per-shard
    # totals use the exact host twin of the device's tight layout.
    min_q = cfg.stream_min_q
    shard_ops = []
    for r0, r1 in a_ranges:
        ops = _host_row_ops(_slice_rows(a_eff, r0, r1), b_len_h)
        assert not ops.size or int(ops.max(initial=0)) <= 2 ** 30, \
            "post-split row past 2^30 (unreachable: _plan_ksplit)"
        shard_ops.append(ops)
    W = cfg.stream_width
    total_qs = []
    for (r0, r1), ops in zip(a_ranges, shard_ops):
        total_qs.append(tight_total_host(ops, W, min_q))
        if total_qs[-1] >= 2 ** 31:
            raise ValueError(
                f"shard rows {r0}:{r1} pack to {total_qs[-1]} stream "
                "slots, past the 2^31 int32 ceiling; use more shards")
    G = max(1, cfg.product_budget // W)
    CP = G * W
    n_chunks = max(1, -(-max(total_qs + [1]) // CP))
    out_cap_base = max(total_qs + [1])
    r_wide_max, wide_rid_h, level_specs = _mesh_wide_plans(
        shard_ops, W, cfg.stream_level_factor, cfg.stream_max_width)

    # ---- k-split static parameters ----
    ks = None
    if ksp is not None:
        n_split = ksp["n_split"]
        sub_ops = ksp["sub_ops"]
        tq_s = [tight_total_host(sub_ops[s], W, min_q) for s in range(D)]
        if max(tq_s) >= 2 ** 31:
            raise ValueError(
                f"a k-split shard packs to {max(tq_s)} stream slots, "
                "past the 2^31 int32 ceiling; use more shards")
        rw_max_s, spl_wide_rid_h, spl_specs = _mesh_wide_plans(
            [sub_ops[s] for s in range(D)], W,
            cfg.stream_level_factor, cfg.stream_max_width)
        P_spl = _pow2ceil(max(1, min(n_cols, int(sub_ops.max(initial=1)))))
        Wm = _pow2ceil(D * P_spl)
        # owner shard / local row of each split row; non-owners drop
        spl_tgt_h = np.full((D, n_split), m_loc, np.int32)
        spl_emit_h = np.full((D, n_split), -1, np.int32)
        out_extra = np.zeros(D, np.int64)
        for j, r in enumerate(ksp["split_ids"]):
            for s, (r0, r1) in enumerate(a_ranges):
                if r0 <= r < r1:
                    spl_tgt_h[s, j] = r - r0
                    spl_emit_h[s, j] = r - r0
                    out_extra[s] += min(n_cols, D * P_spl)
        ks = dict(n_split=n_split, P=P_spl, Wm=Wm,
                  n_chunks=max(1, -(-max(tq_s + [1]) // CP)),
                  rw_max=rw_max_s, specs=spl_specs)
        out_cap_base += int(out_extra.max(initial=0))
    out_cap = _pow2ceil(out_cap_base)
    body = _make_shard_body(cfg, m_loc, W, G, n_chunks, out_cap, n_cols,
                            r_wide_max=r_wide_max,
                            level_specs=level_specs, ks=ks)

    def put(x):
        # make_array_from_callback works identically under one controller
        # and under multi-process (jax.distributed): every process holds
        # the same full host array and each only materializes the shards
        # its local devices own (addressable-shard assembly).
        x = np.asarray(x)
        sh = NamedSharding(mesh, P(ROW_AXIS))
        return jax.make_array_from_callback(x.shape, sh,
                                            lambda idx: x[idx])

    stats = None

    def extra_args(spl_cols_arr):
        """wide_rid + main level maps (+ the split pipeline's inputs;
        spl_cols_arr is mode-specific: global B row ids under allgather,
        received-buffer slots under needset)."""
        args = [put(wide_rid_h)]
        for spec in level_specs:
            args.append(put(spec["in_map"]))
            args.append(put(spec["final"]))
        if ksp is not None:
            args += [put(ksp["spl_indptr"].astype(np.int32)),
                     put(np.asarray(spl_cols_arr, np.int32)),
                     put(ksp["spl_vals"]),
                     put(spl_tgt_h), put(spl_emit_h),
                     put(spl_wide_rid_h)]
            for spec in ks["specs"]:
                args.append(put(spec["in_map"]))
                args.append(put(spec["final"]))
        return args

    n_ladder = (1 + 2 * len(level_specs)
                + ((6 + 2 * len(ks["specs"])) if ksp is not None else 0))

    if exchange == "allgather":
        bi_h, bx_h, bd_h, _ = stack_row_shards(b, D, jnp.float32)
        bnnz_max = bx_h.shape[1]

        def step(ai, ax, ad, bi, bx, bd, wide_rid, *lv):
            ai, ax, ad = ai[0], ax[0], ad[0]
            g_indptr = jax.lax.all_gather(bi[0], ROW_AXIS)   # (D, k_loc+1)
            g_packed = jax.lax.all_gather(
                pack_csr_arrays(bx[0], bd[0]), ROW_AXIS).reshape(-1, 2)
            base = jnp.arange(D, dtype=jnp.int32)[:, None] * bnnz_max
            b_start = (g_indptr[:, :-1] + base).reshape(-1)
            b_len = (g_indptr[:, 1:] - g_indptr[:, :-1]).reshape(-1)
            return body(ai, ax, ad, b_start, b_len, g_packed, wide_rid,
                        *lv)

        sharded = jax.jit(jax.shard_map(
            step, mesh=mesh, in_specs=(P(ROW_AXIS),) * (6 + n_ladder),
            out_specs=(P(ROW_AXIS),) * 3))
        nnz_row, cols, vals = sharded(
            put(ai_h), put(ax_h), put(ad_h), put(bi_h), put(bx_h),
            put(bd_h),
            *extra_args(ksp["spl_cols"] if ksp is not None else None))
    else:
        # ---- need-set exchange plan (host numpy) ----
        k_loc = max(1, -(-b.rows // D))
        b_off = np.asarray(b.row_offsets, np.int64)
        # need set per dst shard: unique B rows referenced by its A cols
        # (plus its k-split slots' cols — those are always self-owned,
        # so they only enlarge the zero-communication round 0)
        needs: List[np.ndarray] = []
        for s, (r0, r1) in enumerate(a_ranges):
            sl = _slice_rows(a_eff, r0, r1)
            cols_need = np.asarray(sl.col_ids, np.int64)
            if ksp is not None:
                nz_s = int(ksp["spl_indptr"][s, -1])
                cols_need = np.concatenate(
                    [cols_need, ksp["spl_cols"][s, :nz_s].astype(np.int64)])
            needs.append(np.unique(cols_need))
        pair_rows = [[nd[(nd // k_loc) == s] for s in range(D)]
                     for nd in needs]
        pair_nnz = np.array([[int(b_len_h[pr].sum()) for pr in row]
                             for row in pair_rows])
        # round r moves pairs src -> dst=(src+r)%D; round 0 is the local
        # self-need (no communication). Each round pads to its own max.
        round_nnz = [int(_pow2ceil(max(1, max(
            pair_nnz[(s + r) % D, s] for s in range(D)))))
            if max(pair_nnz[(s + r) % D, s] for s in range(D)) > 0 else 0
            for r in range(D)]
        seg_off = np.concatenate([[0], np.cumsum(round_nnz)])
        RB_total = int(seg_off[-1])

        # per-round send gather plan (src-local nnz positions) and, per
        # dst, the received-buffer (start, len) of every needed row
        send_idx = [np.zeros((D, round_nnz[r]), np.int64)
                    for r in range(D)]
        send_valid = [np.zeros((D, round_nnz[r]), bool) for r in range(D)]
        P_rows = int(_pow2ceil(max(1, max(len(pr) for row in pair_rows
                                          for pr in row))))
        RB = D * P_rows
        rb_start = np.zeros((D, RB), np.int32)
        rb_len = np.zeros((D, RB), np.int32)
        ax_remap = np.array(ax_h)
        spl_cols_remap = (np.array(ksp["spl_cols"]) if ksp is not None
                          else None)
        for src in range(D):
            for r in range(D):
                dst = (src + r) % D
                rows = pair_rows[dst][src]
                lens = b_len_h[rows]
                nz = int(lens.sum())
                if nz:
                    pos = np.concatenate(
                        [np.arange(b_off[q], b_off[q + 1]) for q in rows])
                    send_idx[r][src, :nz] = pos - b_off[src * k_loc]
                    send_valid[r][src, :nz] = True
        for dst in range(D):
            lut = np.zeros(b.rows, np.int64)
            for src in range(D):
                r = (dst - src) % D
                rows = pair_rows[dst][src]
                lens = b_len_h[rows]
                starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
                slots = src * P_rows + np.arange(len(rows))
                rb_start[dst, slots] = seg_off[r] + starts
                rb_len[dst, slots] = lens
                lut[rows] = slots
            ax_remap[dst] = lut[np.asarray(ax_h[dst], np.int64)]
            if spl_cols_remap is not None:
                spl_cols_remap[dst] = lut[
                    np.asarray(ksp["spl_cols"][dst], np.int64)]

        _, bx_h, bd_h, _ = stack_row_shards(b, D, jnp.float32)
        perms = [[(s, (s + r) % D) for s in range(D)] for r in range(D)]

        def step(ai, axr, ad, bx, bd, rbs, rbl, wide_rid, *rest):
            lv = rest[: n_ladder - 1]
            sends = rest[n_ladder - 1:]
            ai, axr, ad = ai[0], axr[0], ad[0]
            packed = pack_csr_arrays(bx[0], bd[0])
            segs = []
            si = 0
            for r in range(D):
                if round_nnz[r] == 0:
                    continue
                sidx, sval = sends[2 * si][0], sends[2 * si + 1][0]
                si += 1
                payload = packed[jnp.clip(sidx, 0, packed.shape[0] - 1)]
                payload = jnp.where(sval[:, None], payload, 0)
                if r == 0:
                    segs.append(payload)        # self-need: no comm
                else:
                    segs.append(jax.lax.ppermute(payload, ROW_AXIS,
                                                 perms[r]))
            b_packed = (jnp.concatenate(segs) if segs
                        else jnp.zeros((1, 2), jnp.int32))
            return body(ai, axr, ad, rbs[0], rbl[0], b_packed, wide_rid,
                        *lv)

        live_sends = []
        for r in range(D):
            if round_nnz[r] == 0:
                continue
            live_sends.append(put(send_idx[r].astype(np.int32)))
            live_sends.append(put(send_valid[r]))
        n_in = 7 + n_ladder + len(live_sends)
        sharded = jax.jit(jax.shard_map(
            step, mesh=mesh, in_specs=(P(ROW_AXIS),) * n_in,
            out_specs=(P(ROW_AXIS),) * 3))
        nnz_row, cols, vals = sharded(
            put(ai_h), put(ax_remap), put(ad_h), put(bx_h), put(bd_h),
            put(rb_start), put(rb_len), *extra_args(spl_cols_remap),
            *live_sends)
        stats = NeedsetStats(
            # per-shard volume actually moved over the interconnect:
            # all_gather replicates all of B's (col, val) records; the
            # need-set rounds move only the padded non-self rounds
            allgather_bytes=int(b.nnz) * 8,
            needset_bytes=int(sum(round_nnz[1:])) * 8,
            pairs_nnz=pair_nnz,
        )

    meta = {"ranges": a_ranges, "out_cap": out_cap, "m_loc": m_loc,
            "shape": (a.rows, b.cols), "stats": stats}
    return nnz_row, cols, vals, meta


def _fetch_global(x) -> np.ndarray:
    """Fetch a possibly non-fully-addressable sharded array to host.
    Under multi-process (jax.distributed) every process gets the full
    logical array via an all-gather over hosts; single-controller this
    is a plain device fetch."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def mesh_stream_to_host_csr(nnz_row, cols, vals, meta) -> HostCSR:
    """Assemble the padded per-shard outputs into one HostCSR (every
    process gets the full matrix; see _fetch_global)."""
    m, n = meta["shape"]
    m_loc, out_cap = meta["m_loc"], meta["out_cap"]
    nnz_row = _fetch_global(nnz_row).reshape(-1, m_loc)
    cols = _fetch_global(cols).reshape(-1, out_cap)
    vals = _fetch_global(vals).reshape(-1, out_cap)
    parts_c, parts_v, counts = [], [], []
    for d, (r0, r1) in enumerate(meta["ranges"]):
        cnt = nnz_row[d][: r1 - r0]
        tot = int(cnt.sum())
        parts_c.append(cols[d][:tot])
        parts_v.append(vals[d][:tot])
        counts.append(cnt)
    cnt_all = np.concatenate(counts) if counts else np.zeros(0, np.int64)
    offsets = np.zeros(m + 1, np.int64)
    if cnt_all.shape[0]:
        np.cumsum(cnt_all, out=offsets[1:1 + cnt_all.shape[0]])
        offsets[1 + cnt_all.shape[0]:] = offsets[cnt_all.shape[0]]
    return HostCSR(
        rows=m, cols=n, row_offsets=offsets,
        col_ids=(np.concatenate(parts_c) if parts_c
                 else np.zeros(0, np.int64)),
        data=(np.concatenate(parts_v) if parts_v else np.zeros(0)),
    )
