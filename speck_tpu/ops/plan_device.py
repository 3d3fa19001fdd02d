"""Single-dispatch device planning pass.

Analysis, dense-tile eligibility, and row binning each need a host readback
(the reference's D2H points: sumProducts Multiply.cu:249-252, blockStarts
spECK_HashLoadBalancer.cuh:330-331). Through a remote transport every
readback costs a full round trip, so this module fuses the whole planning
computation into ONE jit whose host-facing results come back as ONE packed
int32 array:

  pack = [ bin histogram (2*nbins+1) | n_eligible_tiles |
           kw_eff | cw_eff | la_eff | lb_eff ]

Everything else (rows_sorted, nnz_init, compacted dense tile parameters)
stays on device. Dense tile parameters are compacted eligible-first with a
tiny sort so the host only needs the *count* to slice them.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .binning import _bin_rows_impl
from .dense import tile_stats


@partial(
    jax.jit,
    static_argnames=("caps", "pad_to", "direct_ok", "use_dense", "tile_rows",
                     "kw_max", "cw_max", "la_max", "lb_max", "max_tiles",
                     "m"),
)
def plan_device(a_indptr, a_indices, b_indptr, b_indices,
                row_ops, a_len, work, *,
                caps: Tuple[int, ...], pad_to: int, direct_ok: bool,
                use_dense: bool, tile_rows: int, kw_max: int, cw_max: int,
                la_max: int, lb_max: int, max_tiles: int, m: int):
    """Returns (rows_sorted, nnz_init, tile_r0s, tile_kb, tile_cb,
    tile_valid, pack) — see module docstring. When use_dense is False the
    tile arrays are empty placeholders and pack's tail is zeros."""
    nbins = len(caps)
    if use_dense and m > 0:
        stats = tile_stats(a_indptr, a_indices, b_indptr, b_indices,
                           row_ops, a_len, tile_rows=tile_rows, m=m)
        kmin, kspan, cmin, cspan, amax, bmax = (stats[i] for i in range(6))
        T = kmin.shape[0]
        elig = (
            (kspan <= kw_max) & (cspan <= cw_max)
            & (amax <= la_max) & (bmax <= lb_max) & (cspan > 0)
        )
        # staging budget: only the first max_tiles eligible tiles qualify
        elig = elig & (jnp.cumsum(elig.astype(jnp.int32)) <= max_tiles)
        n_elig = jnp.sum(elig, dtype=jnp.int32)

        # compact eligible tiles to the front, in tile order
        tid = jnp.arange(T, dtype=jnp.int32)
        key = jnp.where(elig, tid, T + tid)
        key_s, kb_s, cb_s = jax.lax.sort(
            (key, kmin, cmin), dimension=0, num_keys=1
        )
        is_real = key_s < T
        r0 = jnp.where(is_real, key_s * tile_rows, m)
        valid = jnp.where(
            is_real, jnp.minimum(tile_rows, m - key_s * tile_rows), 0
        )
        kb_s = jnp.where(is_real, kb_s, 0)
        cb_s = jnp.where(is_real, cb_s, 0)

        # effective window classes for the eligible set
        kw_eff = jnp.max(jnp.where(elig, kspan, 0))
        cw_eff = jnp.max(jnp.where(elig, cspan, 0))
        la_eff = jnp.max(jnp.where(elig, amax, 0))
        lb_eff = jnp.max(jnp.where(elig, bmax, 0))

        dense_mask = jnp.repeat(
            elig, tile_rows, total_repeat_length=T * tile_rows
        )[:m]
    else:
        T = 0
        n_elig = jnp.int32(0)
        r0 = jnp.zeros((0,), jnp.int32)
        kb_s = jnp.zeros((0,), jnp.int32)
        cb_s = jnp.zeros((0,), jnp.int32)
        valid = jnp.zeros((0,), jnp.int32)
        kw_eff = cw_eff = la_eff = lb_eff = jnp.int32(0)
        dense_mask = None

    rows_sorted, counts, nnz_init = _bin_rows_impl(
        work, row_ops, a_len, caps, pad_to, direct_ok, dense_mask
    )
    pack = jnp.concatenate([
        counts,
        jnp.stack([n_elig, kw_eff, cw_eff, la_eff, lb_eff]).astype(jnp.int32),
    ])
    return rows_sorted, nnz_init, r0, kb_s, cb_s, valid, pack
