"""Bitonic compare-exchange sort over the lane (W) axis of (R, W)
arrays, expressed as static reshape/slice/select stages.

Why: the stream chunks (ops/stream.py) spend most of their time in two
batched `jax.lax.sort` calls per chunk. Measured on v5e, lax.sort runs
at ~117-131M elem/s at these widths — ~16x below the HBM bandwidth
bound — i.e. XLA's variadic sort lowering is compute/serial-bound, not
bandwidth-bound. A bitonic network is log2(W)*(log2(W)+1)/2 stages of
pure elementwise min/max selects over aligned slices: every stage is a
bandwidth-bound map XLA can tile freely, so even unfused it has a shot
at ~20x on paper; the real ratio is measured on hardware and recorded
in PARITY.md.

The network (standard bitonic, ascending):

  for k in 2, 4, ..., W:          # sorted-run length after the phase
    for j in k/2, k/4, ..., 1:    # compare distance
      partner of slot i is i ^ j; exchange so that runs of k are
      ascending/descending alternately; final phase k=W ascends.

At stage (k, j) the pairs (i, i^j) are adjacent halves of consecutive
2j-blocks: reshape (R, W) -> (R, W/2j, 2, j) puts partners at [..., 0, :]
and [..., 1, :]. The direction bit is constant per 2j-block
(dir = (block_start & k) == 0), a (W/2j,) vector broadcast.

Keys are int32, ascending; any number of 32-bit value operands ride
along (floats are bitcast by the caller when packing; here they are
carried as-is with jnp.where).

Reference analogue: cub::BlockRadixSort in the per-row sorting kernel
(/root/reference/include/GPU/spECK_HashSpGEMM.cuh:1857-1925) — the
on-chip sort primitive under spECK's output ordering.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


def bitonic_sort_pairs(key: jax.Array, vals: Sequence[jax.Array],
                       ) -> Tuple[jax.Array, Tuple[jax.Array, ...]]:
    """Sort each row of ``key`` (R, W) ascending, permuting every array
    in ``vals`` identically. W must be a power of two."""
    R, W = key.shape
    if not _is_pow2(W):
        raise ValueError(f"bitonic width {W} is not a power of two")
    vals = tuple(vals)
    k = 2
    while k <= W:
        j = k // 2
        while j >= 1:
            nb = W // (2 * j)
            ksh = key.reshape(R, nb, 2, j)
            lo_k, hi_k = ksh[:, :, 0, :], ksh[:, :, 1, :]
            # ascending iff the 2j-block starts in an even k-block
            bstart = jnp.arange(nb, dtype=jnp.int32) * (2 * j)
            asc = ((bstart & k) == 0)[None, :, None]
            # swap needed when (lo > hi) for ascending, (lo < hi) else
            sw = jnp.where(asc, lo_k > hi_k, lo_k < hi_k)
            new_lo = jnp.where(sw, hi_k, lo_k)
            new_hi = jnp.where(sw, lo_k, hi_k)
            key = jnp.stack([new_lo, new_hi], axis=2).reshape(R, W)
            new_vals = []
            for v in vals:
                vsh = v.reshape(R, nb, 2, j)
                lo_v, hi_v = vsh[:, :, 0, :], vsh[:, :, 1, :]
                nlo = jnp.where(sw, hi_v, lo_v)
                nhi = jnp.where(sw, lo_v, hi_v)
                new_vals.append(
                    jnp.stack([nlo, nhi], axis=2).reshape(R, W))
            vals = tuple(new_vals)
            j //= 2
        k *= 2
    return key, vals
