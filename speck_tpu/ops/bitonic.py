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


def _network(key, vals):
    """The compare-exchange stages on in-register/VMEM arrays (shared by
    the jnp form and the Pallas kernel body)."""
    R, W = key.shape
    k = 2
    while k <= W:
        j = k // 2
        while j >= 1:
            nb = W // (2 * j)
            ksh = key.reshape(R, nb, 2, j)
            lo_k, hi_k = ksh[:, :, 0, :], ksh[:, :, 1, :]
            bstart = jnp.arange(nb, dtype=jnp.int32) * (2 * j)
            asc = ((bstart & k) == 0)[None, :, None]
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


def bitonic_sort_pairs(key: jax.Array, vals: Sequence[jax.Array],
                       ) -> Tuple[jax.Array, Tuple[jax.Array, ...]]:
    """Sort each row of ``key`` (R, W) ascending, permuting every array
    in ``vals`` identically. W must be a power of two. Pure jnp — every
    stage is an XLA map over HBM."""
    R, W = key.shape
    if not _is_pow2(W):
        raise ValueError(f"bitonic width {W} is not a power of two")
    return _network(key, tuple(vals))


def _merge_runs(key, vals, run: int):
    """One merge round: consecutive ASCENDING runs of length ``run`` are
    merged pairwise into ascending runs of length 2*run. The second run
    of each pair is reversed (making each 2*run block bitonic), then
    log2(2*run) halving compare-exchange stages clean up — all
    elementwise mins/maxes over aligned slices."""
    R, W = key.shape
    L = run
    nb = W // (2 * L)

    def flip(x):
        xs = x.reshape(R, nb, 2, L)
        return jnp.concatenate(
            [xs[:, :, :1, :], xs[:, :, 1:, ::-1]], axis=2).reshape(R, W)

    key = flip(key)
    vals = tuple(flip(v) for v in vals)
    j = L
    while j >= 1:
        nbj = W // (2 * j)
        ksh = key.reshape(R, nbj, 2, j)
        lo_k, hi_k = ksh[:, :, 0, :], ksh[:, :, 1, :]
        sw = lo_k > hi_k
        key = jnp.stack([jnp.where(sw, hi_k, lo_k),
                         jnp.where(sw, lo_k, hi_k)], axis=2).reshape(R, W)
        new_vals = []
        for v in vals:
            vsh = v.reshape(R, nbj, 2, j)
            lo_v, hi_v = vsh[:, :, 0, :], vsh[:, :, 1, :]
            new_vals.append(jnp.stack(
                [jnp.where(sw, hi_v, lo_v), jnp.where(sw, lo_v, hi_v)],
                axis=2).reshape(R, W))
        vals = tuple(new_vals)
        j //= 2
    return key, vals


def blocked_sort_pairs(key: jax.Array, vals: Sequence[jax.Array],
                       block: int = 8192,
                       ) -> Tuple[jax.Array, Tuple[jax.Array, ...]]:
    """Sort each row of ``key`` (R, W) ascending by sorting width-``block``
    sub-rows with `jax.lax.sort` (fast: XLA's sort lowering is
    compute-bound but competitive at small widths) and then bitonic-MERGING
    the sorted runs pairwise up to the full width. Total merge work is
    O(W log(W/block)·log W) elementwise selects — vs XLA's wide sort whose
    measured per-element cost grows steeply past W=8192 (the round-3
    giant-row chunks paid ~9x per-element at W=65536, BASELINE.md).

    W and block must be powers of two. NOT stable (bitonic merges aren't),
    so only valid for single-key sorts whose key fully orders the payload
    intent — every stream use packs (rid, col) into one key."""
    R, W = key.shape
    vals = tuple(vals)
    if not _is_pow2(W):
        raise ValueError(f"blocked sort width {W} is not a power of two")
    block = min(block, W)
    if W == block:
        out = jax.lax.sort((key,) + vals, dimension=1, num_keys=1)
        return out[0], tuple(out[1:])
    nb = W // block
    out = jax.lax.sort(
        tuple(x.reshape(R * nb, block) for x in (key,) + vals),
        dimension=1, num_keys=1)
    key = out[0].reshape(R, W)
    vals = tuple(v.reshape(R, W) for v in out[1:])
    run = block
    while run < W:
        key, vals = _merge_runs(key, vals, run)
        run *= 2
    return key, vals


def pallas_supported(R: int, W: int) -> bool:
    """VMEM budget gate for the Pallas kernel: one (RB, W) block of
    key + vals in and out must fit comfortably."""
    return _is_pow2(W) and 128 <= W <= 65536 and R % _pallas_rb(W) == 0


def _pallas_rb(W: int) -> int:
    # ~2 MiB of VMEM for a 4-array working set at W=8192
    return max(1, min(8, (1 << 16) // W * 8))


def bitonic_sort_pairs_pallas(
        key: jax.Array, vals: Sequence[jax.Array],
        interpret: bool | None = None,
) -> Tuple[jax.Array, Tuple[jax.Array, ...]]:
    """The same network as ONE Pallas kernel per (RB, W) block: a single
    HBM read + write instead of ~log2(W)^2/2 map stages. Falls back to
    the jnp form when the shape is unsupported."""
    from jax.experimental import pallas as pl

    R, W = key.shape
    vals = tuple(vals)
    if not pallas_supported(R, W):
        return bitonic_sort_pairs(key, vals)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    RB = _pallas_rb(W)
    n_vals = len(vals)

    def kernel(*refs):
        in_refs, out_refs = refs[: 1 + n_vals], refs[1 + n_vals:]
        k = in_refs[0][...]
        vs = tuple(r[...] for r in in_refs[1:])
        k, vs = _network(k, vs)
        out_refs[0][...] = k
        for r, v in zip(out_refs[1:], vs):
            r[...] = v

    spec = pl.BlockSpec((RB, W), lambda i: (i, 0))
    out_shape = [jax.ShapeDtypeStruct((R, W), key.dtype)] + [
        jax.ShapeDtypeStruct((R, W), v.dtype) for v in vals]
    outs = pl.pallas_call(
        kernel,
        grid=(R // RB,),
        in_specs=[spec] * (1 + n_vals),
        out_specs=[spec] * (1 + n_vals),
        out_shape=out_shape,
        interpret=interpret,
    )(key, *vals)
    return outs[0], tuple(outs[1:])
