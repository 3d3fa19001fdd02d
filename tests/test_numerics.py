"""Condition-aware numeric validation: |C_got - C_ref| must be bounded by
the f32 accumulation error bound eps * K * (|A| @ |B|) elementwise. Unlike a
relative tolerance, this distinguishes genuine cancellation (allowed) from
missing/duplicated products (a real bug of any magnitude)."""

import numpy as np
import pytest

from conftest import random_host_csr
from speck_tpu import device_get_csr, device_put_csr, spgemm, oracle_spgemm, compare_csr
from speck_tpu.utils.config import SpgemmConfig

_CFG = SpgemmConfig(product_budget=1 << 14)


@pytest.mark.parametrize("case", range(8))
def test_error_within_accumulation_bound(rng, case):
    m, k, n = rng.integers(20, 120, size=3)
    density = float(rng.uniform(0.02, 0.5))
    a = random_host_csr(rng, int(m), int(k), density)
    b = random_host_csr(rng, int(k), int(n), density)

    ref = oracle_spgemm(a, b)
    got = device_get_csr(spgemm(device_put_csr(a), device_put_csr(b), _CFG))
    assert compare_csr(ref, got).ok  # structure exact

    absA = a.to_scipy().copy()
    absA.data = np.abs(absA.data)
    absB = b.to_scipy().copy()
    absB.data = np.abs(absB.data)
    bound_mat = (absA @ absB).tocsr()
    bound_mat.sort_indices()
    # same structure as ref (products of abs values can't cancel)
    np.testing.assert_array_equal(bound_mat.indices, ref.col_ids)

    eps = np.finfo(np.float32).eps
    max_terms = int(np.diff(a.row_offsets).max(initial=1))
    err = np.abs(got.data.astype(np.float64) - ref.data)
    allowed = eps * (8 + 2 * max_terms) * bound_mat.data + 1e-30
    bad = err > allowed
    assert not bad.any(), (
        f"{bad.sum()} entries exceed accumulation bound; worst ratio "
        f"{(err / allowed).max():.2f}"
    )


def test_owner_fill_matches_numpy_reference(rng):
    """Unit test of ops/esc.py _owner_fill: payload of product slot t must
    be the payload of the last live A slot with start e <= t, across empty
    B rows (dead slots), rows with no live slots, and full-cap rows."""
    import jax.numpy as jnp
    from speck_tpu.ops.esc import _owner_fill

    cap = 32
    R = 12
    live = rng.random((R, cap)) < 0.4
    live[3] = False                       # row with no live slots
    live[5] = True                        # fully live row
    # strictly increasing starts among live slots, gaps for dead slots
    blen = np.where(live, rng.integers(1, 4, (R, cap)), 0)
    e = np.cumsum(blen, axis=1) - blen
    ops = blen.sum(axis=1)
    pay1 = rng.integers(0, 1 << 20, (R, cap)).astype(np.int32)
    pay2 = rng.integers(0, 1 << 20, (R, cap)).astype(np.int32)

    got1, got2 = _owner_fill(
        jnp.asarray(live), jnp.asarray(e, jnp.int32),
        (jnp.asarray(pay1), jnp.asarray(pay2)), cap,
    )
    got1, got2 = np.asarray(got1), np.asarray(got2)

    for r in range(R):
        for t in range(min(int(ops[r]), cap)):
            owners = [j for j in range(cap) if live[r, j] and e[r, j] <= t]
            j = owners[-1]
            assert got1[r, t] == pay1[r, j], (r, t)
            assert got2[r, t] == pay2[r, j], (r, t)
