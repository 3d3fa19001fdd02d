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
