"""Direct-copy fast path: rows of A with exactly one nonzero."""

import numpy as np
import scipy.sparse as sp

from conftest import random_host_csr
from speck_tpu import (
    compare_csr, device_get_csr, device_put_csr, oracle_spgemm, spgemm,
)
from speck_tpu.formats.csr import HostCSR
from speck_tpu.ops.device_csr import is_canonical_host
from speck_tpu.utils.config import SpgemmConfig

_CFG = SpgemmConfig(product_budget=1 << 14)


def test_is_canonical_host():
    assert is_canonical_host(np.array([0, 2, 4]), np.array([0, 3, 1, 2]))
    assert not is_canonical_host(np.array([0, 2]), np.array([3, 0]))
    assert not is_canonical_host(np.array([0, 2]), np.array([1, 1]))  # dup
    assert is_canonical_host(np.array([0, 0, 1]), np.array([5]))
    assert is_canonical_host(np.array([0, 0]), np.zeros(0, int))


def _permutation_like(rng, m):
    """A = permutation matrix: every row has exactly one nonzero."""
    perm = rng.permutation(m)
    return HostCSR(
        rows=m, cols=m,
        row_offsets=np.arange(m + 1, dtype=np.uint32),
        col_ids=perm.astype(np.uint32),
        data=rng.standard_normal(m) + 2.0,
    )


def test_all_direct_rows(rng):
    a = _permutation_like(rng, 50)
    b = random_host_csr(rng, 50, 60, 0.2)
    A, B = device_put_csr(a), device_put_csr(b)
    assert B.canonical
    ref = oracle_spgemm(a, b)
    got = device_get_csr(spgemm(A, B, _CFG))
    assert compare_csr(ref, got, compare_data=True, rel_tol=2e-3).ok


def test_mixed_direct_and_general(rng):
    m = 80
    # half the rows have 1 nnz, half have many
    rows, cols, vals = [], [], []
    for r in range(m):
        k = 1 if r % 2 == 0 else int(rng.integers(2, 12))
        c = rng.choice(m, k, replace=False)
        rows.extend([r] * k)
        cols.extend(c)
        vals.extend(rng.standard_normal(k))
    a = HostCSR.from_scipy(sp.csr_matrix((vals, (rows, cols)), shape=(m, m)))
    ref = oracle_spgemm(a, a)
    got = device_get_csr(spgemm(device_put_csr(a), device_put_csr(a), _CFG))
    r = compare_csr(ref, got, compare_data=True, rel_tol=2e-3)
    assert r.ok, r.message


def test_direct_disabled_for_noncanonical_b(rng):
    # B with duplicate columns in a row: direct path must not engage; the
    # general path merges duplicates
    a = HostCSR(
        rows=2, cols=2,
        row_offsets=np.array([0, 1, 2], np.uint32),
        col_ids=np.array([0, 1], np.uint32),
        data=np.array([2.0, 3.0]),
    )
    b = HostCSR(
        rows=2, cols=3,
        row_offsets=np.array([0, 3, 4], np.uint32),
        col_ids=np.array([1, 1, 2, 0], np.uint32),  # dup col 1 in row 0
        data=np.array([1.0, 4.0, 2.0, 5.0]),
    )
    B = device_put_csr(b)
    assert not B.canonical
    ref = oracle_spgemm(a, b)
    got = device_get_csr(spgemm(device_put_csr(a), B, _CFG))
    r = compare_csr(ref, got, compare_data=True, rel_tol=1e-5)
    assert r.ok, r.message
    assert got.row_offsets[1] == 2  # dup merged: row 0 = {1, 2}


def test_direct_with_empty_b_rows(rng):
    # single-nnz A rows pointing at empty B rows -> empty C rows (ops==0)
    a = HostCSR(
        rows=3, cols=3,
        row_offsets=np.array([0, 1, 2, 3], np.uint32),
        col_ids=np.array([0, 1, 2], np.uint32),
        data=np.ones(3),
    )
    b = HostCSR(
        rows=3, cols=3,
        row_offsets=np.array([0, 0, 2, 2], np.uint32),  # rows 0,2 empty
        col_ids=np.array([0, 2], np.uint32),
        data=np.array([1.0, 2.0]),
    )
    ref = oracle_spgemm(a, b)
    got = device_get_csr(spgemm(device_put_csr(a), device_put_csr(b), _CFG))
    assert compare_csr(ref, got, compare_data=True, rel_tol=1e-5).ok
    assert got.nnz == 2


def test_direct_long_copy(rng):
    # one A row with a single nnz pointing at a very long B row (> min cap)
    m = 40
    a = HostCSR(
        rows=2, cols=m,
        row_offsets=np.array([0, 1, 2], np.uint32),
        col_ids=np.array([0, 1], np.uint32),
        data=np.array([3.0, -1.0]),
    )
    b = random_host_csr(rng, m, 600, 0.6)  # long copy rows
    ref = oracle_spgemm(a, b)
    got = device_get_csr(spgemm(device_put_csr(a), device_put_csr(b), _CFG))
    assert compare_csr(ref, got, compare_data=True, rel_tol=2e-3).ok
