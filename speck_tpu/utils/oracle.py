"""Reference SpGEMM oracle for differential validation.

Replaces the reference's cuSPARSE oracle (CuSparseTest<T>::Multiply,
/root/reference/externals/cusparse/source/cuSparseMultiply.cu:46-127) with
scipy.sparse on the host (SURVEY.md §4): exact structure after sorting,
values in fp64.
"""

from __future__ import annotations

import numpy as np

from ..formats.csr import HostCSR


def oracle_spgemm(a: HostCSR, b: HostCSR, dtype=np.float64) -> HostCSR:
    """C = A @ B computed on the host in float64 via scipy.sparse.

    Explicit zeros arising from cancellation are *kept* (the structural
    result is the set of (row, col) pairs with at least one contributing
    product, matching spECK's symbolic counting semantics, Multiply.cu
    stage 7)."""
    try:
        import scipy.sparse as sp
    except ImportError:
        return _numpy_oracle(a, b, dtype)

    A = sp.csr_matrix(
        (a.data.astype(np.float64), a.col_ids.astype(np.int64), a.row_offsets.astype(np.int64)),
        shape=a.shape,
    )
    B = sp.csr_matrix(
        (b.data.astype(np.float64), b.col_ids.astype(np.int64), b.row_offsets.astype(np.int64)),
        shape=b.shape,
    )
    # scipy csr_matmat PRUNES entries whose products cancel to exactly 0.0,
    # but the structural result must keep them (spECK's symbolic counting
    # is value-independent, Multiply.cu stage 7; cuSPARSE likewise). Build
    # the structure from a pattern product (all-positive values -> no
    # cancellation possible), then graft the numeric values in.
    Ap = A.copy()
    Ap.data = np.ones_like(Ap.data)
    Bp = B.copy()
    Bp.data = np.ones_like(Bp.data)
    P = Ap @ Bp
    P.sort_indices()
    C = A @ B
    C.sort_indices()
    data = np.zeros(P.nnz, dtype=np.float64)
    if C.nnz:
        n64 = np.int64(P.shape[1]) + 1
        rows_p = np.repeat(
            np.arange(P.shape[0], dtype=np.int64), np.diff(P.indptr)
        )
        rows_c = np.repeat(
            np.arange(C.shape[0], dtype=np.int64), np.diff(C.indptr)
        )
        keys_p = rows_p * n64 + P.indices
        keys_c = rows_c * n64 + C.indices
        pos = np.searchsorted(keys_p, keys_c)
        data[pos] = C.data
    return HostCSR(
        rows=int(P.shape[0]),
        cols=int(P.shape[1]),
        row_offsets=np.asarray(P.indptr, dtype=np.int64),
        col_ids=np.asarray(P.indices, dtype=np.int64),
        data=data.astype(dtype),
    )


def _numpy_oracle(a: HostCSR, b: HostCSR, dtype=np.float64) -> HostCSR:
    """Pure-numpy fallback oracle (slow; per-row accumulate into dict)."""
    offs = [0]
    cols_out = []
    vals_out = []
    for r in range(a.rows):
        acc = {}
        for p in range(a.row_offsets[r], a.row_offsets[r + 1]):
            k = int(a.col_ids[p])
            av = float(a.data[p])
            for q in range(b.row_offsets[k], b.row_offsets[k + 1]):
                c = int(b.col_ids[q])
                acc[c] = acc.get(c, 0.0) + av * float(b.data[q])
        ks = sorted(acc)
        cols_out.extend(ks)
        vals_out.extend(acc[k] for k in ks)
        offs.append(len(cols_out))
    return HostCSR(
        rows=a.rows,
        cols=b.cols,
        row_offsets=np.asarray(offs, dtype=np.int64),
        col_ids=np.asarray(cols_out, dtype=np.int64),
        data=np.asarray(vals_out, dtype=dtype),
    )
