"""Multi-device SpGEMM on the 8-virtual-device CPU mesh (SURVEY.md §4:
partition logic testable without a pod)."""

import jax
import numpy as np
import pytest

from conftest import random_host_csr
from speck_tpu.parallel import (
    distributed_spgemm,
    make_row_mesh,
    mesh_spgemm_fixed_cap,
    partition_rows,
)
from speck_tpu.parallel.dist import padded_to_host_csr, stack_row_shards
from speck_tpu.utils.compare import compare_csr
from speck_tpu.utils.config import SpgemmConfig
from speck_tpu.utils.oracle import oracle_spgemm


def test_partition_rows():
    assert partition_rows(10, 4) == [(0, 3), (3, 6), (6, 8), (8, 10)]
    assert partition_rows(3, 8)[-1] == (3, 3)


def test_stack_row_shards_identity_layout(rng):
    a = random_host_csr(rng, 13, 9, 0.3)
    indptr, indices, data, ranges = stack_row_shards(a, 4)
    m_loc = indptr.shape[1] - 1
    assert m_loc == 4  # ceil(13/4)
    # global row k at shard k//m_loc, slot k%m_loc
    for k in [0, 3, 4, 12]:
        d, s = divmod(k, m_loc)
        ln = indptr[d, s + 1] - indptr[d, s]
        assert ln == a.row_offsets[k + 1] - a.row_offsets[k]
    # pad rows empty
    assert indptr[3, 2] == indptr[3, 1]


@pytest.mark.parametrize("n_dev", [2, 8])
def test_distributed_spgemm_matches_oracle(rng, n_dev):
    a = random_host_csr(rng, 70, 70, 0.1)
    ref = oracle_spgemm(a, a)
    sharded = distributed_spgemm(
        a, a, devices=jax.devices()[:n_dev],
        cfg=SpgemmConfig(product_budget=1 << 14),
    )
    got = sharded.to_host()
    assert compare_csr(ref, got).ok
    assert compare_csr(ref, got, compare_data=True, rel_tol=2e-3).ok


def test_mesh_spgemm_fixed_cap_matches_oracle(rng):
    mesh = make_row_mesh(8)
    a = random_host_csr(rng, 50, 50, 0.12)
    b = random_host_csr(rng, 50, 40, 0.15)
    counts, cols, vals = mesh_spgemm_fixed_cap(a, b, mesh)
    got = padded_to_host_csr(counts, cols, vals, a.rows, b.cols)
    ref = oracle_spgemm(a, b)
    r = compare_csr(ref, got, compare_data=True, rel_tol=2e-3)
    assert r.ok, r.message


def test_mesh_spgemm_uneven_rows(rng):
    mesh = make_row_mesh(8)
    a = random_host_csr(rng, 37, 41, 0.2)   # 37 rows over 8 devices
    b = random_host_csr(rng, 41, 23, 0.2)
    counts, cols, vals = mesh_spgemm_fixed_cap(a, b, mesh)
    got = padded_to_host_csr(counts, cols, vals, a.rows, b.cols)
    ref = oracle_spgemm(a, b)
    r = compare_csr(ref, got, compare_data=True, rel_tol=2e-3)
    assert r.ok, r.message


def test_mesh_spgemm_empty_matrix():
    from speck_tpu.formats.csr import HostCSR

    mesh = make_row_mesh(4)
    a = HostCSR(6, 6, np.zeros(7, np.uint32), np.zeros(0, np.uint32), np.zeros(0))
    counts, cols, vals = mesh_spgemm_fixed_cap(a, a, mesh)
    got = padded_to_host_csr(counts, cols, vals, 6, 6)
    assert got.nnz == 0


def test_multihost_helpers_single_process():
    from speck_tpu.parallel import global_row_mesh, local_row_range

    mesh = global_row_mesh()
    assert mesh.devices.size >= 1
    r0, r1 = local_row_range(100)
    assert (r0, r1) == (0, 100)  # single-process CI owns everything


# ---------------------------------------------------------------------------
# Mesh stream path (ops/stream.py inside shard_map)
# ---------------------------------------------------------------------------

def _powerlaw_host(rng, m=512, avg=6):
    """Skewed row lengths: the shape class the fixed-cap path exploded on
    (one wide row inflated every row's rectangle)."""
    import scipy.sparse as sp
    from speck_tpu.formats.csr import HostCSR

    lens = np.minimum(((rng.pareto(1.8, m) + 1) * avg * 0.5).astype(int),
                      m // 2)
    lens[0] = m // 2  # one hot row
    rows = np.repeat(np.arange(m), lens)
    cols = rng.integers(0, m, rows.shape[0])
    vals = rng.standard_normal(rows.shape[0])
    mat = sp.csr_matrix((vals, (rows, cols)), shape=(m, m))
    mat.sum_duplicates()
    return HostCSR.from_scipy(mat)


@pytest.mark.parametrize("exchange", ["allgather", "needset"])
def test_mesh_stream_powerlaw(rng, exchange):
    from speck_tpu.parallel import (make_row_mesh, mesh_stream_spgemm,
                                    mesh_stream_to_host_csr)

    a = _powerlaw_host(rng)
    mesh = make_row_mesh(8)
    nnz_row, cols, vals, meta = mesh_stream_spgemm(
        a, a, mesh, exchange=exchange)
    got = mesh_stream_to_host_csr(nnz_row, cols, vals, meta)
    ref = oracle_spgemm(a, a)
    r = compare_csr(ref, got, compare_data=True, rel_tol=2e-3)
    assert r.ok, r.message
    if exchange == "needset":
        st = meta["stats"]
        assert st is not None and st.reduction > 0
        # every pair's true need is below the full-B volume
        assert st.pairs_nnz.sum() <= a.nnz * 8


def test_mesh_stream_needset_reduction_on_block_structure(rng):
    """Block-diagonal A: each shard only needs its own B block, so the
    need-set exchange moves ~1/D of what all_gather replicates."""
    import scipy.sparse as sp
    from speck_tpu.formats.csr import HostCSR
    from speck_tpu.parallel import (make_row_mesh, mesh_stream_spgemm,
                                    mesh_stream_to_host_csr)

    D, blk = 8, 48
    m = D * blk
    blocks = []
    for d in range(D):
        bmat = sp.random(blk, blk, 0.2, format="csr",
                         random_state=np.random.RandomState(d + 1))
        bmat.data = rng.standard_normal(bmat.nnz) + 1.0
        blocks.append(bmat)
    a = HostCSR.from_scipy(sp.block_diag(blocks, format="csr"))
    mesh = make_row_mesh(8)
    nnz_row, cols, vals, meta = mesh_stream_spgemm(
        a, a, mesh, exchange="needset")
    got = mesh_stream_to_host_csr(nnz_row, cols, vals, meta)
    ref = oracle_spgemm(a, a)
    assert compare_csr(ref, got, compare_data=True, rel_tol=2e-3).ok
    st = meta["stats"]
    # off-diagonal pairs exchange nothing
    offdiag = st.pairs_nnz.sum() - np.trace(st.pairs_nnz)
    assert offdiag == 0
    assert st.reduction > 2  # far less than full replication


def test_mesh_stream_rectangular(rng):
    from speck_tpu.parallel import (make_row_mesh, mesh_stream_spgemm,
                                    mesh_stream_to_host_csr)

    a = random_host_csr(rng, 70, 50, 0.15)
    b = random_host_csr(rng, 50, 90, 0.15)
    mesh = make_row_mesh(4)
    nnz_row, cols, vals, meta = mesh_stream_spgemm(
        a, b, mesh, exchange="needset")
    got = mesh_stream_to_host_csr(nnz_row, cols, vals, meta)
    ref = oracle_spgemm(a, b)
    assert compare_csr(ref, got, compare_data=True, rel_tol=2e-3).ok


def test_multihost_spgemm_single_process(rng):
    """multihost_spgemm degenerates to the global-mesh stream step under
    one process; validates vs the oracle on the 8-device virtual mesh."""
    from speck_tpu.parallel.multihost import (multihost_spgemm,
                                              scaling_efficiency)
    from speck_tpu.parallel import mesh_stream_to_host_csr

    a = random_host_csr(rng, 96, 96, 0.1)
    nnz_row, cols, vals, meta = multihost_spgemm(a, a)
    got = mesh_stream_to_host_csr(nnz_row, cols, vals, meta)
    ref = oracle_spgemm(a, a)
    assert compare_csr(ref, got, compare_data=True, rel_tol=2e-3).ok
    assert scaling_efficiency(8.0, 1.25, 8) == 0.8
