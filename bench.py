#!/usr/bin/env python
"""Benchmark: C = A @ A on a synthetic FEM-like banded matrix (the shape
class of BASELINE.md config 1, cant.mtx-like: ~65K rows, ~33 nnz/row) on the
default device (TPU under the driver).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
value = GFLOPS (2 * sum_products / time, the reference's derived metric,
BASELINE.md); vs_baseline = speedup over scipy.sparse csr_matmat on this
host (the oracle backend standing in for the reference's cuSPARSE compare
path — the repo publishes no GPU numbers, BASELINE.json "published": {}).
"""

import json
import sys
import time

import numpy as np


def make_banded(n=65536, half_band=16, seed=3):
    import scipy.sparse as sp

    rs = np.random.RandomState(seed)
    offs = list(range(-half_band, half_band + 1))
    mat = sp.diags(
        [rs.standard_normal(n - abs(o)) for o in offs], offs,
        shape=(n, n), format="csr",
    )
    from speck_tpu.formats.csr import HostCSR

    return HostCSR.from_scipy(mat)


def main():
    import jax
    import jax.numpy as jnp

    from speck_tpu import device_put_csr, spgemm
    from speck_tpu.ops.analysis import analyze

    # warm the device->host channel: the first fetch in a process costs
    # ~99 s through the axon tunnel, later fetches ~27 ms
    int(jnp.sum(jnp.arange(8)))

    a = make_banded()
    # host baseline (scipy, float64)
    S = a.to_scipy()
    t0 = time.perf_counter()
    C_ref = S @ S
    scipy_s = time.perf_counter() - t0

    A = device_put_csr(a, np.float32)
    stats = analyze(A, A)
    sum_products = float(stats.sum_products)

    import numpy as _np

    def run_one():
        C = spgemm(A, A)
        # force true completion: block_until_ready is ack-at-enqueue through
        # the axon tunnel; only a real D2H fetch waits for the data
        float(C.data[-1])
        return C

    warmup, iters = 2, 3
    for _ in range(warmup):
        C = run_one()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        C = run_one()
        times.append(time.perf_counter() - t0)
    mean_s = sum(times) / len(times)

    assert C.nnz == C_ref.nnz, f"nnz mismatch: {C.nnz} vs {C_ref.nnz}"

    gflops = 2.0 * sum_products / mean_s / 1e9
    result = {
        "metric": "spgemm_banded_65k_AxA_gflops",
        "value": round(gflops, 3),
        "unit": "GFLOPS",
        "vs_baseline": round(scipy_s / mean_s, 3),
    }
    print(json.dumps(result))
    print(
        f"# mean {mean_s*1e3:.2f} ms over {iters} iters, nnz(C)={C.nnz}, "
        f"sum_products={sum_products:.3e}, scipy={scipy_s*1e3:.1f} ms",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
