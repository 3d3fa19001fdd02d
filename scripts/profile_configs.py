#!/usr/bin/env python
"""Per-stage on-chip profile of the bench configs (round-2 perf work).

Usage: python scripts/profile_configs.py [config names...]
Names: banded, mixed, powerlaw2, powerlaw3, rect. Default: banded powerlaw2.
"""

import sys
import time

import numpy as np


def run(name, a, b, iters=3):
    from speck_tpu import device_put_csr, spgemm
    from speck_tpu.utils.timings import Timings

    A = device_put_csr(a, np.float32)
    B = A if (b is a or b is None) else device_put_csr(b, np.float32)
    # warmup (compiles)
    t = Timings()
    t.measure_all = True
    t.measure_complete = True
    C = spgemm(A, B, timings=t)
    float(C.data[-1])
    acc = Timings()
    acc.measure_all = True
    acc.measure_complete = True
    for _ in range(iters):
        C = spgemm(A, B, timings=acc)
        float(C.data[-1])
    acc /= iters
    print(f"== {name}: nnz(C)={C.nnz}")
    for k, v in acc.ms.items():
        if v > 0.05:
            print(f"   {k:22s} {v:9.1f} ms")
    sys.stdout.flush()
    return acc


def main():
    sys.path.insert(0, ".")
    from bench import make_banded, make_mixed, make_powerlaw

    want = sys.argv[1:] or ["banded", "powerlaw2"]
    if "banded" in want:
        a = make_banded()
        run("config1 banded 65k", a, a)
    if "mixed" in want:
        a = make_mixed()
        run("config1b mixed", a, a)
    if "powerlaw2" in want:
        a = make_powerlaw(131072)
        run("config2 powerlaw 131k", a, a)
    if "powerlaw3" in want:
        a = make_powerlaw(262144, seed=7)
        run("config3 powerlaw 262k", a, a)
    if "rect" in want:
        from bench import make_prolongation

        a = make_banded()
        run("config4 rect 65kx16k", a, make_prolongation(65536, 16384))
    if "stencil" in want:
        from bench import make_stencil27

        run("stencil27 1.06M rows", make_stencil27(), None, iters=2)
    if "giant" in want:
        import scipy.sparse as sp
        from speck_tpu.formats.csr import HostCSR

        mg = 40000
        rsg = np.random.RandomState(17)
        NH, HN = 5000, 10000
        hrow = np.repeat(np.arange(10000, 10000 + NH), HN)
        hcol = ((np.tile(np.arange(HN), NH)
                 + np.repeat(np.arange(NH) * 37, HN)) % 10000) + 25000
        lr = np.repeat(np.arange(1, 5000), 16)
        lc = rsg.randint(1, 5000, lr.shape[0])
        gm = sp.csr_matrix(
            (rsg.standard_normal(NH + hrow.shape[0] + lr.shape[0]),
             (np.concatenate([np.zeros(NH, int), hrow, lr]),
              np.concatenate([np.arange(10000, 10000 + NH), hcol, lc]))),
            shape=(mg, mg))
        gm.sum_duplicates()
        run("giant 5e7-product row", HostCSR.from_scipy(gm), None, iters=1)


if __name__ == "__main__":
    main()
