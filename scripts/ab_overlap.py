"""A/B: ``needset`` vs ``needset_overlap`` at bench-scale shapes on the
8-device virtual CPU mesh (round-5, VERDICT r4 item 6).

Measures the PURE jitted SPMD step via ``mesh_stream.last_exec`` — the
same compiled executable re-invoked, so neither host planning nor
compilation pollutes the A/B — and dumps a schedule artifact: the
optimized-HLO op sequence of the overlap step, showing where the
``collective-permute`` ops sit relative to the round-group compute
(sorts). On a real TPU slice the async start/done pairs would bracket
round-0 compute; on the CPU backend collectives execute synchronously,
so the artifact demonstrates the STRUCTURAL independence (round-0
compute ops scheduled before later permutes) and the timing numbers
decide whether the grouping pays for its padding overhead.

Usage: python scripts/ab_overlap.py [m] [iters]
Writes artifacts/overlap_ab.md + artifacts/overlap_hlo_sched.txt.
"""

import os
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  "/tmp/speck_tpu_test_jax_cache")
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from speck_tpu.formats.csr import HostCSR  # noqa: E402
from speck_tpu.parallel import (make_row_mesh,  # noqa: E402
                                mesh_stream_spgemm)
from speck_tpu.parallel import mesh_stream  # noqa: E402
from speck_tpu.utils.config import SpgemmConfig  # noqa: E402


def make_powerlaw(m, avg=8, alpha=2.2, seed=5):
    import scipy.sparse as sp

    rs = np.random.RandomState(seed)
    lens = np.minimum((rs.pareto(alpha, m) + 1) * avg * 0.5,
                      m // 4).astype(np.int64)
    rows = np.repeat(np.arange(m), lens)
    cols = rs.randint(0, m, rows.shape[0])
    vals = rs.standard_normal(rows.shape[0])
    mat = sp.csr_matrix((vals, (rows, cols)), shape=(m, m))
    mat.sum_duplicates()
    return HostCSR.from_scipy(mat)


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    a = make_powerlaw(m)
    mesh = make_row_mesh(8)
    cfg = SpgemmConfig(mesh_exchange_auto=False)
    results = {}
    hlo_sched = None
    for mode in ("needset", "needset_overlap"):
        t0 = time.time()
        out = mesh_stream_spgemm(a, a, mesh, cfg=cfg, exchange=mode)
        jax.block_until_ready(out[0])
        first = time.time() - t0
        fn, args = mesh_stream.last_exec()
        times = []
        for _ in range(iters):
            t0 = time.time()
            r = fn(*args)
            jax.block_until_ready(r)
            times.append(time.time() - t0)
        results[mode] = dict(first_s=first, step_s=min(times),
                             all_s=times,
                             nnz=int(np.asarray(out[0]).sum()))
        print(f"{mode}: first {first:.2f}s, warm step "
              f"{min(times)*1e3:.1f} ms (all: "
              f"{[f'{t*1e3:.0f}' for t in times]})", flush=True)
        if mode == "needset_overlap":
            txt = fn.lower(*args).compile().as_text()
            lines = txt.splitlines()
            sched = [(i, ln.strip()[:140]) for i, ln in enumerate(lines)
                     if ("collective-permute" in ln or "sort(" in ln
                         or " sort." in ln)]
            hlo_sched = sched
            first_perm = next((i for i, ln in sched
                               if "collective-permute" in ln), None)
            sorts_before = sum(1 for i, ln in sched
                               if "sort" in ln and first_perm is not None
                               and i < first_perm)
            results[mode]["hlo_sorts_before_first_permute"] = sorts_before
            results[mode]["hlo_n_permutes"] = sum(
                1 for _, ln in sched if "collective-permute" in ln)

    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/overlap_hlo_sched.txt", "w") as fh:
        fh.write("# optimized-HLO op order (line no, op) for the "
                 "needset_overlap step:\n# collective-permute + sort "
                 "ops only — shows round-group compute interleaved "
                 "with the exchange rounds\n")
        for i, ln in (hlo_sched or []):
            fh.write(f"{i:6d}  {ln}\n")
    ns, ov = results["needset"], results["needset_overlap"]
    with open("artifacts/overlap_ab.md", "w") as fh:
        fh.write(
            "# needset vs needset_overlap A/B (8-device virtual CPU "
            f"mesh, power-law m={m})\n\n"
            f"| mode | warm step (min of {iters}) |\n|---|---|\n"
            f"| needset | {ns['step_s']*1e3:.1f} ms |\n"
            f"| needset_overlap | {ov['step_s']*1e3:.1f} ms |\n\n"
            f"overlap/needset ratio: "
            f"{ov['step_s']/ns['step_s']:.3f}\n\n"
            f"HLO schedule artifact: overlap_hlo_sched.txt — "
            f"{ov.get('hlo_n_permutes', 0)} collective-permutes, "
            f"{ov.get('hlo_sorts_before_first_permute', 0)} sort ops "
            "scheduled BEFORE the first permute (round-0 compute has "
            "no dependence on any exchange round).\n\n"
            "CPU collectives run synchronously, so wall-clock overlap "
            "is only realizable on a real slice; the structural "
            "independence above is what enables it there.\n")
    print("wrote artifacts/overlap_ab.md, artifacts/overlap_hlo_sched.txt")


if __name__ == "__main__":
    main()
