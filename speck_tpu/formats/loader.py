"""Matrix loading with binary caching and the A/B pairing rule.

Parity with DataLoader<T> (/root/reference/source/DataLoader.cpp:23-75):
  - cache path = ``<path><ext>.hicsr`` where ext is "d_" for float64 and ""
    for float32 (DataLoader.cpp:9-18,26);
  - on cache miss: parse .mtx -> COO -> sort-convert -> CSR, write cache;
  - B = A when A is square, else B = A^T (DataLoader.cpp:60-74).
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from .csr import HostCSR, coo_to_csr, csr_transpose
from .hicsr import load_hicsr, store_hicsr
from .mtx import load_mtx


def _cache_path(path: str, dtype) -> str:
    ext = "d_" if np.dtype(dtype).itemsize == 8 else ""
    return path + ext + ".hicsr"


def load_matrix(path: str, dtype=np.float64, use_cache: bool = True, verbose: bool = False) -> HostCSR:
    """Load a matrix from .mtx (or its .hicsr cache) into a HostCSR."""
    cache = _cache_path(path, dtype)
    if use_cache and os.path.exists(cache):
        try:
            # stale-cache guard (beyond the reference, which trusts any
            # existing cache unconditionally, DataLoader.cpp:26-59): a
            # rewritten .mtx must not serve yesterday's matrix
            if (os.path.exists(path)
                    and os.path.getmtime(cache) < os.path.getmtime(path)):
                raise OSError("cache older than source .mtx")
            if verbose:
                print(f'trying to load csr file "{cache}"')
            return load_hicsr(cache, dtype=dtype)
        except Exception as ex:  # corrupted/mismatched cache -> reparse
            if verbose:
                print(f"could not load csr file:\n\t{ex}")
    if verbose:
        print(f'trying to load mtx file "{path}"')
    coo = load_mtx(path, dtype=dtype)
    csr = coo_to_csr(coo)
    if use_cache:
        try:
            store_hicsr(cache, csr)
        except Exception as ex:
            if verbose:
                print(f"could not write csr cache: {ex}")
    return csr


@dataclasses.dataclass
class DataLoader:
    """Loads A (cached) and derives B: B = A if square else A^T."""

    cpuA: HostCSR
    cpuB: HostCSR

    def __init__(self, path: str, dtype=np.float64, use_cache: bool = True, verbose: bool = False):
        self.cpuA = load_matrix(path, dtype=dtype, use_cache=use_cache, verbose=verbose)
        if self.cpuA.rows != self.cpuA.cols:
            self.cpuB = csr_transpose(self.cpuA)
        else:
            self.cpuB = self.cpuA
