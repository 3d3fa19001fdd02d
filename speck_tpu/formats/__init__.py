from .csr import HostCSR, HostCOO, coo_to_csr, csr_transpose
from .mtx import load_mtx
from .hicsr import load_hicsr, store_hicsr
from .loader import DataLoader, load_matrix

__all__ = [
    "HostCSR", "HostCOO", "coo_to_csr", "csr_transpose",
    "load_mtx", "load_hicsr", "store_hicsr", "DataLoader", "load_matrix",
]
