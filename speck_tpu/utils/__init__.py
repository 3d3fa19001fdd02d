from .config import Config, SpgemmConfig
from .timings import Timings
from .compare import compare_csr
from .oracle import oracle_spgemm

__all__ = ["Config", "SpgemmConfig", "Timings", "compare_csr", "oracle_spgemm"]
