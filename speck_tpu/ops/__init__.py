from .device_csr import DeviceCSR, device_put_csr, device_get_csr
from .analysis import analyze, AnalysisResult
from .spgemm import spgemm, SpgemmPlan, plan_spgemm

__all__ = [
    "DeviceCSR", "device_put_csr", "device_get_csr",
    "analyze", "AnalysisResult",
    "spgemm", "SpgemmPlan", "plan_spgemm",
]
