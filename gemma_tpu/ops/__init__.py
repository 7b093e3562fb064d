from .linear import linear, register_kernel, set_force_fallback
from . import quant_matmul  # noqa: F401  (registers fused kernels)

__all__ = ["linear", "register_kernel", "set_force_fallback", "quant_matmul"]
