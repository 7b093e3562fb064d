from .linear import linear, register_kernel, set_force_fallback

__all__ = ["linear", "register_kernel", "set_force_fallback"]
