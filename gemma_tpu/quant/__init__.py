from .numpy_ref import dequantize, quantize, supported_dequant_types

__all__ = ["dequantize", "quantize", "supported_dequant_types"]
