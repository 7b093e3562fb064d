from . import perplexity, profiling, tensor_dump

__all__ = ["profiling", "tensor_dump", "perplexity"]
