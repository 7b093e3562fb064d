"""Linear / matmul dispatch.

All model projections route through :func:`linear` so quantized weights can
be served by fused Pallas dequant+matmul kernels on TPU, with an XLA
dequantize-then-dot fallback elsewhere. This is the TPU-native analogue of
the reference's patched-ggml dispatch into `hpc.cpp:216 mul_mat` — but where
the reference picks CPU-vs-iGPU per call with a static 0.9 row split
(`hpc.cpp:245-248`), here the backend choice is per-platform and the "split"
is the compiler's tiling.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..quant.qtensor import QTensor, dequant_t

# Set by gemma_tpu.ops.quant_matmul at import time on TPU; maps fmt -> fn.
_KERNELS: dict[str, object] = {}
_FORCE_FALLBACK = False


def register_kernel(fmt: str, fn) -> None:
    _KERNELS[fmt] = fn


def set_force_fallback(flag: bool) -> None:
    """Testing hook: bypass Pallas kernels and use the XLA dequant path."""
    global _FORCE_FALLBACK
    _FORCE_FALLBACK = flag


def _trace_count(x: jax.Array, w, path: str) -> None:
    """Op-shape histogram, recorded at TRACE time (once per compiled graph)
    — the analogue of the reference's per-dispatch add_count histograms
    (`/root/reference/src/hpc.cpp:236-243`); per-execution timing lives in
    the engine's roofline records."""
    from ..utils import profiling

    if not profiling.is_enabled():
        return
    m = 1
    for d in x.shape[:-1]:
        m *= d
    if isinstance(w, QTensor):
        shape, fmt = w.shape, w.fmt
    else:
        shape, fmt = tuple(w.shape), str(w.dtype)
    profiling.add_count(f"trace.matmul.{path}.{fmt}[{shape[0]}x{shape[1]}]xM{m}")


def linear(x: jax.Array, w, *, out_dtype=None) -> jax.Array:
    """y = x @ w.T for w either a dense [out, in] array or a QTensor.

    x: [..., in]; returns [..., out] in x.dtype (or out_dtype).
    """
    out_dtype = out_dtype or x.dtype
    if isinstance(w, QTensor):
        fn = None if _FORCE_FALLBACK else _KERNELS.get(w.fmt)
        if fn is not None:
            _trace_count(x, w, "pallas")
            return fn(x, w).astype(out_dtype)
        _trace_count(x, w, "xla")
        wd = dequant_t(w, dtype=jnp.bfloat16)  # [K, N]
        return jnp.dot(x, wd, preferred_element_type=jnp.float32).astype(out_dtype)
    _trace_count(x, w, "dense")
    return jnp.dot(x, w.T, preferred_element_type=jnp.float32).astype(out_dtype)
