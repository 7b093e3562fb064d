#!/usr/bin/env python
"""Per-format production-kernel timing at the decode shape (M=8).

Times ops.quant_matmul's REAL kernels (via quant_matmul on QTensors built
by gemma_tpu.testing) per format on the Gemma-2B hot shapes, against each
format's own stream bytes. Separates "layout v4 byte savings" from "layout
v4 in-kernel metadata math cost" per format (q4_k_m measured 0.667 of its
device stream end-to-end in round 4 vs q4_0's 0.77).

    python tools/bench_fmt_kernels.py
"""
from __future__ import annotations

import sys
import time

import jax

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import jax.numpy as jnp
import numpy as np

from gemma_tpu.compile_cache import setup_compile_cache

setup_compile_cache()

from gemma_tpu.ops.quant_matmul import quant_matmul
from gemma_tpu.testing import make_params  # noqa: F401 (import warms registry)

M = 8
CH = 32


def make_qt(fmt, N, K, rng):
    from gemma_tpu.quant.qtensor import QTensor
    import gemma_tpu.testing as T

    # reuse testing's fabricator via a direct call to its internal matrix
    # builder (random payloads, realistic scales)
    qt = T.make_params.__wrapped__ if hasattr(T.make_params, "__wrapped__") else None
    # simpler: fabricate arrays here with the same recipes
    def payload(shape, dtype):
        if np.issubdtype(dtype, np.unsignedinteger):
            return rng.integers(0, 256, size=shape, dtype=np.uint8)
        return rng.integers(-100, 100, size=shape, dtype=np.int8)

    import ml_dtypes

    def scales(shape):
        return (rng.uniform(0.5, 1.0, size=shape) * 0.01).astype(np.float16).astype(ml_dtypes.bfloat16)

    def subs(shape):
        return rng.integers(1, 64, size=shape, dtype=np.int8)

    if fmt == "q4_0":
        arrays = {"qs": payload((K // 2, N), np.uint8), "scales": scales((K // 32, N))}
    elif fmt == "q8_0":
        arrays = {"qs": payload((K, N), np.int8), "scales": scales((K // 32, N))}
    elif fmt == "q4_k":
        n_sb = K // 256
        dmu = scales((n_sb, 4, N)).view(np.uint16)
        meta = np.concatenate(
            [
                subs((n_sb, 16, N)).astype(np.int8),
                (dmu & 0xFF).astype(np.int8),
                (dmu >> 8).astype(np.int8),
            ],
            axis=1,
        ).reshape(3 * K // 32, N)
        arrays = {"qs": payload((K // 2, N), np.uint8), "meta": meta}
    elif fmt == "q6_k":
        arrays = {
            "qs": payload((K, N), np.int8),
            "sc8": subs((K // 16, N)),
            "d": scales((K // 64, N)),
        }
    return QTensor(fmt, {k: jax.device_put(v) for k, v in arrays.items()})


def measure(fmt, N, K, reps=5, r=32):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    qt = make_qt(fmt, N, K, rng)

    @jax.jit
    def prog(x):
        xx = x
        out = None
        for _ in range(CH):
            out = quant_matmul(xx, qt)
            xx = x + out[:, :1].astype(jnp.bfloat16) * jnp.bfloat16(1e-8)
        return out[:1, :8]

    def run_r(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = prog(x)
        _ = np.asarray(out)
        return time.perf_counter() - t0

    run_r(1)
    vals = []
    for _ in range(reps):
        t1 = run_r(1)
        tr = run_r(1 + r)
        vals.append((tr - t1) / r / CH)
    vals.sort()
    med = vals[len(vals) // 2]
    nbytes = qt.nbytes()
    return med, nbytes / med / 1e9, nbytes


SHAPES = {
    # Gemma-2B decode shapes (fused projections, padded vocab)
    "2b": [
        ("ffn_down", 2048, 16384),
        ("gate_up", 32768, 2048),
        ("lm_head", 256000, 2048),
    ],
    # Gemma-7B (VERDICT r3 #3 attribution): K=3072 / N=3072/4096/49152,
    # vocab 256000
    "7b": [
        ("qkv", 12288, 3072),
        ("attn_out", 3072, 4096),
        ("gate_up", 49152, 3072),
        ("ffn_down", 3072, 24576),
        ("lm_head", 256000, 3072),
    ],
}


def main():
    model = "2b"
    args = [a for a in sys.argv[1:]]
    if args and args[0] in SHAPES:
        model = args.pop(0)
    shapes = SHAPES[model]
    fmts = args or ["q4_0", "q4_k", "q6_k", "q8_0"]
    print(f"device: {jax.devices()[0].device_kind}, {model}, M={M}, CH={CH}")
    for name, N, K in shapes:
        for fmt in fmts:
            dt, gbs, nb = measure(fmt, N, K)
            print(
                f"{name:9s} {fmt:5s}  {dt*1e6:8.1f} us  {gbs:7.1f} GB/s"
                f"  ({nb/1e6:.1f} MB)",
                flush=True,
            )


if __name__ == "__main__":
    main()
