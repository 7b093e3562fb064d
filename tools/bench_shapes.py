#!/usr/bin/env python
"""Per-model-shape quant_matmul timing on real TPU (marginal-chain method).

Times the production `quant_matmul` path for every matmul shape of the
flagship decode step, including the lm_head [vocab, d_model] — whose raw
vocab (256128) only tiles at bn=128 — and a 2048-aligned padded variant.
Prints achieved GB/s against each tensor's own bytes.
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
from gemma_tpu.quant.qtensor import QTensor

M = 8
CH = 32
R = 24


def rand_qt(N, K, fmt="q4_0", seed=0):
    rng = np.random.default_rng(seed)
    arrays = {
        "qs": jnp.asarray(rng.integers(0, 256, size=(K // 2, N), dtype=np.uint8)),
        "scales": jnp.asarray(
            rng.standard_normal((K // 32, N)).astype(np.float16).astype(np.float32)
        ),
    }
    return QTensor(fmt, arrays)


def measure(qt, reps=5):
    N, K = qt.shape
    x0 = jnp.asarray(np.random.default_rng(1).standard_normal((M, K)), jnp.bfloat16)

    @jax.jit
    def prog(x, qt):
        out = None
        xx = x
        for _ in range(CH):
            out = quant_matmul(xx, qt)
            xx = x + (out[:, :1] * jnp.float32(1e-30)).astype(jnp.bfloat16)
        return out[:1, :8]

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = prog(x0, qt)
        _ = np.asarray(out)
        return time.perf_counter() - t0

    run(1)
    vals = []
    for _ in range(reps):
        t1 = run(1)
        tr = run(1 + R)
        vals.append((tr - t1) / R / CH)
    vals.sort()
    med = vals[len(vals) // 2]
    nbytes = qt.nbytes()
    return med, nbytes / med / 1e9, nbytes


def main():
    shapes = [
        ("qkv", 2560, 2048),
        ("attn_out", 2048, 2048),
        ("gate_up", 32768, 2048),
        ("ffn_down", 2048, 16384),
        ("lm_head", 256128, 2048),      # raw vocab: bn=128 tiles
        ("lm_head_pad", 258048, 2048),  # 2048-aligned: bn=2048 tiles
    ]
    print(f"device: {jax.devices()[0].device_kind}, M={M}, CH={CH}")
    total = 0.0
    for name, N, K in shapes:
        qt = rand_qt(N, K)
        dt, gbs, nbytes = measure(qt)
        mult = 18 if name not in ("lm_head", "lm_head_pad") else 1
        if name != "lm_head_pad":
            total += dt * mult
        print(
            f"  {name:12s} [{N:6d},{K:6d}] {dt*1e6:8.1f} us {gbs:7.1f} GB/s"
            f"  ({nbytes/1e6:7.1f} MB) x{mult}",
            flush=True,
        )
    print(f"  sum over decode matmuls (raw lm_head): {total*1e3:.3f} ms/token")


if __name__ == "__main__":
    main()
