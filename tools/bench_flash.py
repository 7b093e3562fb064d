#!/usr/bin/env python
"""Prefill flash-attention tile sweep (marginal-chain timing).

Gemma-2B geometry (Hq=8, Hkv=1, D=256) at T=S=2048 causal — the per-layer
attention cost inside a 2K prefill. Larger q/s tiles amortize per-grid-step
overhead; VMEM bounds the product."""
from __future__ import annotations

import sys
import time

import jax

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import jax.numpy as jnp
import numpy as np

from gemma_tpu.compile_cache import setup_compile_cache

setup_compile_cache()

from gemma_tpu.ops.attention import flash_attention

CH = 16
R = 16


def measure(T, S, bq, bs, Hq=8, Hkv=1, D=256, reps=5):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(1, T, Hq, D)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, Hkv, S, D)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, Hkv, S, D)) * 0.3, jnp.bfloat16)
    pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (1, T))
    lim = jnp.asarray([S], jnp.int32)

    @jax.jit
    def prog(q, k, v, pos, lim):
        out = None
        qq = q
        for _ in range(CH):
            out = flash_attention(qq, k, v, pos, lim, block_q=bq, block_s=bs)
            qq = q + (out[:, :1, :1, :1] * jnp.bfloat16(1e-8))
        return out[0, 0, 0, :8]

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = prog(q, k, v, pos, lim)
        _ = np.asarray(out)
        return time.perf_counter() - t0

    run(1)
    vals = []
    for _ in range(reps):
        t1 = run(1)
        tr = run(1 + R)
        vals.append((tr - t1) / R / CH)
    vals.sort()
    return vals[len(vals) // 2]


def main():
    T = S = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    print(f"device: {jax.devices()[0].device_kind}, T=S={T} causal, Hq=8 Hkv=1 D=256")
    for bq, bs in ((128, 128), (128, 256), (256, 128), (256, 256),
                   (512, 256), (256, 512), (512, 512)):
        if T % bq or S % bs:
            continue
        dt = measure(T, S, bq, bs)
        print(f"  bq={bq:4d} bs={bs:4d} {dt*1e6:9.1f} us/layer", flush=True)


if __name__ == "__main__":
    main()
