#!/usr/bin/env python
"""Decode-attention kernel sweep: block_s vs cache length (marginal-chain
timing, same methodology as bench_qmm_variants). Answers how to amortize
per-grid-step overhead on long caches (config 4) without hurting the
512-ctx headline."""
from __future__ import annotations

import sys
import time

import jax

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import jax.numpy as jnp
import numpy as np

from gemma_tpu.compile_cache import setup_compile_cache

setup_compile_cache()

from gemma_tpu.ops.attention import decode_attention

CH = 32
R = 24


def measure(S, block_s, limit, Hkv=1, D=256, Hq=8, reps=5):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(1, 1, Hq, D)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, Hkv, S, D)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, Hkv, S, D)) * 0.3, jnp.bfloat16)
    lim = jnp.asarray([limit], jnp.int32)

    @jax.jit
    def prog(q, k, v, lim):
        out = None
        qq = q
        for _ in range(CH):
            out = decode_attention(qq, k, v, lim, block_s=block_s)
            qq = q + (out[:, :, :1, :1] * jnp.bfloat16(1e-8))
        return out[0, 0, 0, :8]

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = prog(q, k, v, lim)
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
    print(f"device: {jax.devices()[0].device_kind} (Gemma-2B head geometry)")
    for S, limit in ((512, 500), (4096, 4000), (8192, 8000)):
        for bs in (256, 512, 1024, 2048):
            if S % bs:
                continue
            dt = measure(S, bs, limit)
            live = -(-limit // bs) * bs
            gbs = 2 * live * 256 * 2 / dt / 1e9  # k+v bytes of live tiles
            print(f"  S={S:5d} limit={limit:5d} bs={bs:5d} {dt*1e6:8.2f} us "
                  f"{gbs:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
