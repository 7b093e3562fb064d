#!/usr/bin/env python
"""bn (N-tile) sweep for the production quant-matmul kernel at decode M=8.

The lm_head (N=258048) walks 126 n-steps at bn=2048 and measures 666 GB/s
vs ffn_down's 762 — per-step overhead over many steps. Bigger bn halves the
step count; this sweep measures whether that pays on the real kernel
(methodology = bench_qmm_variants: chained programs, marginal wall time).

    python tools/bench_bn_sweep.py
"""
from __future__ import annotations

import functools
import sys
import time

import jax

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import jax.numpy as jnp
import numpy as np

from gemma_tpu.compile_cache import setup_compile_cache

setup_compile_cache()

from gemma_tpu.ops import quant_matmul as qmm

M = 8
CH = 32


def measure(N, K, bn, reps=5, r=32):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    qs = jnp.asarray(rng.integers(0, 256, size=(K // 2, N), dtype=np.uint8))
    sc = jnp.asarray(
        rng.standard_normal((K // 32, N)).astype(np.float32), jnp.bfloat16
    )

    bk = qmm._pick_bk(K, "q4_0")

    def call(x, qs, sc):
        # reuse the production kernel with a forced bn
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        nsteps = K // bk
        grid = (1, N // bn, nsteps)
        kernel = functools.partial(qmm._q4_0_kernel, nsteps=nsteps, f32dot=True)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((M, bk), lambda m, n, k: (m, k)),
                pl.BlockSpec((bk // 2, bn), lambda m, n, k: (k, n)),
                pl.BlockSpec((bk // 32, bn), lambda m, n, k: (k, n)),
            ],
            out_specs=pl.BlockSpec((M, bn), lambda m, n, k: (m, n)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(x, qs, sc)

    @jax.jit
    def prog(x, qs, sc):
        xx = x
        out = None
        for _ in range(CH):
            out = call(xx, qs, sc)
            xx = x + out[:, :1].astype(jnp.bfloat16) * jnp.bfloat16(1e-8)
        return out[:1, :8]

    def run_r(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = prog(x, qs, sc)
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
    nbytes = qs.size + sc.size * 2
    return med, nbytes / med / 1e9


def main():
    shapes = [
        ("lm_head", 258048, 2048),
        ("gate_up", 32768, 2048),
        ("ffn_down", 2048, 16384),
    ]
    print(f"device: {jax.devices()[0].device_kind}, M={M}, CH={CH}")
    for name, N, K in shapes:
        for bn in (2048, 4096, 8192):
            if N % bn:
                continue
            dt, gbs = measure(N, K, bn)
            print(f"{name:9s} bn={bn:5d}  {dt*1e6:8.1f} us  {gbs:7.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
