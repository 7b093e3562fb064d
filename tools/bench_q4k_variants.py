#!/usr/bin/env python
"""Locate the q4_k kernel's +5 us over q4_0 (33.8 vs 28.7 us at ffn_down).

Variants of the in-kernel metadata math (layout v4: exact int sub-scales +
bf16 hi/lo superscales), all computing the same dequant up to the ablated
term — this is a TIME attribution, not a correctness sweep:

  prod     production: hi/lo d+dmin, sc6*d, mn6*dmin, offs=8sc-mn, xs dot
  nohilo   single-bf16 d/dmin (no hi+lo adds)        — cost of exactness
  noaffine sc only, no mn6/offs/xs dot               — cost of the affine
  nosub    skip sc6 mul: w4 * d-broadcast            — cost of sub-scales
  q4_0ref  q4_0 kernel on the same payload           — floor

    python tools/bench_q4k_variants.py
"""
from __future__ import annotations

import functools
import sys
import time

import jax

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gemma_tpu.compile_cache import setup_compile_cache

setup_compile_cache()

M = 8
CH = 32
N, K = 2048, 16384  # ffn_down
BK, BN = 2048, 2048


def _kernel(x_ref, xs_ref, qs_ref, sc6_ref, mn6_ref, dm_ref, o_ref, acc_ref, *, nsteps, mode):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w4 = pltpu.bitcast(qs_ref[...], jnp.int4)
    bk, bn = w4.shape
    S = bk // 256
    qf = w4.astype(jnp.float32)
    if mode == "q4_0ref":
        sc = sc6_ref[...].astype(jnp.float32)  # [bk/32, bn] as plain scales
        w = (qf.reshape(bk // 32, 32, bn) * sc[:, None, :]).reshape(bk, bn)
    else:
        dm = dm_ref[...].astype(jnp.float32).reshape(S, 4, bn)
        if mode == "nohilo":
            d, dmin = dm[:, 0:1, :], dm[:, 1:2, :]
        else:
            d = dm[:, 0:1, :] + dm[:, 2:3, :]
            dmin = dm[:, 1:2, :] + dm[:, 3:4, :]
        if mode == "nosub":
            w = (qf.reshape(S, 256, bn) * d).reshape(bk, bn)
        else:
            sc = (sc6_ref[...].astype(jnp.float32).reshape(S, 8, bn) * d).reshape(bk // 32, bn)
            w = (qf.reshape(bk // 32, 32, bn) * sc[:, None, :]).reshape(bk, bn)
            if mode in ("prod", "nohilo"):
                mn = (mn6_ref[...].astype(jnp.float32).reshape(S, 8, bn) * dmin).reshape(bk // 32, bn)
                offs = 8.0 * sc - mn
                acc_ref[...] += jax.lax.dot_general(
                    xs_ref[...], offs, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...].astype(jnp.float32), w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(2) == nsteps - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def measure(mode, reps=5, r=32):
    rng = np.random.default_rng(0)
    import ml_dtypes

    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    qs = jnp.asarray(rng.integers(0, 256, size=(K // 2, N), dtype=np.uint8))
    sc6 = jnp.asarray(rng.integers(1, 64, size=(K // 32, N), dtype=np.int8))
    mn6 = jnp.asarray(rng.integers(1, 64, size=(K // 32, N), dtype=np.int8))
    dm = jnp.asarray(
        (rng.uniform(0.5, 1.0, size=(K // 64, N)) * 0.01).astype(np.float16).astype(ml_dtypes.bfloat16)
    )
    if mode == "q4_0ref":
        sc6 = jnp.asarray(
            (rng.uniform(0.5, 1.0, size=(K // 32, N)) * 0.01).astype(np.float16).astype(ml_dtypes.bfloat16)
        )
    xs = jnp.asarray(
        np.asarray(x, np.float32).reshape(M, K // 32, 32).sum(-1).T, jnp.float32
    )
    nsteps = K // BK
    kernel = functools.partial(_kernel, nsteps=nsteps, mode=mode)

    def call(x, xs):
        return pl.pallas_call(
            kernel,
            grid=(1, N // BN, nsteps),
            in_specs=[
                pl.BlockSpec((M, BK), lambda m, n, k: (m, k)),
                pl.BlockSpec((BK // 32, M), lambda m, n, k: (k, m)),
                pl.BlockSpec((BK // 2, BN), lambda m, n, k: (k, n)),
                pl.BlockSpec((BK // 32, BN), lambda m, n, k: (k, n)),
                pl.BlockSpec((BK // 32, BN), lambda m, n, k: (k, n)),
                pl.BlockSpec((BK // 64, BN), lambda m, n, k: (k, n)),
            ],
            out_specs=pl.BlockSpec((M, BN), lambda m, n, k: (m, n)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((M, BN), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(x, xs, qs, sc6, mn6, dm)

    @jax.jit
    def prog(x, xs):
        xx = x
        out = None
        for _ in range(CH):
            out = call(xx, xs)
            xx = x + out[:, :1].astype(jnp.bfloat16) * jnp.bfloat16(1e-8)
        return out[:1, :8]

    def run_r(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = prog(x, xs)
        _ = np.asarray(out)
        return time.perf_counter() - t0

    run_r(1)
    vals = []
    for _ in range(reps):
        t1 = run_r(1)
        tr = run_r(1 + r)
        vals.append((tr - t1) / r / CH)
    vals.sort()
    return vals[len(vals) // 2]


def main():
    print(f"device: {jax.devices()[0].device_kind}, ffn_down [{N},{K}], M={M}")
    for mode in ("prod", "nohilo", "noaffine", "nosub", "q4_0ref"):
        dt = measure(mode)
        print(f"  {mode:9s} {dt*1e6:8.1f} us", flush=True)


if __name__ == "__main__":
    main()
