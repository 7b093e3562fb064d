#!/usr/bin/env python
"""Micro-benchmarks: per-op timing for the decode step on real hardware.

Answers "where do the 5.6ms/token go": times each quantized matmul shape of
the flagship model in isolation (achieved HBM GB/s vs the 819 GB/s v5e
peak), the attention path, and a no-op dispatch chain (device/tunnel launch
overhead). Used to direct kernel optimization; not part of the test suite.
"""
from __future__ import annotations

import os
import sys
import time

import jax

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax.numpy as jnp
import numpy as np

from gemma_tpu.compile_cache import setup_compile_cache

setup_compile_cache()

from gemma_tpu.models import GEMMA_2B
from gemma_tpu.ops.quant_matmul import quant_matmul
from gemma_tpu.quant.qtensor import QTensor
from gemma_tpu.testing import make_params

REPS = 50


def timeit(fn, *args, reps=REPS):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def qt_bytes(qt: QTensor) -> int:
    return sum(int(a.size) * a.dtype.itemsize for a in qt.arrays.values())


def main():
    cfg = GEMMA_2B
    fmt = sys.argv[1] if len(sys.argv) > 1 else "q4_0"
    params = make_params(cfg, fmt=fmt, fill="zeros")
    params = jax.device_put(params)
    jax.block_until_ready(jax.tree_util.tree_leaves(params))

    lp = params["layers"][0]
    shapes = {}
    for name, w in [
        ("qkv", lp.get("attn_qkv")),
        ("attn_out", lp["attn_output"]),
        ("gate_up", lp.get("ffn_gate_up")),
        ("ffn_down", lp["ffn_down"]),
        ("lm_head", params["embed"]),
    ]:
        if w is not None:
            shapes[name] = w

    print(f"== quant_matmul per-shape (fmt={fmt}, M=1 decode) ==")
    total_w = 0.0
    for name, qt in shapes.items():
        N, K = qt.shape
        x = jnp.zeros((1, K), jnp.bfloat16)
        dt = timeit(quant_matmul, x, qt)
        nbytes = qt_bytes(qt)
        gbs = nbytes / dt / 1e9
        n_in_model = 18 if name != "lm_head" else 1
        total_w += dt * n_in_model
        print(f"  {name:9s} [{N:6d},{K:6d}] {dt*1e6:9.1f} us  {gbs:7.1f} GB/s  x{n_in_model}")
    print(f"  sum over model matmuls: {total_w*1e3:.3f} ms/token")

    # attention fallback cost at decode
    from gemma_tpu.ops.attention import sdpa_xla

    B, S = 1, 512
    q = jnp.zeros((B, 1, cfg.n_heads, cfg.head_dim), jnp.bfloat16)
    k = jnp.zeros((B, cfg.n_kv_heads, S, cfg.head_dim), jnp.bfloat16)
    v = jnp.zeros_like(k)
    pos = jnp.full((B, 1), S - 1, jnp.int32)
    lim = jnp.full((B,), S, jnp.int32)
    f = jax.jit(sdpa_xla)
    dt = timeit(f, q, k, v, pos, lim)
    print(f"== sdpa_xla decode (S={S}): {dt*1e6:.1f} us x{cfg.n_layers} = {dt*cfg.n_layers*1e3:.3f} ms")

    # dispatch overhead: chain of trivial jitted ops
    @jax.jit
    def tiny(x):
        return x + 1.0

    x = jnp.zeros((8, 128), jnp.float32)
    dt = timeit(tiny, x, reps=200)
    print(f"== trivial dispatch: {dt*1e6:.1f} us/launch")

    # one full decode step for reference
    from gemma_tpu.runtime import Engine, EngineConfig

    eng = Engine(cfg, params, EngineConfig(max_seq_len=512, max_batch=1))
    logits, cache = eng.prefill([list(range(2, 66))])
    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def step(tok, cache):
        return eng._decode(eng.params, tok, cache)

    # decode donates the cache; re-thread it each rep
    out = step(tok, cache)
    jax.block_until_ready(out[0])
    logits, cache = out
    t0 = time.perf_counter()
    for _ in range(REPS):
        logits, cache = step(tok, cache)
    jax.block_until_ready(logits)
    dt = (time.perf_counter() - t0) / REPS
    print(f"== full decode step: {dt*1e3:.3f} ms/token ({1/dt:.1f} tok/s)")


if __name__ == "__main__":
    main()
