#!/usr/bin/env python
"""Throughput benchmark. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures steady-state decode tokens/s on the flagship config (Gemma-2B
geometry, Q4_0 weights, batch-1 greedy — the reference's own headline
workload, /root/reference/src/app.cpp:36) on whatever accelerator is
visible. `vs_baseline` is the fraction of the analytic per-chip HBM roofline
achieved (BASELINE.md: the reference publishes no numbers; the target is
>= 0.90 of roofline).

Env overrides: BENCH_MODEL (gemma2b|gemma7b|tiny), BENCH_FMT (q4_0|q8_0|
q4_k|q6_k|q4_k_m|bf16), BENCH_TOKENS, BENCH_BATCH. q4_k_m is the mixed
recipe the reference serves (q4_k + q6_k attn_v/head, app.cpp:36).
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gemma_tpu.compile_cache import setup_compile_cache

setup_compile_cache()


def _log(msg: str) -> None:
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


_T0 = time.time()


def hbm_bandwidth_gbs() -> float:
    """Per-chip HBM bandwidth for the visible device (GB/s)."""
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", str(dev)).lower()
    if "v5 lite" in kind or "v5e" in kind:
        return 819.0
    if "v5p" in kind or "v5" in kind:
        return 2765.0
    if "v4" in kind:
        return 1228.0
    if "v6" in kind or "trillium" in kind:
        return 1640.0
    return 100.0  # CPU / unknown: nominal


def param_stream_bytes(params) -> int:
    """Bytes that must stream from HBM per decoded token (all weights),
    in the DEVICE format actually resident in HBM."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(params):
        total += int(np.prod(leaf.shape)) * leaf.dtype.itemsize
    return total


# ggml wire density, bits/weight (the reference's own storage format —
# /root/reference/src/kernals.cl:13-34 block layouts). The honest roofline
# denominator: tokens/s ÷ (HBM BW ÷ wire bytes) cannot be gamed by an
# implementation storing MORE bytes per weight than the reference would.
_WIRE_BPW = {
    "q4_0": 4.5, "q8_0": 8.5, "q4_k": 4.5,
    # both device layouts of Q6_K (shape-selected, qtensor.from_ggml)
    # store the SAME ggml wire format
    "q6_k": 6.5625, "q6_k_v4": 6.5625,
}


def ggml_wire_bytes(params) -> int:
    """Model bytes if stored at ggml's wire density (per-tensor; mixed
    q4_k_m recipes count each tensor at its own format's density)."""
    from gemma_tpu.quant.qtensor import QTensor

    total = 0

    def visit(node):
        nonlocal total
        if isinstance(node, QTensor):
            n, k = node.shape
            total += int(n * k * _WIRE_BPW[node.fmt] / 8)
        elif hasattr(node, "shape") and hasattr(node, "dtype"):
            total += int(np.prod(node.shape)) * node.dtype.itemsize
        elif isinstance(node, dict):
            for v in node.values():
                visit(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                visit(v)

    visit(params)
    return total


def main() -> None:
    from gemma_tpu.models import GEMMA_2B, GEMMA_7B
    from gemma_tpu.models.config import GemmaConfig
    from gemma_tpu.runtime import Engine, EngineConfig
    from gemma_tpu.testing import TINY_CONFIG, make_params

    model = os.environ.get("BENCH_MODEL", "gemma2b")
    fmt = os.environ.get("BENCH_FMT", "q4_0")
    n_tokens = int(os.environ.get("BENCH_TOKENS", "128"))
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    block = int(os.environ.get("BENCH_BLOCK", "8"))

    cfg = {"gemma2b": GEMMA_2B, "gemma7b": GEMMA_7B, "tiny": TINY_CONFIG}[model]
    if model == "tiny":
        fmt = "bf16"

    # zero payloads: throughput is weight-value-independent, and the
    # host->device upload of multi-GB random params dominates wall time
    params = make_params(cfg, fmt=fmt, fill="zeros")
    _log(f"params built ({model} {fmt})")
    params = jax.device_put(params)
    jax.block_until_ready(jax.tree_util.tree_leaves(params)[:1])
    _log("params on device")
    eng = Engine(
        cfg, params,
        EngineConfig(max_seq_len=512, max_batch=batch, decode_block=block),
    )

    prompt = list(range(2, 2 + 64))
    prompts = [prompt] * batch

    # warmup: compile prefill + the fused decode step
    eng.generate_fused(prompts, max_new_tokens=8)
    _log("compiled")
    eng.generate_fused(prompts, max_new_tokens=n_tokens)
    _log("warm")

    # marginal decode rate: t(2n) - t(n) over n extra tokens cancels the
    # constant prefill + final-fetch overhead shared by both runs. Repeat
    # and take the best marginal — host/tunnel jitter only ever slows a
    # run, so min-time is the honest device rate (observed spread across
    # identical runs was ~7 % otherwise).
    best_dt = None
    for _ in range(3):
        t0 = time.perf_counter()
        eng.generate_fused(prompts, max_new_tokens=n_tokens)
        t1 = time.perf_counter()
        eng.generate_fused(prompts, max_new_tokens=2 * n_tokens)
        t2 = time.perf_counter()
        dt = max((t2 - t1) - (t1 - t0), 1e-9)
        best_dt = dt if best_dt is None else min(best_dt, dt)

    toks_per_s = n_tokens * batch / best_dt
    bw = hbm_bandwidth_gbs() * 1e9
    device_bytes = param_stream_bytes(params)
    wire_bytes = ggml_wire_bytes(params)
    # vs_baseline: fraction of the HONEST roofline — HBM BW over ggml WIRE
    # bytes (the reference's own storage density). vs_device_roofline uses
    # the bytes actually resident (layout v4 ~= wire for q4_0/q8_0).
    print(
        json.dumps(
            {
                "metric": f"decode_tokens_per_sec_{model}_{fmt}_b{batch}",
                "value": round(toks_per_s, 2),
                "unit": "tokens/s",
                "vs_baseline": round(toks_per_s * wire_bytes / bw, 4),
                "vs_device_roofline": round(toks_per_s * device_bytes / bw, 4),
                "wire_gb": round(wire_bytes / 1e9, 3),
                "device_gb": round(device_bytes / 1e9, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
