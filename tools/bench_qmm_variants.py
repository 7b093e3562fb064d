#!/usr/bin/env python
"""Decode (M=8) quant-matmul kernel variant sweep on real TPU.

Timing methodology (the only one that works through the axon tunnel, where
block_until_ready is a no-op and per-dispatch overhead is ~10-30 ms with ms
variance): build ONE program of CH chained kernels (data-dependent via the
activation, so nothing can be CSE'd), then take the marginal wall time
between 1 and 1+R dispatches of that program. Tunnel overhead cancels; R
programs of CH kernels each give device time per kernel.

Variants (all int4-payload: u8 [K/2, N], pltpu.bitcast -> i4 [bk, bn]):
  f32sc    f32 scales [K/32, N]: convert + f32 mul + bf16 cast (3 VPU ops/wt)
  bf16sc   bf16 scales: convert + bf16 mul (2 ops/wt, scale rounded to bf16)
  u16sc    f16-bit scales decoded in-kernel (exact, 10 ops per 32 weights)
  noscale  convert only (1 op/wt) — isolates the scale-mul cost
  stream   sum-reduce the same bytes — per-kernel HBM ceiling
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
CH = 64  # kernels per program


def _decode_f16(u16):
    u = u16.astype(jnp.int32)
    sign = jnp.where((u >> 15) & 1 == 1, -1.0, 1.0).astype(jnp.float32)
    exp = (u >> 10) & 0x1F
    mant = u & 0x3FF
    normal = pltpu.bitcast(((exp + 112) << 23) | (mant << 13), jnp.float32)
    sub = mant.astype(jnp.float32) * jnp.float32(2.0**-24)
    return sign * jnp.where(exp == 0, sub, normal)


def _expand32(sc, bk, bn):
    G = sc.shape[0]
    return jnp.broadcast_to(sc[:, None, :], (G, bk // G, bn)).reshape(bk, bn)


def _kernel(x_ref, qs_ref, sc_ref, o_ref, acc_ref, *, nsteps, mode):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if mode == "stream":
        acc_ref[...] += (
            jnp.sum(qs_ref[...].astype(jnp.int32))
            + jnp.sum(sc_ref[...].astype(jnp.int32) if sc_ref.dtype == jnp.uint16 else sc_ref[...].astype(jnp.int32))
        ).astype(jnp.float32)
    elif mode == "gdot":
        # batched per-group integer-free dots: [G, M, 32] x [G, 32, bn]
        # -> [G, M, bn], then scale+reduce on the small output tensor
        # (0.5 VPU ops/weight instead of 2 for expand+mul).
        w4 = pltpu.bitcast(qs_ref[...], jnp.int4)
        bk, bn = w4.shape
        G = bk // 32
        wg = w4.astype(jnp.bfloat16).reshape(G, 32, bn)
        xg = x_ref[...]  # [G, M, 32] (pre-shaped by launcher)
        out3 = jax.lax.dot_general(
            xg, wg, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # [G, M, bn]
        scf = _decode_f16(sc_ref[...]) if sc_ref.dtype == jnp.uint16 else sc_ref[...]
        acc_ref[...] += jnp.sum(out3 * scf[:, None, :], axis=0)
    elif mode == "f32dot":
        # skip the bf16 narrowing: dequant to f32 (2 ops) and feed the MXU
        # f32 operands (3-pass MXU, but MXU time is small at M=8)
        w4 = pltpu.bitcast(qs_ref[...], jnp.int4)
        bk, bn = w4.shape
        scf = _decode_f16(sc_ref[...]) if sc_ref.dtype == jnp.uint16 else sc_ref[...].astype(jnp.float32)
        G = bk // 32
        w = (w4.astype(jnp.float32).reshape(G, 32, bn) * scf[:, None, :]).reshape(bk, bn)
        acc_ref[...] += jax.lax.dot_general(
            x_ref[...].astype(jnp.float32), w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        w4 = pltpu.bitcast(qs_ref[...], jnp.int4)
        bk, bn = w4.shape
        if mode == "f32sc":
            w = (w4.astype(jnp.float32) * _expand32(sc_ref[...], bk, bn)).astype(jnp.bfloat16)
        elif mode == "rsc":
            # broadcast folded into the mul: no materialized [bk, bn] scale
            if sc_ref.dtype == jnp.uint16:
                scf = _decode_f16(sc_ref[...])
            else:
                scf = sc_ref[...].astype(jnp.float32)
            G = bk // 32
            w = (
                w4.astype(jnp.float32).reshape(G, 32, bn) * scf[:, None, :]
            ).reshape(bk, bn).astype(jnp.bfloat16)
        elif mode == "rscb":
            # same but mul in bf16
            scf = _decode_f16(sc_ref[...]) if sc_ref.dtype == jnp.uint16 else sc_ref[...]
            G = bk // 32
            w = (
                w4.astype(jnp.bfloat16).reshape(G, 32, bn) * scf.astype(jnp.bfloat16)[:, None, :]
            ).reshape(bk, bn)
        elif mode == "bf16sc":
            w = w4.astype(jnp.bfloat16) * _expand32(sc_ref[...], bk, bn)
        elif mode == "u16sc":
            scf = _decode_f16(sc_ref[...])
            w = (w4.astype(jnp.float32) * _expand32(scf, bk, bn)).astype(jnp.bfloat16)
        elif mode == "noscale":
            w = w4.astype(jnp.bfloat16)
        acc_ref[...] += jax.lax.dot_general(
            x_ref[...], w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(pl.program_id(2) == nsteps - 1)
    def _():
        o_ref[...] = acc_ref[...] if mode != "stream" else jnp.broadcast_to(acc_ref[0:1, 0:1], o_ref.shape) + acc_ref[...]


def make_call(N, K, mode, sc_dtype, bk, bn):
    nsteps = K // bk

    def call(x, qs, sc):
        if mode == "gdot":
            x = x.reshape(M, K // 32, 32).transpose(1, 0, 2)  # [G_all, M, 32]
            x_spec = pl.BlockSpec((bk // 32, M, 32), lambda m, n, k: (k, 0, 0))
        else:
            x_spec = pl.BlockSpec((M, bk), lambda m, n, k: (m, k))
        return pl.pallas_call(
            functools.partial(_kernel, nsteps=nsteps, mode=mode),
            grid=(1, N // bn, nsteps),
            in_specs=[
                x_spec,
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
            cost_estimate=pl.CostEstimate(
                flops=2 * M * N * K,
                bytes_accessed=K // 2 * N + (K // 32) * N * sc.dtype.itemsize,
                transcendentals=0,
            ),
        )(x, qs, sc)

    return call


def measure(N, K, mode, sc_dtype, bk, bn, reps=5, r=48):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    qs = jnp.asarray(rng.integers(0, 256, size=(K // 2, N), dtype=np.uint8))
    if sc_dtype == jnp.uint16:
        sc = jnp.asarray(
            rng.standard_normal((K // 32, N)).astype(np.float16).view(np.uint16)
        )
    else:
        sc = jnp.asarray(rng.standard_normal((K // 32, N)).astype(np.float32), sc_dtype)
    call = make_call(N, K, mode, sc_dtype, bk, bn)

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

    t_comp = time.time()
    run_r(1)
    t_comp = time.time() - t_comp
    vals = []
    for _ in range(reps):
        t1 = run_r(1)
        tr = run_r(1 + r)
        vals.append((tr - t1) / r / CH)
    vals.sort()
    med = vals[len(vals) // 2]
    nbytes = qs.size + sc.size * sc.dtype.itemsize
    return med, nbytes / med / 1e9, t_comp


def main():
    shapes = [
        ("ffn_down", 2048, 16384),
        ("gate_up", 32768, 2048),
        ("attn_out", 2048, 2048),  # grid (1,1,1) at bk=bn=2048: no pipelining
    ]
    configs = [
        ("stream", jnp.uint16, 2048, 2048),    # HBM ceiling at 4.5 bpw bytes
        ("f32dot", jnp.bfloat16, 2048, 2048),  # PRODUCTION (layout v4): bf16
        ("f32dot", jnp.bfloat16, 2048, 1024),  # scales widened in-kernel
        ("f32dot", jnp.bfloat16, 1024, 2048),
        ("rsc", jnp.bfloat16, 2048, 2048),     # bf16 scales + bf16-narrowed dot
        ("f32dot", jnp.float32, 2048, 2048),   # layout v3 (f32 scales) for ref
        ("rsc", jnp.float32, 2048, 2048),      # round-2 production kernel
        ("noscale", jnp.float32, 2048, 2048),  # scale-mul cost isolation
    ]
    only = sys.argv[1] if len(sys.argv) > 1 else None
    print(f"device: {jax.devices()[0].device_kind}, M={M}, CH={CH}")
    for name, N, K in shapes:
        if only and only != name:
            continue
        print(f"{name} [{N}, {K}]", flush=True)
        for mode, scd, bk, bn in configs:
            if K % bk or N % bn:
                continue
            dt, gbs, t_comp = measure(N, K, mode, scd, bk, bn)
            print(
                f"  {mode:8s} bk={bk:5d} bn={bn:5d} {dt*1e6:8.1f} us {gbs:7.1f} GB/s"
                f"  (compile {t_comp:.0f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
