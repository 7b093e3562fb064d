#!/usr/bin/env python
"""Isolate the allocation-size-dependent decode cost (round 5).

Observation: 7B dense-bf16 decode at ~2K live context runs 81.1 tok/s in a
2048-slot cache but 63.8 tok/s in a 4096-slot cache EVEN AFTER the decode
attention kernel got dead-tile DMA elision (the kernel itself measures
allocation-independent: 49.3 vs 49.7 us/layer). ~3.3 ms/token scales with
the ALLOCATED cache, not the live prefix. Candidates:

  write   the per-token KV scatter (.at[layer, :, :, idx].set) — in-place
          under donation, or a hidden full-buffer copy?
  slice   cache.k[layer] materialization feeding the Pallas decode kernel —
          XLA must pass a dense buffer to the custom call; does it copy the
          [B, H, S, D] slice per layer per step?
  attn    the decode attention kernel itself (control; expected flat)

Each program runs CH chained model-less steps over L layers at 7B geometry,
timed by the marginal-chain method, for S in {2048, 4096}.

    python tools/probe_cache_cost.py
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

from gemma_tpu.ops.attention import decode_attention

L, B, H, D = 28, 1, 16, 256
CH = 8
R = 16


def marginal(prog, args, donate_idx=None, reps=5):
    def run(n, a):
        out = None
        for _ in range(n):
            out = prog(*a)
            if donate_idx is not None:
                a = list(a)
                a[donate_idx] = out  # prog returns the donated state
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0][..., :1])
        return a

    # warmup/compile
    args = run(1, args)
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        args = run(1, args)
        t1 = time.perf_counter()
        args = run(1 + R, args)
        t2 = time.perf_counter()
        vals.append(((t2 - t1) - (t1 - t0)) / R / CH)
    vals.sort()
    return vals[len(vals) // 2]


def probe_write(S):
    """CH chained steps, each writing one token into all L layers (the
    dense KVCache.write_token pattern), cache donated through."""
    rng = np.random.default_rng(0)
    k = jnp.zeros((L, B, H, S, D), jnp.bfloat16)
    v = jnp.zeros((L, B, H, S, D), jnp.bfloat16)
    new = jnp.asarray(rng.normal(size=(B, 1, H, D)) * 0.3, jnp.bfloat16)

    def prog(cache, new, idx):
        # exact KVCache.write_token scatter pattern: [B,1]x[1,H]x[B,1]
        k, v = cache
        b = jnp.arange(B)[:, None]
        h = jnp.arange(H)[None, :]
        for step in range(CH):
            i = (idx + step)[:, None]
            for layer in range(L):
                kn = new + jnp.bfloat16(step + layer)
                k = k.at[layer, b, h, i].set(kn[:, 0])
                v = v.at[layer, b, h, i].set(kn[:, 0])
        return (k, v)

    prog2 = jax.jit(prog, donate_argnums=(0,))
    idx = jnp.asarray([100] * B, jnp.int32)
    return marginal(prog2, [(k, v), new, idx], donate_idx=0)


def probe_slice_attn(S, limit):
    """CH chained steps, each running decode attention over all L layers
    reading cache.k[layer] slices (the gemma.forward pattern)."""
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.normal(size=(L, B, H, S, D)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(L, B, H, S, D)) * 0.3, jnp.bfloat16)
    q = jnp.asarray(rng.normal(size=(B, 1, H, D)) * 0.3, jnp.bfloat16)
    lim = jnp.asarray([limit], jnp.int32)

    @jax.jit
    def prog(q, k, v, lim):
        out = None
        qq = q
        for _ in range(CH):
            for layer in range(L):
                out = decode_attention(qq, k[layer], v[layer], lim)
                # chain EVERY call or XLA dead-code-eliminates all but one
                qq = q + out[:, :, :1, :1].astype(q.dtype) * jnp.bfloat16(1e-8)
        return out

    return marginal(prog, [q, k, v, lim])


def probe_attn_prelisted(S, limit):
    """Control: same attention work but per-layer arrays passed as separate
    inputs (no in-graph slice of a [L, ...] parent)."""
    rng = np.random.default_rng(0)
    ks = [jnp.asarray(rng.normal(size=(B, H, S, D)) * 0.3, jnp.bfloat16) for _ in range(L)]
    vs = [jnp.asarray(rng.normal(size=(B, H, S, D)) * 0.3, jnp.bfloat16) for _ in range(L)]
    q = jnp.asarray(rng.normal(size=(B, 1, H, D)) * 0.3, jnp.bfloat16)
    lim = jnp.asarray([limit], jnp.int32)

    @jax.jit
    def prog(q, ks, vs, lim):
        out = None
        qq = q
        for _ in range(CH):
            for layer in range(L):
                out = decode_attention(qq, ks[layer], vs[layer], lim)
                qq = q + out[:, :, :1, :1].astype(q.dtype) * jnp.bfloat16(1e-8)
        return out

    return marginal(prog, [q, ks, vs, lim])



def probe_combined_prelisted(S, limit):
    """Candidate fix: PER-LAYER cache buffers (no [L, ...] stacking). Each
    layer's scatter + pallas read then touches its own buffer — aliasing
    is per-leaf and no in-graph slice of a stacked parent exists."""
    rng = np.random.default_rng(0)
    ks = [jnp.asarray(rng.normal(size=(B, H, S, D)) * 0.3, jnp.bfloat16) for _ in range(L)]
    vs = [jnp.asarray(rng.normal(size=(B, H, S, D)) * 0.3, jnp.bfloat16) for _ in range(L)]
    q = jnp.asarray(rng.normal(size=(B, 1, H, D)) * 0.3, jnp.bfloat16)
    lim = jnp.asarray([limit], jnp.int32)

    def prog(cache, q, lim):
        ks, vs = list(cache[0]), list(cache[1])
        b = jnp.arange(B)[:, None]
        h = jnp.arange(H)[None, :]
        qq = q
        for step in range(CH):
            i = lim[:, None] + step
            for layer in range(L):
                kn = qq + jnp.bfloat16(layer)
                ks[layer] = ks[layer].at[b, h, i].set(kn[:, 0])
                vs[layer] = vs[layer].at[b, h, i].set(kn[:, 0])
                out = decode_attention(qq, ks[layer], vs[layer], lim + step + 1)
                qq = q + out[:, :, :1, :1].astype(q.dtype) * jnp.bfloat16(1e-8)
        return (tuple(ks), tuple(vs))

    prog2 = jax.jit(prog, donate_argnums=(0,))
    return marginal(prog2, [(tuple(ks), tuple(vs)), q, lim], donate_idx=0)

def main():
    print(f"device: {jax.devices()[0].device_kind} — 7B geometry "
          f"L={L} H={H} D={D}, live limit 2000")
    probes = [
        ("write", probe_write, False),
        ("attn-via-slice", probe_slice_attn, True),
        ("attn-prelisted", probe_attn_prelisted, True),
        ("combined", probe_combined, True),
        ("per-layer-combined", probe_combined_prelisted, True),
    ]
    for S in (2048, 4096):
        for name, fn, needs_lim in probes:
            t = fn(S, 1990) if needs_lim else fn(S)
            print(f"  S={S}: {name:20s} {t*1e3:7.3f} ms/step", flush=True)




def probe_combined(S, limit):
    """The real engine pattern: per layer, attention READS k[layer]/v[layer]
    then the decode scatter WRITES one token into the same buffers, cache
    donated through the step. If XLA breaks aliasing here, the copies scale
    with the allocation."""
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.normal(size=(L, B, H, S, D)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(L, B, H, S, D)) * 0.3, jnp.bfloat16)
    q = jnp.asarray(rng.normal(size=(B, 1, H, D)) * 0.3, jnp.bfloat16)
    lim = jnp.asarray([limit], jnp.int32)

    def prog(cache, q, lim):
        k, v = cache
        b = jnp.arange(B)[:, None]
        h = jnp.arange(H)[None, :]
        qq = q
        for step in range(CH):
            i = lim[:, None] + step
            for layer in range(L):
                kn = qq + jnp.bfloat16(layer)
                k = k.at[layer, b, h, i].set(kn[:, 0])
                v = v.at[layer, b, h, i].set(kn[:, 0])
                out = decode_attention(qq, k[layer], v[layer], lim + step + 1)
                qq = q + out[:, :, :1, :1].astype(q.dtype) * jnp.bfloat16(1e-8)
        return (k, v)

    prog2 = jax.jit(prog, donate_argnums=(0,))
    return marginal(prog2, [(k, v), q, lim], donate_idx=0)


if __name__ == "__main__":
    main()
