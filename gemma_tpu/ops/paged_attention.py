"""Paged decode attention: Pallas kernel reading KV pages via the block table.

The file `runtime/paged_kv.py` promises: decode attention over a paged KV
pool WITHOUT densifying it — the round-1 `gather_layer` fallback
materialized the whole [B, maxp*ps, H, D] pool per layer per step, making
paging strictly worse than the dense cache. Here the block table rides the
scalar-prefetch channel, so each grid step DMAs exactly ONE physical page
(`PrefetchScalarGridSpec` index_map indirection — the TPU idiom for vLLM-
style paged attention; generalizes the reference's dead `kv_cell` machinery,
/root/reference/src/gemma_model.h:75-97).

Shapes:
    q:          [B, 1, Hq, D] (query_scale applied; position = kv_limit-1)
    k/v pages:  [P, Hkv, ps, D] (one layer's pool slice; ps second-to-last
                so each (1, 1, ps, D) block tiles under Mosaic's last-two-
                dims rule for any Hkv)
    page_table: i32 [B, maxp] physical page per logical page (0 = trash)
    kv_limit:   i32 [B] valid token count

Grid is (B, maxp): a sequential page walk per batch row with online-softmax
accumulators for ALL KV heads in VMEM scratch — each step DMAs the whole
(Hkv, ps, D) page slab (v5e runs grid steps on one core, so per-(head,
page) grids pay the fixed per-step cost Hkv-times more; see _paged_kernel).
Pages past a sequence's limit are skipped two ways: the index_map redirects
them to the sequence's page 0 entry (consecutive identical block indices
elide the DMA) and `pl.when` skips their compute.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NUM_LANES = 128
MIN_G = 8  # pad query-group dim to the f32 sublane tile
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _paged_kernel(
    pt_ref,  # scalar-prefetch: i32 [B, maxp]
    lim_ref,  # scalar-prefetch: i32 [B]
    q_ref,  # [1, Hkv, G, D]
    k_ref,  # [1, Hkv, ps, D] (bf16, or int8 when quantized)
    v_ref,  # [1, Hkv, ps, D]
    *rest,  # quantized: ks_ref [1, Hkv, ps], vs_ref [1, Hkv, ps], then outputs
    ps: int,
    n_pages: int,
    attn_softcap: float,
    window: int,
    quantized: bool = False,
):
    # ALL KV heads ride in one block: v5e executes grid steps on ONE core,
    # so a per-(head, page) grid pays the fixed per-step cost B*Hkv*maxp
    # times — per-page DMAs of (1, 1, ps, D) were overhead-bound (7B ps=64
    # measured 0.65x dense). One (1, Hkv, ps, D) block per page walks
    # Hkv-times fewer steps with Hkv-times fatter DMAs (16x for Gemma-7B).
    #
    # int8 pages are read IN PLACE: per-position scales commute through both
    # dots — s = (q · k8ᵀ) * ks, out = (p * vs) @ v8 — so no dequantized
    # copy of the pool ever exists (the round-2 gather_layer fallback
    # tripled traffic; this halves it vs bf16).
    if quantized:
        ks_ref, vs_ref, o_ref, m_scr, l_scr, acc_scr = rest
    else:
        o_ref, m_scr, l_scr, acc_scr = rest
    b, i = pl.program_id(0), pl.program_id(1)

    @pl.when(i == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    limit = lim_ref[b]
    start = i * ps
    live = start < limit
    if window > 0:  # page entirely older than the query's window?
        live &= start + ps - 1 >= limit - window

    @pl.when(live)
    def _():
        q = q_ref[0]  # [Hkv, G, D]
        k = k_ref[0]  # [Hkv, ps, D]
        Hkv, G, D = q.shape
        s = jax.lax.dot_general(
            q, k.astype(q.dtype) if quantized else k,
            (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        )  # [Hkv, G, ps]
        if quantized:
            s = s * ks_ref[0][:, None, :]  # [Hkv, 1, ps]
        if attn_softcap:
            s = attn_softcap * jnp.tanh(s / attn_softcap)
        col = start + jax.lax.broadcasted_iota(jnp.int32, (Hkv, G, ps), 2)
        mask = col < limit
        if window > 0:
            mask &= col > limit - 1 - window
        s = jnp.where(mask, s, MASK_VALUE)

        m_prev = m_scr[...].reshape(Hkv, G, NUM_LANES)[:, :, :1]
        l_prev = l_scr[...].reshape(Hkv, G, NUM_LANES)[:, :, :1]
        m_cur = jnp.max(s, axis=2, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        p = jnp.where(mask, p, 0.0)
        l_next = alpha * l_prev + jnp.sum(p, axis=2, keepdims=True)
        m_scr[...] = jnp.broadcast_to(m_next, (Hkv, G, NUM_LANES)).reshape(m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_next, (Hkv, G, NUM_LANES)).reshape(l_scr.shape)
        v = v_ref[0]  # [Hkv, ps, D]
        if quantized:
            p = p * vs_ref[0][:, None, :]
            v = v.astype(jnp.bfloat16)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [Hkv, G, D]
        acc_scr[...] = (
            acc_scr[...].reshape(Hkv, G, D) * alpha + pv
        ).reshape(acc_scr.shape)

    @pl.when(i == n_pages - 1)
    def _():
        Hkv, G, D = q_ref.shape[1:]
        l = l_scr[...].reshape(Hkv, G, NUM_LANES)[:, :, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_scr[...].reshape(Hkv, G, D) * l_inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("attn_softcap", "window", "interpret")
)
def _paged_call(q_bhgd, k_pages, v_pages, k_scale, v_scale, page_table,
                kv_limit, attn_softcap, window, interpret):
    B, Hkv, G, D = q_bhgd.shape
    P, ps = k_pages.shape[0], k_pages.shape[2]
    maxp = page_table.shape[1]
    quantized = k_scale is not None

    def page_map(b, i, pt_ref, lim_ref):
        # dead steps re-request the sequence's LAST live page: consecutive
        # identical block indices elide the DMA, and pl.when skips compute.
        n_live = jnp.maximum((lim_ref[b] + ps - 1) // ps, 1)
        idx = jnp.where(i < n_live, i, n_live - 1)
        return (pt_ref[b, idx], 0, 0, 0)

    def page_map3(b, i, pt_ref, lim_ref):
        n_live = jnp.maximum((lim_ref[b] + ps - 1) // ps, 1)
        idx = jnp.where(i < n_live, i, n_live - 1)
        return (pt_ref[b, idx], 0, 0)

    kernel = functools.partial(
        _paged_kernel, ps=ps, n_pages=maxp,
        attn_softcap=attn_softcap, window=window, quantized=quantized,
    )
    in_specs = [
        pl.BlockSpec((1, Hkv, G, D), lambda b, i, *_: (b, 0, 0, 0)),
        pl.BlockSpec((1, Hkv, ps, D), page_map),
        pl.BlockSpec((1, Hkv, ps, D), page_map),
    ]
    inputs = [q_bhgd, k_pages, v_pages]
    if quantized:
        in_specs += [pl.BlockSpec((1, Hkv, ps), page_map3)] * 2
        inputs += [k_scale, v_scale]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, maxp),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Hkv, G, D), lambda b, i, *_: (b, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Hkv * G, NUM_LANES), jnp.float32),
            pltpu.VMEM((Hkv * G, NUM_LANES), jnp.float32),
            pltpu.VMEM((Hkv * G, D), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(page_table, kv_limit, *inputs)


def paged_decode_supported(cache, T: int, Hq: int) -> bool:
    """Kernel path gate: T=1 decode, lane-aligned head_dim; bf16 OR int8
    pages (int8 pages are read in place with their scales)."""
    if T != 1:
        return False
    from . import attention as _attn  # force-fallback verification hook

    D = cache.k_pages[0].shape[-1]
    Hkv = cache.k_pages[0].shape[1]
    on_kernel_path = (
        jax.default_backend() == "tpu"
        or os.environ.get("GEMMA_TPU_INTERPRET_KERNELS") == "1"
    ) and not _attn._FORCE_FALLBACK
    return on_kernel_path and D % NUM_LANES == 0 and Hq % Hkv == 0


def paged_decode_attention(
    q: jax.Array,  # [B, 1, Hq, D] scaled
    cache,  # PagedKVCache
    layer: int,
    kv_limit: jax.Array,  # [B]
    attn_softcap: float = 0.0,
    window: int = 0,
) -> jax.Array:
    """Decode attention over the paged pool; returns [B, 1, Hq, D]."""
    B, T, Hq, D = q.shape
    k_pages = cache.k_pages[layer]
    v_pages = cache.v_pages[layer]
    k_scale = cache.k_scale[layer] if cache.quantized else None
    v_scale = cache.v_scale[layer] if cache.quantized else None
    Hkv = k_pages.shape[1]
    G = Hq // Hkv
    Gp = max(G, MIN_G)
    qg = q.reshape(B, Hkv, G, D)
    if Gp != G:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, Gp - G), (0, 0)))
    out = _paged_call(
        qg, k_pages, v_pages, k_scale, v_scale,
        cache.page_table.astype(jnp.int32), kv_limit.astype(jnp.int32),
        float(attn_softcap), int(window), _interpret(),
    )
    # cast back to the query dtype so the kernel path and the sdpa_xla
    # fallback agree for f32-activation configs (int8-KV callers still get
    # bf16 since q is bf16 there)
    return out[:, :, :G].reshape(B, 1, Hq, D).astype(q.dtype)
