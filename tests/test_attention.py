"""Flash attention kernel vs the XLA reference (interpret mode on CPU)."""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from gemma_tpu.ops.attention import (
    decode_attention,
    decode_supported,
    flash_attention,
    flash_supported,
    sdpa_xla,
)

os.environ["GEMMA_TPU_INTERPRET_KERNELS"] = "1"


def make_qkv(rng, B, T, S, Hq, Hkv, D):
    # k/v use the cache-native [B, Hkv, S, D] layout
    q = jnp.asarray(rng.normal(size=(B, T, Hq, D)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)) * 0.3, jnp.bfloat16)
    return q, k, v


CASES = [
    # B, T, S, Hq, Hkv, D, kv_limits, pos0
    (1, 128, 128, 4, 4, 128, [128], 0),          # MHA full square
    (1, 128, 256, 8, 2, 128, [200], 0),          # GQA, partial cache
    (2, 128, 256, 4, 1, 128, [128, 77], 0),      # MQA, per-batch limits
    (1, 256, 256, 2, 2, 128, [256], 0),          # multi q-tile causal
    (1, 128, 384, 4, 4, 128, [384], 256),        # offset queries (chunked prefill)
]


@pytest.mark.parametrize("B,T,S,Hq,Hkv,D,limits,pos0", CASES)
def test_flash_matches_xla(B, T, S, Hq, Hkv, D, limits, pos0, rng):
    assert flash_supported(T, S, D)
    q, k, v = make_qkv(rng, B, T, S, Hq, Hkv, D)
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32) + pos0, (B, T))
    kv_limit = jnp.asarray(limits, jnp.int32)

    got = np.asarray(flash_attention(q, k, v, positions, kv_limit), np.float32)
    ref = np.asarray(sdpa_xla(q, k, v, positions, kv_limit), np.float32)
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=2e-2)


def test_flash_softcap(rng):
    q, k, v = make_qkv(rng, 1, 128, 128, 2, 2, 128)
    positions = jnp.arange(128, dtype=jnp.int32)[None]
    kv_limit = jnp.asarray([128], jnp.int32)
    got = np.asarray(flash_attention(q, k, v, positions, kv_limit, attn_softcap=30.0), np.float32)
    ref = np.asarray(sdpa_xla(q, k, v, positions, kv_limit, attn_softcap=30.0), np.float32)
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("window", [16, 100, 128])
def test_flash_sliding_window(window, rng):
    q, k, v = make_qkv(rng, 1, 128, 256, 4, 2, 128)
    positions = (jnp.arange(128, dtype=jnp.int32) + 128)[None]  # offset queries
    kv_limit = jnp.asarray([256], jnp.int32)
    got = np.asarray(
        flash_attention(q, k, v, positions, kv_limit, window=window), np.float32
    )
    ref = np.asarray(
        sdpa_xla(q, k, v, positions, kv_limit, window=window), np.float32
    )
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=2e-2)


DECODE_CASES = [
    # B, S, Hq, Hkv, D, limits, softcap, window
    (1, 512, 8, 1, 256, [200], 0.0, 0),      # Gemma-2B MQA
    (2, 256, 16, 16, 256, [77, 130], 0.0, 0),  # Gemma-7B MHA (G=1 padding)
    (1, 256, 8, 2, 128, [256], 30.0, 0),     # GQA + softcap
    (1, 512, 8, 1, 256, [300], 0.0, 64),     # sliding window
    (1, 512, 8, 1, 256, [1], 0.0, 0),        # single valid key
    # mostly-dead caches: the index_map redirects dead S-tiles to the last
    # live tile (DMA elision) — correctness of the redirect under multi-tile
    # dead spans, incl. a window whose live span starts mid-cache
    (1, 2048, 16, 16, 128, [300], 0.0, 0),   # MHA, 1 live tile of many
    (2, 2048, 8, 1, 256, [1100, 64], 0.0, 0),
    (1, 2048, 8, 1, 256, [1500], 0.0, 256),  # dead tiles both sides of window
]


@pytest.mark.parametrize("B,S,Hq,Hkv,D,limits,cap,win", DECODE_CASES)
def test_decode_kernel_matches_xla(B, S, Hq, Hkv, D, limits, cap, win, rng):
    assert decode_supported(1, S, Hq, Hkv, D)
    q, k, v = make_qkv(rng, B, 1, S, Hq, Hkv, D)
    kv_limit = jnp.asarray(limits, jnp.int32)
    positions = (kv_limit - 1)[:, None]  # decode: query sits at limit-1
    got = np.asarray(
        decode_attention(q, k, v, kv_limit, attn_softcap=cap, window=win),
        np.float32,
    )
    ref = np.asarray(
        sdpa_xla(q, k, v, positions, kv_limit, attn_softcap=cap, window=win),
        np.float32,
    )
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("B,S,Hq,Hkv,D,limits,cap,win", DECODE_CASES)
def test_decode_kernel_int8_kv(B, S, Hq, Hkv, D, limits, cap, win, rng):
    """int8 cache rows read in place (scales folded into the dots) vs the
    dequantize-then-XLA reference."""
    q, k, v = make_qkv(rng, B, 1, S, Hq, Hkv, D)
    kf = np.asarray(k, np.float32)
    vf = np.asarray(v, np.float32)

    def quant(x):
        amax = np.abs(x).max(axis=-1)
        scale = amax / 127.0
        inv = np.where(scale > 0, 1.0 / np.where(scale == 0, 1.0, scale), 0.0)
        return np.round(x * inv[..., None]).astype(np.int8), scale.astype(np.float32)

    qk, sk = quant(kf)
    qv, sv = quant(vf)
    kv_limit = jnp.asarray(limits, jnp.int32)
    positions = (kv_limit - 1)[:, None]
    got = np.asarray(
        decode_attention(
            q, jnp.asarray(qk), jnp.asarray(qv), kv_limit, attn_softcap=cap,
            window=win, k_scale=jnp.asarray(sk), v_scale=jnp.asarray(sv),
        ),
        np.float32,
    )
    kd = jnp.asarray(qk * sk[..., None], jnp.bfloat16)
    vd = jnp.asarray(qv * sv[..., None], jnp.bfloat16)
    ref = np.asarray(
        sdpa_xla(q, kd, vd, positions, kv_limit, attn_softcap=cap, window=win),
        np.float32,
    )
    np.testing.assert_allclose(got, ref, atol=3e-2, rtol=3e-2)


def test_flash_non_consecutive_positions(rng):
    """Arbitrary (shuffled, gapped) per-row query positions — the kernel
    reads positions per row, so no consecutiveness contract exists."""
    B, T, S, Hq, Hkv, D = 2, 128, 256, 4, 2, 128
    q, k, v = make_qkv(rng, B, T, S, Hq, Hkv, D)
    positions = jnp.asarray(
        np.stack(
            [
                rng.permutation(np.arange(0, 2 * T, 2))[:T],  # gapped + shuffled
                rng.integers(0, S, size=T),
            ]
        ),
        jnp.int32,
    )
    kv_limit = jnp.asarray([S, 180], jnp.int32)
    got = np.asarray(flash_attention(q, k, v, positions, kv_limit), np.float32)
    ref = np.asarray(sdpa_xla(q, k, v, positions, kv_limit), np.float32)
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=2e-2)


def test_flash_rows_before_any_key():
    """Query rows with position < 0 valid keys (empty attention) must not NaN."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    q, k, v = make_qkv(rng, 1, 128, 128, 2, 2, 128)
    positions = jnp.arange(128, dtype=jnp.int32)[None]
    kv_limit = jnp.asarray([1], jnp.int32)  # only key 0 valid
    out = np.asarray(flash_attention(q, k, v, positions, kv_limit), np.float32)
    assert np.isfinite(out).all()


def test_tile_policies():
    """Tile-pick policies encode the measured sweeps (BENCHMARKS.md)."""
    from gemma_tpu.ops.attention import _pick_decode_block_s, _pick_flash_blocks

    # decode: short caches keep 256 (pipelining); long caches take 1024
    assert _pick_decode_block_s(512) == 256
    assert _pick_decode_block_s(4096) == 1024
    assert _pick_decode_block_s(8192) == 1024
    assert _pick_decode_block_s(96) == 96  # odd short cache: whole-S
    # flash: largest 128-multiple up to 512
    assert _pick_flash_blocks(2048, 2048) == (512, 512)
    assert _pick_flash_blocks(128, 256) == (128, 256)
    assert _pick_flash_blocks(384, 640) == (128, 128)
