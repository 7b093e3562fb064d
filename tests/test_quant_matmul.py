"""Fused dequant+matmul kernels vs the XLA dequant reference.

Runs in Pallas interpret mode on CPU (same kernel code the TPU compiles);
each kernel must match x @ dequant(w).T to bf16-level tolerance.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from gemma_tpu.ops.quant_matmul import quant_matmul, supports
from gemma_tpu.quant.qtensor import dequant, quantize_array

CASES = [
    ("q4_0", (256, 512), 1),
    ("q4_0", (256, 512), 7),
    ("q4_0", (128, 1024), 64),
    ("q8_0", (256, 512), 1),
    ("q8_0", (128, 512), 33),
    # K-quant v4 metadata tiles (int8 sub-scales + bf16 superscales) need
    # bk % 1024 == 0, so K must be a 1024-multiple on the kernel path
    ("q4_k", (256, 1024), 1),
    ("q4_k", (128, 1024), 16),
    ("q6_k", (256, 1024), 1),
    ("q6_k", (128, 1024), 9),
    # wide-N: exercises the bn=1024/2048 tile picks (gate_up / lm_head
    # geometry) and the x-permute <-> weight-tile window alignment
    ("q4_0", (8192, 512), 1),
    ("q4_0", (16384, 512), 1),
]


@pytest.mark.parametrize("fmt,shape,m", CASES, ids=[f"{f}-{s}-m{m}" for f, s, m in CASES])
def test_kernel_matches_dequant_reference(fmt, shape, m, rng):
    N, K = shape
    w = quantize_array(rng.normal(size=(N, K)).astype(np.float32), fmt)
    x = jnp.asarray(rng.normal(size=(m, K)).astype(np.float32), jnp.bfloat16)
    assert supports(x.shape, w)

    got = np.asarray(quant_matmul(x, w))
    ref = np.asarray(
        jnp.dot(x, dequant(w, jnp.bfloat16).T, preferred_element_type=jnp.float32)
    )
    # bf16 weight rounding differs slightly between paths (kernel rounds
    # after scale multiply); tolerance ~ bf16 eps * sqrt(K) * |x||w|
    scale = np.abs(ref).max() + 1e-6
    np.testing.assert_allclose(got, ref, atol=2e-2 * scale, rtol=2e-2)


def test_q6k_v4_kernel_matches(rng, monkeypatch):
    """The deep-K int8-payload q6_k variant (GEMMA_TPU_Q6K_DEEPK) runs its
    own kernel; both M buckets must match the dequant reference."""
    monkeypatch.setenv("GEMMA_TPU_Q6K_DEEPK", "8192")
    w = quantize_array(rng.normal(size=(128, 8192)).astype(np.float32), "q6_k")
    assert w.fmt == "q6_k_v4"
    for m in (1, 9):
        x = jnp.asarray(rng.normal(size=(m, 8192)).astype(np.float32), jnp.bfloat16)
        assert supports(x.shape, w)
        got = np.asarray(quant_matmul(x, w))
        ref = np.asarray(
            jnp.dot(x, dequant(w, jnp.bfloat16).T, preferred_element_type=jnp.float32)
        )
        scale = np.abs(ref).max() + 1e-6
        np.testing.assert_allclose(got, ref, atol=2e-2 * scale, rtol=2e-2)


def test_batched_leading_dims(rng):
    w = quantize_array(rng.normal(size=(128, 512)).astype(np.float32), "q4_0")
    x = jnp.asarray(rng.normal(size=(2, 3, 512)), jnp.bfloat16)
    y = quant_matmul(x, w)
    assert y.shape == (2, 3, 128)
    y2 = quant_matmul(x.reshape(6, 512), w).reshape(2, 3, 128)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), rtol=1e-6)


def test_supports_gating(rng):
    w = quantize_array(rng.normal(size=(100, 96)).astype(np.float32), "q4_0")
    assert not supports((1, 96), w)  # N=100 not tileable
