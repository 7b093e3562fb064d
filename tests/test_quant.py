"""Quant codec tests: round-trip accuracy + exact layout invariants."""
import numpy as np
import pytest

from gemma_tpu.gguf import GGMLType, row_size
from gemma_tpu.quant import dequantize, quantize
from gemma_tpu.quant.numpy_ref import _pack_scale_min_k4, _unpack_scale_min_k4

# Empirical round-trip relative RMS for N(0,1) data, ~10% headroom. 4-bit
# uniform quantization of Gaussian data bottoms out around 0.08 relative RMS.
ROUNDTRIP_TOL = {
    GGMLType.Q4_0: 0.095,
    GGMLType.Q4_K: 0.088,
    GGMLType.Q5_K: 0.045,
    GGMLType.Q6_K: 0.022,
    GGMLType.Q8_0: 0.007,
    GGMLType.Q8_K: 0.009,
}


@pytest.mark.parametrize("t", sorted(ROUNDTRIP_TOL, key=int), ids=lambda t: t.name)
def test_roundtrip_error(t, rng):
    n = 4096
    x = rng.normal(size=n).astype(np.float32)
    raw = quantize(x, t)
    assert len(raw) == row_size(t, n)
    y = dequantize(raw, t)
    assert y.shape == (n,)
    rms = np.sqrt(np.mean((x - y) ** 2)) / np.sqrt(np.mean(x**2))
    assert rms < ROUNDTRIP_TOL[t], f"{t.name} relative RMS error {rms}"


@pytest.mark.parametrize("t", [GGMLType.F16, GGMLType.F32, GGMLType.BF16], ids=lambda t: t.name)
def test_float_formats(t, rng):
    x = rng.normal(size=256).astype(np.float32)
    y = dequantize(quantize(x, t), t)
    tol = {GGMLType.F32: 0, GGMLType.F16: 1e-3, GGMLType.BF16: 1e-2}[t]
    np.testing.assert_allclose(y, x, atol=tol * np.abs(x).max() + 1e-12)


def test_scale_min_k4_pack_unpack(rng):
    sc = rng.integers(0, 64, size=(7, 8)).astype(np.uint8)
    mn = rng.integers(0, 64, size=(7, 8)).astype(np.uint8)
    packed = _pack_scale_min_k4(sc, mn)
    assert packed.shape == (7, 12)
    sc2, mn2 = _unpack_scale_min_k4(packed)
    np.testing.assert_array_equal(sc, sc2)
    np.testing.assert_array_equal(mn, mn2)


def test_q4_0_known_block():
    """Hand-built Q4_0 block decodes per the ggml layout: byte j holds elems
    j (lo nibble) and j+16 (hi nibble); value = d * (q - 8)."""
    d = np.float16(0.5)
    qs = np.zeros(16, dtype=np.uint8)
    qs[0] = 0x0F | (0x00 << 4)  # elem0 = 15, elem16 = 0
    qs[3] = 0x08 | (0x01 << 4)  # elem3 = 8,  elem19 = 1
    raw = d.tobytes() + qs.tobytes()
    out = dequantize(raw, GGMLType.Q4_0)
    assert out[0] == pytest.approx(0.5 * 7)
    assert out[16] == pytest.approx(0.5 * -8)
    assert out[3] == pytest.approx(0.0)
    assert out[19] == pytest.approx(0.5 * -7)


def test_q6_k_known_block():
    """All-zero q with unit scales decodes to d * sc * (0 - 32)."""
    ql = np.zeros(128, dtype=np.uint8)
    qh = np.zeros(64, dtype=np.uint8)
    scales = np.ones(16, dtype=np.int8)
    d = np.float16(2.0)
    raw = ql.tobytes() + qh.tobytes() + scales.tobytes() + d.tobytes()
    out = dequantize(raw, GGMLType.Q6_K)
    np.testing.assert_allclose(out, np.full(256, 2.0 * 1 * -32), rtol=1e-3)


def test_q8_k_bsums(rng):
    x = rng.normal(size=512).astype(np.float32)
    raw = np.frombuffer(quantize(x, GGMLType.Q8_K), dtype=np.uint8).reshape(-1, 292)
    q = raw[:, 4:260].view(np.int8)
    bsums = raw[:, 260:292].copy().view("<i2")
    np.testing.assert_array_equal(bsums, q.reshape(-1, 16, 16).sum(axis=2).astype(np.int16))


def test_extreme_values_roundtrip():
    x = np.zeros(256, dtype=np.float32)  # all-zero block must not NaN
    for t in ROUNDTRIP_TOL:
        y = dequantize(quantize(x, t), t)
        assert np.all(np.isfinite(y))
        np.testing.assert_allclose(y, 0.0, atol=1e-6)
