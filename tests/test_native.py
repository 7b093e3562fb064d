"""Native (C++) codec parity vs the numpy reference implementations.

Every native path must be bit-identical to quant/numpy_ref.py (dequant)
and quant/qtensor.py (device-layout repack) — same differential pattern the
reference uses for its GPU kernels (kernals.cl in-kernel verification,
SURVEY.md §4 item 2), applied host-side.
"""
import numpy as np
import pytest

from gemma_tpu import native
from gemma_tpu.gguf.constants import GGMLType
from gemma_tpu.quant import numpy_ref
from gemma_tpu.quant.qtensor import _PACKERS, GGML_TO_FMT

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)

QUANT_TYPES = [GGMLType.Q4_0, GGMLType.Q8_0, GGMLType.Q4_K, GGMLType.Q6_K]


def payload(rng, t: GGMLType, rows: int, cols: int) -> bytes:
    x = rng.normal(0.0, 1.0, size=(rows, cols)).astype(np.float32)
    return numpy_ref.quantize(x, t)


@pytest.mark.parametrize("t", QUANT_TYPES)
def test_dequant_bit_exact(t, rng):
    rows, cols = 6, 512
    raw = payload(rng, t, rows, cols)
    ref = numpy_ref.dequantize(raw, t, (rows, cols))
    got = native.dequantize(raw, t, (rows, cols))
    assert got is not None
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize(
    "t,dt", [(GGMLType.F32, "<f4"), (GGMLType.F16, "<f2"), (GGMLType.BF16, None)]
)
def test_dequant_float_formats(t, dt, rng):
    x = rng.normal(size=(4, 256)).astype(np.float32)
    raw = numpy_ref.quantize(x, t)
    ref = numpy_ref.dequantize(raw, t, (4, 256))
    got = native.dequantize(raw, t, (4, 256))
    assert got is not None
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("t", QUANT_TYPES)
def test_repack_bit_exact(t, rng):
    rows, cols = 12, 768  # multiple superblocks per row, odd-ish N
    raw = payload(rng, t, rows, cols)
    fmt = GGML_TO_FMT[t]
    ref = _PACKERS[fmt][1](raw, (rows, cols))
    got = native.repack(raw, t, (rows, cols))
    assert got is not None
    assert set(got) == set(ref)
    for k in ref:
        assert got[k].dtype == ref[k].dtype, k
        np.testing.assert_array_equal(got[k], ref[k], err_msg=k)


def test_repack_unsupported_returns_none(rng):
    x = rng.normal(size=(4, 256)).astype(np.float32)
    raw = numpy_ref.quantize(x, GGMLType.F16)
    assert native.repack(raw, GGMLType.F16, (4, 256)) is None


def test_f16_special_values_roundtrip():
    # subnormals, zero, negatives — exercised through a Q4_0 scale of tiny
    # magnitude written by numpy f16 rounding
    vals = np.array([0.0, 6e-8, -6e-8, 6e-5, -1.0, 65504.0], np.float32)
    bits = vals.astype(np.float16).view(np.uint16)
    # craft q4_0 blocks with those scales: d || 16 payload bytes
    nb = len(vals)
    blocks = np.zeros((nb, 18), np.uint8)
    blocks[:, :2] = bits[:, None].view(np.uint8)
    blocks[:, 2:] = np.arange(16, dtype=np.uint8)[None, :] | 0xA0
    raw = blocks.tobytes()
    ref = numpy_ref.dequantize(raw, GGMLType.Q4_0, (1, nb * 32))
    got = native.dequantize(raw, GGMLType.Q4_0, (1, nb * 32))
    np.testing.assert_array_equal(got, ref)
