"""GGUF reader/writer round-trip tests."""
import numpy as np

from gemma_tpu.gguf import GGMLType, GGUFReader, GGUFWriter, Keys
from gemma_tpu.quant import dequantize, quantize


def test_gguf_roundtrip(tmp_path, rng):
    path = tmp_path / "tiny.gguf"
    w = GGUFWriter(path)
    w.add_kv(Keys.ARCHITECTURE, "gemma")
    w.add_kv("gemma.block_count", 2)
    w.add_kv("gemma.attention.layer_norm_rms_epsilon", 1e-6)
    w.add_kv("tokenizer.ggml.tokens", ["<pad>", "<bos>", "hello", "▁world"])
    w.add_kv("tokenizer.ggml.scores", np.array([0.0, -1.0, -2.0, -3.0], dtype=np.float32))
    w.add_kv("tokenizer.ggml.token_type", np.array([3, 3, 1, 1], dtype=np.int32))
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("some.negative", -5)
    w.add_kv("some.flag", True)

    f32 = rng.normal(size=(4, 64)).astype(np.float32)
    w.add_tensor("plain_f32", f32, f32.shape, GGMLType.F32)
    f16 = rng.normal(size=(64,)).astype(np.float16)
    w.add_tensor("plain_f16", f16, f16.shape, GGMLType.F16)
    q = rng.normal(size=(8, 256)).astype(np.float32)
    w.add_tensor("quant_q4k", quantize(q, GGMLType.Q4_K), q.shape, GGMLType.Q4_K)
    w.write()

    r = GGUFReader(path)
    assert r.architecture == "gemma"
    assert r.kv("{arch}.block_count") == 2
    assert abs(r.kv("gemma.attention.layer_norm_rms_epsilon") - 1e-6) < 1e-12
    assert r.kv(Keys.TOKENS)[3] == "▁world"
    np.testing.assert_allclose(r.kv(Keys.SCORES), [0.0, -1.0, -2.0, -3.0])
    assert r.kv("some.negative") == -5
    assert r.kv("some.flag") is True
    assert r.kv("missing.key", 42) == 42

    np.testing.assert_array_equal(r.tensor_array("plain_f32"), f32)
    np.testing.assert_array_equal(r.tensor_array("plain_f16"), f16)

    ti = r.tensors["quant_q4k"]
    assert ti.shape == (8, 256)
    assert ti.ggml_type == GGMLType.Q4_K
    deq = dequantize(r.tensor_raw("quant_q4k"), GGMLType.Q4_K, ti.shape)
    rms = np.sqrt(np.mean((deq - q) ** 2)) / np.sqrt(np.mean(q**2))
    assert rms < 0.09
    r.close()


def test_alignment(tmp_path, rng):
    path = tmp_path / "aligned.gguf"
    w = GGUFWriter(path)
    w.add_kv(Keys.ARCHITECTURE, "gemma")
    a = rng.normal(size=(3, 32)).astype(np.float32)
    b = rng.normal(size=(5, 32)).astype(np.float32)
    w.add_tensor("a", a, a.shape, GGMLType.F32)
    w.add_tensor("b", b, b.shape, GGMLType.F32)
    w.write()
    with GGUFReader(path) as r:
        assert r.data_offset % r.alignment == 0
        for ti in r:
            assert ti.offset % r.alignment == 0
        np.testing.assert_array_equal(r.tensor_array("b"), b)
