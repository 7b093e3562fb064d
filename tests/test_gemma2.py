"""Gemma-2 family semantics: sandwich norms, softcaps, sliding window."""
import numpy as np
import pytest

import ref_numpy_gemma
from gemma_tpu.gguf import GGMLType, GGUFReader
from gemma_tpu.models import load_params
from gemma_tpu.quant import dequantize
from gemma_tpu.runtime import Engine, EngineConfig
from gemma_tpu.testing import TINY_GEMMA2_CONFIG, make_gguf


@pytest.fixture(scope="module")
def g2_model(tmp_path_factory):
    path = tmp_path_factory.mktemp("g2") / "tiny2.gguf"
    make_gguf(path, TINY_GEMMA2_CONFIG, weight_type=GGMLType.F32, seed=11, arch="gemma2")
    reader = GGUFReader(path)
    cfg, params = load_params(reader, mode="dequant")
    weights = {
        ti.name: dequantize(reader.tensor_raw(ti.name), ti.ggml_type, ti.shape)
        for ti in reader
    }
    return cfg, params, weights


def test_config_parses_gemma2_extras(g2_model):
    cfg = g2_model[0]
    assert cfg.sliding_window == 16
    assert cfg.swa_pattern == 2
    assert cfg.attn_softcap == 50.0
    assert cfg.final_softcap == 30.0
    # layer 0 slides, layer 1 is global
    assert cfg.layer_window(0) == 16
    assert cfg.layer_window(1) == 0


def test_params_include_sandwich_norms(g2_model):
    _, params, _ = g2_model
    lp = params["layers"][0]
    assert "post_attention_norm" in lp
    assert "post_ffw_norm" in lp


def test_forward_matches_numpy_reference(g2_model):
    cfg, params, weights = g2_model
    # long enough that the window (16) actually truncates attention
    tokens = [1] + list(range(260, 260 + 23))
    ref = ref_numpy_gemma.forward(weights, cfg, tokens)

    import jax.numpy as jnp

    eng = Engine(cfg, params, EngineConfig(max_seq_len=32, donate_cache=False))
    logits, _ = eng._prefill_impl(
        params, jnp.asarray([tokens], jnp.int32),
        jnp.asarray([len(tokens)], jnp.int32), eng.new_cache(1),
    )
    np.testing.assert_allclose(
        np.asarray(logits[0]), ref[-1], atol=0.05 * np.abs(ref[-1]).max() + 1e-3
    )
    assert int(np.argmax(logits[0])) == int(np.argmax(ref[-1]))


def test_prefill_decode_equivalence_with_window(g2_model):
    """Decode past the sliding window must match full-prefill logits."""
    cfg, params, weights = g2_model
    tokens = [1] + list(range(300, 300 + 27))  # crosses the 16-token window
    full = ref_numpy_gemma.forward(weights, cfg, tokens)

    import jax.numpy as jnp

    eng = Engine(cfg, params, EngineConfig(max_seq_len=32, donate_cache=False))
    logits, cache = eng.prefill([tokens[:4]])
    for t in range(4, len(tokens)):
        logits, cache = eng.decode_step(jnp.asarray([tokens[t]], jnp.int32), cache)
        ref = full[t]
        got = np.asarray(logits[0])
        np.testing.assert_allclose(got, ref, atol=0.05 * np.abs(ref).max() + 1e-3)


def test_generate_runs_end_to_end(g2_model):
    cfg, params, _ = g2_model
    eng = Engine(cfg, params, EngineConfig(max_seq_len=64, donate_cache=False))
    out = eng.generate([[1, 301, 302]], max_new_tokens=6)[0]
    assert len(out) == 6
