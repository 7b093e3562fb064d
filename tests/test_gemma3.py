"""Gemma-3 family semantics: QK-norm, split rope bases, linear rope scaling,
5-local/1-global sliding-window cadence."""
import numpy as np
import pytest

import ref_numpy_gemma
from gemma_tpu.gguf import GGMLType, GGUFReader
from gemma_tpu.models import load_params
from gemma_tpu.quant import dequantize
from gemma_tpu.runtime import Engine, EngineConfig
from gemma_tpu.testing import TINY_GEMMA3_CONFIG, make_gguf


@pytest.fixture(scope="module")
def g3_model(tmp_path_factory):
    path = tmp_path_factory.mktemp("g3") / "tiny3.gguf"
    make_gguf(path, TINY_GEMMA3_CONFIG, weight_type=GGMLType.F32, seed=13, arch="gemma3")
    reader = GGUFReader(path)
    cfg, params = load_params(reader, mode="dequant")
    weights = {
        ti.name: dequantize(reader.tensor_raw(ti.name), ti.ggml_type, ti.shape)
        for ti in reader
    }
    return cfg, params, weights


def test_config_parses_gemma3_extras(g3_model):
    cfg = g3_model[0]
    assert cfg.swa_pattern == 6
    assert cfg.rope_base == 1_000_000.0
    assert cfg.rope_base_swa == 10_000.0
    assert cfg.rope_scale == pytest.approx(1.0 / 8.0)
    # layers 0..4 slide at the local base unscaled; layer 5 is global with
    # the trained base and linear scaling
    assert cfg.layer_window(0) == 16 and cfg.layer_window(5) == 0
    assert cfg.layer_rope(0) == (10_000.0, 1.0)
    assert cfg.layer_rope(5) == (1_000_000.0, pytest.approx(1.0 / 8.0))


def test_params_include_qk_norms(g3_model):
    _, params, _ = g3_model
    lp = params["layers"][0]
    assert "attn_q_norm" in lp and "attn_k_norm" in lp
    assert lp["attn_q_norm"].shape == (TINY_GEMMA3_CONFIG.head_dim,)


def test_forward_matches_numpy_reference(g3_model):
    cfg, params, weights = g3_model
    tokens = [1] + list(range(260, 260 + 23))  # long enough to slide
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


def test_prefill_decode_equivalence(g3_model):
    """Incremental decode must match full prefill under per-layer rope."""
    cfg, params, weights = g3_model
    tokens = [1, 7, 300, 42, 260, 9, 77, 5]
    eng = Engine(cfg, params, EngineConfig(max_seq_len=32, donate_cache=False))
    import jax.numpy as jnp

    full = ref_numpy_gemma.forward(weights, cfg, tokens)
    logits, cache = eng.prefill([tokens[:3]])
    for t in range(3, len(tokens)):
        logits, cache = eng.decode_step(jnp.asarray([tokens[t]], jnp.int32), cache)
        ref = full[t]
        got = np.asarray(logits[0])
        np.testing.assert_allclose(got, ref, atol=0.05 * np.abs(ref).max() + 1e-3)
